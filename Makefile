.PHONY: test test-fast smoke bench perf-gate tpu-checkup native clean demo \
	results

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

smoke:
	bash ci/smoke.sh

bench:
	python bench.py

results:  # regenerate the RESULTS.md headline quality table (TPU host)
	python benchmarks/reproduce_results.py

perf-gate:
	python ci/perf_gate.py

tpu-checkup:
	bash ci/tpu_checkup.sh

demo:
	python examples/downstream_rl.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
