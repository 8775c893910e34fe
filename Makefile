.PHONY: test smoke bench native clean demo

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

smoke:
	bash ci/smoke.sh

bench:
	python bench.py

demo:
	python examples/downstream_rl.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
