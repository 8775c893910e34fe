"""A/B: can a remat policy un-materialize the stem's normalized activation?

Target (docs/PERF.md "HLO op accounting"): the custom_cnn step is
HBM-bandwidth-bound, ~11 passes over the 822 MB stem activation A1 =
bf16[512,112,112,64]. Two of those passes exist only because the
BN+relu-normalized tensor N1 has TWO consumers — max_pool's forward and its
backward select_and_scatter — so XLA must materialize it (write 822 MB) and
pool must re-read it (822 MB).

Hypothesis: `jax.checkpoint` over conv->BN->relu->pool with a policy that
saves ONLY the raw conv output A1 (+ the 64-wide batch stats) makes N1
single-consumer in each pass: forward can fuse normalize+relu into pool's
input (saving N1's write+read), and backward recomputes normalize fused
into select_and_scatter's operand from the saved A1 (same reads as before).
Expected ceiling: ~2 passes x 822 MB ~= 2.4 ms of a 28 ms step (+~9%).

Run: JAX_PLATFORMS=axon python benchmarks/stem_remat_bench.py  (real chip)

RESULT (2026-08-19, TPU v5 lite, bs 512 bf16, 15 dispatches/fence, 3 reps,
best-of-3):

    plain            fwd+bwd 21.42 ms/step
    remat_save_a1    fwd+bwd 23.17 ms/step  (0.925x -- LOSES 8%)
    remat_nothing    fwd+bwd 24.88 ms/step  (0.861x)

The hypothesis fails: XLA does not fuse the rematerialized normalize+relu
into select_and_scatter's operand (SAS fully materializes its input), so
the backward recompute re-writes and re-reads N1 on top of the passes it
was supposed to remove. The plain pipeline's materialization of N1 is
already optimal under XLA's fusion rules. Ninth measured alternative, ninth
XLA win (docs/PERF.md "Attempt 9"); kept as a documented reference.
"""

import time

import numpy as np


def main():
    import sys
    sys.path.insert(0, ".")
    from srl_zoo_tpu.utils.platform import honor_env_platform
    honor_env_platform()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.ad_checkpoint import checkpoint_name

    BS, H, W, CIN, COUT = 512, 224, 224, 3, 64
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x_h = rng.randn(BS, H, W, CIN).astype(np.float32)
    w_h = (rng.randn(7, 7, CIN, COUT) * 0.05).astype(np.float32)
    g_h = np.ones((COUT,), np.float32)
    b_h = np.zeros((COUT,), np.float32)

    def stem(w, gamma, beta, x):
        a1 = lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), window_strides=(2, 2),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        a1 = checkpoint_name(a1, "a1")
        af = a1.astype(jnp.float32)
        mu = checkpoint_name(af.mean((0, 1, 2)), "mu")
        var = checkpoint_name(af.var((0, 1, 2)), "var")
        n1 = (a1 - mu.astype(dtype)) * lax.rsqrt(var + 1e-5).astype(dtype)
        n1 = jnp.maximum(n1 * gamma.astype(dtype) + beta.astype(dtype), 0)
        p = lax.reduce_window(n1, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
        return p

    save_a1 = jax.checkpoint_policies.save_only_these_names("a1", "mu", "var")
    variants = {
        "plain": stem,
        "remat_save_a1": jax.checkpoint(stem, policy=save_a1),
        # reference point: full remat (recompute everything incl. the conv)
        "remat_nothing": jax.checkpoint(
            stem, policy=jax.checkpoint_policies.nothing_saveable),
    }

    x = jax.device_put(x_h)
    w = jax.device_put(w_h)
    gamma, beta = jax.device_put(g_h), jax.device_put(b_h)

    results = {}
    for name, fn in variants.items():
        def loss(w, gamma, beta, x, fn=fn):
            p = fn(w, gamma, beta, x)
            return (p.astype(jnp.float32) ** 2).mean()

        step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        v, g = step(w, gamma, beta, x)  # compile
        jax.device_get(v)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(15):
                out = step(w, gamma, beta, x)
            jax.device_get(out[0])
            reps.append((time.perf_counter() - t0) / 15 * 1e3)
        results[name] = min(reps)
        print(f"{name:16s} fwd+bwd {min(reps):7.2f} ms/step "
              f"(reps {['%.2f' % r for r in reps]})")

    base = results["plain"]
    for name, ms in results.items():
        if name != "plain":
            print(f"{name}: {base / ms:.3f}x vs plain "
                  f"({base - ms:+.2f} ms)")


if __name__ == "__main__":
    main()
