"""Measure the ACHIEVABLE matmul rate at the ViT's exact shapes.

The ViT forward sits at ~9.8 ms vs a ~5.4 ms bf16 peak-rate roofline
(1.07 TFLOP over 12 blocks at B=64, N=272, D=384). This probe times JUST the
per-block matmul chain (qkv-with-rope-columns 384x1920, wo 384x384,
w12 384x3072, w3 1536x384 — no LN, no attention, no RoPE glue) under the
same reps-chained scan harness, giving the empirically-achievable floor for
the dominant term: if the chain itself runs well over the peak-rate number,
the "slack" in the ViT is XLA's matmul efficiency at D=384, not glue.

Profiling utility (not a CI artifact).
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 40
ROWS = 64 * 272  # flagship token rows
D = 384


def main():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (ROWS, D), jnp.bfloat16)
    ks = jax.random.split(key, 4)
    w5 = jax.random.normal(ks[0], (D, 5 * D), jnp.bfloat16) * 0.05
    wo = jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.05
    w12 = jax.random.normal(ks[2], (D, 2 * 1536), jnp.bfloat16) * 0.05
    w3 = jax.random.normal(ks[3], (1536, D), jnp.bfloat16) * 0.05

    flops_per_block = 2 * ROWS * (D * 5 * D + D * D + D * 2 * 1536 + 1536 * D)
    flops = 12 * flops_per_block

    @jax.jit
    def loop(x0, w5, wo, w12, w3, seed=0):
        def body(x, _):
            for _b in range(12):
                q = jnp.dot(x, w5, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )[:, :D]
                h = jnp.dot(q, wo, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )
                ab = jnp.dot(h, w12, preferred_element_type=jnp.float32).astype(
                    jnp.bfloat16
                )
                x = jnp.dot(
                    ab[:, :1536], w3, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            return x, None

        x0 = x0 + jnp.bfloat16(seed) * 0  # traced-seed signature
        x, _ = jax.lax.scan(body, x0, jnp.arange(REPS))
        return jnp.sum(x.astype(jnp.float32))

    out = loop(x0, w5, wo, w12, w3, seed=-1)
    _ = float(out)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(loop(x0, w5, wo, w12, w3, seed=i))
        best = min(best, time.perf_counter() - t0)
    dt = best / REPS
    print(
        f"matmul chain: {dt*1e3:.2f} ms/iter, {flops/dt/1e12:.1f} TFLOP/s "
        f"({flops/1e9:.0f} GFLOP per forward)",
        flush=True,
    )


if __name__ == "__main__":
    main()
