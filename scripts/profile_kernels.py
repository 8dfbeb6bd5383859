"""Reps-chained microbench of the individual hot kernels at the flagship
shapes (B=64 eval batch). Each op runs REPS times inside one jit with a data
dependency carried between iterations; the ~35 ms per-CALL dispatch overhead
of this backend amortizes to <1 ms/iter at REPS=40 and the printed numbers
are per-iteration. Synthetic weights — kernel cost depends only on shapes.

Profiling utility (not a CI artifact):
    python scripts/profile_kernels.py [vitattn ln relpe sa fps misc]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 40
B = 64


def steady(op, *args):
    """Time REPS data-chained iterations of op(*args); op returns an array."""

    @jax.jit
    def loop(seed, *a):
        def body(carry, k):
            out = op(*jax.tree.map(lambda t: t + (0.0 * carry).astype(t.dtype), list(a)))
            bump = jnp.sum(out[(0,) * (out.ndim - 1)].astype(jnp.float32)) * 1e-9
            return carry + bump, None

        c, _ = jax.lax.scan(body, jnp.float32(seed), jnp.arange(REPS))
        return c

    out = loop(0.0, *args)
    _ = float(out)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = loop(float(i + 1), *args)
        _ = float(out)
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    which = set(sys.argv[1:]) or {"vitattn", "ln", "relpe", "sa", "fps", "misc"}
    key = jax.random.PRNGKey(0)

    if "vitattn" in which:
        from genpose2_tpu.ops.vit_attention import vit_attention_tm

        N, D, H = 272, 384, 6
        q = jax.random.normal(key, (B, N, D), jnp.bfloat16)
        t = steady(lambda q: vit_attention_tm(q, q, q, H, n_valid=261), q)
        print(f"vit_attention_tm B={B} N={N} D={D}: {t*1e3:7.3f} ms", flush=True)

    if "ln" in which:
        from genpose2_tpu.ops.layernorm import fast_residual_layernorm

        for (M, C) in ((512, 96), (256, 256), (128, 512), (64, 1024)):
            x = jax.random.normal(key, (B, M, C), jnp.float32)
            s = jnp.ones((C,))
            b = jnp.zeros((C,))
            t = steady(lambda x: fast_residual_layernorm(x, x, s, b), x)
            print(f"residual_ln M={M} C={C}: {t*1e3:7.3f} ms", flush=True)

    if "relpe" in which:
        from genpose2_tpu.models.attention import EfficientRelativePositionalEncoding
        from genpose2_tpu.ops.relpe_attention import relpe_attention

        for (M, C) in ((512, 96), (256, 256), (128, 512), (64, 1024)):
            xyz = jax.random.normal(key, (B, M, 3)) * 0.1
            x = jax.random.normal(key, (B, M, C))
            pe_vars = EfficientRelativePositionalEncoding(8).init(key, xyz[:1])
            t = steady(
                lambda x, xyz: relpe_attention(
                    xyz, x, x, x, pe_vars["params"], 8, compute_dtype="bfloat16"
                ),
                x, xyz,
            )
            print(f"relpe_attention M={M} C={C}: {t*1e3:7.3f} ms", flush=True)

    if "sa" in which:
        from genpose2_tpu.ops.fused_sa import fused_sa_stage

        stages = [
            # (N, M, in radii nsamples h1s widths, skip)
            (1024, 512, (0.01, 0.02), (16, 32), (16, 32), ((16, 32), (32, 64)), True),
            (512, 256, (0.02, 0.04), (16, 32), (64, 64), ((64, 128), (96, 128)), False),
            (256, 128, (0.04, 0.08), (16, 32), (128, 128), ((196, 256), (196, 256)), False),
            (128, 64, (0.08, 0.16), (16, 32), (256, 256), ((256, 512), (384, 512)), False),
        ]
        for si, (N, M, radii, ns, h1s, widths, skip) in enumerate(stages):
            xyz = jax.random.normal(key, (B, N, 3)) * 0.1
            nxs = xyz[:, :M]
            projs = [jax.random.normal(key, (B, N, h), jnp.bfloat16) for h in h1s]
            centers = [jax.random.normal(key, (B, M, h), jnp.float32) for h in h1s]
            affines, weights = [], []
            for s in range(2):
                ws = (h1s[s],) + widths[s]
                affines.append([(jnp.ones((w,)), jnp.zeros((w,))) for w in ws])
                weights.append(
                    [jax.random.normal(key, (a, b), jnp.bfloat16) * 0.05
                     for a, b in zip(ws[:-1], ws[1:])]
                )

            def op(p0, p1, xyz=xyz, nxs=nxs, centers=centers, affines=affines,
                   weights=weights, radii=radii, ns=ns, skip=skip):
                return fused_sa_stage(
                    xyz, nxs, [p0, p1], centers, affines, weights, radii, ns,
                    slot_chunk=4 if skip else 8, dynamic_skip=skip,
                )

            t = steady(op, projs[0], projs[1])
            print(f"fused_sa_stage s{si} N={N} M={M}: {t*1e3:7.3f} ms", flush=True)

    if "fps" in which:
        from genpose2_tpu.ops import furthest_point_sample

        for (N, M) in ((1024, 512), (512, 256), (256, 128), (128, 64)):
            xyz = jax.random.normal(key, (B, N, 3)) * 0.1
            t = steady(lambda x, M=M: furthest_point_sample(x, M).astype(jnp.float32), xyz)
            print(f"fps N={N}->M={M}: {t*1e3:7.3f} ms", flush=True)

    if "misc" in which:
        from genpose2_tpu.ops.ball_query_pallas import ball_count

        xyz = jax.random.normal(key, (B, 1024, 3)) * 0.1
        nxs = xyz[:, :512]

        def op(x, nx):
            cnt = ball_count(x, nx, 0.02)
            order = jnp.argsort(-cnt, axis=1)
            return jnp.take_along_axis(nx, order[..., None], axis=1)

        t = steady(op, xyz, nxs)
        print(f"ball_count+sort N=1024 M=512: {t*1e3:7.3f} ms", flush=True)

        # the density-unsort gather on the stage-0 output
        cat = jax.random.normal(key, (B, 512, 96))
        inv = jnp.argsort(jax.random.normal(key, (B, 512)), axis=1)
        t = steady(lambda c: jnp.take_along_axis(c, inv[..., None], axis=1), cat)
        print(f"unsort gather (B,512,96): {t*1e3:7.3f} ms", flush=True)

        # pointwise rgb gather
        fused = jax.random.normal(key, (B, 256, 384))
        pos = jax.random.randint(key, (B, 1024, 1), 0, 256)
        t = steady(lambda f: jnp.take_along_axis(f, pos, axis=1), fused)
        print(f"rgb gather (B,1024,384): {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
