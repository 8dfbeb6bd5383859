"""Per-stage/per-scale microbench of the eval encoder fast path (profiling
utility for ROADMAP item 2: encoder roofline).

Times, at bench.py's shapes (B=128, ClsMSG_CFG_Light, bf16 compute):
  - FPS per stage
  - the fused SA scale kernel per (stage, scale)
  - the GroupAll tail
each iterated R times inside one jit with a carried data dependency
(per-call dispatch is ~30-50 ms on this backend).
"""

import time

import jax
import jax.numpy as jnp

from genpose2_tpu.config import PointNet2Config
from genpose2_tpu.ops import furthest_point_sample, gather_points
from genpose2_tpu.ops.fused_sa import fused_sa_scale

R = 30


def bench(op, x):
    @jax.jit
    def loop(x):
        def body(carry, _):
            out = op(carry)
            bump = jnp.sum(
                jnp.asarray(out[0] if isinstance(out, tuple) else out).astype(jnp.float32)
            )
            return carry + (bump * 0).astype(carry.dtype), None

        carry, _ = jax.lax.scan(body, x, None, length=R)
        return jnp.sum(carry)

    float(loop(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / R


def main():
    B = 128
    cfg = PointNet2Config(compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    Ns = [1024, 512, 256, 128, 64]
    in_widths = [0, 96, 256, 512, 1024]  # feature width entering each stage
    total = 0.0
    for k, npoint in enumerate(cfg.npoints):
        N = Ns[k]
        C = in_widths[k]
        xyz = jax.random.normal(jax.random.fold_in(key, k), (B, N, 3)) * 0.1
        feats = (
            jax.random.normal(jax.random.fold_in(key, 100 + k), (B, N, C))
            if C
            else None
        )
        inp = jnp.concatenate([xyz, feats], axis=-1) if C else xyz

        if npoint is None:
            # GroupAll tail: SharedMLP chains + global max (XLA)
            Ws = [
                [
                    jax.random.normal(key, (din, dout), dt) * 0.05
                    for din, dout in zip((3 + C,) + tuple(w[:-1]), w)
                ]
                for w in cfg.mlps[k]
            ]

            def groupall(x, Ws=Ws):
                outs = []
                for chain in Ws:
                    h = x
                    for W in chain:
                        h = jnp.maximum(h.astype(jnp.float32) @ W.astype(jnp.float32), 0.0)
                    outs.append(jnp.max(h, axis=1, keepdims=True))
                return jnp.concatenate(outs, axis=-1)

            t = bench(groupall, inp)
            total += t
            print(f"stage{k} GroupAll: {t*1e3:7.3f} ms", flush=True)
            continue

        t_fps = bench(lambda x, m=npoint: furthest_point_sample(x, m), xyz)
        total += t_fps
        print(f"stage{k} FPS N={N}->M={npoint}: {t_fps*1e3:7.3f} ms", flush=True)

        idx = jax.jit(lambda x, m=npoint: furthest_point_sample(x, m))(xyz)
        new_xyz = gather_points(xyz, idx)

        for s, (radius, ns) in enumerate(zip(cfg.radii[k], cfg.nsamples[k])):
            widths = cfg.mlps[k][s]
            h1 = widths[0]
            kern = jax.random.normal(key, (3 + C, h1)) * 0.05
            proj = (inp @ kern).astype(dt)
            center = (new_xyz @ kern[:3]).astype(jnp.float32)
            affines = [
                (jnp.ones((h,), jnp.float32), jnp.zeros((h,), jnp.float32))
                for h in widths
            ]
            weights = [
                jax.random.normal(key, (widths[i], widths[i + 1]), dt) * 0.05
                for i in range(len(widths) - 1)
            ]

            def scale_op(p, nx=new_xyz, x=xyz, a=affines, w=weights, r=radius, n=ns,
                         c=center):
                return fused_sa_scale(x, nx, p, c, a, w, r, n)

            t = bench(scale_op, proj)
            total += t
            flops = (
                ns * npoint * N * h1 * 2  # one-hot grouping matmuls
                + ns * npoint * sum(
                    widths[i] * widths[i + 1] for i in range(len(widths) - 1)
                ) * 2
            ) * B
            eff = flops / t / 1e12
            print(
                f"stage{k} scale{s} r={radius} S={ns} h={widths}: "
                f"{t*1e3:7.3f} ms  ({flops/1e9:.1f} GFLOP, {eff:.1f} TFLOP/s)",
                flush=True,
            )

        # projection matmul cost (shared pre-kernel work), one per scale
        kern0 = jax.random.normal(key, (3 + C, cfg.mlps[k][0][0])) * 0.05
        t_proj = bench(lambda x, kk=kern0: x @ kk, inp)
        total += t_proj * len(cfg.mlps[k])
        print(f"stage{k} proj x{len(cfg.mlps[k])}: {t_proj*1e3:7.3f} ms each", flush=True)

    print(f"sum: {total*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
