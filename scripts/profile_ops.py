"""Per-op microbenchmarks at the flagship encoder's shapes (profiling utility).

The remote-backend dispatch round trip is ~30 ms, so each op is iterated R
times inside ONE jit with a carried data dependency; per-iteration time =
(total - rtt) / R.
"""

import time

import jax
import jax.numpy as jnp

from genpose2_tpu.config import PointNet2Config
from genpose2_tpu.ops import ball_query, furthest_point_sample, gather_points
from genpose2_tpu.ops.grouping import group_points, group_points_matmul
from genpose2_tpu.so3.rotations import average_quaternion_batch

R = 50


def bench(op, x, *static, reps=3):
    """op(x, *static) iterated R times inside one jit; returns seconds/iter."""

    @jax.jit
    def loop(x):
        def body(carry, _):
            out = op(carry, *static)
            # fold output back into carry to serialize iterations
            bump = jnp.sum(jnp.asarray(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
            return carry * 1.0 + (bump * 0).astype(carry.dtype), None

        carry, _ = jax.lax.scan(body, x, None, length=R)
        return jnp.sum(carry)

    float(loop(x))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / R


def main():
    B = 128
    cfg = PointNet2Config()
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (B, 1024, 3)) * 0.1

    Ns = [1024] + [n for n in cfg.npoints if n is not None]
    total = 0.0
    rows = []
    for k, npoint in enumerate(n for n in cfg.npoints if n is not None):
        N = Ns[k]
        x = xyz[:, :N]
        t = bench(lambda a, m=npoint: furthest_point_sample(a, m), x)
        total += t
        rows.append(f"stage{k} FPS      N={N:5d}->M={npoint:4d}: {t*1e3:7.3f} ms")
        idx = jax.jit(lambda a, m=npoint: furthest_point_sample(a, m))(x)
        new_xyz = gather_points(x, idx)
        for s, (r, ns) in enumerate(zip(cfg.radii[k], cfg.nsamples[k])):
            t = bench(lambda a, b=new_xyz, r=r, ns=ns: ball_query(a, b, r, ns), x)
            total += t
            rows.append(f"stage{k} ballq s{s} r={r}: {t*1e3:7.3f} ms")
            gidx = jax.jit(lambda a, b, r=r, ns=ns: ball_query(a, b, r, ns))(x, new_xyz)
            h1 = cfg.mlps[k][s][0]
            feat = jax.random.normal(key, (B, N, h1), jnp.bfloat16)
            t = bench(lambda f, gi=gidx: group_points_matmul(f, gi), feat)
            total += t
            rows.append(f"stage{k} group s{s} onehot h1={h1:4d}: {t*1e3:7.3f} ms")
            t = bench(lambda f, gi=gidx: group_points(f, gi), feat)
            rows.append(f"stage{k} group s{s} gather h1={h1:4d}: {t*1e3:7.3f} ms")
            widths = cfg.mlps[k][s]
            M, S = npoint, ns
            h = jax.random.normal(key, (B * M * S, widths[0]), jnp.bfloat16)
            Ws = tuple(
                jax.random.normal(key, (widths[i], widths[i + 1]), jnp.bfloat16)
                for i in range(len(widths) - 1)
            )

            def chain(h, *Ws):
                for W in Ws:
                    h = jnp.maximum(h @ W, 0)
                return h

            t = bench(chain, h, *Ws)
            total += t
            rows.append(f"stage{k} mlp   s{s} {widths}: {t*1e3:7.3f} ms")
    print("\n".join(rows))
    print(f"sum of per-iter op times: {total*1e3:.2f} ms")

    quat = jax.random.normal(key, (128, 20, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    t = bench(average_quaternion_batch, quat)
    print(f"avg_quaternion_batch eigh (128,20,4): {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
