"""Mosaic-lowering check for the folded-bias relpe_attention kernel.

The CPU parity tests run the kernel in interpret mode, which does not prove
the Mosaic (TPU) compiler accepts the fold (an earlier folded variant crashed
the remote compile helper). This script lowers + compiles + executes the
kernel at the flagship stage-0 shape (B=64, M=512, H=8, D=32) on the real
chip and prints PASS/FAIL.

Recorded result (2026-08-21, v5e via axon): PASS — compiles and executes
with the f32 per-program (RB=1) form; this f32 shape at RB=2 measured
18.38M scoped VMEM (16M limit), which is why row batching is gated to the
bf16 compute path in relpe_attention.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("[t] devices:", jax.devices(), flush=True)
    from genpose2_tpu.ops.relpe_attention import relpe_attention

    B, M, H, D = 64, 512, 8, 32
    C = H * D
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 9)
    xyz = jax.random.normal(ks[0], (B, M, 3)) * 0.1
    q = jax.random.normal(ks[1], (B, M, C))
    k = jax.random.normal(ks[2], (B, M, C))
    v = jax.random.normal(ks[3], (B, M, C))
    hid, nb = 16, 8
    pe_params = {
        "Dense_0": {"kernel": jax.random.normal(ks[4], (1, hid)) * 0.1,
                    "bias": jnp.zeros(hid)},
        "Dense_1": {"kernel": jax.random.normal(ks[5], (hid, nb)) * 0.1,
                    "bias": jnp.zeros(nb)},
        "Dense_2": {"kernel": jax.random.normal(ks[6], (3, hid)) * 0.1,
                    "bias": jnp.zeros(hid)},
        "Dense_3": {"kernel": jax.random.normal(ks[7], (hid, nb)) * 0.1,
                    "bias": jnp.zeros(nb)},
        "Dense_4": {"kernel": jax.random.normal(ks[8], (2 * nb, H)) * 0.1,
                    "bias": jnp.zeros(H)},
    }

    fn = jax.jit(lambda *a: relpe_attention(*a, num_heads=H))
    t0 = time.time()
    lowered = fn.lower(xyz, q, k, v, pe_params)
    compiled = lowered.compile()
    print(f"[t] Mosaic lowering+compile OK in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = compiled(xyz, q, k, v, pe_params)
    val = float(np.asarray(out[0, 0, 0]))  # D2H fence
    print(f"[t] execute OK in {time.time()-t0:.1f}s, out[0,0,0]={val:.5f}", flush=True)
    assert np.isfinite(np.asarray(out)).all()
    t0 = time.time()
    out = compiled(xyz + 1e-3, q, k, v, pe_params)
    _ = float(np.asarray(out[0, 0, 0]))
    print(f"[t] steady {1000*(time.time()-t0):.1f} ms at (B=64, M=512, H=8, D=32)", flush=True)
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
