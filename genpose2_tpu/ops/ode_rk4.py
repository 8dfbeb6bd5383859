"""Fully fused fixed-grid RK4 probability-flow ODE sampler (one kernel).

The XLA formulation (diffusion/samplers.py ode_sampler, method='fixed') runs
~29 small fusion kernels per RK4 step — t-vector fills, Fourier embeds,
concats, AXPY glue around four tiny matmul stages — each carrying dispatch
overhead that dwarfs its FLOPs at the (B*K, 9) pose shape. This kernel runs
the ENTIRE num_steps integration in one Pallas program: the pose tile, the
folded score-net weights (models/scorenet.py:fast_score_weights) and the
per-step time tables stay VMEM-resident; HBM traffic is one read of
x0/static/weights and one write of the final poses.

Everything t-dependent is precomputed on the host side of the jit in ONE
batched pass (`_time_tables`): the t-embedding rows (already multiplied
through the heads' first layer), the score scale q = -0.5 g(t)^2 / (std(t)
+ 1e-7), and the linear drift coefficient a(t) (0 for VE, -0.5 beta(t) for
VP/subVP — drift is linear in x for every supported SDE). Inside the kernel
a stage evaluation is then four matmuls + relu glue:

    pf  = relu(relu(xt @ W0 + b0) @ W1p + b1p)          # pose MLP 9->256->256
    hid = relu(pf @ W1_pose + static + t_row[i, j])     # heads' first layer
    k   = (hid @ W2bd + b2cat) * q[i, j] + a[i, j] * xt # rhs = drift + c*score

with the classic butcher tableau x_{i+1} = x + h/6 (k1 + 2 k2 + 2 k3 + k4)
(stage times t, t+h/2, t+h/2, t_next share j in {0, 1, 2}).

Matmuls run in the configured compute dtype with f32 accumulation, exactly
like the XLA fast path; x and all glue stay f32. Parity vs ode_sampler
(method='fixed', denoise=False) is asserted in tests/test_ode_fused.py.

reference being beaten: networks/gf_algorithms/samplers.py:204-234 (scipy
RK45 on the host, one GPU model call per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# stage j-index per RK4 stage: t, t+h/2, t+h/2, t_next
_STAGE_J = (0, 1, 1, 2)
# butcher increments: xt_s = x + c_s * h * k_{s-1}
_STAGE_C = (0.0, 0.5, 0.5, 1.0)


def _kernel(
    trow_ref,  # (8n, H1) f32: per step i, rows 8i+j (j<3) = t-embed rows
    # through W1_t; row 8i+3 lanes [0:7] = [h, q0, q1, q2, a0, a1, a2]
    # (8-row blocks keep the dynamic sublane slice provably 8-aligned,
    # a Mosaic requirement)
    x_ref,  # (TR, LANE) f32, pose in lanes [0, D)
    static_ref,  # (TR, H1) f32
    w0_ref,  # (LANE, P1) compute dtype (zero rows past D)
    b0_ref,  # (1, P1) f32
    w1p_ref,  # (P1, P2)
    b1p_ref,  # (1, P2)
    wpose_ref,  # (P2, H1)
    w2_ref,  # (H1, LANE) (zero cols past D)
    b2_ref,  # (1, LANE) (zero past D)
    out_ref,  # (TR, LANE) f32
    *,
    num_steps: int,
):
    static = static_ref[:]  # (TR, H1)
    w0 = w0_ref[:]
    b0 = b0_ref[:]
    w1p = w1p_ref[:]
    b1p = b1p_ref[:]
    wpose = wpose_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    cdt = w0.dtype

    def stage(xt, trow, q, a, static):
        pf = jnp.maximum(
            jnp.dot(xt.astype(cdt), w0, preferred_element_type=jnp.float32) + b0,
            0.0,
        )
        pf = jnp.maximum(
            jnp.dot(pf.astype(cdt), w1p, preferred_element_type=jnp.float32) + b1p,
            0.0,
        )
        hid = jnp.maximum(
            jnp.dot(pf.astype(cdt), wpose, preferred_element_type=jnp.float32)
            + static
            + trow,
            0.0,
        )
        heads = (
            jnp.dot(hid.astype(cdt), w2, preferred_element_type=jnp.float32) + b2
        )
        return heads * q + a * xt

    TR = x_ref.shape[0]
    HALF = TR // 2

    def body(i, xs):
        # the tile is processed as TWO independent halves whose stage
        # evaluations interleave in the instruction stream: the RK4 stage
        # chain is 16 data-dependent matmuls, so a single chain is
        # MXU-latency-bound; two independent chains let the scheduler
        # overlap one half's matmul with the other's
        blk = trow_ref[pl.ds(8 * i, 8), :]  # (8, H1)
        h = blk[3, 0]
        sts = []
        for j in range(3):
            sts.append(blk[j : j + 1, :])
        xa, xb = xs
        ka, kb = [], []
        xta, xtb = xa, xb
        for s in range(4):
            j = _STAGE_J[s]
            if s > 0:
                c = _STAGE_C[s] * h
                xta = xa + c * ka[-1]
                xtb = xb + c * kb[-1]
            q, a = blk[3, 1 + j], blk[3, 4 + j]
            ka.append(stage(xta, sts[j], q, a, static[:HALF]))
            kb.append(stage(xtb, sts[j], q, a, static[HALF:]))
        h6 = h / 6.0
        xa = xa + h6 * (ka[0] + 2.0 * ka[1] + 2.0 * ka[2] + ka[3])
        xb = xb + h6 * (kb[0] + 2.0 * kb[1] + 2.0 * kb[2] + kb[3])
        return (xa, xb)

    xa, xb = jax.lax.fori_loop(
        0, num_steps, body, (x_ref[:HALF, :], x_ref[HALF:, :])
    )
    out_ref[:HALF, :] = xa
    out_ref[HALF:, :] = xb


def _time_tables(weights, sde, T0, eps, num_steps):
    """Precompute, in one batched pass, everything t-dependent: per-(step,
    stage-j) t-embedding rows through the heads' first layer, the score
    scale q, the drift coefficient a, and the step sizes h."""
    n = num_steps
    ts = jnp.linspace(T0, eps, n + 1)
    h = jnp.diff(ts)  # (n,)
    t_all = jnp.stack([ts[:-1], (ts[:-1] + ts[1:]) / 2.0, ts[1:]], axis=1)  # (n,3)
    flat = t_all.reshape(-1, 1)

    # t embedding exactly as the module/fast path (scorenet.py:_t_embed)
    proj = flat * weights["fourier_W"][None, :] * 2.0 * jnp.pi
    t_feat = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    t_emb = jax.nn.relu(
        t_feat @ weights["t_dense"]["kernel"] + weights["t_dense"]["bias"]
    )
    trows = (t_emb @ weights["W1_t"]).astype(jnp.float32)  # (3n, H1)
    H1 = trows.shape[1]

    g = sde.diffusion_coeff(flat[:, 0])
    std = sde.marginal_prob(None, flat[:, 0])[1]
    q = (-0.5 * g * g) / (std + 1e-7)  # rhs = drift + q * raw_heads
    if sde.mode in ("vp", "subvp"):
        beta = sde.beta_0 + flat[:, 0] * (sde.beta_1 - sde.beta_0)
        a = -0.5 * beta
    else:
        a = jnp.zeros_like(q)

    # 8-row block per step: rows 0..2 the stage t-rows, row 3 the scalars
    # [h, q0..q2, a0..a2] (Mosaic needs 8-aligned dynamic sublane slices)
    table = jnp.zeros((n, 8, H1), jnp.float32)
    table = table.at[:, :3, :].set(trows.reshape(n, 3, H1))
    table = table.at[:, 3, 0].set(h)
    table = table.at[:, 3, 1:4].set(q.reshape(n, 3))
    table = table.at[:, 3, 4:7].set(a.reshape(n, 3))
    return table.reshape(n * 8, H1)


@functools.partial(
    jax.jit,
    static_argnames=("sde", "num_steps", "compute_dtype", "row_tile"),
)
def fused_rk4_integrate(
    x0: jnp.ndarray,
    weights: dict,
    sde,
    T0: float,
    num_steps: int,
    compute_dtype: str = "float32",
    # measured on v5e at the flagship shape (R=3200): TR=800 5.24 ms/iter vs
    # TR=512 5.65 (incl. the harness's ~2.6 ms scan floor; kernel ~2.6 ms vs
    # the XLA scan path's ~4.6 ms)
    row_tile: int = 800,
):
    """Integrate the reverse probability-flow ODE from T0 to sde.eps with
    ``num_steps`` fixed RK4 steps in ONE Pallas program.

    x0 (R, D) f32 initial poses; weights = fast_score_weights(...) with
    ``static`` expanded to (R, H1). Returns x (R, D) f32, bit-comparable to
    ``ode_sampler(..., method='fixed', denoise=False)`` up to the compute
    dtype's matmul rounding."""
    R, D = x0.shape
    static = weights["static"]
    assert static.shape[0] == R, (static.shape, R)
    H1 = static.shape[1]
    P1 = weights["pose_mlp"]["Dense_0"]["kernel"].shape[1]
    P2 = weights["pose_mlp"]["Dense_1"]["kernel"].shape[1]
    assert D <= _LANE

    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    table = _time_tables(weights, sde, T0, float(sde.eps), num_steps)

    # pose lanes padded to the 128-lane tile; zero weight rows/cols keep the
    # padding exactly zero through the integration. TR is a multiple of 16 so
    # the kernel's two interleaved halves stay 8-row aligned.
    TR = min(row_tile, ((R + 15) // 16) * 16)
    assert TR % 16 == 0, TR
    Rp = ((R + TR - 1) // TR) * TR
    xp = jnp.zeros((Rp, _LANE), jnp.float32).at[:R, :D].set(x0)
    static_p = jnp.pad(static.astype(jnp.float32), ((0, Rp - R), (0, 0)))

    w0 = jnp.zeros((_LANE, P1), cdt).at[:D].set(
        weights["pose_mlp"]["Dense_0"]["kernel"].astype(cdt)
    )
    b0 = weights["pose_mlp"]["Dense_0"]["bias"].reshape(1, P1).astype(jnp.float32)
    w1p = weights["pose_mlp"]["Dense_1"]["kernel"].astype(cdt)
    b1p = weights["pose_mlp"]["Dense_1"]["bias"].reshape(1, P2).astype(jnp.float32)
    wpose = weights["W1_pose"].astype(cdt)
    w2 = jnp.zeros((H1, _LANE), cdt).at[:, :D].set(weights["W2bd"].astype(cdt))
    b2 = jnp.zeros((1, _LANE), jnp.float32).at[0, :D].set(weights["b2cat"])

    grid = (Rp // TR,)

    def whole(a):
        return pl.BlockSpec(a.shape, lambda r, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, num_steps=num_steps),
        grid=grid,
        in_specs=[
            whole(table),
            pl.BlockSpec((TR, _LANE), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H1), lambda r: (r, 0), memory_space=pltpu.VMEM),
            whole(w0),
            whole(b0),
            whole(w1p),
            whole(b1p),
            whole(wpose),
            whole(w2),
            whole(b2),
        ],
        out_specs=pl.BlockSpec((TR, _LANE), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, _LANE), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(table, xp, static_p, w0, b0, w1p, b1p, wpose, w2, b2)
    return out[:R, :D]
