"""One-pass LayerNorm kernel for the frozen ViT's bf16 residual stream.

XLA lowers each nn.LayerNorm on the (B, N, D) bf16 stream as a
convert+reduce fusion for the statistics plus an apply pass — measured
~75 us per LN (1.8 ms/forward over 24 LNs) at the flagship shape
(B=64, N=272, D=384). This kernel reads the bf16 block once into VMEM,
computes f32 statistics, applies scale/bias, and writes the compute-dtype
output — one HBM round trip per tensor.

Numerics: statistics and normalization in f32 (same as
nn.LayerNorm(dtype=jnp.float32)); only the final cast differs in where it
happens (here at the kernel write, in XLA at the next matmul's operand).
Parity: tests/test_ops.py::TestFastLayerNorm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, s_ref, b_ref, out_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (TR, D)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * s_ref[:] + b_ref[:]).astype(out_ref.dtype)


def _add_ln_kernel(x_ref, h_ref, g_ref, s_ref, b_ref, x2_ref, ln_ref, *, eps):
    x2 = x_ref[...].astype(jnp.float32) + h_ref[...].astype(jnp.float32) * g_ref[:]
    x2_ref[...] = x2.astype(x2_ref.dtype)
    mu = jnp.mean(x2, axis=1, keepdims=True)
    var = jnp.mean((x2 - mu) ** 2, axis=1, keepdims=True)
    y = (x2 - mu) * jax.lax.rsqrt(var + eps)
    ln_ref[...] = (y * s_ref[:] + b_ref[:]).astype(ln_ref.dtype)


def _row_tiles(B: int, N: int, row_tile: int = 512):
    """LayerNorm treats (B, N, D) as B*N independent rows; tiling rows
    directly (instead of one batch row per program) cuts the grid from B
    programs to ceil(B*N/TR) — per-program overhead was the dominant cost of
    the one-row-per-program form at the flagship shapes (B=64 programs of
    ~5 us work each). TR is sized to the tile COUNT rather than fixed at
    row_tile so the last tile never degenerates: a fixed TR=512 at
    rows=520 would run two 512-row tiles (~2x padded work); here TR becomes
    264 and the pad stays under 8 rows per tile. Returns
    (TR, n_tiles, pad_rows)."""
    rows = B * N
    n_tiles = (rows + row_tile - 1) // row_tile
    TR = -(-((rows + n_tiles - 1) // n_tiles) // 8) * 8  # even split, 8-row sublane aligned
    TR = min(TR, row_tile) if rows >= 8 else rows
    n_tiles = (rows + TR - 1) // TR
    return TR, n_tiles, n_tiles * TR - rows


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype"))
def fast_add_layernorm(x, h, gamma, scale, bias, eps: float = 1e-6, out_dtype=None):
    """Fused residual-add + LayerNorm: returns (x + gamma*h, LN(x + gamma*h)).

    The transformer-block hot pattern: a standalone LN kernel leaves the
    adjacent layerscale+residual as separate XLA fusions (measured net-WORSE
    than XLA's own stats+apply split); absorbing the add makes the kernel a
    strict traffic win (3 reads + 2 writes vs 5+ passes)."""
    B, N, D = x.shape
    out_dtype = x.dtype if out_dtype is None else out_dtype
    TR, n_tiles, pad = _row_tiles(B, N)
    xr = x.reshape(B * N, D)
    hr = h.reshape(B * N, D)
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        hr = jnp.pad(hr, ((0, pad), (0, 0)))
    spec = pl.BlockSpec((TR, D), lambda r: (r, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM)
    x2, ln = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=(n_tiles,),
        in_specs=[spec, spec, vspec, vspec, vspec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * TR, D), out_dtype),
            jax.ShapeDtypeStruct((n_tiles * TR, D), out_dtype),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        xr,
        hr,
        gamma.reshape(1, D).astype(jnp.float32),
        scale.reshape(1, D).astype(jnp.float32),
        bias.reshape(1, D).astype(jnp.float32),
    )
    return (
        x2[: B * N].reshape(B, N, D),
        ln[: B * N].reshape(B, N, D),
    )


def _residual_ln_kernel(x_ref, h_ref, s_ref, b_ref, ln_ref, *, eps):
    x2 = x_ref[...].astype(jnp.float32) + h_ref[...].astype(jnp.float32)
    mu = jnp.mean(x2, axis=1, keepdims=True)
    var = jnp.mean((x2 - mu) ** 2, axis=1, keepdims=True)
    y = (x2 - mu) * jax.lax.rsqrt(var + eps)
    ln_ref[...] = (y * s_ref[:] + b_ref[:]).astype(ln_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype"))
def fast_residual_layernorm(x, h, scale, bias, eps: float = 1e-6, out_dtype=None):
    """LN(x + h) in one pass (post-norm transformer pattern where the residual
    sum itself is NOT needed downstream — the Fus encoder's blocks, unlike the
    ViT's pre-norm blocks served by fast_add_layernorm). Row-tiled like
    fast_add_layernorm."""
    B, N, D = x.shape
    out_dtype = x.dtype if out_dtype is None else out_dtype
    TR, n_tiles, pad = _row_tiles(B, N)
    xr = x.reshape(B * N, D)
    hr = h.reshape(B * N, D)
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        hr = jnp.pad(hr, ((0, pad), (0, 0)))
    spec = pl.BlockSpec((TR, D), lambda r: (r, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_residual_ln_kernel, eps=eps),
        grid=(n_tiles,),
        in_specs=[spec, spec, vspec, vspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TR, D), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(
        xr,
        hr,
        scale.reshape(1, D).astype(jnp.float32),
        bias.reshape(1, D).astype(jnp.float32),
    )
    return out[: B * N].reshape(B, N, D)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype"))
def fast_layernorm(x, scale, bias, eps: float = 1e-6, out_dtype=None):
    """x (B, N, D) -> LayerNorm over the last axis, f32 statistics,
    ``out_dtype`` (default: x.dtype) output. Row-tiled (see _row_tiles)."""
    B, N, D = x.shape
    out_dtype = x.dtype if out_dtype is None else out_dtype
    TR, n_tiles, pad = _row_tiles(B, N)
    xr = x.reshape(B * N, D)
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    spec = pl.BlockSpec((TR, D), lambda r: (r, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(n_tiles,),
        in_specs=[spec, vspec, vspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TR, D), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(xr, scale.reshape(1, D).astype(jnp.float32),
      bias.reshape(1, D).astype(jnp.float32))
    return out[: B * N].reshape(B, N, D)
