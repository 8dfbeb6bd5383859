"""Attribute the ImgEncoder fuse time (4.25 ms at bench shapes) to its three
branches by cumulative truncation (same scanned harness as the other split
profilers; deltas cancel the floor):

    layer : softmax layer attention over the 3 ViT layers
    geo   : layer + spatial relative-position attention
    edge  : layer + geo + edge-enhancement conv  == production fuse

Profiling utility: python scripts/profile_imgenc_split.py layer geo edge
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.models.img_encoder import ImgEncoder

REPS = 10


def fuse_truncated(p, features, upto, dtype):
    feats = jnp.stack(features, axis=1)  # (B, L, P, D)
    B, L, P, D = feats.shape
    h = w = int(np.sqrt(P))

    attn = feats.astype(dtype) @ p["Dense_0"]["kernel"].astype(dtype) + p["Dense_0"]["bias"]
    attn = nn.relu(attn)
    attn = attn @ p["Dense_1"]["kernel"].astype(dtype) + p["Dense_1"]["bias"]
    attn = nn.softmax(attn.astype(jnp.float32), axis=1)
    fused = jnp.sum(feats * attn, axis=1)
    if upto == "layer":
        return fused

    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), axis=-1).reshape(-1, 2)
    rel = coords[None, :, :] - coords[:, None, :] + (h - 1)
    max_rel = 2 * (h - 1)
    rel_idx = np.clip(rel[..., 0] * (2 * (h - 1) + 1) + rel[..., 1], 0, max_rel * max_rel - 1)
    rel_emb = p["Embed_0"]["embedding"][jnp.asarray(rel_idx)]
    feat_geo = fused[:, :, D // 4 :].astype(dtype)
    attn_spatial = jnp.einsum("bpd,bqd->bpq", feat_geo, feat_geo,
                              preferred_element_type=jnp.float32)
    attn_spatial = attn_spatial * jnp.sum(rel_emb, axis=-1)[None]
    attn_spatial = nn.softmax(attn_spatial, axis=-1)
    geo = jnp.einsum("bpq,bqd->bpd", attn_spatial.astype(dtype), fused.astype(dtype),
                     preferred_element_type=jnp.float32)
    gw = nn.relu(p["geo_weight"])
    if upto == "geo":
        return fused + gw * geo

    spatial = fused.reshape(B, h, w, D).astype(dtype)
    edge = jax.lax.conv_general_dilated(
        spatial, p["Conv_0"]["kernel"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["Conv_0"]["bias"]
    edge = nn.relu(edge.astype(jnp.float32))
    edge = jnp.mean(edge, axis=(1, 2))
    edge_w = jnp.tile(edge[:, None, :], (1, 1, 4))
    return fused + gw * geo + nn.relu(p["edge_weight"]) * (fused * edge_w)


def main():
    stages = sys.argv[1:] or ["layer", "geo", "edge"]
    B, P, D = 64, 256, 384
    key = jax.random.PRNGKey(0)
    layers = [jax.random.normal(jax.random.fold_in(key, i), (B, P, D), jnp.float32)
              for i in range(3)]
    enc = ImgEncoder(D, P, dtype=jnp.bfloat16)
    vs = enc.init(jax.random.PRNGKey(1), layers)
    p = vs["params"]

    # sanity: truncated 'edge' == the module
    want = enc.apply(vs, layers)
    got = fuse_truncated(p, layers, "edge", jnp.bfloat16)
    err = float(jnp.max(jnp.abs(want - got)) / (jnp.max(jnp.abs(want)) + 1e-9))
    print(f"parity rel-err vs module: {err:.2e}", flush=True)

    prev = 0.0
    for name in stages:
        @jax.jit
        def loop(lay, seed=0, name=name):
            def body(carry, k):
                l2 = [l + 0.0 * (carry + jnp.float32(seed) * 0) for l in lay]
                out = fuse_truncated(p, l2, name, jnp.bfloat16)
                return out[0, 0, 0].astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
            return carry

        out = loop(layers)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = loop(layers, seed=i + 1)
            _ = float(jnp.asarray(out).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        dt_ = best / REPS
        print(f"{name:5s}: {dt_*1e3:7.2f} ms/iter  (delta {1e3*(dt_-prev):+7.2f})",
              flush=True)
        prev = dt_


if __name__ == "__main__":
    main()
