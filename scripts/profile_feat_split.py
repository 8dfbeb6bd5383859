"""Attribute feature-stage time at the EXACT bench shapes with DCE-safe
consumption: every variant reduces its FULL output with jnp.sum (a scalar
output lets XLA slice the tail of the computation away and corrupts deltas),
and a measured empty-body floor is reported for subtraction.

    floor : harness-only loop (carry add)
    vit3  : DinoV3 patch features, ALL THREE tapped layers consumed
    fuse  : ImgEncoder layer fusion (precomputed layers)
    sa    : gather + SA stages only (rel-PE transformer + GAF skipped)
    trans : sa + rel-PE transformer blocks (GAF skipped)
    gaf   : trans + GAF blocks == production fast path
    feat  : agent.extract_features (the production jit boundary)

Profiling utility (not a CI artifact):
    python scripts/profile_feat_split.py floor vit3 fuse sa trans gaf feat
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.models import fast_encoder as fe
from genpose2_tpu.models.posenet import GFObjectPose
from genpose2_tpu.training import PoseAgent

REPS = 40  # keeps the ~35 ms per-call dispatch under 1 ms/iter amortized


def fus_forward_variant(variables, pointcloud, cfg, with_gaf, with_transformer):
    """fast_fus_forward with the GAF / transformer blocks optionally skipped
    (both are (B, M, C) -> (B, M, C) maps, so shapes stay production)."""
    from genpose2_tpu.models.attention import TransformerBlockWithRelativePE
    from genpose2_tpu.models.layers import linear_resize_points
    from genpose2_tpu.ops.layernorm import fast_residual_layernorm
    from genpose2_tpu.ops.relpe_attention import relpe_attention

    params = variables["params"]
    stats = variables["batch_stats"]
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    xyz = pointcloud[..., :3]
    features = pointcloud[..., 3:]
    downsampled = features
    out_channels = [sum(m[-1] for m in stage) for stage in cfg.mlps]

    S = fe._fps_prefix_centroids(xyz, cfg)  # ONE FPS run, stage prefixes
    for k in range(len(cfg.npoints)):
        if k > 0 and with_gaf:
            if downsampled.shape[1] != features.shape[1]:
                downsampled = linear_resize_points(downsampled, features.shape[1])
            name = f"GatedAttentionFusion_{k - 1}"
            features = fe._fast_gaf(
                params[name], stats.get(name, {}), features, downsampled, dt
            )

        new_xyz, features = fe._fast_sa_stage(
            params[f"SetAbstractionMSG_{k}"],
            stats[f"SetAbstractionMSG_{k}"],
            xyz, features, cfg, k, dt,
            new_xyz=None if (S is None or cfg.npoints[k] is None)
            else S[:, : cfg.npoints[k]],
        )

        if with_transformer:
            name = f"TransformerBlockWithRelativePE_{k}"
            tb = params[name]
            if new_xyz is not None:
                def mm(a, w):
                    return jnp.dot(a.astype(dt), w.astype(dt),
                                   preferred_element_type=jnp.float32)

                pe = params[f"EfficientRelativePositionalEncoding_{k}"]
                mha = tb["MultiheadAttentionWithRelativePE_0"]
                q = mm(features, mha["wq"]["kernel"]) + mha["wq"]["bias"]
                kk = mm(features, mha["wk"]["kernel"]) + mha["wk"]["bias"]
                v = mm(features, mha["wv"]["kernel"]) + mha["wv"]["bias"]
                attn = relpe_attention(new_xyz, q, kk, v, pe, cfg.num_heads,
                                       compute_dtype=cfg.compute_dtype)
                attn = mm(attn, mha["wo"]["kernel"]) + mha["wo"]["bias"]
                h = fast_residual_layernorm(
                    features, attn,
                    tb["LayerNorm_0"]["scale"], tb["LayerNorm_0"]["bias"],
                )
                ff = jax.nn.relu(mm(h, tb["Dense_0"]["kernel"]) + tb["Dense_0"]["bias"])
                ff = mm(ff, tb["Dense_1"]["kernel"]) + tb["Dense_1"]["bias"]
                features = fast_residual_layernorm(
                    h, ff, tb["LayerNorm_1"]["scale"], tb["LayerNorm_1"]["bias"]
                )
            else:
                features = TransformerBlockWithRelativePE(
                    out_channels[k], cfg.num_heads, cfg.dropout
                ).apply({"params": tb}, features, None, deterministic=True)
        xyz = new_xyz

    return features.squeeze(1)


def main():
    stages = sys.argv[1:] or ["floor", "vit3", "fuse", "sa", "trans", "gaf", "feat"]
    cfg = default_config().replace(
        model=ModelConfig(
            dino="pointwise",
            pointnet2=PointNet2Config(compute_dtype="bfloat16"),
            backbone_dtype="bfloat16",
            score_dtype="bfloat16",
        )
    )
    B, N, S = 64, cfg.model.num_points, cfg.model.img_size
    pcfg = cfg.model.pointnet2

    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    data = SyntheticPoseData(num_points=N)
    key = jax.random.PRNGKey(0)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    ks = jax.random.split(key, 3)
    batch["roi_rgb"] = jax.random.normal(ks[0], (B, S, S, 3), jnp.float32)
    batch["roi_xs"] = jax.random.randint(ks[1], (B, N), 0, S)
    batch["roi_ys"] = jax.random.randint(ks[2], (B, N), 0, S)
    state = agent.init_state(key, batch)

    b0 = jax.jit(lambda s, b: agent.with_image_features(s, b))(state, batch)
    layers = [jax.lax.stop_gradient(l) for l in b0["dino_layers"]]
    v = {"params": state.params, "batch_stats": state.batch_stats,
         "constants": state.constants}
    enc_vars = {"params": state.params["pts_encoder"],
                "batch_stats": state.batch_stats["pts_encoder"]}
    from genpose2_tpu.models.provider import split_provider_variables

    _, provider_vars = split_provider_variables(state.constants)

    def body_for(name, carry, lay):
        if name == "floor":
            return carry + 1.0
        if name == "vit3":
            crops = batch["roi_rgb"] + 0.0 * carry
            outs = agent.provider.patch_features(provider_vars, crops)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs) * 1e-9
        lay = [l + 0.0 * carry for l in lay]
        fused = agent.model.apply(v, lay, method=GFObjectPose.fuse_dino_layers)
        if name == "fuse":
            return jnp.sum(fused.astype(jnp.float32)) * 1e-9
        rgb = agent.model.apply(
            v, fused, batch["roi_xs"], batch["roi_ys"],
            method=GFObjectPose.pointwise_rgb_feat,
        )
        inp = jnp.concatenate([batch["pts"], jax.lax.stop_gradient(rgb)], axis=-1)
        if name == "feat":
            b = dict(batch)
            b["dino_layers"] = lay
            feats = agent.extract_features(state, b)
            return jnp.sum(feats[0].astype(jnp.float32)) * 1e-9
        out = fus_forward_variant(
            enc_vars, inp, pcfg,
            with_gaf=(name == "gaf"),
            with_transformer=(name in ("trans", "gaf")),
        )
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    prev = None
    for name in stages:
        @jax.jit
        def loop(lay, seed=0, name=name):
            def body(carry, k):
                return body_for(name, carry + 0.0 * jnp.float32(seed), lay), None

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
        delta = "" if prev is None else f"  (delta {1e3*(dt_-prev):+7.2f})"
        print(f"{name:5s}: {dt_*1e3:7.2f} ms/iter{delta}", flush=True)
        prev = dt_


if __name__ == "__main__":
    main()
