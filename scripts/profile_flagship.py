"""Stage-level steady-state timing of the FLAGSHIP (dino-pointwise) eval
pipeline: ViT / feature extraction (ImgEncoder + gather + Fus encoder) / ODE /
aggregation, plus the Fus encoder's attention sub-pieces. Profiling utility
for ROADMAP item 3."""

import sys
import time

import jax
import jax.numpy as jnp

# share the bench's persistent compile cache (remote compiles are minutes)
jax.config.update("jax_compilation_cache_dir", "/tmp/gp2_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genpose2_tpu.config import ModelConfig, PointNet2Config, default_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates

from genpose2_tpu.training import PoseAgent

REPS = 10


def steady(fn_once, *args):
    @jax.jit
    def loop(*a):
        def body(carry, k):
            return fn_once(carry, k, *a), None

        # init with a plain scalar (every fn_once returns a scalar f32):
        # evaluating fn_once for the init would execute REPS+1 iterations
        # inside the timed window while dividing by REPS
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return carry

    out = loop(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    start = time.perf_counter()
    out = loop(*args)
    float(jnp.asarray(out).reshape(-1)[0])
    return (time.perf_counter() - start) / REPS


def main():
    stages = set(sys.argv[1:]) or {"vit", "feat", "attn", "ode", "agg"}
    B, K, N = 64, 50, 1024
    img = 256
    cfg = default_config().replace(
        model=ModelConfig(
            dino="pointwise",
            img_size=img,
            pointnet2=PointNet2Config(compute_dtype="bfloat16"),
            backbone_dtype="bfloat16",
            score_dtype="bfloat16",
        )
    )
    key = jax.random.PRNGKey(0)
    crops = jax.random.uniform(key, (B, img, img, 3), jnp.float32)

    data = SyntheticPoseData(num_points=N)
    batch = data.batch(key, B)
    batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
    batch["roi_xs"] = jax.random.randint(key, (B, N), 0, img).astype(jnp.float32)
    batch["roi_ys"] = jax.random.randint(key, (B, N), 0, img).astype(jnp.float32)
    batch["roi_rgb"] = crops
    agent = PoseAgent(cfg, "score", steps_per_epoch=1000)
    state = agent.init_state(key, batch)
    from genpose2_tpu.models.provider import split_provider_variables

    _, provider_vars = split_provider_variables(state.constants)

    def vit_layers(c):
        # the production backbone: DinoV3 ViT-S+/16 via the agent's provider
        return agent.provider.patch_features(provider_vars, c)

    if "vit" in stages:
        # consume ALL THREE intermediate outputs: reading only outs[0]
        # (block 2) lets XLA dead-code-eliminate blocks 3..11
        t = steady(
            lambda carry, k, c: sum(
                o[0, 0, 0] for o in vit_layers(c + 0.0 * carry)
            ),
            crops,
        )
        print(f"ViT-S+/16 (3 layers, {B} x {img}px): {t*1e3:8.2f} ms", flush=True)

    layers = vit_layers(crops)

    if "feat" in stages:
        def feat_once(carry, k, st):
            b = dict(batch)
            b["dino_layers"] = [l + 0.0 * carry for l in layers]
            pf, _ = agent.extract_features(st, b)
            return pf[0, 0]

        t = steady(feat_once, state)
        print(f"features (ImgEncoder+gather+Fus): {t*1e3:8.2f} ms", flush=True)

    if "attn" in stages:
        from genpose2_tpu.models.attention import (
            EfficientRelativePositionalEncoding,
            TransformerBlockWithRelativePE,
        )

        # stage-0 shapes: N=512 tokens, C=96
        p = state.params["pts_encoder"]
        for (name_pe, name_tb, M, C) in (
            ("EfficientRelativePositionalEncoding_0", "TransformerBlockWithRelativePE_0", 512, 96),
            ("EfficientRelativePositionalEncoding_1", "TransformerBlockWithRelativePE_1", 256, 256),
        ):
            xyz_s = jax.random.normal(key, (B, M, 3)) * 0.05
            feat_s = jax.random.normal(key, (B, M, C))
            pe = EfficientRelativePositionalEncoding(cfg.model.pointnet2.num_heads)
            tb = TransformerBlockWithRelativePE(C, cfg.model.pointnet2.num_heads, 0.1)

            t = steady(
                lambda carry, k, x: pe.apply({"params": p[name_pe]}, x + 0.0 * carry)[0, 0, 0, 0],
                xyz_s,
            )
            print(f"rel-PE  M={M}: {t*1e3:8.2f} ms", flush=True)

            bias = pe.apply({"params": p[name_pe]}, xyz_s)

            def tb_once(carry, k, f, bi):
                out = tb.apply({"params": p[name_tb]}, f + 0.0 * carry, bi, True)
                return out[0, 0, 0]

            t = steady(tb_once, feat_s, bias)
            print(f"transformer M={M} C={C}: {t*1e3:8.2f} ms", flush=True)

    if "gaf" in stages:
        from genpose2_tpu.models.attention import GatedAttentionFusion

        p = state.params["pts_encoder"]
        st = state.batch_stats["pts_encoder"]
        for (name, M, C) in (
            ("GatedAttentionFusion_0", 512, 96),
            ("GatedAttentionFusion_1", 256, 256),
        ):
            cur = jax.random.normal(key, (B, M, C))
            orig = jax.random.normal(key, (B, 1024, 384))
            gaf = GatedAttentionFusion(C)

            def gaf_once(carry, k, c, o):
                out = gaf.apply(
                    {"params": p[name], "batch_stats": st.get(name, {})},
                    c + 0.0 * carry, o, False,
                )
                return out[0, 0, 0]

            t = steady(gaf_once, cur, orig)
            print(f"gated-fusion M={M} C={C}: {t*1e3:8.2f} ms", flush=True)

    if "img" in stages:
        def img_once(carry, k, st):
            b = dict(batch)
            b["dino_layers"] = [l + 0.0 * carry for l in layers]
            from genpose2_tpu.models.posenet import GFObjectPose

            v = {"params": st.params, "batch_stats": st.batch_stats,
                 "constants": st.constants}
            fused = agent.model.apply(
                v, b["dino_layers"], method=GFObjectPose.fuse_dino_layers
            )
            return fused[0, 0, 0]

        t = steady(img_once, state)
        print(f"ImgEncoder fuse: {t*1e3:8.2f} ms", flush=True)

    if "ode" in stages:
        b = dict(batch)
        b["dino_layers"] = layers
        pts_feat, _ = jax.jit(lambda s, bb: agent.extract_features(s, bb))(state, b)

        def ode_once(carry, k, st, pf):
            pf = pf + 0.0 * carry
            sfn = agent.score_fn(st, jnp.repeat(pf, K, axis=0), None)
            from genpose2_tpu.diffusion import samplers

            x, _ = samplers.ode_sampler(
                jax.random.fold_in(key, k), sfn, agent.sde, B * K, 9,
                T0=0.55, method="fixed", num_steps=50,
            )
            return x[0, 0]

        t = steady(ode_once, state, pts_feat)
        print(f"ODE ({B*K} cands): {t*1e3:8.2f} ms", flush=True)

    if "agg" in stages:
        b = dict(batch)
        b["dino_layers"] = layers
        poses = jax.jit(
            lambda s, bb, kk: agent.sample_candidates(
                s, bb, kk, repeat_num=K, T0=0.55, method="fixed", num_steps=50
            )
        )(state, b, key)

        def agg_once(carry, k, ps):
            out = aggregate_candidates(
                ps + 0.0 * carry, None, retain_ratio=cfg.eval.retain_ratio,
                clustering=cfg.eval.clustering, eps=cfg.eval.clustering_eps,
                minpts_ratio=cfg.eval.clustering_minpts_ratio,
            )
            return out["rotation"][0, 0, 0]

        t = steady(agg_once, poses)
        print(f"aggregation: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
