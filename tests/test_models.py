"""Shape-golden and behavior tests for the network stack.

Dimension goldens follow the reference: pts_feat is 1024-d
(reference: pointnet2.py:77-89 — final stage (512, 512) x 2 scales), score-net
fusion input is 128+256+1024 (+dino) (reference: scorenet.py:153), zero-init
heads emit exactly 0 at init (reference: scorenet.py:15-21).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose2_tpu.config import ModelConfig, PointNet2Config, tiny_test_config
from genpose2_tpu.diffusion import init_sde
from genpose2_tpu.models import (
    GFObjectPose,
    ImgEncoder,
    PointNet2ClsMSG,
    PointNet2ClsMSGFus,
    PointNetFeat,
    PoseEnergyNet,
    PoseScoreNet,
    ScaleNet,
    vit_s16,
)
from genpose2_tpu.models.posenet import energy_score_fn

SDE = init_sde("ve")


def std_fn(t):
    return SDE.marginal_prob(None, t)[1]


TINY = tiny_test_config()


class TestPointNet2:
    def test_cls_msg_output_shape(self):
        cfg = TINY.model.pointnet2
        model = PointNet2ClsMSG(cfg)
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 128, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts)
        out = model.apply(vars_, pts)
        expected = sum(m[-1] for m in cfg.mlps[-1])
        assert out.shape == (2, expected)

    def test_fus_encoder_with_features(self):
        cfg = TINY.model.pointnet2
        model = PointNet2ClsMSGFus(cfg)
        pc = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 128, 3 + 16)), jnp.float32
        )
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, pc
        )
        out = model.apply(vars_, pc)
        expected = sum(m[-1] for m in cfg.mlps[-1])
        assert out.shape == (2, expected)
        assert np.isfinite(np.asarray(out)).all()

    def test_fus_train_mode_with_bn_and_dropout(self):
        cfg = TINY.model.pointnet2
        model = PointNet2ClsMSGFus(cfg)
        pc = jnp.asarray(np.random.default_rng(0).normal(size=(2, 128, 19)), jnp.float32)
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, pc
        )
        out, mutated = model.apply(
            vars_,
            pc,
            True,
            rngs={"aug": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        assert "batch_stats" in mutated
        assert np.isfinite(np.asarray(out)).all()

    def test_full_light_config_dims(self):
        # the real ClsMSG_CFG_Light stack -> 1024-d global feature
        cfg = PointNet2Config()
        model = PointNet2ClsMSG(cfg)
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1024, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts)
        out = model.apply(vars_, pts)
        assert out.shape == (1, 1024)


class TestPointNetLegacy:
    def test_shapes(self):
        model = PointNetFeat(out_dim=1024)
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts)
        assert model.apply(vars_, pts).shape == (2, 1024)


class TestScoreNet:
    def test_zero_init_and_std_normalization(self):
        model = PoseScoreNet(std_fn, pose_dim=9)
        B = 4
        pts_feat = jnp.ones((B, 1024))
        pose = jnp.ones((B, 9))
        t = jnp.full((B, 1), 0.5)
        vars_ = model.init(jax.random.PRNGKey(0), pts_feat, None, pose, t)
        out = model.apply(vars_, pts_feat, None, pose, t)
        assert out.shape == (B, 9)
        # zero-initialized output layers -> exactly zero scores at init
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    @pytest.mark.parametrize("head", ["RT", "R_and_T", "Rx_Ry_and_T"])
    def test_heads(self, head):
        model = PoseScoreNet(std_fn, pose_dim=9, regression_head=head)
        B = 2
        args = (jnp.ones((B, 1024)), None, jnp.ones((B, 9)), jnp.full((B, 1), 0.3))
        vars_ = model.init(jax.random.PRNGKey(0), *args)
        assert model.apply(vars_, *args).shape == (B, 9)

    def test_global_dino_head(self):
        model = PoseScoreNet(std_fn, pose_dim=9, dino_dim=384 + 60)
        B = 2
        args = (
            jnp.ones((B, 1024)),
            jnp.ones((B, 444)),
            jnp.ones((B, 9)),
            jnp.full((B, 1), 0.3),
        )
        vars_ = model.init(jax.random.PRNGKey(0), *args)
        assert model.apply(vars_, *args).shape == (B, 9)

    @pytest.mark.parametrize("head", ["RT", "R_and_T", "Rx_Ry_and_T"])
    @pytest.mark.parametrize("dino", [0, 444])
    def test_fast_score_fn_parity(self, head, dino):
        """The sampler fast path (loop-invariant rows hoisted, heads fused)
        must equal the module forward on the same params."""
        from genpose2_tpu.models.scorenet import make_fast_score_fn

        model = PoseScoreNet(std_fn, pose_dim=9, regression_head=head, dino_dim=dino)
        B = 5
        rng = np.random.default_rng(3)
        pts_feat = jnp.asarray(rng.normal(size=(B, 1024)), jnp.float32)
        rgb_feat = jnp.asarray(rng.normal(size=(B, dino)), jnp.float32) if dino else None
        pose = jnp.asarray(rng.normal(size=(B, 9)), jnp.float32)
        t = jnp.asarray(rng.uniform(0.01, 1.0, size=(B, 1)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts_feat, rgb_feat, pose, t)
        # randomize the zero-initialized output layers so parity is non-trivial
        vars_ = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(rng.normal(size=p.shape, scale=0.05), p.dtype),
            vars_,
        )
        ref = model.apply(vars_, pts_feat, rgb_feat, pose, t)
        fast = make_fast_score_fn(
            vars_["params"],
            vars_["constants"],
            std_fn,
            pts_feat,
            rgb_feat,
            pose_dim=9,
            regression_head=head,
        )(pose, t)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestEnergyNet:
    def _mk(self, **kw):
        model = PoseEnergyNet(std_fn, pose_dim=9, **kw)
        B = 4
        args = (jnp.ones((B, 1024)), None, jnp.ones((B, 9)), jnp.full((B, 1), 0.5))
        vars_ = model.init(jax.random.PRNGKey(1), *args)
        return model, vars_, args

    def test_decoupled_energy_shape(self):
        model, vars_, args = self._mk()
        e = model.apply(vars_, *args)
        assert e.shape == (4, 2)  # (rot, trans) energies

    def test_coupled_energy_shape(self):
        model, vars_, args = self._mk()
        e = model.apply(vars_, *args, False)
        assert e.shape == (4,)

    @pytest.mark.parametrize("energy_mode", ["DAE", "L2", "IP"])
    @pytest.mark.parametrize("s_theta_mode", ["score", "decoder", "identical"])
    def test_mode_matrix(self, energy_mode, s_theta_mode):
        model, vars_, args = self._mk(energy_mode=energy_mode, s_theta_mode=s_theta_mode)
        e = model.apply(vars_, *args, False)
        assert np.isfinite(np.asarray(e)).all()

    def test_norm_energy_modes(self):
        for norm in ["identical", "std", "minus"]:
            model, vars_, args = self._mk(norm_energy=norm)
            e = model.apply(vars_, *args)
            assert np.isfinite(np.asarray(e)).all()


class TestScaleNet:
    def test_output_and_zero_init(self):
        model = ScaleNet(180)
        B = 3
        pts_feat = jnp.ones((B, 1024))
        axes = jnp.tile(jnp.eye(3), (B, 1, 1))
        vars_ = model.init(jax.random.PRNGKey(0), pts_feat, axes)
        out = model.apply(vars_, pts_feat, axes)
        assert out.shape == (B, 3)
        np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero-init head


class TestImgEncoderViT:
    def test_img_encoder_shapes(self):
        enc = ImgEncoder(dim=64, num_patches=16)
        feats = [jnp.ones((2, 16, 64)) * i for i in range(3)]
        vars_ = enc.init(jax.random.PRNGKey(0), feats)
        out = enc.apply(vars_, feats)
        assert out.shape == (2, 16, 64)

    def test_vit_intermediate_layers(self):
        vit = vit_s16(depth=4)
        x = jnp.ones((1, 64, 64, 3))
        vars_ = vit.init(jax.random.PRNGKey(0), x, (1, 3))
        outs = vit.apply(vars_, x, (1, 3))
        assert len(outs) == 2
        assert outs[0].shape == (1, 16, 384)  # 64/16 = 4x4 patches


class TestGFObjectPose:
    def test_score_composition_dino_none(self):
        model = GFObjectPose(TINY.model, std_fn, "score")
        B, N = 2, 128
        data = {
            "pts": jnp.asarray(np.random.default_rng(0).normal(size=(B, N, 3)), jnp.float32),
            "sampled_pose": jnp.zeros((B, 9)),
            "t": jnp.full((B, 1), 0.5),
        }
        vars_ = model.init(jax.random.PRNGKey(0), data)
        out = model.apply(vars_, data)
        assert out.shape == (B, 9)

    def test_energy_score_fn_grad(self):
        model = GFObjectPose(TINY.model, std_fn, "energy")
        B, N = 2, 128
        data = {
            "pts": jnp.asarray(np.random.default_rng(0).normal(size=(B, N, 3)), jnp.float32),
            "sampled_pose": jnp.zeros((B, 9)),
            "t": jnp.full((B, 1), 0.5),
        }
        vars_ = model.init(jax.random.PRNGKey(0), data)
        pts_feat = model.apply(vars_, data, method=GFObjectPose.extract_pts_feature)
        sfn = energy_score_fn(model, vars_, pts_feat, None)
        s = sfn(jnp.ones((B, 9)), jnp.full((B, 1), 0.5))
        assert s.shape == (B, 9)
        assert np.isfinite(np.asarray(s)).all()

    def test_pointwise_dino_composition(self):
        cfg = ModelConfig(
            num_points=64,
            pointnet2=TINY.model.pointnet2,
            dino="pointwise",
            dino_dim=32,
            img_size=64,
            patch_size=16,
        )
        model = GFObjectPose(cfg, std_fn, "score")
        B, N, P = 2, 64, 16
        rng = np.random.default_rng(0)
        data = {
            "pts": jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32),
            "dino_layers": [jnp.asarray(rng.normal(size=(B, P, 32)), jnp.float32)] * 3,
            "roi_xs": jnp.asarray(rng.integers(0, 64, size=(B, N))),
            "roi_ys": jnp.asarray(rng.integers(0, 64, size=(B, N))),
            "sampled_pose": jnp.zeros((B, 9)),
            "t": jnp.full((B, 1), 0.5),
        }
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, data
        )
        out = model.apply(vars_, data)
        assert out.shape == (B, 9)
        assert np.isfinite(np.asarray(out)).all()


class TestHeadsAndFP:
    def test_per_point_heads(self):
        from genpose2_tpu.models.heads import RotHead, TransHead

        feat = jnp.ones((2, 64, 32))
        for Head in (RotHead, TransHead):
            m = Head(3)
            v = m.init(jax.random.PRNGKey(0), feat)
            assert m.apply(v, feat).shape == (2, 3)

    def test_feature_propagation(self):
        from genpose2_tpu.models.pointnet2 import FeaturePropagation

        rng_np = np.random.default_rng(0)
        unknown = jnp.asarray(rng_np.normal(size=(2, 32, 3)), jnp.float32)
        known = jnp.asarray(rng_np.normal(size=(2, 8, 3)), jnp.float32)
        ufeat = jnp.asarray(rng_np.normal(size=(2, 32, 5)), jnp.float32)
        kfeat = jnp.asarray(rng_np.normal(size=(2, 8, 7)), jnp.float32)
        fp = FeaturePropagation((16, 16))
        v = fp.init(jax.random.PRNGKey(0), unknown, known, ufeat, kfeat)
        out = fp.apply(v, unknown, known, ufeat, kfeat)
        assert out.shape == (2, 32, 16)
        # known=None broadcast path
        out2 = fp.apply(
            fp.init(jax.random.PRNGKey(0), unknown, None, ufeat, kfeat[:, :1]),
            unknown, None, ufeat, kfeat[:, :1],
        )
        assert out2.shape == (2, 32, 16)


class TestGlobalDinoComposition:
    def test_global_mode_end_to_end(self):
        # dino='global': plain ClsMSG encoder + CLS feature + view-dir encoding
        cfg = ModelConfig(
            num_points=64,
            pointnet2=TINY.model.pointnet2,
            dino="global",
            dino_dim=32,
            global_embedding_dim=12,
            img_size=64,
        )
        model = GFObjectPose(cfg, std_fn, "score")
        B, N = 2, 64
        rng_np = np.random.default_rng(0)
        data = {
            "pts": jnp.asarray(rng_np.normal(size=(B, N, 3)), jnp.float32),
            "dino_global": jnp.asarray(rng_np.normal(size=(B, 32)), jnp.float32),
            "roi_center_dir": jnp.asarray(rng_np.normal(size=(B, 3)), jnp.float32),
            "sampled_pose": jnp.zeros((B, 9)),
            "t": jnp.full((B, 1), 0.5),
        }
        vars_ = model.init(jax.random.PRNGKey(0), data)
        out = model.apply(vars_, data)
        assert out.shape == (B, 9)
        rgb = model.apply(vars_, data, method=GFObjectPose.extract_global_rgb_feature)
        assert rgb.shape == (B, 32 + 2 * 3 * (12 // 6))


class TestSegEncoder:
    def test_per_point_logits(self):
        from genpose2_tpu.models.pointnet2 import PointNet2SegMSG

        cfg = TINY.model.pointnet2  # 3 stages; use 2 SA + 2 FP levels
        model = PointNet2SegMSG(cfg, fp_mlps=((16, 16), (32, 32)), cls_fc=(16,))
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 128, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts)
        out = model.apply(vars_, pts)
        assert out.shape == (2, 128, 1)
        assert np.isfinite(np.asarray(out)).all()


class TestFastEncoder:
    def test_fast_cls_forward_parity(self):
        """The fused-kernel eval path must equal the module forward."""
        from genpose2_tpu.config import PointNet2Config
        from genpose2_tpu.models.fast_encoder import fast_cls_forward
        from genpose2_tpu.models.pointnet2 import PointNet2ClsMSG

        # small stack exercising multi-stage + GroupAll
        cfg = PointNet2Config(
            npoints=(16, 8, None),
            radii=((0.2, 0.4), (0.4, 0.8), (None, None)),
            nsamples=((4, 8), (4, 8), (None, None)),
            mlps=(
                ((8, 8, 16), (8, 8, 16)),
                ((16, 16, 32), (16, 24, 32)),
                ((32, 48), (32, 48)),
            ),
        )
        model = PointNet2ClsMSG(cfg)
        rng = np.random.default_rng(7)
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 64, 3)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts)
        # randomize params and batch stats so BN folding is non-trivial
        vars_ = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(np.abs(rng.normal(size=p.shape, scale=0.1)), p.dtype),
            vars_,
        )
        ref = model.apply(vars_, pts, train=False)
        got = fast_cls_forward(
            {"params": vars_["params"], "batch_stats": vars_["batch_stats"]}, pts, cfg
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_fps_prefix_property(self):
        """The greedy-FPS prefix property the fast path relies on
        (fast_encoder._fps_prefix_centroids): re-running FPS on its own
        pick-ordered prefix reproduces arange, so stage k's centroids are a
        prefix of the stage-0 run."""
        from genpose2_tpu.ops import furthest_point_sample, gather_points

        rng = np.random.default_rng(23)
        xyz = jnp.asarray(rng.uniform(-0.5, 0.5, size=(3, 256, 3)), jnp.float32)
        S = gather_points(xyz, furthest_point_sample(xyz, 128))
        for n_prev, n in ((128, 64), (64, 32), (32, 16)):
            sub = S[:, :n_prev]
            idx = furthest_point_sample(sub, n)
            np.testing.assert_array_equal(
                np.asarray(idx), np.tile(np.arange(n), (3, 1))
            )
            np.testing.assert_array_equal(
                np.asarray(gather_points(sub, idx)), np.asarray(S[:, :n])
            )

    def test_fast_gaf_parity(self):
        """BN-folded pure-function GatedAttentionFusion == the module
        (eval mode), including the resize branch and the k=7 spatial conv."""
        from genpose2_tpu.models.attention import GatedAttentionFusion
        from genpose2_tpu.models.fast_encoder import _fast_gaf

        rng = np.random.default_rng(17)
        C, M, N0, C0 = 16, 24, 40, 24
        cur = jnp.asarray(rng.normal(size=(2, M, C)), jnp.float32)
        orig = jnp.asarray(rng.normal(size=(2, N0, C0)), jnp.float32)
        mod = GatedAttentionFusion(C)
        vs = mod.init(jax.random.PRNGKey(0), cur, orig, train=False)
        vs = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(np.abs(rng.normal(size=p.shape, scale=0.05)), p.dtype),
            vs,
        )
        want = mod.apply(vs, cur, orig, train=False)
        got = _fast_gaf(vs["params"], vs["batch_stats"], cur, orig, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_fast_fus_forward_parity(self):
        """Fus-variant fast path == module forward (eval mode)."""
        from genpose2_tpu.models.fast_encoder import fast_fus_forward

        cfg = TINY.model.pointnet2
        model = PointNet2ClsMSGFus(cfg)
        rng = np.random.default_rng(11)
        pc = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 128, 3 + 16)), jnp.float32)
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, pc
        )
        vars_ = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(np.abs(rng.normal(size=p.shape, scale=0.05)), p.dtype),
            vars_,
        )
        ref = model.apply(vars_, pc, False)
        got = fast_fus_forward(
            {"params": vars_["params"], "batch_stats": vars_["batch_stats"]}, pc, cfg
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("head", ["RT", "Rx_Ry_and_T"])
    def test_fast_score_fn_uniform_t_parity(self, head):
        """uniform_t fast path == module forward when all rows share one t."""
        from genpose2_tpu.models.scorenet import make_fast_score_fn

        model = PoseScoreNet(std_fn, pose_dim=9, regression_head=head)
        B = 6
        rng = np.random.default_rng(9)
        pts_feat = jnp.asarray(rng.normal(size=(B, 1024)), jnp.float32)
        pose = jnp.asarray(rng.normal(size=(B, 9)), jnp.float32)
        t = jnp.full((B, 1), 0.37, jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts_feat, None, pose, t)
        vars_ = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(rng.normal(size=p.shape, scale=0.05), p.dtype),
            vars_,
        )
        ref = model.apply(vars_, pts_feat, None, pose, t)
        fast = make_fast_score_fn(
            vars_["params"], vars_["constants"], std_fn, pts_feat, None,
            pose_dim=9, regression_head=head, uniform_t=True,
        )(pose, t)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_fast_fus_forward_parity_bf16(self):
        """bf16-compute config: scale stages run bf16 in BOTH paths; the
        GroupAll stage must stay f32 in the fast path (the module's GroupAll
        SharedMLP has no compute dtype)."""
        from genpose2_tpu.models.fast_encoder import fast_fus_forward

        cfg = TINY.model.pointnet2.__class__(
            **{**TINY.model.pointnet2.__dict__, "compute_dtype": "bfloat16"}
        )
        model = PointNet2ClsMSGFus(cfg)
        rng = np.random.default_rng(13)
        pc = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 128, 3 + 16)), jnp.float32)
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1)}, pc
        )
        vars_ = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(np.abs(rng.normal(size=p.shape, scale=0.05)), p.dtype),
            vars_,
        )
        ref = np.asarray(model.apply(vars_, pc, False), np.float32)
        got = np.asarray(
            fast_fus_forward(
                {"params": vars_["params"], "batch_stats": vars_["batch_stats"]}, pc, cfg
            ),
            np.float32,
        )
        # bf16 matmuls: tolerate rounding, catch structural divergence
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)

    def test_fast_cls_forward_parity_no_xyz(self):
        """use_xyz=False: the module performs NO centering; the fast path must
        match (regression: it used to subtract a garbage feature-row term)."""
        from genpose2_tpu.config import PointNet2Config
        from genpose2_tpu.models.fast_encoder import fast_cls_forward
        from genpose2_tpu.models.pointnet2 import PointNet2ClsMSG

        cfg = PointNet2Config(
            npoints=(16, None),
            radii=((0.3,), (None,)),
            nsamples=((8,), (None,)),
            mlps=(((8, 16),), ((16, 24),)),
            use_xyz=False,
        )
        model = PointNet2ClsMSG(cfg)
        rng = np.random.default_rng(17)
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 64, 3 + 6)), jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), pts)
        vars_ = jax.tree_util.tree_map(
            lambda p: p + jnp.asarray(np.abs(rng.normal(size=p.shape, scale=0.1)), p.dtype),
            vars_,
        )
        ref = model.apply(vars_, pts, train=False)
        got = fast_cls_forward(
            {"params": vars_["params"], "batch_stats": vars_["batch_stats"]}, pts, cfg
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestLayoutFastPaths:
    """The tiny-channel conv and exact-halving resize replacements are
    algebraically identical to the XLA forms they replace."""

    def test_shiftconv_matches_nn_conv(self):
        import flax.linen as nn
        from genpose2_tpu.models.attention import _ShiftConv1d

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, 40, 2)).astype(np.float32))
        ref = nn.Conv(1, kernel_size=(7,), padding="SAME", use_bias=False)
        vs = ref.init(jax.random.PRNGKey(1), x)
        got = _ShiftConv1d(1, 7).apply(vs, x)
        want = ref.apply(vs, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_halving_resize_matches_torch_interpolate(self):
        """Oracle is the reference op: torch F.interpolate(mode='linear',
        align_corners=False) (ref pointnet2.py:344-350). jax.image.resize with
        its default antialias=True is a *different* operator on downsample and
        must NOT be used as the oracle here."""
        import torch
        import torch.nn.functional as F

        from genpose2_tpu.models.layers import linear_resize_points

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 64, 5)).astype(np.float32)
        got = linear_resize_points(jnp.asarray(x), 32)
        # torch interpolates along the last axis of (B, C, N)
        want = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 2, 1),
                size=32,
                mode="linear",
                align_corners=False,
            )
            .permute(0, 2, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_non_halving_resize_matches_torch_interpolate(self):
        """The general fallback (antialias=False) also matches torch for a
        non-2x ratio (64 -> 48)."""
        import torch
        import torch.nn.functional as F

        from genpose2_tpu.models.layers import linear_resize_points

        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 64, 5)).astype(np.float32)
        got = linear_resize_points(jnp.asarray(x), 48)
        want = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 2, 1),
                size=48,
                mode="linear",
                align_corners=False,
            )
            .permute(0, 2, 1)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
