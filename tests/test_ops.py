"""Tests for point-cloud kernels: brute-force oracles reproduce the CUDA
semantics (reference: src/sampling_gpu.cu:93-253, src/ball_query_gpu.cu:9-45),
and the Pallas FPS is checked against the jnp reference (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose2_tpu.ops import (
    ball_query,
    fps_pallas,
    fps_ref,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)


def fps_numpy(xyz, npoint):
    """Direct transcription of the CUDA FPS loop semantics
    (reference: sampling_gpu.cu:113-137): start at 0, iterative min-dist
    update, argmax (first index on ties)."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, np.float64)
        old = 0
        for j in range(1, npoint):
            d = np.sum((xyz[b] - xyz[b, old]) ** 2, axis=-1)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))
            out[b, j] = old
    return out


def ball_query_numpy(xyz, new_xyz, radius, nsample):
    """Direct transcription of ball_query_gpu.cu:28-44."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((new_xyz[b, m] - xyz[b, k]) ** 2)
                if d2 < radius * radius:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


class TestFPS:
    def test_ref_matches_cuda_semantics(self, rng):
        xyz = rng.normal(size=(4, 64, 3)).astype(np.float32)
        expected = fps_numpy(xyz, 16)
        got = np.asarray(fps_ref(jnp.asarray(xyz), 16))
        np.testing.assert_array_equal(got, expected)

    def test_pallas_matches_ref(self, rng):
        xyz = rng.normal(size=(12, 256, 3)).astype(np.float32)
        a = np.asarray(fps_ref(jnp.asarray(xyz), 64))
        b = np.asarray(fps_pallas(jnp.asarray(xyz), 64, 8))
        np.testing.assert_array_equal(a, b)

    def test_pallas_batch_padding(self, rng):
        # batch not a multiple of the row tile
        xyz = rng.normal(size=(5, 128, 3)).astype(np.float32)
        a = np.asarray(fps_ref(jnp.asarray(xyz), 32))
        b = np.asarray(fps_pallas(jnp.asarray(xyz), 32, 4))
        np.testing.assert_array_equal(a, b)

    def test_coverage_property(self, rng):
        # FPS indices are distinct and spread: max point-to-sample distance is
        # below max point-to-random-sample distance
        xyz = rng.normal(size=(2, 512, 3)).astype(np.float32)
        idx = np.asarray(fps_ref(jnp.asarray(xyz), 128))
        for b in range(2):
            assert len(np.unique(idx[b])) == 128
            samples = xyz[b, idx[b]]
            d = np.linalg.norm(xyz[b][:, None] - samples[None], axis=-1).min(1)
            rand_idx = rng.choice(512, 128, replace=False)
            d_rand = (
                np.linalg.norm(xyz[b][:, None] - xyz[b][rand_idx][None], axis=-1).min(1)
            )
            assert d.max() <= d_rand.max() + 1e-6


class TestBallQuery:
    def test_matches_cuda_semantics(self, rng):
        xyz = rng.uniform(-0.5, 0.5, size=(3, 96, 3)).astype(np.float32)
        new_xyz = xyz[:, :24]
        for radius, nsample in [(0.1, 8), (0.3, 16), (0.05, 4)]:
            expected = ball_query_numpy(xyz, new_xyz, radius, nsample)
            got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), radius, nsample))
            np.testing.assert_array_equal(got, expected, err_msg=f"r={radius}")

    def test_empty_ball_returns_zeros(self):
        xyz = jnp.asarray(np.array([[[10.0, 10, 10], [20, 20, 20]]], np.float32))
        new_xyz = jnp.zeros((1, 1, 3), jnp.float32)
        idx = np.asarray(ball_query(xyz, new_xyz, 0.1, 4))
        np.testing.assert_array_equal(idx, np.zeros((1, 1, 4), np.int32))

    def test_chunked_matches_unchunked(self, rng):
        xyz = rng.uniform(-0.5, 0.5, size=(37, 64, 3)).astype(np.float32)
        new_xyz = xyz[:, :16]
        a = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.2, 8, 8))
        b = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.2, 8, 64))
        np.testing.assert_array_equal(a, b)


class TestGrouping:
    def test_gather(self, rng):
        feats = rng.normal(size=(2, 32, 5)).astype(np.float32)
        idx = rng.integers(0, 32, size=(2, 7)).astype(np.int32)
        out = np.asarray(gather_points(jnp.asarray(feats), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_array_equal(out[b], feats[b, idx[b]])

    def test_group(self, rng):
        feats = rng.normal(size=(2, 32, 5)).astype(np.float32)
        idx = rng.integers(0, 32, size=(2, 7, 4)).astype(np.int32)
        out = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_array_equal(out[b], feats[b][idx[b]])

    def test_group_grad_is_scatter_add(self, rng):
        # gradient w.r.t. features accumulates duplicate indices (CUDA atomicAdd
        # equivalent, but deterministic)
        feats = jnp.asarray(rng.normal(size=(1, 8, 2)).astype(np.float32))
        idx = jnp.asarray(np.array([[[0, 0, 3]]], np.int32))  # index 0 twice

        def f(x):
            return jnp.sum(group_points(x, idx))

        g = np.asarray(jax.grad(f)(feats))
        expected = np.zeros((1, 8, 2), np.float32)
        expected[0, 0] = 2.0
        expected[0, 3] = 1.0
        np.testing.assert_array_equal(g, expected)


class TestInterpolate:
    def test_three_nn(self, rng):
        unknown = rng.normal(size=(2, 20, 3)).astype(np.float32)
        known = rng.normal(size=(2, 9, 3)).astype(np.float32)
        dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        d_full = np.linalg.norm(unknown[:, :, None] - known[:, None], axis=-1)
        expected_idx = np.argsort(d_full, axis=-1)[..., :3]
        np.testing.assert_allclose(
            np.sort(np.asarray(dist), -1), np.sort(np.take_along_axis(d_full, expected_idx, -1), -1),
            atol=1e-5,
        )
        # sets of 3-NN indices agree
        for b in range(2):
            for n in range(20):
                assert set(np.asarray(idx)[b, n]) == set(expected_idx[b, n])

    def test_three_interpolate_weights(self, rng):
        feats = rng.normal(size=(1, 6, 4)).astype(np.float32)
        idx = np.array([[[0, 2, 4], [1, 1, 1]]], np.int32)
        w = np.array([[[0.5, 0.3, 0.2], [1.0, 0.0, 0.0]]], np.float32)
        out = np.asarray(
            three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
        )
        expected0 = 0.5 * feats[0, 0] + 0.3 * feats[0, 2] + 0.2 * feats[0, 4]
        np.testing.assert_allclose(out[0, 0], expected0, atol=1e-6)
        np.testing.assert_allclose(out[0, 1], feats[0, 1], atol=1e-6)


class TestBallQueryPallas:
    def test_matches_xla_and_cuda_semantics(self, rng):
        from genpose2_tpu.ops.ball_query_pallas import ball_query_pallas

        xyz = rng.uniform(-0.5, 0.5, size=(3, 96, 3)).astype(np.float32)
        new_xyz = xyz[:, :40]
        for radius, nsample in [(0.1, 8), (0.3, 16)]:
            expected = ball_query_numpy(xyz, new_xyz, radius, nsample)
            got = np.asarray(
                ball_query_pallas(jnp.asarray(xyz), jnp.asarray(new_xyz), radius, nsample, 16)
            )
            np.testing.assert_array_equal(got, expected, err_msg=f"r={radius}")

    def test_padding_and_empty(self, rng):
        from genpose2_tpu.ops.ball_query_pallas import ball_query_pallas

        # non-multiple M and N, plus a centroid with zero hits
        xyz = rng.uniform(-0.5, 0.5, size=(2, 70, 3)).astype(np.float32)
        new_xyz = np.concatenate(
            [xyz[:, :17], np.full((2, 1, 3), 10.0, np.float32)], axis=1
        )
        expected = ball_query_numpy(xyz, new_xyz, 0.2, 8)
        got = np.asarray(
            ball_query_pallas(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.2, 8, 8)
        )
        np.testing.assert_array_equal(got, expected)


class TestGroupMatmul:
    def test_matches_gather_exactly(self, rng):
        from genpose2_tpu.ops.grouping import group_points_matmul

        feats = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 64, size=(2, 10, 4)).astype(np.int32))
        a = np.asarray(group_points(feats, idx))
        b = np.asarray(group_points_matmul(feats, idx))
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_gradient_matches(self, rng):
        from genpose2_tpu.ops.grouping import group_points_matmul

        feats = jnp.asarray(rng.normal(size=(1, 16, 4)).astype(np.float32))
        idx = jnp.asarray(np.array([[[0, 0, 5]]], np.int32))
        g1 = jax.grad(lambda x: jnp.sum(group_points(x, idx) ** 2))(feats)
        g2 = jax.grad(lambda x: jnp.sum(group_points_matmul(x, idx) ** 2))(feats)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


class TestFusedSA:
    def test_matches_oracle(self, rng):
        """Fused group+center+affine+MLP+pool kernel vs the dense-jnp oracle."""
        from genpose2_tpu.ops.fused_sa import (
            fused_group_mlp_pool,
            fused_group_mlp_pool_reference,
        )

        B, N, M, S, h1 = 2, 64, 16, 8, 16
        widths = (16, 24)
        proj = jnp.asarray(rng.normal(size=(B, N, h1)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(B, M, S)).astype(np.int32))
        center = jnp.asarray(rng.normal(size=(B, M, h1)).astype(np.float32))
        affines = [
            (
                jnp.asarray(rng.uniform(0.5, 1.5, size=(w,)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(w,)).astype(np.float32)),
            )
            for w in (h1,) + widths
        ]
        weights = [
            jnp.asarray(rng.normal(size=(a, b)).astype(np.float32))
            for a, b in zip((h1,) + widths[:-1], widths)
        ]
        ref = fused_group_mlp_pool_reference(proj, idx, center, affines, weights)
        got = fused_group_mlp_pool(proj, idx, center, affines, weights, row_tile=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_zero_layers(self, rng):
        """Only the input affine + pool (degenerate single-layer scale)."""
        from genpose2_tpu.ops.fused_sa import (
            fused_group_mlp_pool,
            fused_group_mlp_pool_reference,
        )

        B, N, M, S, h1 = 1, 32, 8, 4, 8
        proj = jnp.asarray(rng.normal(size=(B, N, h1)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(B, M, S)).astype(np.int32))
        center = jnp.asarray(rng.normal(size=(B, M, h1)).astype(np.float32))
        affines = [
            (
                jnp.asarray(rng.uniform(0.5, 1.5, size=(h1,)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(h1,)).astype(np.float32)),
            )
        ]
        ref = fused_group_mlp_pool_reference(proj, idx, center, affines, [])
        got = fused_group_mlp_pool(proj, idx, center, affines, [], row_tile=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_fused_sa_scale_matches_unfused(self, rng):
        """Ball-query-fused scale kernel == ball_query + fused_group_mlp_pool,
        including first-hit padding and zero-hit rows."""
        from genpose2_tpu.ops import ball_query
        from genpose2_tpu.ops.fused_sa import (
            fused_group_mlp_pool_reference,
            fused_sa_scale,
        )

        B, N, M, S, h1 = 2, 70, 16, 8, 16  # non-128-multiple N exercises padding
        widths = (16, 24)
        radius = 0.25
        xyz = jnp.asarray(rng.uniform(-0.4, 0.4, size=(B, N, 3)).astype(np.float32))
        # one centroid far away -> zero hits
        new_xyz = jnp.concatenate(
            [xyz[:, :M-1], jnp.full((B, 1, 3), 5.0, jnp.float32)], axis=1
        )
        proj = jnp.asarray(rng.normal(size=(B, N, h1)).astype(np.float32))
        center = jnp.asarray(rng.normal(size=(B, M, h1)).astype(np.float32))
        affines = [
            (
                jnp.asarray(rng.uniform(0.5, 1.5, size=(w,)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(w,)).astype(np.float32)),
            )
            for w in (h1,) + widths
        ]
        weights = [
            jnp.asarray(rng.normal(size=(a, b)).astype(np.float32))
            for a, b in zip((h1,) + widths[:-1], widths)
        ]
        idx = ball_query(xyz, new_xyz, radius, S)
        ref = fused_group_mlp_pool_reference(proj, idx, center, affines, weights)
        got = fused_sa_scale(
            xyz, new_xyz, proj, center, affines, weights, radius, S, row_tile=16
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestFusedSAStage:
    @pytest.mark.parametrize("dynamic_skip", [False, True])
    def test_stage_matches_per_scale_concat(self, rng, dynamic_skip):
        """Merged multi-scale stage kernel == concat of fused_sa_scale calls
        (shared distance matrix, in-VMEM concat, scratch accumulators)."""
        from genpose2_tpu.ops.fused_sa import fused_sa_scale, fused_sa_stage

        B, N, M = 2, 200, 16
        radii = (0.15, 0.4)
        nsamples = (4, 8)
        h1s = (8, 16)
        widths = ((8, 12), (16, 8))
        xyz = jnp.asarray(rng.uniform(-0.4, 0.4, size=(B, N, 3)).astype(np.float32))
        # one centroid far away -> zero hits in both scales
        new_xyz = jnp.concatenate(
            [xyz[:, : M - 1], jnp.full((B, 1, 3), 5.0, jnp.float32)], axis=1
        )
        projs, centers, affines_list, weights_list = [], [], [], []
        for s in range(2):
            projs.append(jnp.asarray(rng.normal(size=(B, N, h1s[s])).astype(np.float32)))
            centers.append(jnp.asarray(rng.normal(size=(B, M, h1s[s])).astype(np.float32)))
            ws = (h1s[s],) + widths[s]
            affines_list.append(
                [
                    (
                        jnp.asarray(rng.uniform(0.5, 1.5, size=(w,)).astype(np.float32)),
                        jnp.asarray(rng.normal(size=(w,)).astype(np.float32)),
                    )
                    for w in ws
                ]
            )
            weights_list.append(
                [
                    jnp.asarray(rng.normal(size=(a, b)).astype(np.float32))
                    for a, b in zip(ws[:-1], ws[1:])
                ]
            )

        want = jnp.concatenate(
            [
                fused_sa_scale(
                    xyz, new_xyz, projs[s], centers[s], affines_list[s],
                    weights_list[s], radii[s], nsamples[s], row_tile=16,
                )
                for s in range(2)
            ],
            axis=-1,
        )
        got = fused_sa_stage(
            xyz, new_xyz, projs, centers, affines_list, weights_list,
            radii, nsamples, row_tile=16, slot_chunk=4, dynamic_skip=dynamic_skip,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestRelPEAttention:
    @pytest.mark.parametrize("M", [64, 128, 200])
    def test_matches_xla_modules(self, rng, M):
        """Fused kernel == EfficientRelativePositionalEncoding + MHA modules."""
        from genpose2_tpu.models.attention import (
            EfficientRelativePositionalEncoding,
            MultiheadAttentionWithRelativePE,
        )
        from genpose2_tpu.ops.relpe_attention import relpe_attention

        B, C, H = 2, 32, 8
        xyz = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32)) * 0.1
        x = jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32))

        pe = EfficientRelativePositionalEncoding(H)
        pe_vars = pe.init(jax.random.PRNGKey(0), xyz)
        mha = MultiheadAttentionWithRelativePE(C, H, 0.0)
        mha_vars = mha.init(jax.random.PRNGKey(1), x, None, True)

        bias = pe.apply(pe_vars, xyz)
        want = mha.apply(mha_vars, x, bias, True)

        p = mha_vars["params"]
        q = x @ p["wq"]["kernel"] + p["wq"]["bias"]
        k = x @ p["wk"]["kernel"] + p["wk"]["bias"]
        v = x @ p["wv"]["kernel"] + p["wv"]["bias"]
        attn = relpe_attention(xyz, q, k, v, pe_vars["params"], H)
        got = attn @ p["wo"]["kernel"] + p["wo"]["bias"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

        # bf16 compute takes the row-batched (RB=2) kernel form — the
        # production flagship path (f32 keeps RB=1 for scoped-VMEM reasons,
        # see relpe_attention.py); same math within bf16 tolerance
        attn16 = relpe_attention(
            xyz, q, k, v, pe_vars["params"], H, compute_dtype="bfloat16"
        )
        got16 = attn16 @ p["wo"]["kernel"] + p["wo"]["bias"]
        np.testing.assert_allclose(
            np.asarray(got16), np.asarray(want), rtol=2e-2, atol=2e-2
        )


class TestDynamicSkip:
    """The production eval path (N >= 1024) runs fused_sa_scale with
    dynamic_skip=True plus the ball_count density ordering — cover that
    branch at production point count (small widths keep interpret-mode
    cost down)."""

    @pytest.mark.parametrize("radius", [0.05, 0.6])  # sparse and dense hits
    def test_skip_matches_no_skip_at_n1024(self, rng, radius):
        from genpose2_tpu.ops.fused_sa import fused_sa_scale

        B, N, M, S = 2, 1024, 128, 16
        widths = (8, 8)
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        new_xyz = xyz[:, :M]
        proj = jnp.asarray(rng.normal(size=(B, N, widths[0])).astype(np.float32))
        center = jnp.asarray(rng.normal(size=(B, M, widths[0])).astype(np.float32))
        affines = [
            (
                jnp.asarray(rng.uniform(0.5, 1.5, size=(w,)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(w,)).astype(np.float32)),
            )
            for w in widths
        ]
        weights = [jnp.asarray(rng.normal(size=(widths[0], widths[1])).astype(np.float32))]

        base = fused_sa_scale(
            xyz, new_xyz, proj, center, affines, weights, radius, S,
            slot_chunk=8, dynamic_skip=False,
        )
        skip = fused_sa_scale(
            xyz, new_xyz, proj, center, affines, weights, radius, S,
            slot_chunk=4, dynamic_skip=True,
        )
        np.testing.assert_allclose(np.asarray(skip), np.asarray(base), rtol=1e-5, atol=1e-5)

    def test_ball_count_matches_oracle(self, rng):
        from genpose2_tpu.ops.ball_query_pallas import ball_count

        B, N, M, r = 2, 200, 40, 0.4
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        new_xyz = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
        got = np.asarray(ball_count(xyz, new_xyz, r))
        d2 = np.sum(
            (np.asarray(new_xyz)[:, :, None, :] - np.asarray(xyz)[:, None, :, :]) ** 2, -1
        )
        want = (d2 < r * r).sum(-1).astype(np.int32)
        np.testing.assert_array_equal(got, want)

    def test_density_sorted_stage_matches_module(self, rng):
        """fast_cls_forward at N=1024 (the use_skip + density-sort branch) ==
        the PointNet2ClsMSG module."""
        import dataclasses

        from genpose2_tpu.config import PointNet2Config
        from genpose2_tpu.models.fast_encoder import fast_cls_forward
        from genpose2_tpu.models.pointnet2 import PointNet2ClsMSG

        cfg = PointNet2Config(
            npoints=(128, None),
            radii=((0.1, 0.3), (None, None)),
            nsamples=((4, 8), (None, None)),
            mlps=(((8, 8), (8, 8)), ((16, 16), (16, 16))),
        )
        B, N = 2, 1024
        pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)) * 0.5
        model = PointNet2ClsMSG(cfg)
        vs = model.init(jax.random.PRNGKey(0), pts)
        want = model.apply(vs, pts, train=False)
        got = fast_cls_forward(
            {"params": vs["params"], "batch_stats": vs.get("batch_stats", {})}, pts, cfg
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


class TestViTAttention:
    """Fused ViT attention kernel vs dense oracle (interpret mode on CPU)."""

    def test_parity_f32_unaligned_tokens(self):
        import numpy as np
        from genpose2_tpu.ops.vit_attention import (
            vit_attention,
            vit_attention_reference,
        )

        rng = np.random.default_rng(0)
        B, N, H, hd = 2, 261, 6, 16  # N not a multiple of 8
        D = H * hd
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)) for _ in range(3)
        )
        got = vit_attention(q, k, v, H)
        want = vit_attention_reference(q, k, v, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_parity_bf16(self):
        import numpy as np
        from genpose2_tpu.ops.vit_attention import (
            vit_attention,
            vit_attention_reference,
        )

        rng = np.random.default_rng(1)
        B, N, H, hd = 2, 40, 2, 32
        D = H * hd
        mk = lambda: jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        q, k, v = mk(), mk(), mk()
        got = vit_attention(q, k, v, H)
        want = vit_attention_reference(q, k, v, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


class TestViTAttentionTokenMajor:
    """Token-major kernel (in-kernel head slicing, no XLA transposes) vs the
    dense oracle, including masked padding rows."""

    def test_parity_f32_padded(self):
        import numpy as np
        from genpose2_tpu.ops.vit_attention import (
            vit_attention_reference,
            vit_attention_tm,
        )

        rng = np.random.default_rng(2)
        B, N, H, hd = 2, 272, 4, 64  # padded; 261 valid
        D = H * hd
        n_valid = 261
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
            for _ in range(3)
        )
        got = vit_attention_tm(q, k, v, H, n_valid=n_valid)
        want = vit_attention_reference(
            q[:, :n_valid], k[:, :n_valid], v[:, :n_valid], H
        )
        np.testing.assert_allclose(
            np.asarray(got)[:, :n_valid], np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_parity_bf16(self):
        import numpy as np
        from genpose2_tpu.ops.vit_attention import (
            vit_attention_reference,
            vit_attention_tm,
        )

        rng = np.random.default_rng(3)
        B, N, H, hd = 2, 48, 2, 32
        D = H * hd
        mk = lambda: jnp.asarray(
            rng.normal(size=(B, N, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        got = vit_attention_tm(q, k, v, H)
        want = vit_attention_reference(q, k, v, H)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )


class TestFastLayerNorm:
    def test_matches_nn_layernorm(self):
        import flax.linen as nn
        import numpy as np
        from genpose2_tpu.ops.layernorm import fast_layernorm

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(3, 16, 48)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        got = fast_layernorm(x, scale, bias)
        ref = nn.LayerNorm(dtype=jnp.float32)
        want = ref.apply({"params": {"scale": scale, "bias": bias}}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_residual_ln_matches_add_then_ln(self):
        import flax.linen as nn
        import numpy as np
        from genpose2_tpu.ops.layernorm import fast_residual_layernorm

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(3, 16, 48)).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(3, 16, 48)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        got = fast_residual_layernorm(x, h, scale, bias)
        want = nn.LayerNorm(dtype=jnp.float32).apply(
            {"params": {"scale": scale, "bias": bias}}, x + h
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_bf16_stream(self):
        import numpy as np
        from genpose2_tpu.ops.layernorm import fast_layernorm

        rng = np.random.default_rng(5)
        xf = rng.normal(size=(2, 16, 64)).astype(np.float32)
        x = jnp.asarray(xf).astype(jnp.bfloat16)
        got = fast_layernorm(x, jnp.ones(64), jnp.zeros(64))
        assert got.dtype == jnp.bfloat16
        mu = xf.mean(-1, keepdims=True)
        want = (xf - mu) / np.sqrt(((xf - mu) ** 2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(
            np.asarray(got.astype(jnp.float32)), want, atol=5e-2
        )


class TestFastAddLayerNorm:
    def test_matches_composed_ops(self):
        import flax.linen as nn
        import numpy as np
        from genpose2_tpu.ops.layernorm import fast_add_layernorm

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(2, 16, 48)).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(2, 16, 48)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
        x2, ln = fast_add_layernorm(x, h, g, scale, bias)
        want_x2 = x + h * g
        want_ln = nn.LayerNorm(dtype=jnp.float32).apply(
            {"params": {"scale": scale, "bias": bias}}, want_x2
        )
        np.testing.assert_allclose(np.asarray(x2), np.asarray(want_x2), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ln), np.asarray(want_ln), rtol=1e-5, atol=1e-5)
