"""ViT torch-weight ingestion: build a DINOv2-format torch state dict, load it
into the JAX ViT, and check the two networks produce matching features
(validates the layout mapping needed for pretrained-backbone parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from genpose2_tpu.models.vit import ViT, load_torch_state_dict
from genpose2_tpu.training.agent import calc_likelihood


def build_torch_vit(dim=32, depth=2, heads=2, patch=8):
    """Minimal DINOv2-style torch ViT mirroring our flax architecture."""

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(dim)
            self.attn = torch.nn.ModuleDict(
                {
                    "qkv": torch.nn.Linear(dim, dim * 3),
                    "proj": torch.nn.Linear(dim, dim),
                }
            )
            self.ls1 = torch.nn.ParameterDict(
                {"gamma": torch.nn.Parameter(torch.full((dim,), 1e-5))}
            )
            self.norm2 = torch.nn.LayerNorm(dim)
            self.mlp = torch.nn.ModuleDict(
                {
                    "fc1": torch.nn.Linear(dim, dim * 4),
                    "fc2": torch.nn.Linear(dim * 4, dim),
                }
            )
            self.ls2 = torch.nn.ParameterDict(
                {"gamma": torch.nn.Parameter(torch.full((dim,), 1e-5))}
            )

        def forward(self, x):
            h = self.norm1(x)
            B, N, D = h.shape
            qkv = self.attn["qkv"](h).reshape(B, N, 3, heads, D // heads)
            q, k, v = qkv.unbind(2)
            att = torch.softmax(
                (q.transpose(1, 2) @ k.transpose(1, 2).transpose(-1, -2))
                / np.sqrt(D // heads),
                dim=-1,
            )
            h = (att @ v.transpose(1, 2)).transpose(1, 2).reshape(B, N, D)
            h = self.attn["proj"](h)
            x = x + h * self.ls1["gamma"]
            h = self.norm2(x)
            h = self.mlp["fc2"](torch.nn.functional.gelu(self.mlp["fc1"](h)))
            return x + h * self.ls2["gamma"]

    class TorchViT(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
            P = (16 // patch) ** 2
            self.pos_embed = torch.nn.Parameter(torch.randn(1, P + 1, dim) * 0.02)
            self.patch_embed = torch.nn.ModuleDict(
                {"proj": torch.nn.Conv2d(3, dim, patch, patch)}
            )
            self.blocks = torch.nn.ModuleList([Block() for _ in range(depth)])
            self.norm = torch.nn.LayerNorm(dim)

        def forward(self, x):
            t = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
            t = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), t], 1)
            t = t + self.pos_embed
            for b in self.blocks:
                t = b(t)
            return self.norm(t)[:, 1:]

    return TorchViT()


class TestViTWeightIngestion:
    def test_feature_parity_with_torch(self):
        torch.manual_seed(0)
        tv = build_torch_vit()
        sd = tv.state_dict()

        vit = ViT(patch_size=8, dim=32, depth=2, num_heads=2)
        x = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
        params = vit.init(jax.random.PRNGKey(0), jnp.asarray(x))
        loaded = load_torch_state_dict(params, sd)
        out_jax = np.asarray(vit.apply(loaded, jnp.asarray(x)))

        with torch.no_grad():
            out_torch = tv(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(out_jax, out_torch, atol=2e-4)

    def test_intermediate_layers_after_load(self):
        tv = build_torch_vit()
        vit = ViT(patch_size=8, dim=32, depth=2, num_heads=2)
        x = jnp.ones((1, 16, 16, 3))
        params = vit.init(jax.random.PRNGKey(0), x)
        loaded = load_torch_state_dict(params, tv.state_dict())
        outs = vit.apply(loaded, x, (0, 1))
        assert len(outs) == 2 and outs[0].shape == (1, 4, 32)


class TestLikelihood:
    def test_agent_likelihood_ranks_gt_above_random(self):
        from genpose2_tpu.config import tiny_test_config
        from genpose2_tpu.data.synthetic import SyntheticPoseData
        from genpose2_tpu.training import PoseAgent

        cfg = tiny_test_config()
        data = SyntheticPoseData(num_points=cfg.model.num_points)
        agent = PoseAgent(cfg, "score", 10)
        key = jax.random.PRNGKey(0)
        batch = data.batch(key, 2, fixed_pose=True)
        state = agent.init_state(key, batch)
        for i in range(300):
            b = data.batch(jax.random.PRNGKey(i), 8, fixed_pose=True)
            state, _ = agent.train_step(state, b, jax.random.PRNGKey(i))
        gt = batch["zero_mean_gt_pose"].at[..., -3:].add(batch["pts_center"])
        poses = jnp.stack([gt, gt + 1.5], axis=1)  # (B, 2, 9): gt vs off
        ll = np.asarray(calc_likelihood(agent, state, batch, poses))
        assert np.isfinite(ll).all()
        assert (ll[:, 0] > ll[:, 1]).all()
