"""Multi-device sharding tests on the 8-device virtual CPU mesh
(the standard pjit/shard_map simulation; SURVEY.md §4 test plan (e))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpose2_tpu.config import tiny_test_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.parallel import make_mesh, replicate, shard_batch
from genpose2_tpu.training import PoseAgent


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestMesh:
    def test_mesh_shapes(self, eight_devices):
        mesh = make_mesh(data=4, cand=2)
        assert mesh.devices.shape == (4, 2)
        mesh = make_mesh(cand=2)
        assert mesh.devices.shape == (4, 2)

    def test_sharded_train_step_matches_single_device(self, eight_devices):
        cfg = tiny_test_config()
        agent = PoseAgent(cfg, "score", steps_per_epoch=10)
        data = SyntheticPoseData(num_points=cfg.model.num_points)
        key = jax.random.PRNGKey(0)
        batch = data.batch(key, 8)
        batch = {k: batch[k] for k in ("pts", "zero_mean_gt_pose", "pts_center")}
        state = agent.init_state(key, batch)

        # single-device result
        s1, m1 = agent.train_step(state, batch, key)

        # 8-way data-parallel result
        mesh = make_mesh(data=8, cand=1)
        state_r = replicate(state, mesh)
        batch_s = shard_batch(batch, mesh)
        s8, m8 = agent.train_step(state_r, batch_s, key)

        assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-4
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_dryrun_entrypoint(self, eight_devices):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        # use the tiny flagship internally? entry() builds the full flagship —
        # compile-check via abstract eval only (no execution) to stay fast
        fn, (variables, data) = ge.entry()
        shapes = jax.eval_shape(fn, variables, data)
        assert shapes.shape == (2, 9)
