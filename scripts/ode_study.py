"""Adaptive-vs-fixed ODE integrator study (ROADMAP item 5).

Question: is the cheap fixed-grid integrator metric-equivalent to the
reference's adaptive RK45 (scipy solve_ivp semantics, atol=rtol=1e-5,
reference: samplers.py:204-234)? The eval pipeline's cost is linear in score
evaluations, so the cheapest equivalent setting defines the serving
configuration.

Protocol: train a small conditional ScoreNet on synthetic scenes (unseen-pose
generalization regime, as tests/test_e2e_slice.py), then sample the SAME test
set and PRNG key with:

- adaptive RK45 (on-device Dormand-Prince, scipy-parity-tested), T0=0.55
- fixed RK4 at 10 / 25 / 50 / 100 steps
- fixed Euler at 50 / 200 steps

and report (a) pose metrics vs GT per integrator, (b) pose agreement between
each integrator and RK45, (c) score evaluations per candidate. Prints JSON
lines.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from genpose2_tpu.config import tiny_test_config
from genpose2_tpu.data.synthetic import SyntheticPoseData
from genpose2_tpu.eval import aggregate_candidates, batch_criterion, sym_label
from genpose2_tpu.so3.rotations import get_rot_matrix
from genpose2_tpu.training import PoseAgent

TRAIN_STEPS = 3000
B_TEST = 16
K = 50
T0 = 0.55


def main():
    cfg = tiny_test_config()
    data = SyntheticPoseData(num_points=cfg.model.num_points, noise=0.001)
    agent = PoseAgent(cfg, "score", steps_per_epoch=100)

    key = jax.random.PRNGKey(0)
    batch = data.batch(key, 16)
    state = agent.init_state(key, batch)
    for i in range(TRAIN_STEPS):
        b = data.batch(jax.random.PRNGKey(100 + i), 16)
        state, m = agent.train_step(state, b, jax.random.PRNGKey(i))
    print(json.dumps({"metric": "final_train_loss", "value": float(m["loss"])}))

    test_batch = data.batch(jax.random.PRNGKey(999), B_TEST)
    skey = jax.random.PRNGKey(7)
    sym = jnp.tile(sym_label()[None], (B_TEST, 1))
    sizes = test_batch["bbox_side_len"]

    def run(method, num_steps):
        poses = agent.sample_candidates(
            state, test_batch, skey, repeat_num=K, T0=T0,
            method=method, num_steps=num_steps,
        )
        agg = aggregate_candidates(poses, None, retain_ratio=0.4)
        iou, deg, sht = batch_criterion(
            agg["rotation"], agg["translation"], sizes,
            test_batch["gt_rotation"], test_batch["gt_translation"], sizes, sym,
        )
        return poses, agg, float(np.mean(np.asarray(iou))), float(
            np.mean(np.asarray(deg))
        ), float(np.mean(np.asarray(sht)))

    ref_poses, ref_agg, riou, rdeg, rsht = run("rk45", None)
    print(
        json.dumps(
            {
                "integrator": "rk45_adaptive(atol=rtol=1e-5)",
                "iou": round(riou, 4),
                "rot_deg": round(rdeg, 3),
                "trans_cm": round(rsht, 3),
                "evals_per_candidate": "adaptive (~6 per accepted step)",
            }
        )
    )

    settings = [("fixed", 10), ("fixed", 25), ("fixed", 50), ("fixed", 100),
                ("euler", 50), ("euler", 200)]
    for method, n in settings:
        poses, agg, iou, deg, sht = run(method, n)
        # agreement with the adaptive reference on the AGGREGATED pose
        dR = jnp.einsum("bij,bkj->bik", agg["rotation"], ref_agg["rotation"])
        tr = jnp.clip((jnp.trace(dR, axis1=1, axis2=2) - 1) / 2, -1, 1)
        rot_gap = float(jnp.mean(jnp.degrees(jnp.arccos(tr))))
        t_gap = float(
            jnp.mean(jnp.linalg.norm(agg["translation"] - ref_agg["translation"], axis=-1))
        )
        evals = {"fixed": 4 * n + 1, "euler": n + 1}[method]
        print(
            json.dumps(
                {
                    "integrator": f"{method}_{n}",
                    "iou": round(iou, 4),
                    "rot_deg": round(deg, 3),
                    "trans_cm": round(sht, 3),
                    "agreement_rot_deg_vs_rk45": round(rot_gap, 3),
                    "agreement_trans_m_vs_rk45": round(t_gap, 5),
                    "evals_per_candidate": evals,
                }
            )
        )


if __name__ == "__main__":
    main()
