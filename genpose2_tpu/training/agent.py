"""Training/inference agents: optax optimization, EMA, NaN guard, checkpoints.

Functional re-design of the reference's PoseNet agent state machine
(reference: networks/posenet_agent.py:52-823): the mutable torch module +
optimizer + EMA-juggling becomes one immutable TrainState pytree advanced by
jitted steps. Per-agent-type losses:

- score:  denoising score matching, ``repeat_num`` draws vmapped in one step
  (reference: posenet_agent.py:205-226 runs a 20x Python loop);
- energy: DSM on the energy-gradient score (second-order AD, the reference's
  create_graph=True, energynet.py:221-226) + optional pairwise ranking loss on
  candidates from a frozen score agent (posenet_agent.py:253-288, 316-338);
- scale:  MSE x 1e4 on bbox lengths over noised-axes candidate batches
  (posenet_agent.py:290-314, 371-383).

Candidate sampling (``sample_candidates``) computes the conditioning feature
ONCE per object and broadcasts it across the K-candidate axis before running
the on-device ODE — the reference repeats every input tensor K times through
the whole encoder path (reference: posenet_agent.py:510-527).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from genpose2_tpu.config import Config
from genpose2_tpu.diffusion import init_sde, ode_sampler, pc_sampler
from genpose2_tpu.diffusion.losses import dsm_loss
from genpose2_tpu.models.posenet import GFObjectPose
from genpose2_tpu.models.provider import (
    ImageFeatureProvider,
    attach_provider_variables,
    split_provider_variables,
)
from genpose2_tpu.models.scalenet import ScaleNet, scale_loss
from genpose2_tpu.models.fast_encoder import fast_cls_forward, fast_fus_forward
from genpose2_tpu.models.scorenet import make_fast_score_fn
from genpose2_tpu.training.ema import ema_init, ema_update
from genpose2_tpu.training.ranking import ranking_loss, sort_results


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    ema_params: Any
    ema_updates: jnp.ndarray


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """Linear warmup (cfg.train.warmup steps) then per-epoch exponential decay
    with a floor (reference: posenet_agent.py:121-139, 721-730)."""
    t = cfg.train

    def schedule(step):
        warm = jnp.minimum(1.0, (step + 1.0) / max(t.warmup, 1))
        epoch = step // max(steps_per_epoch, 1)
        decayed = jnp.maximum(t.lr * t.lr_decay**epoch, t.lr_floor)
        return warm * decayed

    return schedule


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class PoseAgent:
    """Owner of a GFObjectPose ('score' or 'energy') plus its optimization."""

    def __init__(self, cfg: Config, agent_type: Optional[str] = None, steps_per_epoch: int = 1000):
        self.cfg = cfg
        self.agent_type = agent_type or cfg.train.agent_type
        self.sde = init_sde(cfg.sde)
        self.marginal_std_fn = lambda t: self.sde.marginal_prob(None, t)[1]
        # sde 'edm': the score agent trains/runs the EDM-preconditioned
        # denoiser (reference: configs/config.py:28-31 sampler_mode 'edm',
        # scorenet.py:278-424, samplers.py:261-340)
        self.use_decoder = self.agent_type == "score" and cfg.sde.mode == "edm"
        self.model = GFObjectPose(
            cfg.model, self.marginal_std_fn, self.agent_type,
            use_decoder=self.use_decoder,
        )
        # frozen image backbone: owned here (not by the model), mirroring the
        # reference's out-of-repo torch.hub asset (reference: posenet.py:56-62)
        self.provider = (
            ImageFeatureProvider(cfg.model)
            if cfg.model.dino != "none" and cfg.model.backbone != "none"
            else None
        )
        self.lr_schedule = make_lr_schedule(cfg, steps_per_epoch)
        opt = {
            "adam": optax.adam(self.lr_schedule),
            "sgd": optax.sgd(self.lr_schedule, momentum=0.9),
        }[cfg.train.optimizer]
        self.tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip), opt)

    # ------------------------------------------------------------------ init
    def init_state(self, key, sample_batch) -> TrainState:
        kp, ka, kd, kv = jax.random.split(key, 4)
        B = sample_batch["pts"].shape[0]
        init_batch = dict(sample_batch)
        init_batch.setdefault("sampled_pose", jnp.zeros((B, self.cfg.model.pose_dim)))
        init_batch.setdefault("t", jnp.full((B, 1), 0.5))
        provider_vars = None
        if self.provider is not None and self._needs_provider(init_batch):
            provider_vars = self.provider.init(kv)
            init_batch = self._apply_provider(provider_vars, init_batch)
        variables = self.model.init(
            {"params": kp, "aug": ka, "dropout": kd}, init_batch, False
        )
        params = variables["params"]
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            constants=attach_provider_variables(
                variables.get("constants", {}), provider_vars
            ),
            opt_state=self.tx.init(params),
            ema_params=ema_init(params),
            ema_updates=jnp.asarray(0, jnp.float32),
        )

    def _variables(self, state: TrainState, use_ema: bool = False):
        constants, _ = split_provider_variables(state.constants)
        return {
            "params": state.ema_params if use_ema else state.params,
            "batch_stats": state.batch_stats,
            "constants": constants,
        }

    # ----------------------------------------------------- image features
    def _needs_provider(self, batch) -> bool:
        """True when the batch carries pixels but not the dino features the
        configured mode consumes (precomputed-feature batches skip the
        backbone entirely)."""
        m = self.cfg.model
        if "roi_rgb" not in batch:
            return False
        if m.dino == "pointwise":
            return "dino_layers" not in batch
        if m.dino == "global":
            return "dino_global" not in batch
        return False

    def _apply_provider(self, provider_vars, batch):
        """Compute the frozen backbone's features from ``roi_rgb`` pixels
        unless the batch already carries them (precomputed-feature runs). The
        reference runs this inside every forward
        (reference: posenet.py:127-228); here it happens once per step,
        outside the gradient path (the backbone is frozen)."""
        m = self.cfg.model
        if m.dino == "pointwise" and "dino_layers" not in batch and "roi_rgb" in batch:
            batch = dict(batch)
            batch["dino_layers"] = self.provider.patch_features(
                provider_vars, batch["roi_rgb"]
            )
        if m.dino == "global" and "dino_global" not in batch and "roi_rgb" in batch:
            batch = dict(batch)
            batch["dino_global"] = self.provider.global_feature(
                provider_vars, batch["roi_rgb"]
            )
        return batch

    def with_image_features(self, state: TrainState, batch):
        """Public entry: batch -> batch with dino features attached."""
        if self.provider is None:
            return batch
        _, provider_vars = split_provider_variables(state.constants)
        if provider_vars is None:
            return batch
        return self._apply_provider(provider_vars, batch)

    def load_backbone(self, state: TrainState, state_dict) -> TrainState:
        """Ingest a torch backbone checkpoint into the provider variables."""
        assert self.provider is not None
        consts, provider_vars = split_provider_variables(state.constants)
        loaded = self.provider.load_torch_state_dict(provider_vars, state_dict)
        return state.replace(constants=attach_provider_variables(consts, loaded))

    # ------------------------------------------------------------- features
    @functools.partial(jax.jit, static_argnums=(0, 3), static_argnames=("use_ema",))
    def extract_features(self, state: TrainState, batch, use_ema: bool = True):
        batch = self.with_image_features(state, batch)
        v = self._variables(state, use_ema)
        enc_vars = {
            "params": v["params"].get("pts_encoder"),
            "batch_stats": v["batch_stats"].get("pts_encoder"),
        }
        if self.cfg.model.pts_encoder == "pointnet2" and self.cfg.model.dino == "none":
            # eval fast path: fused SA-scale Pallas kernel, folded BatchNorms
            # (module-parity tested; see models/fast_encoder.py)
            pts_feat = fast_cls_forward(
                enc_vars, batch["pts"], self.cfg.model.pointnet2
            )
        elif self.cfg.model.pts_encoder == "pointnet2" and self.cfg.model.dino == "pointwise":
            # flagship path: DINO fusion + per-point gather via the module,
            # then the fused-kernel Fus encoder
            fused = self.model.apply(
                v, batch["dino_layers"], method=GFObjectPose.fuse_dino_layers
            )
            rgb = self.model.apply(
                v, fused, batch["roi_xs"], batch["roi_ys"],
                method=GFObjectPose.pointwise_rgb_feat,
            )
            inp = jnp.concatenate(
                [batch["pts"], jax.lax.stop_gradient(rgb)], axis=-1
            )
            pts_feat = fast_fus_forward(enc_vars, inp, self.cfg.model.pointnet2)
        else:
            pts_feat = self.model.apply(
                v, batch, False, method=GFObjectPose.extract_pts_feature
            )
        rgb_feat = (
            self.model.apply(v, batch, method=GFObjectPose.extract_global_rgb_feature)
            if self.cfg.model.dino == "global"
            else None
        )
        return pts_feat, rgb_feat

    def denoiser_fn(self, state: TrainState, pts_feat, rgb_feat, use_ema: bool = True):
        """Pure (x, sigma) -> denoised closure (sde 'edm' decoder agents)."""
        assert self.use_decoder
        v = self._variables(state, use_ema)

        def fn(x, sigma):
            return self.model.apply(
                v, pts_feat, rgb_feat, x, sigma, method=GFObjectPose.denoise
            )

        return fn

    def score_fn(self, state: TrainState, pts_feat, rgb_feat, use_ema: bool = True):
        """Pure (x, t) -> score closure for the samplers."""
        v = self._variables(state, use_ema)
        if self.use_decoder:
            # score from the denoiser: s(x, t) = (D(x; sigma) - x) / sigma^2
            # with sigma = marginal std (t and sigma interchangeable for EDM)
            dfn = self.denoiser_fn(state, pts_feat, rgb_feat, use_ema)

            def fn(x, t):
                sigma = self.marginal_std_fn(t)
                return (dfn(x, sigma) - x) / (sigma**2 + 1e-12)

            return fn
        if self.agent_type == "score":
            # fast path: loop-invariant first-layer rows precomputed, heads
            # fused (parity-tested vs the module in tests/test_models.py)
            return make_fast_score_fn(
                v["params"]["pose_net"],
                v["constants"]["pose_net"],
                self.model.marginal_std_fn,
                pts_feat,
                rgb_feat,
                pose_dim=self.cfg.model.pose_dim,
                regression_head=self.cfg.model.regression_head,
                # uniform_t=False: measured slower on v5e when this XLA fast
                # path WAS the fixed-grid sampler (the (1, .) t-row ops break
                # fusion). Since the fused RK4 kernel (ops/ode_rk4.py) took
                # over method='fixed', this closure only serves the adaptive
                # RK45 / PC / likelihood paths, where step counts are dynamic
                # and the t-row precompute cannot amortize — keep it off.
                uniform_t=False,
                compute_dtype=self.cfg.model.score_dtype,
            )

        def fn(x, t):
            def e(p):
                out = self.model.apply(
                    v, pts_feat, rgb_feat, p, t, False, method=GFObjectPose.energy
                )
                return jnp.sum(out)

            return jax.grad(e)(x)

        return fn

    # ------------------------------------------------------- distillation
    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step_distilled(self, state: TrainState, teacher_state: TrainState, batch, key):
        """Score distillation: the DSM target is the TEACHER's score evaluated
        with the teacher's own features on the same perturbed poses
        (reference: losses.py:81-86, trainer --distillation path). The teacher
        is this same agent architecture with frozen ``teacher_state`` (EMA
        params)."""
        k_aug, k_drop, k_loss, _ = jax.random.split(key, 4)
        batch = self.with_image_features(state, batch)

        teacher_feat, teacher_rgb = self._teacher_features(teacher_state, batch)
        t_vars = self._variables(teacher_state, use_ema=True)

        def teacher_score(x, t):
            return self.model.apply(
                t_vars, teacher_feat, teacher_rgb, x, t, method=GFObjectPose.score
            )

        def loss_fn(params):
            variables = {
                "params": params,
                "batch_stats": state.batch_stats,
                "constants": state.constants,
            }
            pts_feat, mut = self.model.apply(
                variables,
                batch,
                True,
                method=GFObjectPose.extract_pts_feature,
                mutable=["batch_stats"],
                rngs={"aug": k_aug, "dropout": k_drop},
            )
            rgb_feat = (
                self.model.apply(variables, batch, method=GFObjectPose.extract_global_rgb_feature)
                if self.cfg.model.dino == "global"
                else None
            )
            run_vars = {
                "params": params,
                "batch_stats": mut["batch_stats"],
                "constants": state.constants,
            }

            def sfn(x, t):
                return self.model.apply(
                    run_vars, pts_feat, rgb_feat, x, t, method=GFObjectPose.score
                )

            loss = dsm_loss(
                k_loss,
                sfn,
                batch["zero_mean_gt_pose"],
                self.sde,
                self.cfg.train.repeat_num,
                teacher_score_fn=teacher_score,
            )
            return loss, (mut, {"loss": loss, "distill_loss": loss})

        (loss, (mut, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        finite = jnp.isfinite(loss)
        new_params = _tree_where(finite, new_params, state.params)
        new_opt_state = _tree_where(finite, new_opt_state, state.opt_state)
        ema_params, ema_updates = ema_update(
            state.ema_params, new_params, state.ema_updates, self.cfg.train.ema_rate
        )
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=_tree_where(finite, mut["batch_stats"], state.batch_stats),
                opt_state=new_opt_state,
                ema_params=_tree_where(finite, ema_params, state.ema_params),
                ema_updates=jnp.where(finite, ema_updates, state.ema_updates),
            ),
            metrics,
        )

    def _teacher_features(self, teacher_state: TrainState, batch):
        v = self._variables(teacher_state, use_ema=True)
        pts_feat = self.model.apply(v, batch, False, method=GFObjectPose.extract_pts_feature)
        rgb_feat = (
            self.model.apply(v, batch, method=GFObjectPose.extract_global_rgb_feature)
            if self.cfg.model.dino == "global"
            else None
        )
        return pts_feat, rgb_feat

    # ------------------------------------------------------------ train step
    @functools.partial(jax.jit, static_argnums=(0,))
    def train_steps(self, state: TrainState, batches, key):
        """Run one optimization step per leading-axis slice of ``batches``
        inside a single jit program (lax.scan): the optimizer state stays
        device-resident and host dispatch is amortized — on remote backends
        the per-call round trip (~30 ms) costs as much as a whole step.
        ``batches``: pytree stacked on a leading step axis. Returns
        (state, metrics stacked over steps)."""
        S = jax.tree_util.tree_leaves(batches)[0].shape[0]
        keys = jax.random.split(key, S)

        def body(st, xs):
            b, k = xs
            return self.train_step(st, b, k)

        return jax.lax.scan(body, state, (batches, keys))

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch, key):
        """One optimization step. batch: dict with 'pts' (the RAW camera-frame
        cloud — the encoder consumes it uncentered, matching the reference;
        zero-centering lives only in 'zero_mean_pts'/'pts_center', see
        data/loader.py:51-53 vs ref posenet.py:135),
        'zero_mean_gt_pose', optional dino inputs; energy agents additionally
        'candidate_poses' (B, K, D) + 'candidate_metrics' (B, K, 2) when
        ranking. Returns (new_state, metrics dict)."""
        k_aug, k_drop, k_loss, k_rank = jax.random.split(key, 4)
        # frozen-backbone features computed once, outside the grad closure
        batch = self.with_image_features(state, batch)

        def loss_fn(params):
            variables = {
                "params": params,
                "batch_stats": state.batch_stats,
                "constants": state.constants,
            }
            pts_feat, mut = self.model.apply(
                variables,
                batch,
                True,
                method=GFObjectPose.extract_pts_feature,
                mutable=["batch_stats"],
                rngs={"aug": k_aug, "dropout": k_drop},
            )
            rgb_feat = (
                self.model.apply(variables, batch, method=GFObjectPose.extract_global_rgb_feature)
                if self.cfg.model.dino == "global"
                else None
            )
            run_vars = {
                "params": params,
                "batch_stats": mut["batch_stats"],
                "constants": state.constants,
            }
            if self.use_decoder:
                # EDM: denoiser loss instead of DSM
                # (reference: losses.py:8-45 loss_fn_edm)
                from genpose2_tpu.diffusion.losses import edm_loss

                def dfn(x, sigma):
                    return self.model.apply(
                        run_vars, pts_feat, rgb_feat, x, sigma,
                        method=GFObjectPose.denoise,
                    )

                loss = edm_loss(
                    k_loss,
                    dfn,
                    batch["zero_mean_gt_pose"],
                    sigma_min=self.cfg.sde.edm_sigma_min,
                    sigma_max=self.cfg.sde.edm_sigma_max,
                    repeat=self.cfg.train.repeat_num,
                )
                metrics = {"score_loss": loss}
                metrics["loss"] = loss
                return loss, (mut, metrics)
            if self.agent_type == "score":

                def sfn(x, t):
                    return self.model.apply(
                        run_vars, pts_feat, rgb_feat, x, t, method=GFObjectPose.score
                    )

            else:

                def sfn(x, t):
                    def e(p):
                        return jnp.sum(
                            self.model.apply(
                                run_vars, pts_feat, rgb_feat, p, t, False,
                                method=GFObjectPose.energy,
                            )
                        )

                    return jax.grad(e)(x)

            loss = dsm_loss(
                k_loss, sfn, batch["zero_mean_gt_pose"], self.sde, self.cfg.train.repeat_num
            )
            metrics = {"score_loss": loss}

            if self.agent_type == "energy" and "candidate_poses" in batch:
                cand = batch["candidate_poses"]  # (B, K, D) zero-centered
                B, K, D = cand.shape
                t = jax.random.uniform(k_rank, (B * K, 1), cand.dtype, 1e-5, 1e-4)
                feat_rep = jnp.repeat(pts_feat, K, axis=0)
                rgb_rep = None if rgb_feat is None else jnp.repeat(rgb_feat, K, axis=0)
                energy = self.model.apply(
                    run_vars, feat_rep, rgb_rep, cand.reshape(B * K, D), t, True,
                    method=GFObjectPose.energy,
                ).reshape(B, K, 2)
                sorted_e = sort_results(energy, batch["candidate_metrics"])
                r_loss = ranking_loss(sorted_e)
                metrics["ranking_loss"] = r_loss
                loss = loss + r_loss

            metrics["loss"] = loss
            return loss, (mut, metrics)

        (loss, (mut, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN guard: skip the whole update on a non-finite loss
        # (reference: posenet_agent.py:711-713)
        finite = jnp.isfinite(loss)
        new_params = _tree_where(finite, new_params, state.params)
        new_opt_state = _tree_where(finite, new_opt_state, state.opt_state)
        new_bs = _tree_where(finite, mut["batch_stats"], state.batch_stats)

        ema_params, ema_updates = ema_update(
            state.ema_params, new_params, state.ema_updates, self.cfg.train.ema_rate
        )
        ema_params = _tree_where(finite, ema_params, state.ema_params)

        metrics["lr"] = self.lr_schedule(state.step)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            ema_params=ema_params,
            ema_updates=jnp.where(finite, ema_updates, state.ema_updates),
        )
        return new_state, metrics

    # -------------------------------------------------------------- sampling
    @functools.partial(
        jax.jit,
        static_argnums=(0,),
        static_argnames=("repeat_num", "T0", "use_ema", "method", "num_steps"),
    )
    def sample_candidates(
        self,
        state: TrainState,
        batch,
        key,
        repeat_num: int = 50,
        T0: float = 1.0,
        init_x: Optional[jnp.ndarray] = None,
        use_ema: bool = True,
        method: str = "rk45",
        num_steps: int = 500,
        features=None,
    ):
        """Sample ``repeat_num`` pose candidates per object with the on-device
        probability-flow ODE. Returns (B, K, D) poses in the camera frame
        (pts_center re-added). ``init_x`` (B, D) or (B, K, D), zero-centered,
        warm-starts tracking (reference: posenet_agent.py:490-584).
        ``features``: optional (pts_feat, rgb_feat) precomputed by
        ``extract_features`` — pass it when the caller also needs the features
        (e.g. for ScaleNet) so the frozen backbone + encoder run once per
        batch instead of once per stage."""
        if features is not None:
            pts_feat, rgb_feat = features
        else:
            pts_feat, rgb_feat = self.extract_features(state, batch, use_ema)
        B = pts_feat.shape[0]
        K = repeat_num
        D = self.cfg.model.pose_dim
        feat_rep = jnp.repeat(pts_feat, K, axis=0)
        rgb_rep = None if rgb_feat is None else jnp.repeat(rgb_feat, K, axis=0)
        sfn = self.score_fn(state, feat_rep, rgb_rep, use_ema)
        center = batch.get("pts_center")
        center_rep = None if center is None else jnp.repeat(center, K, axis=0)
        if init_x is not None:
            if init_x.ndim == 2:
                init_x = jnp.repeat(init_x, K, axis=0)
            else:
                init_x = init_x.reshape(B * K, D)
        if method == "edm":
            # Karras-Heun sampler on the EDM denoiser
            # (reference: samplers.py:261-340 cond_edm_sampler)
            assert self.use_decoder, "--sampler_mode edm requires --sde_mode edm"
            # edm always starts from fresh latents at sigma_max; a tracking
            # warm start (init_x / T0 < 1) would be silently dropped — fail
            # loudly instead of misleading the caller
            if init_x is not None or T0 != 1.0:
                raise ValueError(
                    "method='edm' does not support warm starts: init_x must "
                    "be None and T0 must be 1.0 (use method='rk45' for "
                    "tracking-style warm-started sampling)"
                )
            from genpose2_tpu.diffusion import edm_sampler

            dfn = self.denoiser_fn(state, feat_rep, rgb_rep, use_ema)
            poses = edm_sampler(
                key,
                dfn,
                B * K,
                D,
                num_steps=num_steps,
                sigma_min=self.cfg.sde.edm_sigma_min,
                sigma_max=self.cfg.sde.edm_sigma_max,
                pose_mode=self.cfg.model.pose_mode,
                pts_center=center_rep,
            )
            return poses.reshape(B, K, D)
        if method == "pc":
            # Predictor-Corrector sampler (reference sampler_mode 'pc',
            # samplers.py:113-177)
            poses = pc_sampler(
                key,
                sfn,
                self.sde,
                B * K,
                D,
                num_steps=num_steps,
                snr=self.cfg.sampler.snr,
                init_x=init_x,
                pose_mode=self.cfg.model.pose_mode,
                pts_center=center_rep,
            )
            return poses.reshape(B, K, D)
        fused_weights = None
        if (
            method == "fixed"
            and self.cfg.sampler.fused_fixed
            and self.agent_type == "score"
            and not self.use_decoder
        ):
            # whole-integration Pallas kernel (ops/ode_rk4.py): fold the
            # score net once per call; the sampler then runs ONE program
            # instead of ~29 fusions per RK4 step
            from genpose2_tpu.models.scorenet import fast_score_weights

            v = self._variables(state, use_ema)
            fused_weights = fast_score_weights(
                v["params"]["pose_net"],
                v["constants"]["pose_net"],
                feat_rep,
                rgb_rep,
                pose_dim=D,
                regression_head=self.cfg.model.regression_head,
            )
        poses, _ = ode_sampler(
            key,
            sfn,
            self.sde,
            B * K,
            D,
            T0=T0,
            init_x=init_x,
            num_steps=num_steps,
            pose_mode=self.cfg.model.pose_mode,
            pts_center=center_rep,
            method=method,
            atol=self.cfg.sampler.atol,
            rtol=self.cfg.sampler.rtol,
            max_steps=self.cfg.sampler.max_rk45_steps,
            fused_weights=fused_weights,
            compute_dtype=self.cfg.model.score_dtype,
        )
        return poses.reshape(B, K, D)

    @functools.partial(
        jax.jit, static_argnums=(0,), static_argnames=("use_ema", "fixed_t")
    )
    def get_energy(
        self,
        state: TrainState,
        batch,
        poses,
        use_ema: bool = True,
        fixed_t: Optional[float] = 1e-5,
        key: Optional[jax.Array] = None,
    ):
        """Energy of candidate poses (B, K, D) -> (B, K, 2). Poses are given in
        the camera frame; the point-cloud center is subtracted to match the
        zero-centered training distribution (reference: posenet_agent.py:608-705).
        """
        assert self.agent_type == "energy"
        pts_feat, rgb_feat = self.extract_features(state, batch, use_ema)
        B, K, D = poses.shape
        center = batch.get("pts_center")
        if center is not None:
            poses = poses.at[..., -3:].add(-center[:, None, :])
        flat = poses.reshape(B * K, D)
        if fixed_t is None:
            t = jax.random.uniform(key, (B * K, 1), flat.dtype, 1e-5, 1e-4)
        else:
            t = jnp.full((B * K, 1), fixed_t, flat.dtype)
        feat_rep = jnp.repeat(pts_feat, K, axis=0)
        rgb_rep = None if rgb_feat is None else jnp.repeat(rgb_feat, K, axis=0)
        v = self._variables(state, use_ema)
        energy = self.model.apply(
            v, feat_rep, rgb_rep, flat, t, True, method=GFObjectPose.energy
        )
        return energy.reshape(B, K, 2)


def calc_likelihood(agent: "PoseAgent", state: TrainState, batch, poses, key=None):
    """Exact log-likelihood (bits) of camera-frame poses (B, K, D) under the
    learned score field (reference: posenet.py:278-292 -> samplers.py:25-110).
    """
    from genpose2_tpu.diffusion import ode_likelihood

    key = jax.random.PRNGKey(0) if key is None else key
    pts_feat, rgb_feat = agent.extract_features(state, batch)
    B, K, D = poses.shape
    center = batch.get("pts_center")
    if center is not None:
        poses = poses.at[..., -3:].add(-center[:, None, :])
    feat_rep = jnp.repeat(pts_feat, K, axis=0)
    rgb_rep = None if rgb_feat is None else jnp.repeat(rgb_feat, K, axis=0)
    sfn = agent.score_fn(state, feat_rep, rgb_rep)
    _, ll = ode_likelihood(
        key,
        sfn,
        agent.sde,
        poses.reshape(B * K, D),
        atol=agent.cfg.sampler.atol,
        rtol=agent.cfg.sampler.rtol,
        max_steps=agent.cfg.sampler.max_rk45_steps,
    )
    return ll.reshape(B, K)


class ScaleAgent:
    """ScaleNet trained on frozen score-encoder features
    (reference: runners/trainer.py:190-254, posenet_agent.py:290-314)."""

    def __init__(self, cfg: Config, steps_per_epoch: int = 1000):
        self.cfg = cfg
        self.model = ScaleNet(cfg.model.scale_embedding)
        self.lr_schedule = make_lr_schedule(cfg, steps_per_epoch)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip), optax.adam(self.lr_schedule)
        )

    def init_state(self, key, pts_dim: int = 1024) -> TrainState:
        variables = self.model.init(
            key, jnp.zeros((1, pts_dim)), jnp.zeros((1, 3, 3))
        )
        params = variables["params"]
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats={},
            constants={},
            opt_state=self.tx.init(params),
            ema_params=ema_init(params),
            ema_updates=jnp.asarray(0, jnp.float32),
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch, key):
        """batch: 'pts_feat' (B, F) frozen features, 'axes_training'
        (B, S, 3, 3) noised GT axes, 'gt_length' (B, 3)."""
        axes = batch["axes_training"]
        B, S = axes.shape[:2]

        def loss_fn(params):
            feat_rep = jnp.repeat(batch["pts_feat"], S, axis=0)
            pred = self.model.apply(
                {"params": params}, feat_rep, axes.reshape(B * S, 3, 3)
            )
            gt = jnp.repeat(batch["gt_length"], S, axis=0)
            return scale_loss(pred, gt)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        finite = jnp.isfinite(loss)
        new_params = _tree_where(finite, new_params, state.params)
        new_opt_state = _tree_where(finite, new_opt_state, state.opt_state)
        ema_params, ema_updates = ema_update(
            state.ema_params, new_params, state.ema_updates, self.cfg.train.ema_rate
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=_tree_where(finite, ema_params, state.ema_params),
            ema_updates=jnp.where(finite, ema_updates, state.ema_updates),
        )
        return new_state, {"loss": loss}

    @functools.partial(jax.jit, static_argnums=(0,))
    def predict(self, state: TrainState, pts_feat, axes, use_ema: bool = True):
        params = state.ema_params if use_ema else state.params
        return self.model.apply({"params": params}, pts_feat, axes)
