"""Multi-video tracking multiplexer: fills the chip by batching frames from
many concurrent video streams into one tracking step.

reference: runners/evaluation_tracking.py:219-331 — up to 30 concurrent video
dataloaders are drained round-robin, their frame-batches concatenated to
~batch_size objects with split bookkeeping, and each stream's prev_pose is
carried between its own frames. Completed streams are replaced by unopened
videos. Here the concatenated batch is additionally PADDED to a fixed object
budget so the jitted tracking step compiles once (the reference recompiles
nothing because torch is eager; under jit a varying batch would retrace).

Pose propagation is per-stream state; there is no cross-stream communication
(on a mesh, streams ride the 'data' axis; SURVEY §2.8)."""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpose2_tpu.data.loader import process_batch
from genpose2_tpu.eval.metrics import batch_criterion, compute_metrics
from genpose2_tpu.eval.tracking import PoseTracker


class _Stream:
    def __init__(self, video, sid):
        self.video = video
        self.sid = sid
        self.frame_idx = 0
        self.prev_pose = None
        self.results: List[dict] = []

    def next_frame(self):
        if self.frame_idx >= len(self.video):
            return None
        try:
            batch = self.video[self.frame_idx]
        except ValueError:
            return None  # failed video (already logged by the dataset)
        self.frame_idx += 1
        return batch


def _pad_batch(batch: dict, target: int):
    n = batch["pts"].shape[0]
    if n == target:
        return batch
    pad = target - n

    def pad_arr(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        reps = np.concatenate([np.asarray(x), np.repeat(np.asarray(x[-1:]), pad, axis=0)])
        return jnp.asarray(reps)

    return {k: pad_arr(v) if not isinstance(v, list) else v for k, v in batch.items()}


def track_videos_multiplexed(
    tracker: PoseTracker,
    videos: Iterable,
    key: jax.Array,
    max_streams: int = 30,
    object_budget: int = 128,
    pose_mode: str = "rot_matrix",
    progress: Optional[Callable] = None,
):
    """Run tracking over all videos; returns per-video lists of per-frame
    results (rotation/translation/lengths + gt/sym for metrics)."""
    videos = list(videos)
    pending = list(range(len(videos)))
    active: List[_Stream] = []
    finished: Dict[int, List[dict]] = {}

    def refill():
        while len(active) < max_streams and pending:
            vid = pending.pop(0)
            active.append(_Stream(videos[vid], vid))

    refill()
    step_i = 0
    while active:
        chunks, owners = [], []
        total = 0
        done_streams = []
        for s in list(active):
            raw = s.next_frame()
            if raw is None:
                finished[s.sid] = s.results
                done_streams.append(s)
                continue
            batch = process_batch(raw, pose_mode)
            n = batch["pts"].shape[0]
            if total + n > object_budget and total > 0:
                s.frame_idx -= 1  # put the frame back
                break
            # a single frame larger than the budget is admitted alone and
            # processed in budget-size slices below (objects are independent,
            # so slicing the step is exact)
            chunks.append((s, batch, n))
            total += n
            if total > object_budget - 8 or n > object_budget:
                break
        for s in done_streams:
            active.remove(s)
        refill()
        if not chunks:
            if not active:
                break
            continue

        # concat + pad to the fixed object budget
        keys_ = [k for k in chunks[0][1] if not isinstance(chunks[0][1][k], list)]
        big = {
            k: jnp.concatenate([c[1][k] for c in chunks], axis=0) for k in keys_
        }
        k_step = jax.random.fold_in(key, step_i)
        step_i += 1
        prevs = []
        for s, batch, n in chunks:
            if s.prev_pose is None:
                s.prev_pose = tracker.init_from_gt(
                    jax.random.fold_in(k_step, s.sid),
                    batch["gt_rotation"],
                    batch["gt_translation"],
                )
            prevs.append(s.prev_pose)
        prev = jnp.concatenate(prevs, axis=0)
        n_real = big["pts"].shape[0]

        # run in budget-size slices (normally exactly one): handles frames
        # with more objects than the budget without a negative pad
        # (reference slices arbitrary-size batches eagerly,
        # evaluation_tracking.py:261-331)
        outs = []
        for off in range(0, n_real, object_budget):
            sl = slice(off, off + object_budget)
            sub = {k: v[sl] for k, v in big.items()}
            sub_prev = prev[sl]
            m = sub["pts"].shape[0]
            sub = _pad_batch(sub, object_budget)
            if m < object_budget:
                sub_prev = jnp.concatenate(
                    [sub_prev, jnp.repeat(sub_prev[-1:], object_budget - m, axis=0)],
                    axis=0,
                )
            o = tracker.step(sub, sub_prev, jax.random.fold_in(k_step, off))
            outs.append({k2: v[:m] for k2, v in o.items()})
        out = {k2: jnp.concatenate([o[k2] for o in outs], axis=0) for k2 in outs[0]}

        off = 0
        for s, batch, n in chunks:
            sl = slice(off, off + n)
            s.prev_pose = out["prev_pose"][sl]
            s.results.append(
                {
                    "rotation": np.asarray(out["rotation"][sl]),
                    "translation": np.asarray(out["translation"][sl]),
                    "lengths": np.asarray(out["lengths"][sl]),
                    "gt_rotation": np.asarray(batch["gt_rotation"]),
                    "gt_translation": np.asarray(batch["gt_translation"]),
                    "gt_lengths": np.asarray(batch["bbox_side_len"]),
                    "sym_info": np.asarray(batch["sym_info"]),
                    "class_label": np.asarray(batch["class_label"]),
                }
            )
            off += n
            if progress:
                progress(n)
    return [finished.get(i, []) for i in range(len(videos))]


def tracking_metrics(all_video_results):
    """Concatenate per-frame tracking results across videos into the standard
    metric family (reference: evaluation_tracking.py:334-384)."""
    ious, degs, shts, cls = [], [], [], []
    for results in all_video_results:
        for r in results:
            iou, deg, sht = batch_criterion(
                jnp.asarray(r["rotation"]),
                jnp.asarray(r["translation"]),
                jnp.asarray(r["lengths"]),
                jnp.asarray(r["gt_rotation"]),
                jnp.asarray(r["gt_translation"]),
                jnp.asarray(r["gt_lengths"]),
                jnp.asarray(r["sym_info"]),
            )
            ious.append(np.asarray(iou))
            degs.append(np.asarray(deg))
            shts.append(np.asarray(sht))
            cls.append(np.asarray(r["class_label"]))
    return compute_metrics(
        np.concatenate(ious), np.concatenate(degs), np.concatenate(shts),
        class_labels=np.concatenate(cls),
    )
