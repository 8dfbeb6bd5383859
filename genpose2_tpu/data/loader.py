"""Host-side batching and prefetching.

Replaces torch DataLoader worker processes
(reference: datasets_omni6dpose.py:515-671) with a thread-pool prefetcher —
cv2/numpy release the GIL for the heavy ops, and threads avoid the pickling
and fork overhead of process workers while the TPU consumes batches
asynchronously. ``process_batch`` is the device-side tail: pose-representation
conversion and zero-centering (reference: datasets_omni6dpose.py:674-754).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from genpose2_tpu.so3.rotations import get_pose_representation


def collate(samples: Sequence[dict]) -> dict:
    """Stack a list of per-object sample dicts into arrays (strings -> list)."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], (str, bytes)):
            out[k] = list(vals)
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


def process_batch(
    batch: dict,
    pose_mode: str = "rot_matrix",
    aug_params: Optional[dict] = None,
    aug_key=None,
) -> dict:
    """Numpy batch -> jnp training batch with zero-centering.

    Keys out: pts, zero_mean_gt_pose, pts_center, gt_pose, plus pass-throughs
    (roi_rgb/roi_xs/roi_ys/sym_info/...). reference: datasets_omni6dpose.py:674-754.

    ``aug_params``: NOCS-style cloud augmentation probabilities
    (cfg PTS_AUG_PARAMS). Exactly as the reference gates it
    (datasets_omni6dpose.py:687-702): applied only when BOTH aug_params is
    set AND the batch is NOCS-style (carries 'old_sym_info'); the augmented
    cloud/rotation/translation feed the standard tail and the deformed sizes
    are discarded, matching the reference's processed_sample contents.
    """
    pts = jnp.asarray(batch["pcl_in"])
    R = jnp.asarray(batch["rotation"])
    t = jnp.asarray(batch["translation"])
    if aug_params is not None and "old_sym_info" in batch:
        from genpose2_tpu.data.augmentation import data_augment

        if aug_key is None:
            raise ValueError("aug_params set but no aug_key — pass a PRNGKey")
        # full sizes = fsnet residual + per-class mean shape
        # (ref data_augmentation.py:263-266 re-derives them the same way)
        gt_s = jnp.asarray(batch["fsnet_scale"]) + jnp.asarray(batch["mean_shape"])
        xyz, R, t, _ = data_augment(
            aug_key,
            aug_params,
            pts[..., :3],
            R,
            t,
            gt_s,
            sym=jnp.asarray(batch["old_sym_info"]),
            model_point=jnp.asarray(batch["model_point"])
            if "model_point" in batch
            else None,
            nocs_scale=jnp.asarray(batch["nocs_scale"])
            if "nocs_scale" in batch
            else None,
            mug_bowl_mask=jnp.asarray(batch["mug_bowl_mask"])
            if "mug_bowl_mask" in batch
            else None,
        )
        pts = pts.at[..., :3].set(xyz) if pts.shape[-1] > 3 else xyz
    rot_repr = get_pose_representation(R, pose_mode)
    gt_pose = jnp.concatenate([rot_repr, t], axis=-1)
    center = jnp.mean(pts[..., :3], axis=1)
    zero_pts = pts.at[..., :3].add(-center[:, None, :])
    zero_gt = gt_pose.at[..., -3:].add(-center)
    out = {
        "pts": pts,  # encoder consumes the raw camera-frame cloud, as the
        # reference does (posenet.py:135 reads data['pts'] from
        # process_batch's non-centered 'pts')
        "zero_mean_pts": zero_pts,
        "gt_pose": gt_pose,
        "zero_mean_gt_pose": zero_gt,
        "pts_center": center,
        "gt_rotation": R,
        "gt_translation": t,
    }
    for k in (
        "sym_info",
        "roi_rgb",
        "roi_xs",
        "roi_ys",
        "roi_center_dir",
        "bbox_side_len",
        "class_label",
        "intrinsics",
        "axes_training",
        "length_training",
        "handle_visibility",
    ):
        if k in batch:
            out[k] = jnp.asarray(batch[k])
    return out


class DataLoader:
    """Threaded prefetching loader over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 4,
        drop_last: bool = False,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        """``shard_index``/``num_shards``: multi-host sharding — every host
        builds the SAME seeded global permutation and keeps a disjoint
        contiguous slice of it (the torch DistributedSampler contract the
        reference imports but never uses, datasets_omni6dpose.py:19).
        ``batch_size`` is the HOST-LOCAL batch size. The permutation is
        truncated to a multiple of ``num_shards`` so shards stay equal-length
        and hosts emit the same number of batches (no stragglers in the
        collective)."""
        assert 0 <= shard_index < num_shards, (shard_index, num_shards)
        assert num_shards <= len(dataset), (
            f"num_shards={num_shards} exceeds dataset size {len(dataset)}: "
            "every shard would be empty"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._epoch = 0

    def _shard_len(self):
        return len(self.dataset) // self.num_shards

    def __len__(self):
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        if hasattr(self.dataset, "epoch"):
            # epoch folds into the dataset's per-sample RNG seed
            self.dataset.epoch = self._epoch
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        if self.num_shards > 1:
            n = self._shard_len()
            order = order[self.shard_index * n : (self.shard_index + 1) * n]
        self._epoch += 1
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    q.put(collate(samples))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
