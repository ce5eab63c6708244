"""Batching + device feeding.

The reference uses torch DataLoader workers + a ragged collate
(dataset.py:172-285). Here every sample is already static-shape, so a batch
is a dense dict of numpy arrays ready for jax device_put:
  points (B, N, 4) f32, gt_boxes (B, MAX_GT, 8) f32 zero-padded.

MAX_GT is a fixed pad (bucketed) so the jitted train step compiles once.
"""
from __future__ import annotations

import numpy as np


MAX_GT_DEFAULT = 64


def collate_batch(samples: list[dict], max_gt: int = MAX_GT_DEFAULT) -> dict:
    batch = {}
    batch["frame_id"] = [s["frame_id"] for s in samples]
    if "calib" in samples[0]:
        batch["calib"] = [s["calib"] for s in samples]
    if "image_shape" in samples[0]:
        batch["image_shape"] = [s["image_shape"] for s in samples]
    batch["points"] = np.stack([s["points"] for s in samples]).astype(np.float32)
    if "gt_boxes" in samples[0]:
        width = max((s["gt_boxes"].shape[1] for s in samples), default=8)
        gt = np.zeros((len(samples), max_gt, width), np.float32)
        for i, s in enumerate(samples):
            n = min(len(s["gt_boxes"]), max_gt)
            gt[i, :n] = s["gt_boxes"][:n]
        batch["gt_boxes"] = gt
    batch["batch_size"] = len(samples)
    return batch


class DataLoader:
    """Single-process loader with deterministic epoch shuffling.

    (The reference uses torch multiprocessing workers; this host has one
    core in CI — a native prefetch pipeline is a planned upgrade.)
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool, max_gt: int = MAX_GT_DEFAULT,
                 drop_last: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_gt = max_gt
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            if not self.drop_last and len(idx) < self.batch_size:
                # pad the tail batch by wrapping (keeps static shapes); the
                # eval loop de-dupes by frame_id
                idx = np.concatenate([idx, order[: self.batch_size - len(idx)]])
            yield collate_batch([self.dataset[int(i)] for i in idx], self.max_gt)


def build_dataloader(dataset_cfg, class_names, batch_size, root_path=None, training=True,
                     logger=None, total_epochs=1, merge_all_iters_to_one_epoch=False,
                     max_gt: int = MAX_GT_DEFAULT, seed: int = 0):
    name = dataset_cfg.get("DATASET", "KittiDataset") \
        if hasattr(dataset_cfg, "get") else "KittiDataset"
    if name == "NuScenesDataset":
        from .nuscenes_dataset import NuScenesDataset as cls_
    elif name == "WaymoDataset":
        from .waymo_dataset import WaymoDataset as cls_
    else:
        from .kitti_dataset import KittiDataset as cls_

    dataset = cls_(
        dataset_cfg=dataset_cfg, class_names=class_names, training=training,
        root_path=root_path, logger=logger,
    )
    if merge_all_iters_to_one_epoch:
        dataset.merge_all_iters_to_one_epoch(True, total_epochs)
    loader = DataLoader(dataset, batch_size, shuffle=training, max_gt=max_gt,
                        drop_last=training, seed=seed)
    return dataset, loader
