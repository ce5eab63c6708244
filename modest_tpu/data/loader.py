"""Batching + device feeding.

The reference uses torch DataLoader workers + a ragged collate
(dataset.py:172-285). Here every sample is already static-shape, so a batch
is a dense dict of numpy arrays ready for jax device_put:
  points (B, N, 4) f32, gt_boxes (B, MAX_GT, 8) f32 zero-padded.

MAX_GT is a fixed pad (bucketed) so the jitted train step compiles once.

Async input (reference: torch DataLoader num_workers=4 +
DistributedSampler, pcdet/datasets/__init__.py build_dataloader): with
`num_workers > 0` batches are built by forked worker PROCESSES ahead of
consumption. Measured on the flagship config, the augmentation + sampling
path is GIL-bound (many small numpy ops on ~50k-pt clouds: a thread pool
made batch building monotonically SLOWER — 82 ms/batch at 1 thread,
191 ms at 4), so real overlap with the device step needs processes, the
same architecture as the reference's torch workers. Workers inherit the
dataset by fork (no pickling, no accelerator touched in children) and a
collated batch is ~0.8 MB, cheap to pipe back. Each batch is built under
a seed derived from (loader seed, epoch, batch index), so output is
bit-identical for ANY worker count including 0 — stronger than the
reference's per-worker RNG streams. `prefetch_to_device` additionally
starts the host→device transfer (async under jit dispatch) one batch
ahead. Platforms without fork fall back to in-line building.
"""
from __future__ import annotations

import collections
import multiprocessing as mp

import numpy as np


MAX_GT_DEFAULT = 64

# fork-inherited worker state ({} in the parent; set by _worker_init)
_WORKER = {}


def _worker_init(dataset, max_gt):
    _WORKER["dataset"] = dataset
    _WORKER["max_gt"] = max_gt


def _worker_build(task):
    seed, idx = task
    np.random.seed(seed)
    ds, max_gt = _WORKER["dataset"], _WORKER["max_gt"]
    return collate_batch([ds[int(i)] for i in idx], max_gt)


def collate_batch(samples: list[dict], max_gt: int = MAX_GT_DEFAULT) -> dict:
    batch = {}
    batch["frame_id"] = [s["frame_id"] for s in samples]
    if "calib" in samples[0]:
        batch["calib"] = [s["calib"] for s in samples]
    if "image_shape" in samples[0]:
        batch["image_shape"] = [s["image_shape"] for s in samples]
    if "metadata" in samples[0]:  # nuScenes token / Waymo context, used by eval writers
        batch["metadata"] = [s["metadata"] for s in samples]
    batch["points"] = np.stack([s["points"] for s in samples]).astype(np.float32)
    # camera-model extras (CaDDN): stacked when the dataset provides them
    for key in ("images", "depth_maps", "trans_lidar_to_cam", "trans_cam_to_img"):
        if key in samples[0]:
            batch[key] = np.stack([s[key] for s in samples]).astype(np.float32)
    if "gt_boxes2d" in samples[0]:
        b2d = np.zeros((len(samples), max_gt, 4), np.float32)  # static shape
        for i, s in enumerate(samples):
            n = min(len(s["gt_boxes2d"]), max_gt)
            b2d[i, :n] = s["gt_boxes2d"][:n]
        batch["gt_boxes2d"] = b2d
    if "gt_boxes" in samples[0]:
        width = max((s["gt_boxes"].shape[1] for s in samples), default=8)
        gt = np.zeros((len(samples), max_gt, width), np.float32)
        for i, s in enumerate(samples):
            n = min(len(s["gt_boxes"]), max_gt)
            if len(s["gt_boxes"]) > max_gt:
                import warnings

                warnings.warn(
                    f"collate_batch: frame has {len(s['gt_boxes'])} gt boxes, "
                    f"truncating to max_gt={max_gt} — raise --max_gt to keep "
                    f"all labels (extra boxes are silently unsupervised)")
            gt[i, :n] = s["gt_boxes"][:n]
        batch["gt_boxes"] = gt
    batch["batch_size"] = len(samples)
    return batch


class DataLoader:
    """Epoch loader with deterministic shuffling and optional batch
    prefetch by forked worker PROCESSES (`num_workers` workers, up to
    `num_workers * prefetch_factor` batches in flight, yielded in order;
    see the module docstring for why processes, not threads).

    `use_procs`: None (default) auto-selects — workers requested AND >1
    host core (a single core can't overlap builders with the dispatch
    thread, so inline is strictly faster there); True/False forces the
    fork-pool / inline path regardless (tests pin True to exercise the
    pool on 1-core hosts; batches are bit-identical either way)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool, max_gt: int = MAX_GT_DEFAULT,
                 drop_last: bool = True, seed: int = 0, num_workers: int = 0,
                 prefetch_factor: int = 2, process_shard: tuple | None = None,
                 use_procs: bool | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_gt = max_gt
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.num_workers = num_workers
        self.prefetch_factor = prefetch_factor
        # (process_id, num_processes): every process shuffles the SAME global
        # order (shared seed) then keeps its interleaved slice — the
        # DistributedSampler contract; batch_size is the per-process batch
        self.process_shard = process_shard
        self.use_procs = use_procs

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _local_count(self):
        n = len(self.dataset)
        if self.process_shard is not None:
            pid, nproc = self.process_shard
            n = len(range(pid, n, nproc))
        return n

    def __len__(self):
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        if self.process_shard is not None:
            pid, nproc = self.process_shard
            order = order[pid::nproc]
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    return
                # pad the tail batch by wrapping (keeps static shapes); the
                # eval loop de-dupes by frame_id
                idx = np.concatenate([idx, order[: self.batch_size - len(idx)]])
            yield idx

    def _seed_for(self, batch_i: int) -> int:
        # per-batch augmentation stream: identical output for any worker count
        return (self.seed * 1_000_003 + self.epoch * 100_019 + batch_i) % (2**31)

    def _build(self, idx, batch_i: int):
        np.random.seed(self._seed_for(batch_i))
        return collate_batch([self.dataset[int(i)] for i in idx], self.max_gt)

    def _get_pool(self):
        """Lazily create ONE persistent worker pool, reused across epochs.

        Context preference: fork — workers inherit the dataset by COW page
        sharing (no per-worker pickle of infos/gt-db, the design the module
        docstring promises; torch DataLoader makes the same Linux default).
        Children run pure numpy and never touch the JAX backend, so the
        fork-after-backend-init hazard is limited to held allocator mutexes —
        the same exposure the reference's torch workers accept. forkserver is
        the fallback for platforms without fork; it pickles initargs
        (slower startup, duplicated RAM for big datasets)."""
        if getattr(self, "_pool", None) is not None:
            return self._pool
        methods = mp.get_all_start_methods()
        method = "fork" if "fork" in methods else "forkserver"
        ctx = mp.get_context(method)
        self._pool = ctx.Pool(self.num_workers, initializer=_worker_init,
                              initargs=(self.dataset, self.max_gt))
        return self._pool

    def close(self):
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.terminate()
            pool.join()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        use_procs = self.use_procs
        if use_procs is None:
            # a single-core host (this dev box has nproc=1) can't overlap
            # builders with anything — run inline rather than pay IPC overhead
            use_procs = (mp.cpu_count() or 1) > 1
        use_procs = use_procs and self.num_workers > 0
        if not use_procs:
            for bi, idx in enumerate(self._batch_indices()):
                yield self._build(idx, bi)
            return
        # worker processes; bounded in-flight so results (~0.8 MB each)
        # never pile up faster than the device consumes them
        depth = max(2, self.num_workers * self.prefetch_factor)
        try:
            pool = self._get_pool()
        except Exception as e:  # pool setup failed → inline fallback
            import warnings

            warnings.warn(
                f"loader: worker pool unavailable ({e!r}); running inline — "
                f"ALL prefetch parallelism is lost")
            self.close()
            for bi, idx in enumerate(self._batch_indices()):
                yield self._build(idx, bi)
            return
        pending: collections.deque = collections.deque()
        for bi, idx in enumerate(self._batch_indices()):
            pending.append(
                pool.apply_async(_worker_build, ((self._seed_for(bi), idx),)))
            if len(pending) >= depth:
                yield pending.popleft().get()
        while pending:
            yield pending.popleft().get()


def prefetch_to_device(loader, mesh=None, size: int = 2):
    """Yield batches with device transfer started `size` batches ahead.

    jax.device_put is asynchronous: issuing it early overlaps the host→HBM
    copy (and the worker-thread batch build behind it) with the running
    step. Array entries get batch-dim sharding over `mesh` when given.
    """
    from ..parallel.mesh import shard_batch

    def _put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch)
        return batch

    queue: collections.deque = collections.deque()
    it = iter(loader)
    for batch in it:
        queue.append(_put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def build_dataloader(dataset_cfg, class_names, batch_size, root_path=None, training=True,
                     logger=None, total_epochs=1, merge_all_iters_to_one_epoch=False,
                     max_gt: int = MAX_GT_DEFAULT, seed: int = 0, num_workers: int = 0):
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
    process_shard = None
    try:  # only guard the jax import/backend probe — NOT the divisibility check
        import jax

        nproc = jax.process_count()
        pid = jax.process_index()
    except Exception:
        nproc, pid = 1, 0
    if nproc > 1:
        process_shard = (pid, nproc)
        assert batch_size % nproc == 0, (
            f"global batch_size {batch_size} must divide evenly across "
            f"{nproc} processes — a silent floor would "
            f"change the effective batch/LR schedule")
        batch_size = batch_size // nproc
    loader = DataLoader(dataset, batch_size, shuffle=training, max_gt=max_gt,
                        drop_last=training, seed=seed, num_workers=num_workers,
                        process_shard=process_shard)
    return dataset, loader
