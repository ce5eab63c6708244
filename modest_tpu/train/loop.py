"""Epoch-level train / eval loops (reference tools/train_utils/train_utils.py
+ tools/eval_utils/eval_utils.py)."""
from __future__ import annotations

import pickle
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import prefetch_to_device
from .checkpoint import save_checkpoint
from .optim import current_lr
from .state import make_eval_step, make_train_multi_step, make_train_step

_CAMERA_KEYS = ("images", "trans_lidar_to_cam", "trans_cam_to_img",
                "depth_maps", "gt_boxes2d")


def model_inputs(batch, model_cfg=None, eval_mode: bool = False):
    """Batch dict → the `points` argument of the train/eval steps: the point
    tensor for lidar models, a dict of camera inputs for CaDDN. Dispatch is
    on the MODEL config — a lidar model may legally train on a dataset whose
    GET_ITEM_LIST also loads images. Eval drops the train-only supervision
    tensors (depth_maps, gt_boxes2d) — dead inputs that would otherwise ship
    ~2 MB/frame of depth map host→device per eval batch."""
    is_camera = (model_cfg is not None
                 and str(model_cfg.get("NAME", "")) == "CaDDN")
    if is_camera or (model_cfg is None and "images" in batch):
        keys = _CAMERA_KEYS[:3] if eval_mode else _CAMERA_KEYS
        return {k: jnp.asarray(batch[k]) for k in keys if k in batch}
    return jnp.asarray(batch["points"])


def train_model(model, model_cfg, optimizer, state, loader, *, mesh=None,
                start_epoch: int, total_epochs: int, ckpt_manager=None,
                ckpt_save_interval: int = 1, logger=None, rng_seed: int = 666,
                log_interval: int = 50, merge_all_iters_to_one_epoch: bool = False,
                metrics_logger=None, steps_per_dispatch: int = 1):
    train_step = make_train_step(model, model_cfg, optimizer, mesh)
    spd = max(int(steps_per_dispatch), 1)
    multi_step = (make_train_multi_step(model, model_cfg, optimizer, mesh)
                  if spd > 1 else None)
    rng = jax.random.PRNGKey(rng_seed)
    log = logger.info if logger else print

    def run_epoch(epoch, batches, its_this_epoch):
        nonlocal state
        t0 = time.time()
        n_it = 0
        last_metrics = {}
        last_step = None  # (metrics pytree, scan index or None)
        pend = []  # (points, gt) awaiting a full steps_per_dispatch group

        def do_log(metrics, idx=None, it=None, spd_group=1):
            # idx: scan index within a multi-step group (None = single step);
            # it: the iteration number this line reports (defaults to group
            # end n_it). Metrics are recorded at the step the scan index
            # actually was (state.step - (spd-1-idx)), not the group-end
            # step, so per-step curves don't collide when
            # steps_per_dispatch > 1 (ADVICE r4). lr is read from the
            # group-end opt_state — the schedule moved spd-1-idx steps past
            # this point, a known approximation for intermediate lines.
            nonlocal last_metrics
            last_metrics = {
                k: float(v if idx is None else v[idx]) for k, v in metrics.items()}
            lr = current_lr(state.opt_state)
            step = int(state.step) - (0 if idx is None else spd_group - 1 - idx)
            log(
                f"epoch {epoch} it {n_it if it is None else it}/{its_this_epoch} "
                f"loss {last_metrics['loss']:.4f} lr {lr:.6f}"
            )
            if metrics_logger is not None:
                metrics_logger.log(step, {**last_metrics, "lr": lr},
                                   prefix="train/")

        def flush_pending():
            # tail shorter than the group: bit-identical single steps
            nonlocal state, n_it, last_step
            for pts, gt in pend:
                state, metrics = train_step(state, pts, gt, rng)
                n_it += 1
                last_step = (metrics, None)
                if n_it % log_interval == 0:
                    do_log(metrics)
            pend.clear()

        for batch in batches:
            pts = model_inputs(batch, model_cfg)
            gt = jnp.asarray(batch["gt_boxes"])
            if multi_step is None:
                state, metrics = train_step(state, pts, gt, rng)
                n_it += 1
                last_step = (metrics, None)
                if n_it % log_interval == 0:
                    do_log(metrics)
            else:
                pend.append((pts, gt))
                if len(pend) == spd:
                    state, metrics = multi_step(
                        state, jnp.stack([p for p, _ in pend]),
                        jnp.stack([g for _, g in pend]), rng)
                    lo, n_it = n_it, n_it + spd
                    last_step = (metrics, spd - 1)
                    pend.clear()
                    for j in range(lo + 1, n_it + 1):
                        if j % log_interval == 0:
                            do_log(metrics, idx=j - lo - 1, it=j, spd_group=spd)
            if n_it + len(pend) >= its_this_epoch:
                flush_pending()
                break
        flush_pending()
        last_metrics = ({k: float(v if last_step[1] is None else v[last_step[1]])
                         for k, v in last_step[0].items()}
                        if last_step is not None else {})
        log(
            f"epoch {epoch} done in {time.time() - t0:.1f}s "
            + " ".join(f"{k}={v:.4f}" for k, v in last_metrics.items())
        )
        if ckpt_manager is not None and (epoch + 1) % ckpt_save_interval == 0:
            save_checkpoint(ckpt_manager, jax.device_get(state), epoch + 1)

    if merge_all_iters_to_one_epoch:
        # the merged dataset already holds total_epochs × N samples: ONE
        # pass over the loader is the whole training run, checkpointed every
        # len/total_epochs iterations (reference train_utils.train_model —
        # iterating the merged loader per epoch would train total_epochs²
        # effective epochs)
        its_per_epoch = max(len(loader) // max(total_epochs, 1), 1)
        loader.set_epoch(0)
        it = iter(prefetch_to_device(loader, mesh, size=2))
        for _ in range(start_epoch * its_per_epoch):  # resume: skip consumed
            next(it, None)
        for epoch in range(start_epoch, total_epochs):
            run_epoch(epoch, it, its_per_epoch)
    else:
        for epoch in range(start_epoch, total_epochs):
            loader.set_epoch(epoch)
            run_epoch(epoch, prefetch_to_device(loader, mesh, size=2),
                      len(loader))
    return state


def _trim_predictions(final, batch):
    """Device outputs (padded) → per-sample trimmed numpy pred dicts."""
    boxes = np.asarray(final["boxes"])
    scores = np.asarray(final["scores"])
    labels = np.asarray(final["labels"])
    valid = np.asarray(final["valid"])
    preds = []
    for i in range(len(boxes)):
        v = valid[i]
        preds.append(
            {
                "pred_boxes": boxes[i][v],
                "pred_scores": scores[i][v],
                "pred_labels": labels[i][v].astype(int),
            }
        )
    return preds


def _recall_update(recall_dict, final, gt_boxes, thresh_list):
    """Online roi/rcnn recall vs gt (reference detector3d_template:283-325)."""
    import jax.numpy as jnp

    from ..ops.iou3d import boxes_iou3d

    boxes = np.asarray(final["boxes"])
    valid = np.asarray(final["valid"])
    rois = np.asarray(final.get("rois")) if final.get("rois") is not None else None
    for i in range(len(boxes)):
        gt = gt_boxes[i]
        gt = gt[np.abs(gt).sum(1) > 0]
        if gt.shape[0] == 0:
            continue
        recall_dict["gt"] = recall_dict.get("gt", 0) + gt.shape[0]
        dets = boxes[i][valid[i]]
        for name, cand in (("rcnn", dets), ("roi", rois[i] if rois is not None else None)):
            if cand is None:
                continue
            if cand.shape[0] == 0:
                ious = np.zeros((1, gt.shape[0]))
            else:
                ious = np.asarray(
                    boxes_iou3d(jnp.asarray(cand[:, :7], jnp.float32),
                                jnp.asarray(gt[:, :7], jnp.float32))
                )
            for t in thresh_list:
                key = f"{name}_{t}"
                recall_dict[key] = recall_dict.get(key, 0) + int((ious.max(0) > t).sum())
    return recall_dict


def _local_rows(x):
    """Batch-sharded global array → THIS process's rows (multi-host eval:
    jax.device_get on a global array spanning other hosts' devices raises;
    each process handles its own slice, merged afterwards)."""
    if jax.process_count() > 1 and hasattr(x, "addressable_shards"):
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def eval_one_epoch(model, model_cfg, state, loader, dataset, class_names, *,
                   mesh=None, result_dir=None, logger=None, save_to_file=False):
    eval_step = make_eval_step(model, model_cfg, mesh)
    log = logger.info if logger else print
    det_annos = []
    seen = set()
    recall_dict = {}
    thresh_list = list(model_cfg.POST_PROCESSING.RECALL_THRESH_LIST)
    t0 = time.time()
    n_frames = 0
    for batch in prefetch_to_device(loader, mesh, size=2):
        final = eval_step(state, model_inputs(batch, model_cfg, eval_mode=True))
        final = {k: (_local_rows(v) if v is not None else None)
                 for k, v in final.items()}
        preds = _trim_predictions(final, batch)
        # wrap-padded tail-batch duplicates contribute to NOTHING (annos,
        # recall, counts) — they already appeared earlier this epoch
        fresh = [i for i, fid in enumerate(batch["frame_id"])
                 if fid not in seen]
        if "gt_boxes" in batch and fresh:
            sub = np.asarray(fresh)
            final_f = {k: (v[sub] if v is not None else None)
                       for k, v in final.items()}
            recall_dict = _recall_update(
                recall_dict, final_f, np.asarray(batch["gt_boxes"])[sub],
                thresh_list)
        annos = dataset.generate_prediction_dicts(
            batch, preds, class_names,
            output_path=result_dir if save_to_file else None,
        )
        for a in annos:
            if a["frame_id"] in seen:  # wrap-padded tail batch
                continue
            seen.add(a["frame_id"])
            det_annos.append(a)
            n_frames += 1
    sec_per_example = (time.time() - t0) / max(n_frames, 1)
    log(f"eval: {n_frames} frames, {sec_per_example:.4f} sec_per_example")

    if jax.process_count() > 1:
        # merge per-process shards; only process 0 evaluates/saves
        from ..parallel.multihost import merge_results_dist

        merge_dir = Path(result_dir or ".") / "merge_tmp"
        merged = merge_results_dist(det_annos, merge_dir)
        merged_rec = merge_results_dist([recall_dict], merge_dir / "recall")
        if merged is None:  # non-zero process
            return None, {}
        det_annos = [a for a in merged if a is not None]
        recall_dict = {}
        for rd in merged_rec:
            for k, v in rd.items():
                recall_dict[k] = recall_dict.get(k, 0) + v
        n_frames = len(det_annos)

    if recall_dict.get("gt", 0) > 0:
        for t in thresh_list:
            for name in ("roi", "rcnn"):
                k = f"{name}_{t}"
                if k in recall_dict:
                    log(f"recall_{k}: {recall_dict[k] / recall_dict['gt']:.4f}")

    if result_dir is not None:
        result_dir = Path(result_dir)
        result_dir.mkdir(parents=True, exist_ok=True)
        with open(result_dir / "result.pkl", "wb") as f:
            pickle.dump(det_annos, f)

    ret = {"sec_per_example": sec_per_example, "recall": recall_dict}
    ap_str, ap_dict = dataset.evaluation(det_annos, class_names)
    if ap_str is not None:
        log(ap_str)
    ret.update(ap_dict or {})
    return det_annos, ret
