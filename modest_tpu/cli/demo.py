"""CLI: quick inference demo on raw point-cloud files (reference
tools/demo.py).

Usage:
  python -m modest_tpu.cli.demo --cfg_file <model.yaml> --ckpt_dir <dir> \
      --data_path <file-or-dir> [--ext .bin] [--save_dir demo_out]

Loads `.bin` (f32 x C velodyne) or `.npy` point files, runs them through the
config's point-feature encoding + processor pipeline and the detector's eval
step, prints the predicted boxes, and renders a BEV PNG per frame
(`utils/visualize.plot_bev`) — the headless equivalent of the reference's
interactive mayavi window (tools/demo.py:87-97).
"""
from __future__ import annotations

import argparse
import glob
from pathlib import Path

import jax
import numpy as np

from ..data.loader import collate_batch
from ..data.processor import DataProcessor, PointFeatureEncoder
from ..models import build_network
from ..parallel.mesh import make_mesh
from ..train.checkpoint import make_manager, restore_checkpoint
from ..train.loop import _trim_predictions, model_inputs
from ..train.optim import build_optimizer
from ..train.state import create_train_state, make_eval_step
from ..utils.config import cfg_from_list, cfg_from_yaml_file


class DemoDataset:
    """File-list dataset: raw points → the config's eval-time pipeline
    (reference tools/demo.py DemoDataset)."""

    def __init__(self, dataset_cfg, class_names, root_path, ext=".bin"):
        self.dataset_cfg = dataset_cfg
        self.class_names = class_names
        self.ext = ext
        root = Path(root_path)
        files = sorted(glob.glob(str(root / f"*{ext}"))) if root.is_dir() else [str(root)]
        if not files:
            raise FileNotFoundError(f"no *{ext} files under {root}")
        self.sample_file_list = files
        self.point_feature_encoder = PointFeatureEncoder(dataset_cfg.POINT_FEATURE_ENCODING)
        self.data_processor = DataProcessor(
            dataset_cfg.DATA_PROCESSOR, dataset_cfg.POINT_CLOUD_RANGE, training=False
        )
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size
        self.point_cloud_range = np.asarray(dataset_cfg.POINT_CLOUD_RANGE, np.float32)

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        path = self.sample_file_list[index]
        src = len(self.dataset_cfg.POINT_FEATURE_ENCODING.src_feature_list)
        if self.ext == ".bin":
            points = np.fromfile(path, dtype=np.float32).reshape(-1, src)
        elif self.ext == ".npy":
            points = np.load(path).astype(np.float32)
        else:
            raise NotImplementedError(self.ext)
        data_dict = {"points": points, "frame_id": Path(path).stem}
        data_dict = self.point_feature_encoder(data_dict)
        return self.data_processor(data_dict)


def main(argv=None):
    parser = argparse.ArgumentParser(description="quick inference demo")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--ckpt_dir", type=str, default=None,
                        help="checkpoint dir; omit for random weights (smoke)")
    parser.add_argument("--ckpt_epoch", type=int, default=None)
    parser.add_argument("--data_path", type=str, required=True,
                        help="a point-cloud file or a directory of them")
    parser.add_argument("--ext", type=str, default=".bin", choices=[".bin", ".npy"])
    parser.add_argument("--save_dir", type=str, default=None,
                        help="write <frame_id>.png BEV renders here")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from ..utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = cfg_from_yaml_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    if str(cfg.MODEL.get("NAME", "")) == "CaDDN":
        raise SystemExit("demo.py is lidar-only; CaDDN needs camera inputs "
                         "(use cli.test with a KITTI-format dir)")

    dataset = DemoDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.data_path, args.ext)
    print(f"total samples: {len(dataset)}")
    mesh = make_mesh(1)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=dataset)

    sample = collate_batch([dataset[0]])
    sample["gt_boxes"] = np.zeros((1, 1, 8), np.float32)
    optimizer = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    state = create_train_state(model, optimizer, sample)
    if args.ckpt_dir is not None:
        restored, epoch = restore_checkpoint(make_manager(args.ckpt_dir), state,
                                             args.ckpt_epoch)
        assert restored is not None, f"no checkpoint found in {args.ckpt_dir}"
        state = restored
        print(f"loaded epoch {epoch} from {args.ckpt_dir}")
    else:
        print("WARNING: no --ckpt_dir — running with randomly initialized weights")

    eval_step = make_eval_step(model, cfg.MODEL, mesh)
    save_dir = Path(args.save_dir) if args.save_dir else None
    if save_dir is not None:
        save_dir.mkdir(parents=True, exist_ok=True)

    results = []
    for i in range(len(dataset)):
        batch = collate_batch([dataset[i]])
        final = eval_step(state, model_inputs(batch, cfg.MODEL))
        preds = _trim_predictions(jax.device_get(final), batch)[0]
        frame_id = batch["frame_id"][0]
        boxes = np.asarray(preds["pred_boxes"])
        boxes = boxes.reshape(-1, boxes.shape[-1])[:, :7]  # 9-dim velocity coders
        scores = np.asarray(preds["pred_scores"]).reshape(-1)
        labels = np.asarray(preds["pred_labels"]).reshape(-1).astype(int)
        print(f"[{i + 1}/{len(dataset)}] {frame_id}: {len(boxes)} detections")
        for b, s, lb in zip(boxes, scores, labels):
            name = cfg.CLASS_NAMES[lb - 1] if 0 < lb <= len(cfg.CLASS_NAMES) else str(lb)
            print(f"  {name} score={s:.3f} xyz=({b[0]:.2f},{b[1]:.2f},{b[2]:.2f}) "
                  f"lwh=({b[3]:.2f},{b[4]:.2f},{b[5]:.2f}) ry={b[6]:.2f}")
        if save_dir is not None:
            from ..utils.visualize import plot_bev

            plot_bev(batch["points"][0], boxes,
                     save_path=save_dir / f"{frame_id}.png")
        results.append({"frame_id": frame_id, "boxes": boxes, "scores": scores,
                        "labels": labels})
    print("demo done.")
    return results


if __name__ == "__main__":
    main()
