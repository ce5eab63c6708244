"""Full-framework integration: multi-traversal synthetic data → PP scores →
seed labels → round-0 dataset → tiny detector training → train-split
inference → combine_labels fusion (one self-training round's data flow)."""
import os
import pickle

import numpy as np
import pytest
import yaml

from modest_tpu.cli import (
    combine_labels,
    generate_label_files,
    generate_mask,
    pre_compute_pp_score,
)
from modest_tpu.utils import kitti_io
from modest_tpu.utils.config import Config, cfg_from_yaml_file

from synth_kitti import IMG_SHAPE, write_png
from test_pointrcnn_model import tiny_model_cfg

pytestmark = pytest.mark.slow


N_FRAMES = 3  # origin frames (one per traversal pass over the same spot)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """3 traversals of one road; each frame sees ground + wall + its own car."""
    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("selftrain")
    data_root = root / "training"
    for sub in ["velodyne", "oxts", "l2e", "calib", "image_2", "planes"]:
        os.makedirs(data_root / sub)
    meta = root / "meta_data" / "lyft"
    os.makedirs(meta)

    from synth_kitti import P2, R0, V2C

    def write_calib(gid):
        with open(data_root / "calib" / f"{gid:06d}.txt", "w") as f:
            f.write("P2: " + " ".join(map(str, P2.reshape(-1))) + "\n")
            f.write("P3: " + " ".join(map(str, P2.reshape(-1))) + "\n")
            f.write("R0_rect: " + " ".join(map(str, R0.reshape(-1))) + "\n")
            f.write("Tr_velo_to_cam: " + " ".join(map(str, V2C.reshape(-1))) + "\n")

    ground = np.stack(
        [rng.uniform(0, 60, 5000), rng.uniform(-20, 20, 5000), np.full(5000, -1.8)], 1
    )
    wall = np.stack(
        [rng.uniform(30, 34, 800), np.full(800, -12.0), rng.uniform(-1.8, 1.2, 800)], 1
    )
    cars = {}
    gids = list(range(N_FRAMES))
    for gid in gids:
        # a car in front of the camera (y within FOV) only in this traversal
        cx = rng.uniform(12, 30)
        cy = rng.uniform(-2, 2)
        car = rng.uniform(0, 1, (500, 3)) * [4.2, 1.8, 1.5] + [cx, cy, -1.79]
        cars[gid] = np.array([cx + 2.1, cy + 0.9])
        static = np.concatenate([ground, wall]) + rng.randn(5800, 3) * 0.01
        pts = np.concatenate([static, car]).astype(np.float32)
        scan = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        kitti_io.save_velo_scan(data_root / "velodyne" / f"{gid:06d}.bin", scan)
        (data_root / "oxts" / f"{gid:06d}.txt").write_text("0 0 0 0 0 0\n")
        np.save(data_root / "l2e" / f"{gid:06d}.npy", np.eye(4, dtype=np.float32))
        write_calib(gid)
        write_png(data_root / "image_2" / f"{gid:06d}.png", IMG_SHAPE[0], IMG_SHAPE[1])
        kitti_io.save_plane(
            data_root / "planes" / f"{gid:06d}.txt", np.array([0.0, -1.0, 0.0, -1.8])
        )

    track_list = [[g] for g in gids]
    valid_idx = {
        g: (g, 0, [(o, [0]) for o in gids if o != g] + [(g, [0])]) for g in gids
    }
    # reference semantics: neighbors are OTHER traversals; include ≥2
    valid_idx = {g: (g, 0, [(o, [0]) for o in gids if o != g]) for g in gids}
    with open(meta / "fw70_2m_train_track_list.pkl", "wb") as f:
        pickle.dump(track_list, f)
    with open(meta / "fw70_2m_valid_train_idx_info.pkl", "wb") as f:
        pickle.dump(valid_idx, f)
    (meta / "fw70_2m_train_idx.txt").write_text("\n".join(f"{g:06d}" for g in gids) + "\n")
    return root, data_root, cars


def test_full_self_training_flow(world, tmp_path_factory):
    root, data_root, cars = world
    ov = [f"work_dir={root}", f"data_root={data_root}"]

    # --- stage 1-3: PP score → seed masks → label files -------------------
    pre_compute_pp_score.main(ov)
    generate_mask.main(ov + ["graph.n_neighbors=30"])
    generate_label_files.main(ov + ["fov_only=true"])
    label_dir = root / "intermediate_results" / "lyft_labels_pp_score_fw70_2m_r0.3_fov"
    seeds = {g: kitti_io.read_label(label_dir / f"{g:06d}.txt") for g in range(N_FRAMES)}
    for g, objs in seeds.items():
        assert len(objs) >= 1, f"frame {g}: no seed boxes"
        # seed box sits near the planted car (camera x = -lidar y, z = lidar x)
        best = min(objs, key=lambda o: abs(o.t[2] - cars[g][0]))
        assert abs(best.t[2] - cars[g][0]) < 1.5
        assert abs(-best.t[0] - cars[g][1]) < 1.5

    # --- stage 4: round-0 dataset from seed labels -------------------------
    ds_root = tmp_path_factory.mktemp("round0")
    os.symlink(data_root / "velodyne", ds_root / "training_velodyne_tmp")
    training = ds_root / "training"
    os.makedirs(training)
    for sub in ["velodyne", "calib", "image_2", "planes"]:
        os.symlink(data_root / sub, training / sub)
    os.symlink(label_dir, training / "label_2")
    os.makedirs(ds_root / "ImageSets")
    ids = [f"{g:06d}" for g in range(N_FRAMES)]
    (ds_root / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    (ds_root / "ImageSets" / "val.txt").write_text(ids[-1] + "\n")

    data_cfg = cfg_from_yaml_file("configs/datasets/lyft_dataset_dynamic_obj.yaml")
    data_cfg.DATA_PROCESSOR = [
        Config({"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True}),
        Config({"NAME": "sample_points", "NUM_POINTS": {"train": 512, "test": 512}}),
        Config({"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}}),
    ]
    data_cfg.DATA_PATH = str(ds_root)
    from modest_tpu.data.kitti_dataset import create_kitti_infos

    create_kitti_infos(data_cfg, ["Dynamic"], ds_root, ds_root)
    with open(ds_root / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == N_FRAMES
    assert all(len(i["annos"]["name"]) >= 1 for i in infos)

    # --- stage 5: train the tiny detector on SEED labels -------------------
    full = Config({
        "CLASS_NAMES": ["Dynamic"],
        "DATA_CONFIG": data_cfg,
        "MODEL": tiny_model_cfg(),
        "OPTIMIZATION": {
            "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1,
            "OPTIMIZER": "adam_onecycle", "LR": 0.002, "WEIGHT_DECAY": 0.01,
            "MOMENTUM": 0.9, "MOMS": [0.95, 0.85], "PCT_START": 0.4,
            "DIV_FACTOR": 10, "GRAD_NORM_CLIP": 10,
        },
    })
    cfg_file = ds_root / "tiny.yaml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(full.to_dict(), f)

    from modest_tpu.cli import test as test_cli
    from modest_tpu.cli import train as train_cli

    out_dir = ds_root / "output"
    train_cli.main([
        "--cfg_file", str(cfg_file), "--batch_size", "1", "--epochs", "1",
        "--num_devices", "1", "--fix_random_seed", "--output_dir", str(out_dir),
    ])

    # --- stage 6: inference on the TRAIN split → result.pkl ---------------
    test_cli.main([
        "--cfg_file", str(cfg_file), "--ckpt_dir", str(out_dir / "ckpt"),
        "--batch_size", "1", "--num_devices", "1", "--output_dir", str(out_dir),
        "--set", "DATA_CONFIG.DATA_SPLIT.test", "train",
        "DATA_CONFIG.INFO_PATH.test", "[kitti_infos_train.pkl]",
    ])
    results = sorted(out_dir.glob("eval/epoch_*/train/result.pkl"))
    assert results
    with open(results[-1], "rb") as f:
        dets = pickle.load(f)
    assert len(dets) == N_FRAMES

    # --- stage 7: combine_labels fusion (round-1 pseudo labels) -----------
    fused_dir = root / "round1_labels"
    combine_labels.main(ov + [
        f"det_result_path={results[-1]}", f"save_path={fused_dir}", "fov_only=true",
    ])
    for g in range(N_FRAMES):
        objs = kitti_io.read_label(fused_dir / f"{g:06d}.txt")
        assert len(objs) >= 1  # at minimum the area-scored seed boxes survive
