"""cli/self_train.py main() — the driver users actually run for days.

Two rounds on the tiny synthetic world (reusing test_self_training_e2e's
fixtures and stage outputs), including `.finish_tkn` kill-and-resume and
the round-dataset symlink layout. Reference orchestration:
scripts/self_training_lyft.sh:30-93.
"""
import os
import pickle

import numpy as np
import pytest
import yaml

from modest_tpu.cli import (
    generate_label_files,
    generate_mask,
    pre_compute_pp_score,
    self_train,
)
from modest_tpu.utils import kitti_io
from modest_tpu.utils.config import Config, cfg_from_yaml_file

from test_pointrcnn_model import tiny_model_cfg
from test_self_training_e2e import N_FRAMES, world  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def seeded(world):  # noqa: F811
    """Seed stages (PP score → masks → label+bbox-info files) + a synthetic
    round-0 detector result.pkl near the planted cars."""
    root, data_root, cars = world
    ov = [f"work_dir={root}", f"data_root={data_root}"]
    pre_compute_pp_score.main(ov)
    generate_mask.main(ov + ["graph.n_neighbors=30"])
    generate_label_files.main(ov + ["fov_only=true"])

    dets = []
    for g in range(N_FRAMES):
        # camera-rect coords: x = -lidar_y, z = lidar_x (synth world calib)
        cx, cy = cars[g]  # lidar bbox center
        dets.append({
            "frame_id": f"{g:06d}",
            "name": np.array(["Dynamic"]),
            "location": np.array([[-cy, -0.3, cx]], np.float32),
            "dimensions": np.array([[4.2, 1.5, 1.8]], np.float32),  # l h w
            "rotation_y": np.array([0.0], np.float32),
            "score": np.array([0.9], np.float32),
        })
    seed_result = root / "seed_result.pkl"
    with open(seed_result, "wb") as f:
        pickle.dump(dets, f)
    return root, data_root, seed_result


@pytest.fixture(scope="module")
def base_data(seeded, tmp_path_factory):
    """KITTI root for round datasets: sensors + ImageSets (train split)."""
    root, data_root, seed_result = seeded
    base = tmp_path_factory.mktemp("base_data")
    training = base / "training"
    os.makedirs(training)
    for sub in ["velodyne", "calib", "image_2", "planes", "oxts", "l2e"]:
        os.symlink(data_root / sub, training / sub)
    os.makedirs(base / "ImageSets")
    ids = [f"{g:06d}" for g in range(N_FRAMES)]
    (base / "ImageSets" / "train.txt").write_text("\n".join(ids) + "\n")
    (base / "ImageSets" / "val.txt").write_text(ids[-1] + "\n")
    return base


@pytest.fixture(scope="module")
def cfg_file(base_data, tmp_path_factory):
    data_cfg = cfg_from_yaml_file("configs/datasets/lyft_dataset_dynamic_obj.yaml")
    data_cfg.DATA_PROCESSOR = [
        Config({"NAME": "mask_points_and_boxes_outside_range",
                "REMOVE_OUTSIDE_BOXES": True}),
        Config({"NAME": "sample_points", "NUM_POINTS": {"train": 512, "test": 512}}),
        Config({"NAME": "shuffle_points",
                "SHUFFLE_ENABLED": {"train": True, "test": False}}),
    ]
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
    path = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(full.to_dict(), f)
    return path


def _driver_args(seeded, base_data, cfg_file, out_root, max_iter):
    root, _, seed_result = seeded
    return [
        "--cfg_file", str(cfg_file),
        "--base_data", str(base_data),
        "--work_dir", str(root),
        "--seed_result", str(seed_result),
        "--max_iter", str(max_iter),
        "--output_root", str(out_root),
        "--rounds_dir", str(out_root / "rounds"),
        "--batch_size", "1", "--epochs", "1", "--num_devices", "1",
    ]


def test_self_train_driver_two_rounds_with_resume(
        seeded, base_data, cfg_file, tmp_path_factory):
    out_root = tmp_path_factory.mktemp("st_out")

    # ---- round 1 ----
    self_train.main(_driver_args(seeded, base_data, cfg_file, out_root, 1))
    r1_result = out_root / "round_1" / "eval_train" / "result.pkl"
    assert r1_result.exists()
    with open(r1_result, "rb") as f:
        assert len(pickle.load(f)) == N_FRAMES

    root = seeded[0]
    label_tok = self_train.token(
        root / "intermediate_results" / "round_1_labels")
    data_tok = self_train.token(out_root / "rounds" / "round_1")
    assert label_tok.exists() and data_tok.exists()
    # fused labels exist and the round dataset points label_2 at them
    label2 = out_root / "rounds" / "round_1" / "training" / "label_2"
    assert label2.is_symlink()
    assert (label2 / "000000.txt").exists()
    assert (out_root / "rounds" / "round_1" / "training" / "velodyne").is_symlink()
    for g in range(N_FRAMES):
        assert len(kitti_io.read_label(label2 / f"{g:06d}.txt")) >= 1

    mt_label, mt_data = label_tok.stat().st_mtime_ns, data_tok.stat().st_mtime_ns
    mt_r1 = r1_result.stat().st_mtime_ns

    # ---- resume into round 2: round 1 must be skipped wholesale ----
    self_train.main(_driver_args(seeded, base_data, cfg_file, out_root, 2))
    assert label_tok.stat().st_mtime_ns == mt_label
    assert data_tok.stat().st_mtime_ns == mt_data
    assert r1_result.stat().st_mtime_ns == mt_r1  # untouched
    r2_result = out_root / "round_2" / "eval_train" / "result.pkl"
    assert r2_result.exists()
    # round 2 fused labels came from round 1's detections (token present)
    r2_label_tok = self_train.token(
        root / "intermediate_results" / "round_2_labels")
    assert r2_label_tok.exists()

    # ---- kill-and-resume mid-round: wipe round 2's training outputs but
    # keep its label/data tokens → labels are NOT regenerated, training is
    import shutil

    mt2_label = r2_label_tok.stat().st_mtime_ns
    shutil.rmtree(out_root / "round_2" / "eval_train_root")
    r2_result.unlink()
    shutil.rmtree(out_root / "round_2" / "ckpt")
    self_train.main(_driver_args(seeded, base_data, cfg_file, out_root, 2))
    assert r2_label_tok.stat().st_mtime_ns == mt2_label  # stage skipped
    assert r2_result.exists()  # training + inference re-ran
