"""End-to-end pipeline CLI test on a synthetic multi-traversal mini-dataset:
pre_compute_pp_score → generate_mask → generate_label_files → combine_labels.
"""
import os
import pickle

import numpy as np
import pytest

from modest_tpu.cli import (
    combine_labels,
    generate_label_files,
    generate_mask,
    pre_compute_pp_score,
)
from modest_tpu.utils import kitti_io

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    rng = np.random.RandomState(42)
    root = tmp_path_factory.mktemp("lyftmini")
    data_root = root / "training"
    for sub in ["velodyne", "oxts", "l2e", "calib"]:
        os.makedirs(data_root / sub)
    meta = root / "meta_data" / "lyft"
    os.makedirs(meta)

    def write_calib(gid):
        P2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 200, 0], [0, 0, 1.0, 0]])
        V2C = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1.0, 0, 0, 0]])
        R0 = np.eye(3)
        with open(data_root / "calib" / f"{gid:06d}.txt", "w") as f:
            f.write("P2: " + " ".join(map(str, P2.reshape(-1))) + "\n")
            f.write("P3: " + " ".join(map(str, P2.reshape(-1))) + "\n")
            f.write("R0_rect: " + " ".join(map(str, R0.reshape(-1))) + "\n")
            f.write("Tr_velo_to_cam: " + " ".join(map(str, V2C.reshape(-1))) + "\n")

    # scene: ground + wall (persistent), car (only in traversal/seq 0)
    ground = np.stack(
        [rng.uniform(0, 60, 5000), rng.uniform(-20, 20, 5000), rng.normal(-1.8, 0.01, 5000)], 1
    )
    wall = np.stack(
        [rng.uniform(30, 34, 600), np.full(600, -10.0), rng.uniform(-1.8, 1.2, 600)], 1
    )
    car = rng.uniform(0, 1, (500, 3)) * [4.2, 1.8, 1.5] + [20.0, 3.0, -1.79]

    track_list = [[0], [1], [2]]  # 3 single-frame traversals
    for gid, seq in [(0, 0), (1, 1), (2, 2)]:
        static = np.concatenate([ground, wall]) + rng.randn(5600, 3) * 0.01
        pts = np.concatenate([static, car]) if seq == 0 else static
        scan = np.concatenate([pts, np.zeros((len(pts), 1))], 1).astype(np.float32)
        kitti_io.save_velo_scan(data_root / "velodyne" / f"{gid:06d}.bin", scan)
        (data_root / "oxts" / f"{gid:06d}.txt").write_text("0 0 0 0 0 0\n")
        np.save(data_root / "l2e" / f"{gid:06d}.npy", np.eye(4, dtype=np.float32))
        write_calib(gid)

    valid_idx = {0: (0, 0, [(0, [0]), (1, [0]), (2, [0])])}
    with open(meta / "fw70_2m_train_track_list.pkl", "wb") as f:
        pickle.dump(track_list, f)
    with open(meta / "fw70_2m_valid_train_idx_info.pkl", "wb") as f:
        pickle.dump(valid_idx, f)
    (meta / "fw70_2m_train_idx.txt").write_text("0\n")
    return root, data_root


def overrides(root, data_root):
    return [f"work_dir={root}", f"data_root={data_root}"]


def test_full_pipeline(synth_dataset):
    root, data_root = synth_dataset
    ov = overrides(root, data_root)

    # stage 1: PP scores
    pre_compute_pp_score.main(ov)
    pp_file = root / "intermediate_results" / "lyft_pp_score_fw70_2m_r0.3" / "000000.npy"
    assert pp_file.exists()
    pp = np.load(pp_file)
    n_pts = kitti_io.load_velo_scan(data_root / "velodyne" / "000000.bin").shape[0]
    assert pp.shape == (n_pts,)
    assert pp[-500:].mean() < 0.2  # car points: ephemeral
    assert pp[:5000].mean() > 0.8  # ground: persistent

    # idempotent re-run (existing outputs skipped)
    pre_compute_pp_score.main(ov)

    # stage 2: clustering → seg + bbox
    generate_mask.main(ov + ["graph.n_neighbors=30"])
    seg = np.load(root / "intermediate_results" / "lyft_seg_pp_score_fw70_2m_r0.3" / "000000.npy")
    with open(
        root / "intermediate_results" / "lyft_bbox_pp_score_fw70_2m_r0.3" / "000000.pkl", "rb"
    ) as f:
        objs = pickle.load(f)
    assert seg.shape == (n_pts,)
    assert len(objs) == 1  # exactly the car
    assert (seg[-500:] > 0).mean() > 0.9
    # config snapshot saved
    assert (root / "intermediate_results" / "lyft_seg_pp_score_fw70_2m_r0.3" / "configs.yaml").exists()

    # stage 3: label files (car at y=3 left of center is outside camera FOV;
    # disable fov filtering for the synthetic calib)
    generate_label_files.main(ov + ["fov_only=false"])
    label_file = (
        root / "intermediate_results" / "lyft_labels_pp_score_fw70_2m_r0.3_fov" / "000000.txt"
    )
    labels = kitti_io.read_label(label_file)
    assert len(labels) == 1
    obj = labels[0]
    assert obj.cls_type == "Dynamic"
    np.testing.assert_allclose(sorted([obj.l, obj.w]), [1.8, 4.2], atol=0.35)

    # stage 4: combine with fake detector results
    det = [
        {
            "frame_id": "000000",
            "location": np.array([[-3.0, -0.5, 20.0]]),  # rect coords of a car-ish det
            "dimensions": np.array([[4.2, 1.5, 1.8]]),
            "rotation_y": np.array([0.0]),
            "score": np.array([0.95]),
        }
    ]
    det_path = root / "result.pkl"
    with open(det_path, "wb") as f:
        pickle.dump(det, f)
    save_path = root / "combined_labels"
    combine_labels.main(
        ov + [f"det_result_path={det_path}", f"save_path={save_path}", "fov_only=false"]
    )
    fused = kitti_io.read_label(save_path / "000000.txt")
    assert len(fused) >= 1
