"""Synthetic KITTI-format dataset builder for tests (Lyft-like geometry)."""
import os

import numpy as np

from modest_tpu.utils import box_np, kitti_io

P2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 200, 0], [0, 0, 1.0, 0]])
V2C = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1.0, 0, 0, 0]])
R0 = np.eye(3)
IMG_SHAPE = (400, 1200)  # H, W


def make_calib_obj():
    return kitti_io.Calibration({"P2": P2, "P3": P2, "R0_rect": R0, "Tr_velo_to_cam": V2C})


def write_png(path, h, w):
    from PIL import Image

    Image.new("RGB", (w, h)).save(path)


def _write_calib(path):
    with open(path, "w") as f:
        f.write("P2: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        f.write("P3: " + " ".join(map(str, P2.reshape(-1))) + "\n")
        f.write("R0_rect: " + " ".join(map(str, R0.reshape(-1))) + "\n")
        f.write("Tr_velo_to_cam: " + " ".join(map(str, V2C.reshape(-1))) + "\n")


def make_dataset(root, n_train=4, n_val=2, seed=0, ground_z=-1.8,
                 n_ground=4000, n_obj=300):
    """Creates root/training/{velodyne,calib,label_2,image_2,planes} +
    ImageSets. Each frame: ground plane + 1-2 'Dynamic' cars ahead of the
    camera (lidar +x), labels written in camera coords. n_ground/n_obj set
    the cloud density (raise for realistic loader-cost benchmarks)."""
    rng = np.random.RandomState(seed)
    root = str(root)
    for sub in ["velodyne", "calib", "label_2", "image_2", "planes"]:
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)
    calib = make_calib_obj()

    def make_frame(gid):
        n_cars = rng.randint(1, 3)
        boxes = []
        pts = [
            np.stack(
                [rng.uniform(2, 80, n_ground), rng.uniform(-30, 30, n_ground),
                 np.full(n_ground, ground_z) + rng.randn(n_ground) * 0.02], 1
            )
        ]
        for _ in range(n_cars):
            l, w, h = rng.uniform(3.5, 4.5), rng.uniform(1.6, 2.0), rng.uniform(1.4, 1.7)
            cx = rng.uniform(8, 45)
            cy = rng.uniform(-8, 8)
            ry = rng.uniform(-np.pi, np.pi)
            cz = ground_z + h / 2
            box = np.array([cx, cy, cz, l, w, h, ry])
            local = rng.uniform(-0.5, 0.5, (n_obj, 3)) * [l, w, h]
            c, s = np.cos(ry), np.sin(ry)
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
            pts.append(local @ rot.T + box[:3])
            boxes.append(box)
        cloud = np.concatenate(pts).astype(np.float32)
        scan = np.concatenate([cloud, rng.rand(len(cloud), 1).astype(np.float32)], 1)
        kitti_io.save_velo_scan(os.path.join(root, "training", "velodyne", f"{gid:06d}.bin"), scan)
        _write_calib(os.path.join(root, "training", "calib", f"{gid:06d}.txt"))
        write_png(os.path.join(root, "training", "image_2", f"{gid:06d}.png"),
                  IMG_SHAPE[0], IMG_SHAPE[1])
        # plane in rect coords: ground z = ground_z (lidar) → y = -ground_z (rect)
        kitti_io.save_plane(
            os.path.join(root, "training", "planes", f"{gid:06d}.txt"),
            np.array([0.0, -1.0, 0.0, ground_z]),
        )
        # labels: lidar box → camera format
        lines = []
        boxes = np.array(boxes).reshape(-1, 7)
        cam = box_np.boxes3d_lidar_to_kitti_camera(boxes.copy(), calib)
        img_boxes = box_np.boxes3d_kitti_camera_to_imageboxes(cam.copy(), calib, IMG_SHAPE)
        for b, ib in zip(cam, img_boxes):
            x, y, z, l, h, w, ry = b
            alpha = -np.arctan2(x, z) + ry
            lines.append(
                f"Dynamic -1 -1 {alpha:.4f} {ib[0]:.2f} {ib[1]:.2f} {ib[2]:.2f} {ib[3]:.2f} "
                f"{h:.4f} {w:.4f} {l:.4f} {x:.4f} {y:.4f} {z:.4f} {ry:.4f}"
            )
        with open(os.path.join(root, "training", "label_2", f"{gid:06d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        return boxes

    gt = {}
    train_ids, val_ids = [], []
    for gid in range(n_train + n_val):
        gt[gid] = make_frame(gid)
        (train_ids if gid < n_train else val_ids).append(f"{gid:06d}")
    with open(os.path.join(root, "ImageSets", "train.txt"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as f:
        f.write("\n".join(val_ids) + "\n")
    return gt
