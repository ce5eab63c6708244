"""Every shipped model config must build and trace end-to-end.

Mirrors the reference's guarantee that each tools/cfgs yaml constructs a
runnable network. jax.eval_shape traces the FULL train forward + loss at the
config's production sizes without executing anything, so wiring, shape and
dtype bugs surface in seconds per config even on the CPU host.
"""
import glob
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modest_tpu.models import build_network
from modest_tpu.models.api import apply_train, compute_loss
from modest_tpu.utils.config import cfg_from_yaml_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs/models/**/*.yaml"),
                           recursive=True))


def _fake_dataset(cfg):
    dc = cfg.DATA_CONFIG
    pcr = np.asarray(dc.POINT_CLOUD_RANGE, np.float32)
    voxel_size = grid_size = None
    for proc in dc.get("DATA_PROCESSOR", []):
        if proc.NAME in ("transform_points_to_voxels", "calculate_grid_size"):
            voxel_size = list(proc.VOXEL_SIZE)
    if voxel_size is None and dc.get("VOXEL_SIZE", None):
        voxel_size = list(dc.VOXEL_SIZE)
    if voxel_size is not None:
        grid_size = np.round((pcr[3:6] - pcr[0:3]) / np.asarray(voxel_size)
                             ).astype(np.int64)
    return types.SimpleNamespace(
        point_cloud_range=pcr, voxel_size=voxel_size, grid_size=grid_size,
        class_names=list(cfg.CLASS_NAMES),
    )


@pytest.mark.parametrize(
    "cfg_path", CONFIGS,
    ids=[os.path.relpath(p, os.path.join(REPO, "configs/models")) for p in CONFIGS])
def test_config_builds_and_traces(cfg_path):
    cfg = cfg_from_yaml_file(os.path.relpath(cfg_path, REPO))
    dataset = _fake_dataset(cfg)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=dataset)

    n_pts = 16384
    gt_width = 8
    dh = cfg.MODEL.get("DENSE_HEAD", None)
    if dh is not None and dh.get("TARGET_ASSIGNER_CONFIG", None):
        bcc = dh.TARGET_ASSIGNER_CONFIG.get("BOX_CODER_CONFIG", None)
        if bcc and bcc.get("code_size", 7) > 7:
            gt_width = int(bcc.get("code_size")) + 1
    gt = jax.ShapeDtypeStruct((1, 12, gt_width), jnp.float32)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    if cfg.MODEL.NAME == "CaDDN":
        hp, wp = (int(v) for v in cfg.DATA_CONFIG.get("IMAGE_PAD", (384, 1248)))
        pts = {
            "images": jax.ShapeDtypeStruct((1, hp, wp, 3), jnp.float32),
            "trans_lidar_to_cam": jax.ShapeDtypeStruct((1, 4, 4), jnp.float32),
            "trans_cam_to_img": jax.ShapeDtypeStruct((1, 3, 4), jnp.float32),
            "depth_maps": jax.ShapeDtypeStruct((1, hp // 4, wp // 4), jnp.float32),
            "gt_boxes2d": jax.ShapeDtypeStruct((1, 12, 4), jnp.float32),
        }

        def init_fn(p, g):
            return model.init({"params": k0}, p["images"],
                              p["trans_lidar_to_cam"], p["trans_cam_to_img"],
                              g, train=True)
    else:
        pts = jax.ShapeDtypeStruct((1, n_pts, 4), jnp.float32)

        def init_fn(p, g):
            return model.init({"params": k0, "sampler": k1}, p, g, train=True)

    variables = jax.eval_shape(init_fn, pts, gt)
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(
        variables["params"]))
    assert n_params > 1e4, f"{cfg_path}: suspiciously small model"

    def fwd_loss(v, p, g):
        out, _ = apply_train(model, cfg.MODEL, v, p, g, k1)
        loss, tb = compute_loss(out, g, cfg.MODEL, len(cfg.CLASS_NAMES))
        return loss

    loss_shape = jax.eval_shape(fwd_loss, variables, pts, gt)
    assert loss_shape.shape == () and loss_shape.dtype == jnp.float32
