"""Voxel R-CNN: voxel-query RoI pooling, full forward/backward."""
import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.config import Config
import pytest

pytestmark = pytest.mark.slow


def voxelrcnn_model_cfg():
    from tests.test_grid_detectors import second_model_cfg

    cfg = second_model_cfg()
    cfg.NAME = "VoxelRCNN"
    cfg.ROI_HEAD = Config({
        "NAME": "VoxelRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32], "CLS_FC": [16], "REG_FC": [16], "DP_RATIO": 0.0,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {
            "GRID_SIZE": 3,
            "FEATURES_SOURCE": ["x_conv2", "x_conv3"],
            "POOL_LAYERS": {
                "x_conv2": {"MLPS": [[8, 8]], "QUERY_RANGES": [[2, 2, 2]],
                            "POOL_RADIUS": [1.0], "NSAMPLE": [8],
                            "POOL_METHOD": "max_pool"},
                "x_conv3": {"MLPS": [[8, 8]], "QUERY_RANGES": [[2, 2, 2]],
                            "POOL_RADIUS": [2.0], "NSAMPLE": [8],
                            "POOL_METHOD": "max_pool"},
            },
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
            "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "roi_iou",
            "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                             "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7},
        },
    })
    return cfg


def test_voxelrcnn_forward_backward(rng):
    from modest_tpu.models import voxel_rcnn as vr
    from tests.test_grid_detectors import _toy_batch

    cfg = voxelrcnn_model_cfg()
    pcr = [0, -8, -3, 16, 8, 1]
    vs, gs = [0.5, 0.5, 0.125], (32, 32, 32)
    model = vr.VoxelRCNN(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                         voxel_size=vs, grid_size=gs)
    pts, gt = _toy_batch(rng, (16 / 3, -8 / 3))
    rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    variables = model.init(rngs, pts, gt, train=True, max_voxels=512)
    out, _ = model.apply(variables, pts, gt, train=True, max_voxels=512,
                         rngs={"sampler": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    loss, metrics = vr.voxelrcnn_loss(out, gt, cfg)
    assert np.isfinite(float(loss)), metrics
    assert out["rcnn_cls"].shape == (2, 16, 1)
    assert out["rcnn_reg"].shape == (2, 16, 7)

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           pts, gt, train=True, max_voxels=512,
                           rngs={"sampler": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return vr.voxelrcnn_loss(o, gt, cfg)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {jax.tree_util.keystr(p).split("'")[1] for p, _ in flat}
    assert "pool_x_conv2" in touched and "pool_x_conv3" in touched

    from modest_tpu.models.api import post_process
    out_e = model.apply(variables, pts, train=False, max_voxels=512)
    final = post_process(out_e, cfg)
    assert final["boxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(final["scores"])).all()
