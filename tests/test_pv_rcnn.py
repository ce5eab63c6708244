"""PV-RCNN: VSA bilinear BEV interp, grid points, full forward/backward."""
import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.config import Config
import pytest

pytestmark = pytest.mark.slow


def pvrcnn_model_cfg():
    from tests.test_grid_detectors import second_model_cfg

    cfg = second_model_cfg()
    cfg.NAME = "PVRCNN"
    cfg.PFE = Config({
        "NAME": "VoxelSetAbstraction",
        "NUM_KEYPOINTS": 64,
        "NUM_OUTPUT_FEATURES": 32,
        "FEATURES_SOURCE": ["bev", "x_conv1", "x_conv3", "raw_points"],
        "SA_LAYER": {
            "raw_points": {"MLPS": [[8, 8]], "POOL_RADIUS": [1.2], "NSAMPLE": [8]},
            "x_conv1": {"MLPS": [[8, 8]], "POOL_RADIUS": [0.8], "NSAMPLE": [8]},
            "x_conv3": {"MLPS": [[8, 8]], "POOL_RADIUS": [2.4], "NSAMPLE": [8]},
        },
    })
    cfg.POINT_HEAD = Config({
        "NAME": "PointHeadSimple", "CLS_FC": [16], "CLASS_AGNOSTIC": True,
        "USE_POINT_FEATURES_BEFORE_FUSION": True,
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0}},
    })
    cfg.ROI_HEAD = Config({
        "NAME": "PVRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32], "CLS_FC": [16], "REG_FC": [16], "DP_RATIO": 0.0,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {"GRID_SIZE": 3, "MLPS": [[8, 8]],
                          "POOL_RADIUS": [0.8], "NSAMPLE": [8],
                          "POOL_METHOD": "max_pool"},
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


def test_bilinear_bev_exact():
    from modest_tpu.models.pv_rcnn import bilinear_bev

    h = w = 4
    bev = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    pcr = (0.0, 0.0, -3.0)
    vs = (1.0, 1.0, 1.0)
    # reference semantics: grid index i IS the sample coordinate (no
    # half-cell shift, voxel_set_abstraction interpolate_from_bev_features)
    xy = jnp.asarray([[[2.0, 1.0]]], jnp.float32)  # (row 1, col 2) → 1*4+2
    v = bilinear_bev(bev, xy, pcr, vs, stride=1)
    np.testing.assert_allclose(np.asarray(v)[0, 0, 0], 6.0, atol=1e-5)
    xy = jnp.asarray([[[2.5, 1.0]]], jnp.float32)  # halfway to (1, 3) → 6.5
    v = bilinear_bev(bev, xy, pcr, vs, stride=1)
    np.testing.assert_allclose(np.asarray(v)[0, 0, 0], 6.5, atol=1e-5)


def test_roi_grid_points_inside_roi():
    from modest_tpu.models.pv_rcnn import roi_grid_points
    from modest_tpu.utils.box_np import points_in_boxes_mask

    rois = jnp.asarray([[[4.0, 1.0, -0.5, 3.0, 1.5, 1.5, 0.7]]], jnp.float32)
    grid = np.asarray(roi_grid_points(rois, 3))
    assert grid.shape == (1, 1, 27, 3)
    inside = points_in_boxes_mask(grid[0, 0], np.asarray(rois[0]))
    assert inside.all()


def test_pvrcnn_forward_backward(rng):
    from modest_tpu.models import pv_rcnn as pv
    from tests.test_grid_detectors import _toy_batch

    cfg = pvrcnn_model_cfg()
    pcr = [0, -8, -3, 16, 8, 1]
    vs, gs = [0.5, 0.5, 0.125], (32, 32, 32)
    model = pv.PVRCNN(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                      voxel_size=vs, grid_size=gs)
    pts, gt = _toy_batch(rng, (16 / 3, -8 / 3))
    rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    variables = model.init(rngs, pts, gt, train=True, max_voxels=512)
    out, _ = model.apply(variables, pts, gt, train=True, max_voxels=512,
                         rngs={"sampler": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    loss, metrics = pv.pvrcnn_loss(out, gt, cfg)
    assert np.isfinite(float(loss)), metrics
    assert out["rcnn_cls"].shape == (2, 16, 1)
    assert out["rcnn_reg"].shape == (2, 16, 7)

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           pts, gt, train=True, max_voxels=512,
                           rngs={"sampler": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return pv.pvrcnn_loss(o, gt, cfg)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # VSA + PKW + grid pool params all receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {jax.tree_util.keystr(p).split("'")[1] for p, _ in flat}
    assert any(k.startswith("vsa_") for k in touched)
    assert "pkw_head" in touched and "roi_grid_pool" in touched

    # eval path + shared post-process
    from modest_tpu.models.api import post_process
    out_e = model.apply(variables, pts, train=False, max_voxels=512)
    final = post_process(out_e, cfg)
    assert final["boxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(final["scores"])).all()
