"""Part-A²: intra-part targets, full forward/backward."""
import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.config import Config
import pytest

pytestmark = pytest.mark.slow


def parta2_model_cfg():
    from tests.test_grid_detectors import second_model_cfg

    cfg = second_model_cfg()
    cfg.NAME = "PartA2"
    cfg.POINT_HEAD = Config({
        "NAME": "PointIntraPartOffsetHead", "CLS_FC": [16], "PART_FC": [16],
        "CLASS_AGNOSTIC": True,
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0,
                                         "point_part_weight": 1.0}},
    })
    cfg.ROI_HEAD = Config({
        "NAME": "PartA2FCHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32], "CLS_FC": [16], "REG_FC": [16], "DP_RATIO": 0.0,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                      "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                     "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "ROI_AWARE_POOL": {"POOL_SIZE": 4, "NUM_FEATURES": 16,
                           "MAX_POINTS_PER_VOXEL": 128},
        "CONV_TOWER": {"NUM_FILTERS": [16, 16], "STRIDES": [1, 2]},
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


def test_intra_part_targets_canonical():
    from modest_tpu.models.part_a2 import intra_part_targets

    gt = jnp.zeros((2, 8), jnp.float32)
    gt = gt.at[0, :7].set(jnp.asarray([10.0, 0, 0, 4, 2, 2, 0.0]))
    gt = gt.at[0, 7].set(1)
    centers = jnp.asarray([
        [10.0, 0.0, 0.0],    # box center → part (.5, .5, .5)
        [11.9, 0.9, 0.9],    # near (+x, +y, +z) corner → towards (1, 1, 1)
        [8.1, -0.9, -0.9],   # near (-x, -y, -z) corner → towards (0, 0, 0)
        [50.0, 0.0, 0.0],    # outside → seg 0, part 0
    ], jnp.float32)
    valid = jnp.ones((4,), bool)
    seg, part = intra_part_targets(centers, valid, gt)
    np.testing.assert_array_equal(np.asarray(seg), [1, 1, 1, 0])
    np.testing.assert_allclose(np.asarray(part[0]), [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(part[1]), [0.975, 0.95, 0.95], atol=1e-5)
    np.testing.assert_allclose(np.asarray(part[2]), [0.025, 0.05, 0.05], atol=1e-5)
    np.testing.assert_allclose(np.asarray(part[3]), [0, 0, 0], atol=1e-6)

    # rotated box: canonical frame follows the heading
    gt2 = gt.at[0, 6].set(jnp.pi / 2)
    _, part_r = intra_part_targets(
        jnp.asarray([[10.0, 1.9, 0.0]], jnp.float32), jnp.ones((1,), bool), gt2)
    # +y in world = +x in canonical (heading pi/2) → part x near 1
    np.testing.assert_allclose(np.asarray(part_r[0, 0]), 0.975, atol=1e-5)


def test_parta2_forward_backward(rng):
    from modest_tpu.models import part_a2 as pa
    from tests.test_grid_detectors import _toy_batch

    cfg = parta2_model_cfg()
    pcr = [0, -8, -3, 16, 8, 1]
    vs, gs = [0.5, 0.5, 0.125], (32, 32, 32)
    model = pa.PartA2(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                      voxel_size=vs, grid_size=gs)
    pts, gt = _toy_batch(rng, (16 / 3, -8 / 3))
    rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    variables = model.init(rngs, pts, gt, train=True, max_voxels=512)
    out, _ = model.apply(variables, pts, gt, train=True, max_voxels=512,
                         rngs={"sampler": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    loss, metrics = pa.parta2_loss(out, gt, cfg)
    assert np.isfinite(float(loss)), metrics
    assert float(metrics["seg_loss"]) > 0
    # some voxels fall inside the toy gt box → fg part targets exist
    assert int(np.asarray(out["seg_targets"]).sum()) > 0

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           pts, gt, train=True, max_voxels=512,
                           rngs={"sampler": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return pa.parta2_loss(o, gt, cfg)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {jax.tree_util.keystr(p).split("'")[1] for p, _ in flat}
    assert "seg_head" in touched and "part_head" in touched
    assert any(k.startswith("tower_conv") for k in touched)

    from modest_tpu.models.api import post_process
    out_e = model.apply(variables, pts, train=False, max_voxels=512)
    final = post_process(out_e, cfg)
    assert final["boxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(final["scores"])).all()


def test_second_iou_forward_backward(rng):
    from modest_tpu.models import second_iou as si
    from modest_tpu.utils.config import Config
    from tests.test_grid_detectors import _toy_batch, second_model_cfg

    cfg = second_model_cfg()
    cfg.NAME = "SECONDNetIoU"
    cfg.ROI_HEAD = Config({
        "NAME": "SECONDHead", "CLASS_AGNOSTIC": True,
        "GRID_SIZE": 4, "SHARED_FC": [16], "IOU_FC": [16],
        "NMS_CONFIG": {
            "TRAIN": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                     "NMS_THRESH": 0.7},
        },
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0}},
    })
    pcr = [0, -8, -3, 16, 8, 1]
    vs, gs = [0.5, 0.5, 0.125], (32, 32, 32)
    model = si.SECONDIoU(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                         voxel_size=vs, grid_size=gs)
    pts, gt = _toy_batch(rng, (16 / 3, -8 / 3))
    variables = model.init(jax.random.PRNGKey(0), pts, gt, train=True,
                           max_voxels=512)
    out, _ = model.apply(variables, pts, gt, train=True, max_voxels=512,
                         mutable=["batch_stats"])
    loss, metrics = si.second_iou_loss(out, gt, cfg)
    assert np.isfinite(float(loss)), metrics
    assert out["rcnn_iou"].shape == (2, 32, 1)
    assert np.asarray(out["iou_targets"]).max() <= 1.0

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           pts, gt, train=True, max_voxels=512,
                           mutable=["batch_stats"])
        return si.second_iou_loss(o, gt, cfg)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {jax.tree_util.keystr(p).split("'")[1] for p, _ in flat}
    assert "iou_head" in touched and "iou_mlp" in touched

    from modest_tpu.models.api import post_process
    out_e = model.apply(variables, pts, train=False, max_voxels=512)
    final = post_process(out_e, cfg)
    assert final["boxes"].shape == (2, 16, 7)


def parta2_free_model_cfg():
    cfg = parta2_model_cfg()
    cfg.NAME = "PointRCNN"
    cfg.BACKBONE_3D = Config({"NAME": "UNetV2", "RETURN_ENCODED_TENSOR": False})
    cfg.POINT_HEAD = Config({
        "NAME": "PointIntraPartOffsetHead", "CLS_FC": [16], "PART_FC": [16],
        "REG_FC": [16], "CLASS_AGNOSTIC": False,
        "TARGET_CONFIG": {
            "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
            "BOX_CODER": "PointResidualCoder",
            "BOX_CODER_CONFIG": {"use_mean_size": True,
                                 "mean_size": [[3.9, 1.6, 1.56]]},
        },
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "point_cls_weight": 1.0, "point_box_weight": 1.0,
            "point_part_weight": 1.0, "code_weights": [1.0] * 8}},
    })
    cfg.ROI_HEAD.DISABLE_PART = True
    return cfg


def test_parta2_free_forward_backward(rng):
    from modest_tpu.models import part_a2 as pa
    from tests.test_grid_detectors import _toy_batch

    cfg = parta2_free_model_cfg()
    pcr = [0, -8, -3, 16, 8, 1]
    vs, gs = [0.5, 0.5, 0.125], (32, 32, 32)
    model = pa.PartA2Free(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                          voxel_size=vs, grid_size=gs)
    pts, gt = _toy_batch(rng, (16 / 3, -8 / 3))
    rngs = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
    variables = model.init(rngs, pts, gt, train=True, max_voxels=512)
    out, _ = model.apply(variables, pts, gt, train=True, max_voxels=512,
                         rngs={"sampler": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    loss, metrics = pa.parta2_free_loss(out, gt, cfg)
    assert np.isfinite(float(loss)), metrics
    # voxels inside the toy gt get fg point labels and part targets
    assert int((np.asarray(out["point_cls_labels"]) > 0).sum()) > 0
    assert int(np.asarray(out["seg_targets"]).sum()) > 0

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           pts, gt, train=True, max_voxels=512,
                           rngs={"sampler": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        return pa.parta2_free_loss(o, gt, cfg)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    touched = {jax.tree_util.keystr(p).split("'")[1] for p, _ in flat}
    assert "part_head" in touched
    assert any(k.startswith("tower_conv") for k in touched)

    from modest_tpu.models.api import post_process
    out_e = model.apply(variables, pts, train=False, max_voxels=512)
    final = post_process(out_e, cfg)
    assert final["boxes"].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(final["scores"])).all()
