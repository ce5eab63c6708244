"""PointRCNN model smoke + behavior tests (tiny config, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modest_tpu.models.pointrcnn import PointRCNN, pointrcnn_loss, post_process
from modest_tpu.utils.config import Config

pytestmark = pytest.mark.slow


def tiny_model_cfg():
    return Config(
        {
            "NAME": "PointRCNN",
            "BACKBONE_3D": {
                "NAME": "PointNet2MSG",
                "SA_CONFIG": {
                    "NPOINTS": [64, 16],
                    "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
                    "NSAMPLE": [[8, 8], [8, 8]],
                    "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
                },
                "FP_MLPS": [[16, 16], [16, 16]],
            },
            "POINT_HEAD": {
                "NAME": "PointHeadBox",
                "CLS_FC": [16], "REG_FC": [16],
                "CLASS_AGNOSTIC": False,
                "TARGET_CONFIG": {
                    "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                    "BOX_CODER": "PointResidualCoder",
                    "BOX_CODER_CONFIG": {
                        "use_mean_size": True,
                        "mean_size": [[3.9, 1.6, 1.56]],
                    },
                },
                "LOSS_CONFIG": {
                    "LOSS_REG": "WeightedSmoothL1Loss",
                    "LOSS_WEIGHTS": {
                        "point_cls_weight": 1.0,
                        "point_box_weight": 1.0,
                        "code_weights": [1.0] * 8,
                    },
                },
            },
            "ROI_HEAD": {
                "NAME": "PointRCNNHead",
                "CLASS_AGNOSTIC": True,
                "ROI_POINT_POOL": {
                    "POOL_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                    "NUM_SAMPLED_POINTS": 32,
                    "DEPTH_NORMALIZER": 70.0,
                },
                "XYZ_UP_LAYER": [16, 16],
                "CLS_FC": [16], "REG_FC": [16],
                "DP_RATIO": 0.0, "USE_BN": False,
                "SA_CONFIG": {
                    "NPOINTS": [16, -1],
                    "RADIUS": [0.5, 100],
                    "NSAMPLE": [8, 8],
                    "MLPS": [[16, 16], [16, 32]],
                },
                "NMS_CONFIG": {
                    "TRAIN": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                              "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                              "NMS_THRESH": 0.8},
                    "TEST": {"NMS_TYPE": "nms_gpu", "MULTI_CLASSES_NMS": False,
                             "NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 16,
                             "NMS_THRESH": 0.85},
                },
                "TARGET_CONFIG": {
                    "BOX_CODER": "ResidualCoder",
                    "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
                    "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "cls",
                    "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45,
                    "CLS_BG_THRESH_LO": 0.1, "HARD_BG_RATIO": 0.8,
                    "REG_FG_THRESH": 0.55,
                },
                "LOSS_CONFIG": {
                    "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
                    "CORNER_LOSS_REGULARIZATION": True,
                    "LOSS_WEIGHTS": {
                        "rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                        "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7,
                    },
                },
            },
            "POST_PROCESSING": {
                "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                "SCORE_THRESH": 0.1, "OUTPUT_RAW_SCORE": False,
                "EVAL_METRIC": "kitti",
                "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                               "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 128,
                               "NMS_POST_MAXSIZE": 16},
            },
        }
    )


@pytest.fixture(scope="module")
def model_and_batch():
    rng = np.random.RandomState(0)
    cfg = tiny_model_cfg()
    model = PointRCNN(model_cfg=cfg, num_class=1)
    n = 256
    points = rng.uniform(-1, 1, (2, n, 4)).astype(np.float32) * [20, 20, 1.5, 1]
    # plant a "car": cluster of points inside a box
    box = np.array([5.0, 3.0, 0.0, 4.0, 1.8, 1.5, 0.3])
    inside = rng.uniform(-0.45, 0.45, (40, 3)) * box[3:6]
    c, s = np.cos(0.3), np.sin(0.3)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    points[0, :40, :3] = inside @ rot.T + box[:3]
    points[1, :40, :3] = inside @ rot.T + box[:3]
    gt = np.zeros((2, 5, 8), np.float32)
    gt[:, 0, :7] = box
    gt[:, 0, 7] = 1  # class id
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        jnp.asarray(points), jnp.asarray(gt), train=True,
    )
    return model, cfg, variables, jnp.asarray(points), jnp.asarray(gt)


def test_train_forward_and_loss(model_and_batch):
    model, cfg, variables, points, gt = model_and_batch
    out, mutated = model.apply(
        variables, points, gt, train=True,
        rngs={"sampler": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out["point_cls_preds"].shape == (2, 256, 1)
    assert out["point_box_preds"].shape == (2, 256, 8)
    assert out["rois"].shape == (2, 16, 7)
    assert out["rcnn_cls"].shape == (2 * 16, 1)
    assert out["rcnn_reg"].shape == (2 * 16, 7)
    loss, metrics = pointrcnn_loss(out, gt, cfg)
    assert np.isfinite(float(loss)), metrics
    assert float(metrics["point_pos_num"]) > 0  # planted points are fg


def test_gradients_flow(model_and_batch):
    model, cfg, variables, points, gt = model_and_batch

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            points, gt, train=True,
            rngs={"sampler": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return pointrcnn_loss(out, gt, cfg)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least 50% of parameter tensors receive nonzero gradient
    nonzero = [float(np.abs(np.asarray(g)).max()) > 0 for g in flat]
    assert np.mean(nonzero) > 0.5


def test_eval_forward_and_postprocess(model_and_batch):
    model, cfg, variables, points, gt = model_and_batch
    out = model.apply(variables, points, train=False)
    assert out["batch_box_preds"].shape == (2, 16, 7)
    final = post_process(out, cfg.POST_PROCESSING)
    assert final["boxes"].shape == (2, 16, 7)
    assert final["valid"].dtype == bool
    # scores of valid outputs exceed the threshold
    v = np.asarray(final["valid"])
    s = np.asarray(final["scores"])
    assert (s[v] > 0.1).all()


def test_eval_deterministic(model_and_batch):
    model, cfg, variables, points, gt = model_and_batch
    out1 = model.apply(variables, points, train=False)
    out2 = model.apply(variables, points, train=False)
    np.testing.assert_array_equal(np.asarray(out1["batch_box_preds"]),
                                  np.asarray(out2["batch_box_preds"]))


def test_sample_rois_hard_bg_capped_by_pool(rng):
    """Hard-bg quota caps at the HARD POOL SIZE (reference sample_bg_inds),
    not at n_bg — a 2-roi hard pool must not fill ~80% of bg slots."""
    import jax

    from modest_tpu.models.roi_head import sample_rois_for_rcnn
    from modest_tpu.utils.config import Config

    cfg = Config({
        "ROI_PER_IMAGE": 64, "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55,
        "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
        "HARD_BG_RATIO": 0.8, "SAMPLE_ROI_BY_EACH_CLASS": True,
        "CLS_SCORE_TYPE": "cls",
    })
    R = 96
    gt = np.zeros((1, 4, 8), np.float32)
    gt[0, 0, :7] = [10, 0, 0, 4, 2, 1.6, 0.0]
    gt[0, 0, 7] = 1
    rois = np.zeros((1, R, 7), np.float32)
    # 2 hard-band rois (IoU in [0.1, 0.55)), the rest zero-overlap easy
    rois[0, 0, :7] = [11.5, 0, 0, 4, 2, 1.6, 0.0]
    rois[0, 1, :7] = [11.3, 0, 0, 4, 2, 1.6, 0.0]
    for i in range(2, R):
        rois[0, i, :7] = [100 + 3 * i, 50, 0, 4, 2, 1.6, 0.0]
    scores = np.zeros((1, R), np.float32)
    labels = np.ones((1, R), np.int32)
    targets = sample_rois_for_rcnn(
        jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(scores),
        jnp.asarray(labels), jnp.asarray(gt), cfg)
    ov = np.asarray(targets["gt_iou_of_rois"][0])
    n_hard_sampled = int(((ov >= 0.1) & (ov < 0.55)).sum())
    # n_fg=0 (no roi ≥ fg_thresh... roi0/1 iou<0.55) → 64 bg slots; the hard
    # quota must be min(int(64*0.8), 2) = 2, not ~51
    assert n_hard_sampled <= 2, n_hard_sampled


def test_sample_rois_by_each_class(rng):
    """SAMPLE_ROI_BY_EACH_CLASS: a roi labeled class 2 overlapping a class-1
    gt at high IoU must NOT become foreground for that gt."""
    import jax

    from modest_tpu.models.roi_head import sample_rois_for_rcnn
    from modest_tpu.utils.config import Config

    base = {
        "ROI_PER_IMAGE": 8, "FG_RATIO": 0.5, "REG_FG_THRESH": 0.55,
        "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45, "CLS_BG_THRESH_LO": 0.1,
        "HARD_BG_RATIO": 0.8, "CLS_SCORE_TYPE": "cls",
    }
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0, :7] = [10, 0, 0, 4, 2, 1.6, 0.0]
    gt[0, 0, 7] = 1  # class 1
    rois = np.zeros((1, 8, 7), np.float32)
    rois[0, 0, :7] = [10, 0, 0, 4, 2, 1.6, 0.0]  # perfect overlap
    for i in range(1, 8):
        rois[0, i, :7] = [100 + 3 * i, 50, 0, 4, 2, 1.6, 0.0]
    scores = np.zeros((1, 8), np.float32)
    labels = np.full((1, 8), 2, np.int32)  # wrong class

    t_on = sample_rois_for_rcnn(
        jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(scores),
        jnp.asarray(labels), jnp.asarray(gt),
        Config({**base, "SAMPLE_ROI_BY_EACH_CLASS": True}))
    assert float(np.asarray(t_on["gt_iou_of_rois"]).max()) == 0.0

    t_off = sample_rois_for_rcnn(
        jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(scores),
        jnp.asarray(labels), jnp.asarray(gt),
        Config({**base, "SAMPLE_ROI_BY_EACH_CLASS": False}))
    assert float(np.asarray(t_off["gt_iou_of_rois"]).max()) > 0.9
