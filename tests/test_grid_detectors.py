"""PointPillars / SECOND tests: voxelization, anchors, target assignment,
sparse conv equivalence vs dense conv, and full forward/backward smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modest_tpu.models import grid_detectors as gd
from modest_tpu.models import voxelize as vx
from modest_tpu.models.box_coders import ResidualCoder
from modest_tpu.utils.config import Config

pytestmark = pytest.mark.slow


def test_point_voxel_coords():
    pts = jnp.array([[0.05, -39.0, -2.0, 0.5], [100.0, 0.0, 0.0, 0.1], [1.0, 0.0, 0.0, 0.2]])
    coords, valid = vx.point_voxel_coords(
        pts, [0, -40, -3, 90.4, 40, 1], [0.16, 0.16, 4.0], (565, 500, 1)
    )
    assert bool(valid[0]) and not bool(valid[1]) and bool(valid[2])
    np.testing.assert_array_equal(np.asarray(coords[0]), [0, 6, 0])


def test_pillar_stats_and_scatter(rng):
    n = 64
    pts_np = rng.uniform(0, 1.6, (n, 4)).astype(np.float32)
    pts_np[:, 2] = rng.uniform(-2.5, 0.5, n)  # keep z inside [-3, 1)
    pts = jnp.asarray(pts_np)
    coords, valid = vx.point_voxel_coords(pts, [0, 0, -3, 16, 16, 1], [0.8, 0.8, 4.0], (20, 20, 1))
    assert bool(np.asarray(valid).all())
    cnt, mean, key = vx.pillar_stats(pts, valid, coords[:, :2], 20, 20)
    # mean of points sharing a pillar equals numpy groupby mean
    keys_np = np.asarray(key)
    for k in np.unique(keys_np):
        sel = keys_np == k
        np.testing.assert_allclose(
            np.asarray(mean)[sel][0], np.asarray(pts)[sel, :3].mean(0), atol=1e-5
        )
    feats = jnp.asarray(rng.rand(n, 8).astype(np.float32))
    bev = vx.scatter_max_bev(feats, key, valid, 20, 20)
    assert bev.shape == (20, 20, 8)
    k0 = int(keys_np[0])
    np.testing.assert_allclose(
        np.asarray(bev).reshape(400, 8)[k0],
        np.asarray(feats)[keys_np == k0].max(0),
        atol=1e-6,
    )


def test_voxelize_sparse_unique(rng):
    pts = rng.uniform(0, 4, (200, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 1, 200)
    coords, valid = vx.point_voxel_coords(
        jnp.asarray(pts), [0, 0, -3, 4, 4, 1], [1.0, 1.0, 1.0], (4, 4, 4)
    )
    vc, vf, vv, vk = vx.voxelize_sparse(jnp.asarray(pts), valid, coords, 64, 4, 4, 4)
    nv = int(vv.sum())
    keys_np = np.asarray(vk)[:nv]
    assert (np.diff(keys_np) > 0).all()  # sorted strictly increasing
    # voxel mean features correct
    cnp = np.asarray(coords)
    flat = cnp[:, 2] * 16 + cnp[:, 1] * 4 + cnp[:, 0]
    for i in range(min(nv, 10)):
        sel = (flat == keys_np[i]) & np.asarray(valid)
        np.testing.assert_allclose(np.asarray(vf)[i], pts[sel].mean(0), atol=1e-5)


def test_generate_anchors():
    cfg = [{
        "class_name": "Dynamic", "anchor_sizes": [[2.0, 1.0, 1.7]],
        "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.6],
        "align_center": False, "feature_map_stride": 2,
        "matched_threshold": 0.5, "unmatched_threshold": 0.35,
    }]
    anchors, fmap = gd.generate_anchors(cfg, (560, 496, 1), [0, -39.68, -3, 89.6, 39.68, 1])
    assert anchors.shape == (280 * 248 * 2, 7)
    assert fmap == (248, 280)
    np.testing.assert_allclose(anchors[0, :3], [0, -39.68, -1.6 + 0.85], atol=1e-5)
    np.testing.assert_allclose(anchors[0, 6], 0.0)
    np.testing.assert_allclose(anchors[1, 6], 1.57)


def test_aligned_bev_iou():
    a = jnp.array([[0, 0, 0, 4, 2, 2, 0.0]])
    b = jnp.array([[0, 0, 0, 4, 2, 2, jnp.pi / 2]])  # rotated → dims swap
    iou = gd.aligned_bev_iou(a, b)
    # aligned boxes: 4x2 vs 2x4 → inter 2x2=4, union 12
    np.testing.assert_allclose(np.asarray(iou), [[4 / 12]], atol=1e-5)


def test_assign_anchor_targets():
    anchors = jnp.array(
        [[10, 0, 0, 4, 2, 1.6, 0.0], [10, 0.5, 0, 4, 2, 1.6, 0.0],
         [50, 20, 0, 4, 2, 1.6, 0.0]],
        jnp.float32,
    )
    gt = jnp.zeros((1, 2, 8), jnp.float32)
    gt = gt.at[0, 0, :7].set(jnp.array([10, 0, 0, 4, 2, 1.6, 0.0]))
    gt = gt.at[0, 0, 7].set(1)
    labels, reg_targets, reg_w = gd.assign_anchor_targets(
        anchors, gt, ResidualCoder(), 0.5, 0.35
    )
    assert int(labels[0, 0]) == 1  # perfect match
    assert int(labels[0, 2]) == 0  # far anchor → bg
    # anchor 1 iou: inter 4*1.5=6 / union (8+8-6) = 0.6 → pos
    assert int(labels[0, 1]) == 1
    np.testing.assert_allclose(np.asarray(reg_targets[0, 0]), 0.0, atol=1e-6)


def test_assign_anchor_targets_padded_gt_never_forces():
    """Padded (all-zero) gt rows carry a -1 overlap sentinel; the force-match
    rule must not compare against them — an anchor with a small positive IoU
    below matched_threshold stays ignore/bg, not foreground."""
    anchors = jnp.array([[10, 1.8, 0, 4, 2, 1.6, 0.0],   # IoU ~0.08 with gt
                         [50, 20, 0, 4, 2, 1.6, 0.0]], jnp.float32)
    gt = jnp.zeros((1, 3, 8), jnp.float32)  # rows 1-2 are padding
    gt = gt.at[0, 0, :7].set(jnp.array([10, 0, 0, 4, 2, 1.6, 0.0]))
    gt = gt.at[0, 0, 7].set(1)
    labels, _, _ = gd.assign_anchor_targets(anchors, gt, ResidualCoder(),
                                            0.6, 0.45)
    # anchor 0: best-for-the-gt → legitimately forced fg
    assert int(labels[0, 0]) == 1
    # anchor 1: zero overlap, must stay background despite pad sentinels
    assert int(labels[0, 1]) == 0


def test_assign_anchor_targets_class_aware():
    """With anchor_cls, an anchor only matches gts of its own class."""
    anchors = jnp.array([[10, 0, 0, 4, 2, 1.6, 0.0],
                         [10, 0, 0, 4, 2, 1.6, 0.0]], jnp.float32)
    gt = jnp.zeros((1, 1, 8), jnp.float32)
    gt = gt.at[0, 0, :7].set(jnp.array([10, 0, 0, 4, 2, 1.6, 0.0]))
    gt = gt.at[0, 0, 7].set(2)  # class 2
    anchor_cls = jnp.array([1, 2], jnp.int32)
    labels, _, _ = gd.assign_anchor_targets(anchors, gt, ResidualCoder(),
                                            0.6, 0.45, anchor_cls=anchor_cls)
    assert int(labels[0, 0]) == 0  # class-1 anchor ignores the class-2 gt
    assert int(labels[0, 1]) == 2  # class-2 anchor matches it


def _atss_oracle(anchors, gt, cls, topk):
    """Reference ATSSTargetAssigner.assign_targets_single semantics
    (atss_target_assigner.py:75-141), sequential numpy, trimmed gt."""
    a_n, m = len(anchors), len(gt)
    ious = np.asarray(gd.boxes_iou_bev(jnp.asarray(anchors), jnp.asarray(gt[:, :7])))
    dist = np.linalg.norm(anchors[:, None, :3] - gt[None, :, :3], axis=-1)
    topk_idxs = np.argsort(dist, axis=0, kind="stable")[:topk]  # (K, M)
    cand = ious[topk_idxs, np.arange(m)]
    thresh = cand.mean(0) + cand.std(0, ddof=1) + 1e-6
    is_pos = cand >= thresh
    for mm in range(m):  # center-in-gt (with the reference's (dy, dx) swap)
        for kk in range(topk):
            a = topk_idxs[kk, mm]
            off = anchors[a, :2] - gt[mm, :2]
            c, s = np.cos(-gt[mm, 6]), np.sin(-gt[mm, 6])
            x_l = off[0] * c - off[1] * s
            y_l = off[0] * s + off[1] * c
            if not (abs(x_l) <= gt[mm, 4] / 2 and abs(y_l) <= gt[mm, 3] / 2):
                is_pos[kk, mm] = False
    ious_inf = np.full((a_n, m), -np.inf)
    for mm in range(m):
        for kk in range(topk):
            if is_pos[kk, mm]:
                a = topk_idxs[kk, mm]
                ious_inf[a, mm] = ious[a, mm]
    vals = ious_inf.max(1)
    idxs = ious_inf.argmax(1)
    best = ious.argmax(0)
    for mm in range(m):  # sequential: later gt wins a collision
        idxs[best[mm]] = mm
        vals[best[mm]] = ious[best[mm], mm]
    return np.where(vals > -np.inf, cls[idxs], 0), idxs, vals


def test_assign_targets_atss_matches_reference_semantics(rng):
    """Vectorized ATSS == the reference's sequential per-gt loop."""
    a_n, topk = 48, 5
    anchors = np.zeros((a_n, 7), np.float32)
    anchors[:, 0] = rng.uniform(0, 40, a_n)
    anchors[:, 1] = rng.uniform(-10, 10, a_n)
    anchors[:, 3:6] = [4.0, 2.0, 1.6]
    gt_valid = np.zeros((3, 7), np.float32)
    gt_valid[:, 0] = [8.0, 20.0, 33.0]
    gt_valid[:, 1] = [-4.0, 2.0, 6.0]
    gt_valid[:, 3:6] = [4.2, 1.9, 1.5]
    gt_valid[:, 6] = [0.1, -0.3, 0.8]
    cls_valid = np.array([1, 2, 1], np.int64)

    gt_pad = np.zeros((1, 5, 8), np.float32)  # 2 padded rows
    gt_pad[0, :3, :7] = gt_valid
    gt_pad[0, :3, 7] = cls_valid

    labels, reg_t, reg_w = gd.assign_targets_atss(
        jnp.asarray(anchors), jnp.asarray(gt_pad), ResidualCoder(), topk
    )
    want_labels, want_idx, _ = _atss_oracle(anchors, gt_valid, cls_valid, topk)
    np.testing.assert_array_equal(np.asarray(labels[0]), want_labels)
    np.testing.assert_array_equal(np.asarray(reg_w[0]), (want_labels > 0))
    fg = want_labels > 0
    want_reg = np.asarray(
        ResidualCoder().encode(jnp.asarray(gt_valid[want_idx]), jnp.asarray(anchors))
    )
    np.testing.assert_allclose(np.asarray(reg_t[0])[fg], want_reg[fg], atol=1e-5)
    assert fg.sum() >= 3  # every gt force-claims at least its best anchor


def test_sparse_subm_conv_matches_dense(rng):
    """Submanifold conv output == dense conv output at active sites with
    zeroed inactive sites."""
    from modest_tpu.models.sparse_conv import SubMConv3d

    nz = ny = nx = 5
    dense = np.zeros((nz, ny, nx, 3), np.float32)
    active = rng.rand(nz, ny, nx) < 0.3
    active[0, 0, 0] = True
    dense[active] = rng.randn(active.sum(), 3).astype(np.float32)

    zz, yy, xx = np.nonzero(active)
    order = np.argsort(zz * ny * nx + yy * nx + xx)
    coords = np.stack([zz, yy, xx], 1)[order].astype(np.int32)
    feats = dense[zz[order], yy[order], xx[order]]
    keys = (coords[:, 0] * ny * nx + coords[:, 1] * nx + coords[:, 2]).astype(np.int32)
    V = len(keys)
    pad = 8
    coords_p = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, 3), np.float32)])
    keys_p = np.concatenate([keys, np.full(pad, nz * ny * nx, np.int32)])
    valid_p = np.concatenate([np.ones(V, bool), np.zeros(pad, bool)])

    mod = SubMConv3d(4)
    b1 = lambda a: jnp.asarray(a)[None]  # modules are batched
    vars_ = mod.init(jax.random.PRNGKey(0), b1(feats_p), b1(coords_p),
                     b1(keys_p), b1(valid_p), (nz, ny, nx))
    out = mod.apply(vars_, b1(feats_p), b1(coords_p),
                    b1(keys_p), b1(valid_p), (nz, ny, nx))[0]

    # dense oracle: correlate with the same kernel
    w = np.asarray(vars_["params"]["kernel"]).reshape(3, 3, 3, 3, 4)
    padded = np.pad(dense, ((1, 1), (1, 1), (1, 1), (0, 0)))
    for i in range(V):
        z, y, x = coords[i]
        patch = padded[z:z + 3, y:y + 3, x:x + 3]  # (3,3,3,Cin)
        want = np.einsum("zyxc,zyxco->o", patch, w)
        np.testing.assert_allclose(np.asarray(out[i]), want, atol=1e-4)


def test_downsample_active_set():
    from modest_tpu.models.sparse_conv import downsample_active_set

    coords = jnp.array([[0, 0, 0], [0, 0, 1], [0, 4, 4]], jnp.int32)
    keys = jnp.array([0, 1, 4 * 8 + 4], jnp.int32)  # shape (8,8,8) flat... recompute
    nz = ny = nx = 8
    keys = jnp.array(
        [0 * 64 + 0 * 8 + 0, 0 * 64 + 0 * 8 + 1, 0 * 64 + 4 * 8 + 4], jnp.int32
    )
    valid = jnp.ones(3, bool)
    oc, ok, ov = downsample_active_set(
        coords, keys, valid, (8, 8, 8), (4, 4, 4),
        jnp.array([2, 2, 2]), jnp.array([1, 1, 1]), 16
    )
    got = {tuple(c) for c, v in zip(np.asarray(oc), np.asarray(ov)) if v}
    # input (0,0,0): windows of outputs containing it: o s.t. 2o-1 <= 0 <= 2o+1 → o=0 (and o= -? no)
    assert (0, 0, 0) in got
    # input (0,4,4) → outputs (0,2,2) at least
    assert (0, 2, 2) in got
    # all valid outputs contain at least one input in their window
    for c in got:
        win_ok = False
        for inp in np.asarray(coords):
            lo = np.array(c) * 2 - 1
            if ((inp >= lo) & (inp <= lo + 2)).all():
                win_ok = True
        assert win_ok, c


def pillar_model_cfg():
    return Config({
        "NAME": "PointPillar",
        "VFE": {"NAME": "PillarVFE", "WITH_DISTANCE": False, "USE_ABSLOTE_XYZ": True,
                "USE_NORM": True, "NUM_FILTERS": [16]},
        "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1, 1],
                        "LAYER_STRIDES": [2, 2], "NUM_FILTERS": [16, 32],
                        "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [16, 16]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
            "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
            "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Dynamic", "anchor_sizes": [[2.0, 1.0, 1.7]],
                "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.6],
                "align_center": False, "feature_map_stride": 2,
                "matched_threshold": 0.5, "unmatched_threshold": 0.35,
            }],
            "TARGET_ASSIGNER_CONFIG": {"NAME": "AxisAlignedTargetAssigner",
                                       "POS_FRACTION": -1.0, "SAMPLE_SIZE": 512,
                                       "NORM_BY_NUM_EXAMPLES": False,
                                       "MATCH_HEIGHT": False,
                                       "BOX_CODER": "ResidualCoder"},
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                             "dir_weight": 0.2,
                                             "code_weights": [1.0] * 7}},
        },
        "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
                            "OUTPUT_RAW_SCORE": False, "EVAL_METRIC": "kitti",
                            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False,
                                           "NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.01,
                                           "NMS_PRE_MAXSIZE": 256,
                                           "NMS_POST_MAXSIZE": 32}},
    })


def second_model_cfg():
    cfg = pillar_model_cfg()
    cfg.NAME = "SECONDNet"
    cfg.VFE = Config({"NAME": "MeanVFE"})
    cfg.MAP_TO_BEV = Config({"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256})
    cfg.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG[0].feature_map_stride = 8
    cfg.BACKBONE_2D = Config({"NAME": "BaseBEVBackbone", "LAYER_NUMS": [1, 1],
                              "LAYER_STRIDES": [1, 2], "NUM_FILTERS": [32, 64],
                              "UPSAMPLE_STRIDES": [1, 2],
                              "NUM_UPSAMPLE_FILTERS": [32, 32]})
    return cfg


def _toy_batch(rng, gt_xy, n=512, b=2):
    pts = rng.uniform(0, 1, (b, n, 4)).astype(np.float32)
    pts[..., 0] *= 16
    pts[..., 1] = (pts[..., 1] - 0.5) * 16
    pts[..., 2] = pts[..., 2] * 4 - 3
    gt = np.zeros((b, 3, 8), np.float32)
    gt[:, 0, :7] = [gt_xy[0], gt_xy[1], -0.75, 2, 1, 1.7, 0.0]
    gt[:, 0, 7] = 1
    return jnp.asarray(pts), jnp.asarray(gt)


@pytest.mark.parametrize("which", ["pillar", "second"])
def test_grid_detector_forward_backward(rng, which):
    cfg = pillar_model_cfg() if which == "pillar" else second_model_cfg()
    pcr = [0, -8, -3, 16, 8, 1]
    if which == "pillar":
        vs, gs = [0.5, 0.5, 4.0], (32, 32, 1)
        gt_xy = (8.0, 0.0)
    else:
        # z grid deep enough to survive the 8x z-downsampling chain (ref z=41)
        vs, gs = [0.5, 0.5, 0.125], (32, 32, 32)
        # stride-8 anchors on a 32-cell grid are 5.33 m apart; put the gt on
        # an anchor site so matching can fire (as it would at real density)
        gt_xy = (16 / 3, -8 / 3)
    model = gd.GridDetector(model_cfg=cfg, num_class=1, point_cloud_range=pcr,
                            voxel_size=vs, grid_size=gs)
    pts, gt = _toy_batch(rng, gt_xy)
    variables = model.init(jax.random.PRNGKey(0), pts, gt, train=True, max_voxels=512)
    out, _ = model.apply(variables, pts, gt, train=True, max_voxels=512,
                         mutable=["batch_stats"])
    loss, metrics = gd.grid_detector_loss(out, cfg)
    assert np.isfinite(float(loss)), metrics
    assert int((np.asarray(out["box_cls_labels"]) > 0).sum()) > 0  # fg anchors exist

    def loss_fn(params):
        o, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           pts, gt, train=True, max_voxels=512, mutable=["batch_stats"])
        return gd.grid_detector_loss(o, cfg)[0]

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))

    # eval path
    out_e = model.apply(variables, pts, train=False, max_voxels=512)
    final = gd.grid_post_process(out_e, cfg.POST_PROCESSING)
    assert final["boxes"].shape[0] == 2


def test_assign_multiclass_targets_padded_gt_never_forces():
    """Same padded-gt sentinel bug class as assign_anchor_targets: a -1.0
    masked column must not force-match every positive-IoU anchor."""
    from modest_tpu.models.anchor_head_multi import assign_multiclass_targets

    anchors = jnp.array([[10, 1.8, 0, 4, 2, 1.6, 0.0],   # IoU ~0.08 with gt
                         [50, 20, 0, 4, 2, 1.6, 0.0]], jnp.float32)
    anchor_cls = jnp.array([1, 1], jnp.int32)
    gt = jnp.zeros((1, 3, 8), jnp.float32)  # rows 1-2 are padding
    gt = gt.at[0, 0, :7].set(jnp.array([10, 0, 0, 4, 2, 1.6, 0.0]))
    gt = gt.at[0, 0, 7].set(1)
    labels, _, _, _ = assign_multiclass_targets(
        anchors, anchor_cls, jnp.full((2,), 0.6), jnp.full((2,), 0.45),
        gt, ResidualCoder())
    assert int(labels[0, 0]) == 1  # best-for-the-gt → legitimately forced
    assert int(labels[0, 1]) == 0  # zero overlap stays background
