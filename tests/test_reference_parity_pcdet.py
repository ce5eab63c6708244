"""Golden-parity tests importing the reference's pcdet (torch CPU) directly.

Extends test_reference_parity.py (pipeline/eval side) to the OpenPCDet fork:
box coders, losses, world augmentations, the axis-aligned anchor assigner,
and the fastai one-cycle schedule are compared against the reference's OWN
torch implementations on identical inputs. CUDA extension modules are
stubbed (never reached on these paths) and `.cuda()` is patched to identity.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

REF_PCDET = Path("/root/reference/downstream/OpenPCDet")


def _load_as(name: str, path: Path):
    """File-load a reference module under a dotted name, creating empty
    parent packages so its relative imports resolve without executing the
    heavy package __init__ chain (datasets/__init__ wants skimage/spconv)."""
    import importlib.util

    parts = name.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def pcdet_ref():
    """Import the reference pcdet modules with CUDA extensions stubbed."""
    sys.path.insert(0, str(REF_PCDET))
    ver = types.ModuleType("pcdet.version")
    ver.__version__ = "0.3.0+ref"
    sys.modules.setdefault("pcdet.version", ver)
    for ext in ("pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda",
                "pcdet.ops.iou3d_nms.iou3d_nms_cuda"):
        sys.modules.setdefault(ext, types.ModuleType(ext))
    # torch.Tensor.cuda → identity: the assigner round-trips argmax through
    # .cuda() unconditionally (axis_aligned_target_assigner.py:144,149)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import pcdet.utils.box_coder_utils as bcu
        import pcdet.utils.loss_utils as lu

        pc = REF_PCDET / "pcdet"
        au = _load_as("pcdet.datasets.augmentor.augmentor_utils",
                      pc / "datasets/augmentor/augmentor_utils.py")
        aata = _load_as(
            "pcdet.models.dense_heads.target_assigner.axis_aligned_target_assigner",
            pc / "models/dense_heads/target_assigner/axis_aligned_target_assigner.py")
        yield types.SimpleNamespace(
            box_coder_utils=bcu, loss_utils=lu, augmentor_utils=au,
            AxisAlignedTargetAssigner=aata.AxisAlignedTargetAssigner,
        )
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(str(REF_PCDET))


def _rand_boxes(rng, n, velocity=False):
    b = np.zeros((n, 9 if velocity else 7), np.float32)
    b[:, 0] = rng.uniform(-40, 40, n)
    b[:, 1] = rng.uniform(-40, 40, n)
    b[:, 2] = rng.uniform(-2, 1, n)
    b[:, 3:6] = rng.uniform(0.5, 6, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if velocity:
        b[:, 7:9] = rng.uniform(-5, 5, (n, 2))
    return b


# ---------------------------------------------------------------------------
# box coders (reference box_coder_utils.py:5-222)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sincos", [False, True])
def test_residual_coder_parity(pcdet_ref, rng, sincos):
    from modest_tpu.models.box_coders import ResidualCoder

    import jax.numpy as jnp

    anchors = _rand_boxes(rng, 64)
    boxes = _rand_boxes(rng, 64)
    ref = pcdet_ref.box_coder_utils.ResidualCoder(encode_angle_by_sincos=sincos)
    ours = ResidualCoder(encode_angle_by_sincos=sincos)
    ref_enc = ref.encode_torch(torch.from_numpy(boxes), torch.from_numpy(anchors)).numpy()
    our_enc = np.asarray(ours.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(our_enc, ref_enc, atol=2e-5)
    ref_dec = ref.decode_torch(torch.from_numpy(ref_enc), torch.from_numpy(anchors)).numpy()
    our_dec = np.asarray(ours.decode(jnp.asarray(ref_enc), jnp.asarray(anchors)))
    np.testing.assert_allclose(our_dec, ref_dec, atol=2e-4)


def test_residual_coder_velocity_parity(pcdet_ref, rng):
    """9-dim nuScenes boxes: velocity channels ride through as identity
    residuals (reference box_coder_utils.py:42,75)."""
    from modest_tpu.models.box_coders import ResidualCoder

    import jax.numpy as jnp

    anchors = _rand_boxes(rng, 32, velocity=True)
    anchors[:, 7:9] = 0  # anchor velocity prior is zero in every config
    boxes = _rand_boxes(rng, 32, velocity=True)
    ref = pcdet_ref.box_coder_utils.ResidualCoder(code_size=9)
    ours = ResidualCoder(code_size=9)
    ref_enc = ref.encode_torch(torch.from_numpy(boxes), torch.from_numpy(anchors)).numpy()
    our_enc = np.asarray(ours.encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(our_enc, ref_enc, atol=2e-5)
    ref_dec = ref.decode_torch(torch.from_numpy(ref_enc), torch.from_numpy(anchors)).numpy()
    our_dec = np.asarray(ours.decode(jnp.asarray(ref_enc), jnp.asarray(anchors)))
    np.testing.assert_allclose(our_dec, ref_dec, atol=2e-4)


def test_point_residual_coder_parity(pcdet_ref, rng):
    from modest_tpu.models.box_coders import PointResidualCoder

    import jax.numpy as jnp

    mean_size = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]]
    boxes = _rand_boxes(rng, 48)
    points = boxes[:, :3] + rng.uniform(-1, 1, (48, 3)).astype(np.float32)
    classes = rng.randint(1, 3, 48)
    ref = pcdet_ref.box_coder_utils.PointResidualCoder(mean_size=mean_size)
    ours = PointResidualCoder(mean_size=mean_size)
    ref_enc = ref.encode_torch(
        torch.from_numpy(boxes), torch.from_numpy(points),
        torch.from_numpy(classes)).numpy()
    our_enc = np.asarray(ours.encode(
        jnp.asarray(boxes), jnp.asarray(points), jnp.asarray(classes)))
    np.testing.assert_allclose(our_enc, ref_enc, atol=2e-5)
    ref_dec = ref.decode_torch(
        torch.from_numpy(ref_enc), torch.from_numpy(points),
        torch.from_numpy(classes)).numpy()
    our_dec = np.asarray(ours.decode(
        jnp.asarray(ref_enc), jnp.asarray(points), jnp.asarray(classes)))
    np.testing.assert_allclose(our_dec, ref_dec, atol=2e-4)


# ---------------------------------------------------------------------------
# losses (reference loss_utils.py)
# ---------------------------------------------------------------------------


def test_sigmoid_focal_loss_parity(pcdet_ref, rng):
    from modest_tpu.models.losses import sigmoid_focal_loss

    import jax.numpy as jnp

    logits = rng.randn(2, 100, 3).astype(np.float32) * 3
    targets = (rng.rand(2, 100, 3) > 0.7).astype(np.float32)
    weights = rng.rand(2, 100).astype(np.float32)
    ref = pcdet_ref.loss_utils.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)
    ref_out = ref(torch.from_numpy(logits), torch.from_numpy(targets),
                  torch.from_numpy(weights)).numpy()
    our_out = np.asarray(sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


def test_weighted_smooth_l1_parity(pcdet_ref, rng):
    from modest_tpu.models.losses import weighted_smooth_l1

    import jax.numpy as jnp

    code_weights = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    preds = rng.randn(2, 50, 7).astype(np.float32)
    gts = rng.randn(2, 50, 7).astype(np.float32)
    weights = rng.rand(2, 50).astype(np.float32)
    ref = pcdet_ref.loss_utils.WeightedSmoothL1Loss(beta=1.0 / 9.0,
                                                    code_weights=code_weights)
    ref_out = ref(torch.from_numpy(preds), torch.from_numpy(gts),
                  torch.from_numpy(weights)).numpy()
    our_out = np.asarray(weighted_smooth_l1(
        jnp.asarray(preds), jnp.asarray(gts), jnp.asarray(weights),
        code_weights=code_weights))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-6)


def test_corner_loss_parity(pcdet_ref, rng):
    from modest_tpu.models.losses import corner_loss_lidar

    import jax.numpy as jnp

    pred = _rand_boxes(rng, 40)
    gt = pred.copy()
    gt[:, :3] += rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32)
    gt[:, 6] += rng.uniform(-0.4, 0.4, 40).astype(np.float32)
    ref_out = pcdet_ref.loss_utils.get_corner_loss_lidar(
        torch.from_numpy(pred), torch.from_numpy(gt)).numpy()
    our_out = np.asarray(corner_loss_lidar(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-4)


# ---------------------------------------------------------------------------
# world augmentations (reference augmentor_utils.py:7-79) — the random gate
# is forced on; what's compared is the transform math incl. velocity columns
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("axis", ["x", "y"])
def test_world_flip_parity(pcdet_ref, rng, axis, monkeypatch):
    from modest_tpu.data import augmentor as ours

    monkeypatch.setattr(np.random, "choice", lambda *a, **k: True)
    boxes = _rand_boxes(rng, 16, velocity=True)
    points = rng.randn(200, 4).astype(np.float32)
    ref_fn = getattr(pcdet_ref.augmentor_utils, f"random_flip_along_{axis}")
    our_fn = getattr(ours, f"random_flip_along_{axis}")
    ref_b, ref_p = ref_fn(boxes.copy(), points.copy())
    our_b, our_p = our_fn(boxes.copy(), points.copy())
    np.testing.assert_allclose(our_b, ref_b, atol=1e-6)
    np.testing.assert_allclose(our_p, ref_p, atol=1e-6)


def test_global_rotation_parity(pcdet_ref, rng, monkeypatch):
    from modest_tpu.data import augmentor as ours

    monkeypatch.setattr(np.random, "uniform", lambda lo, hi, *a, **k: 0.37)
    boxes = _rand_boxes(rng, 16, velocity=True)
    points = rng.randn(200, 4).astype(np.float32)
    ref_b, ref_p = pcdet_ref.augmentor_utils.global_rotation(
        boxes.copy(), points.copy(), [-0.78, 0.78])
    our_b, our_p = ours.global_rotation(boxes.copy(), points.copy(), [-0.78, 0.78])
    np.testing.assert_allclose(np.asarray(our_b), np.asarray(ref_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_p), np.asarray(ref_p), atol=1e-5)


def test_global_scaling_parity(pcdet_ref, rng, monkeypatch):
    from modest_tpu.data import augmentor as ours

    monkeypatch.setattr(np.random, "uniform", lambda lo, hi, *a, **k: 1.04)
    boxes = _rand_boxes(rng, 16)
    points = rng.randn(200, 4).astype(np.float32)
    ref_b, ref_p = pcdet_ref.augmentor_utils.global_scaling(
        boxes.copy(), points.copy(), [0.95, 1.05])
    our_b, our_p = ours.global_scaling(boxes.copy(), points.copy(), [0.95, 1.05])
    np.testing.assert_allclose(our_b, ref_b, atol=1e-6)
    np.testing.assert_allclose(our_p, ref_p, atol=1e-6)


# ---------------------------------------------------------------------------
# axis-aligned anchor target assigner (reference
# axis_aligned_target_assigner.py:36-209, match_height=False)
# ---------------------------------------------------------------------------


class _Cfg(types.SimpleNamespace):
    def get(self, k, default=None):
        return getattr(self, k, default)


def _make_ref_assigner(pcdet_ref, anchor_cfgs, class_names, box_coder):
    model_cfg = _Cfg(
        ANCHOR_GENERATOR_CONFIG=anchor_cfgs,
        TARGET_ASSIGNER_CONFIG=_Cfg(POS_FRACTION=-1, SAMPLE_SIZE=512,
                                    NORM_BY_NUM_EXAMPLES=False),
    )
    return pcdet_ref.AxisAlignedTargetAssigner(
        model_cfg, class_names, box_coder, match_height=False)


def test_axis_aligned_assigner_parity_single_class(pcdet_ref, rng):
    import jax.numpy as jnp

    from modest_tpu.models.box_coders import ResidualCoder as OurCoder
    from modest_tpu.models.grid_detectors import assign_anchor_targets, generate_anchors

    anchor_cfg = {
        "class_name": "Dynamic", "feature_map_stride": 8,
        "anchor_sizes": [[4.0, 2.0, 1.6]], "anchor_rotations": [0, 1.57],
        "anchor_bottom_heights": [-1.78],
        "matched_threshold": 0.6, "unmatched_threshold": 0.45,
        "align_center": False,
    }
    grid_size, pcr = (128, 128, 40), [0, -20, -3, 40.96, 20, 1]
    anchors_flat, fmap = generate_anchors([anchor_cfg], grid_size, pcr)

    gt = np.zeros((2, 6, 8), np.float32)
    for b in range(2):
        nb = 3 + b
        gt[b, :nb, :7] = _rand_boxes(rng, nb)
        gt[b, :nb, 0] = rng.uniform(2, 38, nb)
        gt[b, :nb, 1] = rng.uniform(-18, 18, nb)
        gt[b, :nb, 3:5] = rng.uniform(1.5, 4.5, (nb, 2))
        gt[b, :nb, 7] = 1

    ref_assigner = _make_ref_assigner(
        pcdet_ref, [anchor_cfg], ["Dynamic"],
        pcdet_ref.box_coder_utils.ResidualCoder())
    # reference anchors are (fy, fx, na, 7); view(-1, 7) = our flat order
    ref_anchors = torch.from_numpy(
        anchors_flat.reshape(fmap[0], fmap[1], -1, 7))
    ref_out = ref_assigner.assign_targets([ref_anchors], torch.from_numpy(gt))

    labels, reg_t, reg_w = assign_anchor_targets(
        jnp.asarray(anchors_flat), jnp.asarray(gt), OurCoder(), 0.6, 0.45)
    np.testing.assert_array_equal(
        np.asarray(labels), ref_out["box_cls_labels"].numpy())
    np.testing.assert_array_equal(
        np.asarray(reg_w), ref_out["reg_weights"].numpy())
    fg = np.asarray(labels) > 0
    np.testing.assert_allclose(
        np.asarray(reg_t)[fg], ref_out["box_reg_targets"].numpy()[fg], atol=2e-5)


def test_axis_aligned_assigner_parity_two_class(pcdet_ref, rng):
    import jax.numpy as jnp

    from modest_tpu.models.box_coders import ResidualCoder as OurCoder
    from modest_tpu.models.grid_detectors import (
        assign_anchor_targets,
        single_head_anchor_setup,
    )

    anchor_cfgs = [
        {"class_name": "Car", "feature_map_stride": 8,
         "anchor_sizes": [[3.9, 1.6, 1.56]], "anchor_rotations": [0, 1.57],
         "anchor_bottom_heights": [-1.78],
         "matched_threshold": 0.6, "unmatched_threshold": 0.45,
         "align_center": False},
        {"class_name": "Pedestrian", "feature_map_stride": 8,
         "anchor_sizes": [[0.8, 0.6, 1.73]], "anchor_rotations": [0, 1.57],
         "anchor_bottom_heights": [-0.6],
         "matched_threshold": 0.5, "unmatched_threshold": 0.35,
         "align_center": False},
    ]
    grid_size, pcr = (128, 128, 40), [0, -20, -3, 40.96, 20, 1]
    anchors_flat, na, m_thr, u_thr, a_cls = single_head_anchor_setup(
        anchor_cfgs, grid_size, pcr)

    gt = np.zeros((2, 5, 8), np.float32)
    for b in range(2):
        nb = 4
        gt[b, :nb, :7] = _rand_boxes(rng, nb)
        gt[b, :nb, 0] = rng.uniform(2, 38, nb)
        gt[b, :nb, 1] = rng.uniform(-18, 18, nb)
        gt[b, :2, 3:6] = [3.8, 1.7, 1.5]   # car-sized
        gt[b, :2, 7] = 1
        gt[b, 2:nb, 3:6] = [0.75, 0.65, 1.7]  # pedestrian-sized
        gt[b, 2:nb, 7] = 2

    ref_assigner = _make_ref_assigner(
        pcdet_ref, anchor_cfgs, ["Car", "Pedestrian"],
        pcdet_ref.box_coder_utils.ResidualCoder())
    fy, fx = grid_size[1] // 8, grid_size[0] // 8
    # reference anchors are 6-D (fy, fx, nz, ns, nr, 7) per class config —
    # feature_map_size = shape[:3] must be (fy, fx, 1) so the final
    # cat(dim=-1).view(-1) interleaves class-major per location, our layout
    per_class = [a.reshape(fy, fx, 1, 1, 2, 7)
                 for a in np.split(anchors_flat.reshape(fy, fx, na, 7), 2, axis=2)]
    ref_out = ref_assigner.assign_targets(
        [torch.from_numpy(np.ascontiguousarray(a)) for a in per_class],
        torch.from_numpy(gt))

    labels, reg_t, reg_w = assign_anchor_targets(
        jnp.asarray(anchors_flat), jnp.asarray(gt), OurCoder(),
        jnp.asarray(m_thr), jnp.asarray(u_thr), anchor_cls=jnp.asarray(a_cls))
    np.testing.assert_array_equal(
        np.asarray(labels), ref_out["box_cls_labels"].numpy())
    np.testing.assert_array_equal(
        np.asarray(reg_w), ref_out["reg_weights"].numpy())
    fg = np.asarray(labels) > 0
    np.testing.assert_allclose(
        np.asarray(reg_t)[fg], ref_out["box_reg_targets"].numpy()[fg], atol=2e-5)


# ---------------------------------------------------------------------------
# one-cycle schedule (reference learning_schedules_fastai.py:60-78)
# ---------------------------------------------------------------------------


def test_one_cycle_schedule_parity(rng):
    sys.path.insert(0, str(REF_PCDET / "tools"))
    try:
        from train_utils.optimization import build_optimizer as ref_build
        from train_utils.optimization import build_scheduler as ref_sched
    finally:
        sys.path.remove(str(REF_PCDET / "tools"))

    from modest_tpu.train.optim import one_cycle_schedules

    total_steps = 240
    cfg = _Cfg(OPTIMIZER="adam_onecycle", LR=0.01, WEIGHT_DECAY=0.01,
               MOMS=[0.95, 0.85], DIV_FACTOR=10.0, PCT_START=0.4,
               DECAY_STEP_LIST=[35, 45], LR_DECAY=0.1, LR_CLIP=1e-7,
               LR_WARMUP=False, WARMUP_EPOCH=1)
    model = torch.nn.Linear(4, 4)
    opt = ref_build(model, cfg)
    sched, _ = ref_sched(opt, total_iters_each_epoch=24, total_epochs=10,
                         last_epoch=-1, optim_cfg=cfg)

    lr_fn, b1_fn = one_cycle_schedules(0.01, (0.95, 0.85), 10.0, 0.4, total_steps)
    for step in [0, 1, 50, 95, 96, 97, 150, 239]:
        sched.step(step)
        # ours evaluates in f32 on device; the reference in python floats —
        # rtol reflects f32 resolution at the tiny end-of-run lr
        np.testing.assert_allclose(float(lr_fn(step)), opt.lr, rtol=3e-4)
        np.testing.assert_allclose(float(b1_fn(step)), opt.mom, rtol=3e-4)


def test_one_cycle_flat_schedule_parity():
    sys.path.insert(0, str(REF_PCDET / "tools"))
    try:
        from train_utils.optimization.learning_schedules_fastai import (
            FakeOptim,
            OneCycleFlat,
        )
    finally:
        sys.path.remove(str(REF_PCDET / "tools"))

    from modest_tpu.train.optim import one_cycle_flat_schedules

    total_steps = 200
    opt = FakeOptim()
    sched = OneCycleFlat(opt, total_steps, 0.01, [0.95, 0.85], 10.0, 0.3, 0.7)
    lr_fn, b1_fn = one_cycle_flat_schedules(0.01, (0.95, 0.85), 10.0, 0.3, 0.7,
                                            total_steps)
    for step in [0, 1, 30, 59, 60, 61, 100, 139, 140, 141, 170, 199]:
        sched.step(step)
        np.testing.assert_allclose(float(lr_fn(step)), opt.lr, rtol=3e-4)
        np.testing.assert_allclose(float(b1_fn(step)), opt.mom, rtol=3e-4)


def test_build_optimizer_variants_step():
    """Every OPTIMIZER branch builds and applies an update (incl. the new
    onecycleflat / decay-list adam / sgd paths)."""
    import jax
    import jax.numpy as jnp

    from modest_tpu.train.optim import build_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = jax.tree.map(jnp.ones_like, params)
    base = dict(LR=0.01, WEIGHT_DECAY=0.01, MOMS=[0.95, 0.85], DIV_FACTOR=10,
                PCT_START=0.4, FLAT_START=0.7, GRAD_NORM_CLIP=10,
                MOMENTUM=0.9, NUM_EPOCHS=2, DECAY_STEP_LIST=[1, 2],
                LR_DECAY=0.1, LR_CLIP=1e-7, LR_WARMUP=True, WARMUP_EPOCH=1)
    for name in ("adam_onecycle", "adam_onecycleflat", "adam", "sgd"):
        cfg = _Cfg(OPTIMIZER=name, **base)
        tx = build_optimizer(cfg, total_steps=20, iters_per_epoch=10)
        opt_state = tx.init(params)
        new = params
        for _ in range(2):  # warmup paths have lr=0 at step 0
            updates, opt_state = tx.update(grads, opt_state, new)
            new = jax.tree.map(lambda p, u: p + u, new, updates)
        assert np.isfinite(np.asarray(new["w"])).all()
        assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))


def test_decay_list_schedule_parity():
    """Step-decay LambdaLR + cosine warmup vs the reference's lr_lbmd /
    CosineWarmupLR (optimization/__init__.py:40-47, fastai:103-112)."""
    from modest_tpu.train.optim import decay_list_schedule

    lr0, lr_decay, lr_clip = 0.003, 0.1, 1e-7
    iters_per_epoch = 10
    decay_steps = [e * iters_per_epoch for e in (3, 6, 9)]

    def ref_lr_lbmd(cur_step):
        cur_decay = 1
        for decay_step in decay_steps:
            if cur_step >= decay_step:
                cur_decay = cur_decay * lr_decay
        return max(cur_decay, lr_clip / lr0) * lr0  # LambdaLR multiplies base lr

    lr_fn = decay_list_schedule(lr0, decay_steps, lr_decay, lr_clip)
    for step in [0, 5, 29, 30, 31, 59, 60, 89, 90, 120, 500]:
        np.testing.assert_allclose(float(lr_fn(step)), ref_lr_lbmd(step), rtol=1e-5)

    # warmup ramp vs the reference's own CosineWarmupLR class (built with
    # eta_min = LR / DIV_FACTOR, optimization/__init__.py:62-66)
    sys.path.insert(0, str(REF_PCDET / "tools"))
    try:
        from train_utils.optimization.learning_schedules_fastai import CosineWarmupLR
    finally:
        sys.path.remove(str(REF_PCDET / "tools"))
    div_factor = 10.0
    warm_steps = 2 * iters_per_epoch
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr0)
    ref_warm = CosineWarmupLR(opt, T_max=warm_steps, eta_min=lr0 / div_factor)
    lr_fn_w = decay_list_schedule(lr0, decay_steps, lr_decay, lr_clip,
                                  warmup_steps=warm_steps,
                                  warmup_eta_min=lr0 / div_factor)
    for step in [0, 1, 10, 19]:  # stepped per iteration, like the reference
        ref_warm.last_epoch = step - 1
        ref_warm.step()
        np.testing.assert_allclose(float(lr_fn_w(step)),
                                   opt.param_groups[0]["lr"], rtol=1e-5)
    np.testing.assert_allclose(float(lr_fn_w(35)), ref_lr_lbmd(35), rtol=1e-5)
