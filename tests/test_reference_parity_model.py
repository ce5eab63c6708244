"""FULL-MODEL golden parity: the reference's complete torch PointRCNN
forward (eval mode, CPU, CUDA exts backed by the numpy shims in
ref_shims.py) vs our JAX PointRCNN under MODEST_EXACT_OPS on identical
converted weights and identical scenes.

This converts the per-stack converter-equality tests (test_torch_convert)
and the protocol-parity AP harness into the end-to-end claim: same
checkpoint ⇒ same final detections (boxes / scores / labels after proposal
NMS, RoI refinement and post NMS) ⇒ same AP.

Reference call stack exercised: pcdet/models/detectors/point_rcnn.py
(forward + Detector3DTemplate.post_processing),
backbones_3d/pointnet2_backbone.py, dense_heads/point_head_box.py,
roi_heads/pointrcnn_head.py, ops/pointnet2/pointnet2_batch/*,
ops/roipoint_pool3d/*, ops/iou3d_nms/* (via shims).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF_PCDET = Path("/root/reference/downstream/OpenPCDet")
CFG_YAML = "configs/models/lyft_models/pointrcnn_dynamic_obj.yaml"
N_PTS = 6144
N_SCENES = 10


def _synth_scene(rng, n=N_PTS):
    """Ground + a handful of car-like clusters (same recipe as bench.py)."""
    pts = rng.uniform(0, 1, (n, 4)).astype(np.float32)
    pts[:, 0] *= 70.0
    pts[:, 1] = (pts[:, 1] - 0.5) * 80
    pts[:, 2] = (pts[:, 2] - 0.5) * 3 - 0.5
    per = max(n // 24, 100)  # cluster size scales with the scene
    for k in range(8):
        c = rng.uniform([5, -30, -1.6], [60, 30, -1.4])
        sl = slice(k * per, (k + 1) * per)
        pts[sl, :3] = c + rng.uniform(-1, 1, (per, 3)) * [2, 0.9, 0.7]
    return pts


@pytest.fixture(scope="module")
def ref_model():
    import ref_shims

    ref_shims.install()
    sys.path.insert(0, str(REF_PCDET))
    ver = types.ModuleType("pcdet.version")
    ver.__version__ = "0.3.0+ref"
    sys.modules.setdefault("pcdet.version", ver)
    for ext in ("pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda",
                "pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda",
                "torchvision", "kornia"):
        sys.modules.setdefault(ext, types.ModuleType(ext))
    if "spconv" not in sys.modules:
        sp = types.ModuleType("spconv")
        for n in ("SparseModule", "SparseSequential", "SubMConv3d",
                  "SparseConv3d", "SparseConvTensor", "SparseInverseConv3d"):
            setattr(sp, n, type(n, (), {}))
        sys.modules["spconv"] = sp
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None):
                super().__init__()
                for k, v in (d or {}).items():
                    if isinstance(v, dict):
                        v = EasyDict(v)
                    elif isinstance(v, list):
                        v = [EasyDict(x) if isinstance(x, dict) else x
                             for x in v]
                    self[k] = v

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            __setattr__ = dict.__setitem__

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    import torch
    import yaml
    from easydict import EasyDict

    torch.manual_seed(7)
    cfg = EasyDict(yaml.safe_load(open(CFG_YAML)))
    from pcdet.models.detectors.point_rcnn import PointRCNN as RefPointRCNN

    class Enc:
        num_point_features = 4

    class DS:
        class_names = list(cfg.CLASS_NAMES)
        point_feature_encoder = Enc()
        grid_size = np.array([1, 1, 1])
        point_cloud_range = np.array([0, -40, -3, 70.4, 40, 1])
        voxel_size = [0.05, 0.05, 0.1]
        depth_downsample_factor = None

    model = RefPointRCNN(model_cfg=cfg.MODEL, num_class=1, dataset=DS()).eval()
    with torch.no_grad():
        for m in model.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    yield types.SimpleNamespace(model=model, cfg=cfg)
    sys.path.remove(str(REF_PCDET))


def _ref_forward(ref, scenes):
    """Reference eval forward on a list of (N, 4) scenes → per-scene preds."""
    import torch

    pts = []
    for i, s in enumerate(scenes):
        pts.append(np.concatenate(
            [np.full((len(s), 1), i, np.float32), s], axis=1))
    batch = {
        "batch_size": len(scenes),
        "points": torch.from_numpy(np.concatenate(pts)),
    }
    with torch.no_grad():
        pred_dicts, _ = ref.model(batch)
    return [{k: v.numpy() for k, v in d.items()} for d in pred_dicts]


@pytest.fixture(scope="module")
def ours(ref_model):
    import jax
    import jax.numpy as jnp

    from modest_tpu.models.pointrcnn import PointRCNN, post_process
    from modest_tpu.ops import pointnet2 as P2
    from modest_tpu.train.torch_convert import convert_pointrcnn_state
    from modest_tpu.utils.config import cfg_from_yaml_file

    P2.set_exact_ops(True)
    cfg = cfg_from_yaml_file(CFG_YAML)
    model = PointRCNN(model_cfg=cfg.MODEL, num_class=1)
    pts = jnp.zeros((2, N_PTS, 4), jnp.float32)
    var = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        pts, jnp.zeros((2, 2, 8), jnp.float32), train=True)
    state = {k: v for k, v in ref_model.model.state_dict().items()
             if k != "global_step"}
    params, stats, report = convert_pointrcnn_state(
        state, var["params"], var["batch_stats"])

    @jax.jit
    def infer(pts):
        out = model.apply({"params": params, "batch_stats": stats},
                          pts, train=False)
        final = post_process(out, cfg.MODEL.POST_PROCESSING)
        return final

    yield types.SimpleNamespace(infer=infer, report=report)
    P2.set_exact_ops(False)


def _match_1to1(boxes, scores, rb, rs):
    """Greedy 1:1 match: same center (<1 cm), size (<2e-3) and score
    (<5e-4). Returns matched pair indices."""
    used = np.zeros(len(boxes), bool)
    pairs = []
    for j in range(len(rb)):
        d = np.linalg.norm(boxes[:, :3] - rb[j, :3], axis=1)
        ds = np.abs(boxes[:, 3:6] - rb[j, 3:6]).max(axis=1)
        cand = np.flatnonzero((d < 1e-2) & (ds < 2e-3)
                              & (np.abs(scores - rs[j]) < 5e-4) & ~used)
        if len(cand):
            used[cand[0]] = True
            pairs.append((int(cand[0]), j))
    return pairs


def test_full_model_final_boxes_match(ref_model, ours):
    """≥10 synthetic scenes: same weights ⇒ same final detections.

    ≥99% of detections must match 1:1 (center < 1 cm, sizes < 2e-3,
    score < 5e-4, yaw < 2e-3, same label) — both forwards run exact
    reference semantics, but torch-CPU BLAS and XLA-CPU round f32
    differently, so a borderline NMS keep (IoU within float noise of the
    0.85 threshold, or a near-equal score-order swap) can legitimately
    flip a detection; everything non-borderline must be identical."""
    rng = np.random.RandomState(3)
    scenes = [_synth_scene(rng) for _ in range(N_SCENES)]

    total = matched = 0
    for s0 in range(0, N_SCENES, 2):
        pair = scenes[s0:s0 + 2]
        ref_preds = _ref_forward(ref_model, pair)
        final = ours.infer(np.stack(pair))
        for i, rp in enumerate(ref_preds):
            valid = np.asarray(final["valid"][i])
            boxes = np.asarray(final["boxes"][i])[valid]
            scores = np.asarray(final["scores"][i])[valid]
            labels = np.asarray(final["labels"][i])[valid]

            rb, rs, rl = rp["pred_boxes"], rp["pred_scores"], rp["pred_labels"]
            assert abs(len(boxes) - len(rb)) <= 1, (
                f"scene {s0 + i}: {len(boxes)} vs ref {len(rb)} detections")
            pairs = _match_1to1(boxes, scores, rb, rs)
            for a, j in pairs:
                dyaw = abs(float(boxes[a, 6]) - float(rb[j, 6])) % (2 * np.pi)
                assert min(dyaw, 2 * np.pi - dyaw) < 2e-3
                assert labels[a] == rl[j]
            matched += len(pairs)
            total += max(len(rb), len(boxes))
    assert total > 200, "too few detections — test is vacuous"
    assert matched / total >= 0.99, (
        f"only {matched}/{total} detections match the reference's")


def test_full_model_final_boxes_match_production_shape(ref_model, ours):
    """Same claim at the flagship's PRODUCTION operating point — 12288
    pts/scan (tools/cfgs/lyft_models/pointrcnn_dynamic_obj.yaml
    NUM_POINTS / bench.py) — so the parity evidence covers the shapes the
    published checkpoints actually run at (VERDICT r4 item 7). Fewer
    scenes than the 6144-pt test: the torch-CPU reference forward is ~4×
    slower at this size."""
    rng = np.random.RandomState(11)
    n = 12288
    scenes = [_synth_scene(rng, n=n) for _ in range(4)]

    total = matched = 0
    for s0 in range(0, len(scenes), 2):
        pair = scenes[s0:s0 + 2]
        ref_preds = _ref_forward(ref_model, pair)
        final = ours.infer(np.stack(pair))
        for i, rp in enumerate(ref_preds):
            valid = np.asarray(final["valid"][i])
            boxes = np.asarray(final["boxes"][i])[valid]
            scores = np.asarray(final["scores"][i])[valid]
            labels = np.asarray(final["labels"][i])[valid]
            rb, rs, rl = rp["pred_boxes"], rp["pred_scores"], rp["pred_labels"]
            assert abs(len(boxes) - len(rb)) <= 2, (
                f"scene {s0 + i}: {len(boxes)} vs ref {len(rb)} detections")
            pairs = _match_1to1(boxes, scores, rb, rs)
            for a, j in pairs:
                dyaw = abs(float(boxes[a, 6]) - float(rb[j, 6])) % (2 * np.pi)
                assert min(dyaw, 2 * np.pi - dyaw) < 2e-3
                assert labels[a] == rl[j]
            matched += len(pairs)
            total += max(len(rb), len(boxes))
    assert total > 80, "too few detections — test is vacuous"
    assert matched / total >= 0.98, (
        f"only {matched}/{total} detections match the reference's at 12288 pts")
