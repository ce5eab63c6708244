"""Load the reference's released torch checkpoints into modest_tpu.

MODEST publishes PointRCNN `.pth` checkpoints per self-training round
(reference README.md:98-123; ckpt format {epoch, it, model_state,
optimizer_state, version}, tools/train_utils/train_utils.py:118-152). This
module converts that `model_state` into our flax param/batch_stats trees so
a reference user can evaluate or fine-tune their existing checkpoints here.

Layout facts the conversion relies on (verified by layer-level forward
equality in tests/test_torch_convert.py):
- the reference's 1x1 Conv2d/Conv1d/Linear stacks are our channel-last
  Dense layers: kernel = torch weight (out, in, 1, 1) → squeeze → transpose;
- torch BatchNorm{1,2}d (weight, bias, running_mean, running_var) →
  flax BatchNorm (scale, bias) + batch_stats (mean, var);
- grouped SA inputs concatenate [xyz, features] on both sides
  (pointnet2_utils.py:257 ↔ ops/pointnet2.query_and_group);
- FP modules run deepest-first: reference FP_modules.{n-1-i} ≡ our
  FPModule_{i} (pointnet2_backbone.py forward ↔ models/pointnet2_backbone).
"""
from __future__ import annotations

import copy
import re

import numpy as np

__all__ = ["convert_pointrcnn_state", "load_reference_pth"]


def _np(v) -> np.ndarray:
    """torch tensor (possibly requires_grad, on any device) or array → numpy."""
    if hasattr(v, "detach"):
        v = v.detach().cpu()
    return np.asarray(v)


def _seq_layers(model_state, prefix, report=None):
    """Ordered [(kind, tensors)] for a torch nn.Sequential prefix; kind is
    'lin' (conv/linear) or 'bn'. Robust to ReLU/Dropout index gaps. Marks
    every key under the prefix as consumed in the report."""
    idxs = sorted({
        int(m.group(1))
        for k in model_state
        if (m := re.match(re.escape(prefix) + r"\.(\d+)\.", k))
    })
    out = []
    for i in idxs:
        keys = [k for k in model_state if k.startswith(f"{prefix}.{i}.")]
        if report is not None:
            report.used.update(keys)
        tensors = {k[len(prefix) + len(str(i)) + 2:]: np.asarray(model_state[k])
                   for k in keys}
        if "running_mean" in tensors:
            out.append(("bn", tensors))
        elif "weight" in tensors:
            out.append(("lin", tensors))
    return out


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv/linear weight (out, in, *1s) → flax Dense kernel (in, out)."""
    assert int(np.prod(w.shape[2:], initial=1)) == 1, \
        f"not a 1x1/pointwise weight: {w.shape}"
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


class _Report:
    def __init__(self):
        self.converted = []
        self.skipped_ref = []
        self.used = set()  # reference keys actually consumed

    def __repr__(self):
        return (f"<torch_convert: {len(self.converted)} tensors converted, "
                f"{len(self.skipped_ref)} reference keys unused>")


def _put(tree, path, value, report, what):
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"{what}: no module {'/'.join(path)} in target tree")
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(f"{what}: no leaf {'/'.join(path)} in target tree")
    have = np.asarray(node[leaf])
    if have.shape != value.shape:
        raise ValueError(
            f"{what}: shape mismatch at {'/'.join(path)}: "
            f"checkpoint {value.shape} vs model {have.shape}")
    node[leaf] = value.astype(have.dtype)
    report.converted.append("/".join(path))


def _convert_seq(model_state, prefix, params, stats, base_path, report,
                 final_dense_path=None):
    """Torch Sequential → SharedMLP dict at base_path. With
    final_dense_path, the LAST linear goes there instead (FCHead layout)."""
    layers = _seq_layers(model_state, prefix, report)
    if not layers:
        raise KeyError(f"no tensors under {prefix}")
    lins = [t for k, t in layers if k == "lin"]
    bns = [t for k, t in layers if k == "bn"]
    if final_dense_path is not None:
        *lins, final = lins
    for li, t in enumerate(lins):
        _put(params, base_path + (f"Dense_{li}", "kernel"),
             _dense_kernel(t["weight"]), report, prefix)
        if "bias" in t:
            _put(params, base_path + (f"Dense_{li}", "bias"),
                 t["bias"], report, prefix)
    for bi, t in enumerate(bns):
        _put(params, base_path + (f"BatchNorm_{bi}", "scale"),
             t["weight"], report, prefix)
        _put(params, base_path + (f"BatchNorm_{bi}", "bias"),
             t["bias"], report, prefix)
        _put(stats, base_path + (f"BatchNorm_{bi}", "mean"),
             t["running_mean"], report, prefix)
        _put(stats, base_path + (f"BatchNorm_{bi}", "var"),
             t["running_var"], report, prefix)
    if final_dense_path is not None:
        _put(params, final_dense_path + ("kernel",),
             _dense_kernel(final["weight"]), report, prefix)
        if "bias" in final:
            _put(params, final_dense_path + ("bias",),
                 final["bias"], report, prefix)


def convert_pointrcnn_state(model_state, params, batch_stats):
    """Reference PointRCNN model_state → (params, batch_stats, report).

    model_state: flat dict of torch tensors / numpy arrays keyed
    'backbone_3d.…' / 'point_head.…' / 'roi_head.…'. params/batch_stats:
    trees from our PointRCNN init — returned copies have every matching
    module replaced; a structural or shape mismatch raises.
    """
    ms = {k: _np(v) for k, v in model_state.items()}
    params = copy.deepcopy(
        {k: v for k, v in _to_plain(params).items()})
    batch_stats = copy.deepcopy(_to_plain(batch_stats))
    report = _Report()

    def indices(pattern):
        return sorted({int(m.group(1)) for k in ms
                       if (m := re.match(pattern, k))})

    # backbone SA (MSG) levels
    for i in indices(r"backbone_3d\.SA_modules\.(\d+)\."):
        for j in indices(rf"backbone_3d\.SA_modules\.{i}\.mlps\.(\d+)\."):
            _convert_seq(ms, f"backbone_3d.SA_modules.{i}.mlps.{j}",
                         params, batch_stats,
                         ("backbone", f"SAModuleMSG_{i}", f"SharedMLP_{j}"),
                         report)
    # backbone FP levels (reference deepest index runs first = our _0)
    fp_idx = indices(r"backbone_3d\.FP_modules\.(\d+)\.")
    n_fp = len(fp_idx)
    for i in fp_idx:
        _convert_seq(ms, f"backbone_3d.FP_modules.{i}.mlp",
                     params, batch_stats,
                     ("backbone", f"FPModule_{n_fp - 1 - i}", "SharedMLP_0"),
                     report)
    # point head: cls_layers → FCHead_0, box_layers → FCHead_1
    for ref_name, ours in (("cls_layers", "FCHead_0"), ("box_layers", "FCHead_1")):
        _convert_seq(ms, f"point_head.{ref_name}", params, batch_stats,
                     ("point_head", ours, "SharedMLP_0"), report,
                     final_dense_path=("point_head", ours, "Dense_0"))
    # roi head
    for i in indices(r"roi_head\.SA_modules\.(\d+)\."):
        _convert_seq(ms, f"roi_head.SA_modules.{i}.mlps.0",
                     params, batch_stats,
                     ("roi_head", f"SAModule_{i}", "SharedMLP_0"), report)
    _convert_seq(ms, "roi_head.xyz_up_layer", params, batch_stats,
                 ("roi_head", "SharedMLP_0"), report)
    _convert_seq(ms, "roi_head.merge_down_layer", params, batch_stats,
                 ("roi_head", "SharedMLP_1"), report)
    for ref_name, ours in (("cls_layers", "FCHead_0"), ("reg_layers", "FCHead_1")):
        _convert_seq(ms, f"roi_head.{ref_name}", params, batch_stats,
                     ("roi_head", ours, "SharedMLP_0"), report,
                     final_dense_path=("roi_head", ours, "Dense_0"))

    report.skipped_ref = _unused(ms, report)
    return params, batch_stats, report


def _to_plain(tree):
    """FrozenDict/dict tree → plain nested dict of numpy arrays."""
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (out, in, kh, kw) → flax Conv (kh, kw, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _convtranspose2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) → flax ConvTranspose
    (kh, kw, in, out). flax's transposed conv does not flip the kernel
    (lax.conv_transpose transpose_kernel=False), torch's does — flip
    spatially to compensate (verified numerically)."""
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _sparse_kernel(w: np.ndarray, want_shape, layout: str) -> np.ndarray:
    """spconv weight → our flattened (kvol*in, out) sparse kernel.

    spconv 1.x (what the reference pins) stores (kz, ky, kx, in, out) —
    exactly our window-major/channel-minor flattening (the window offsets
    enumerate z, y, x 'ij', and sparse convs correlate, no flip — verified
    vs a dense torch Conv3d oracle in tests). spconv 2.x checkpoints store
    (out, kz, ky, kx, in). The layout is decided ONCE per checkpoint from a
    non-square probe layer (square layers fit both layouts by shape).
    """
    if layout == "spconv2":
        w = w.transpose(1, 2, 3, 4, 0)
    flat = w.reshape(-1, w.shape[-1])
    if flat.shape != tuple(want_shape):
        raise ValueError(f"sparse kernel {w.shape} ({layout}) does not fit "
                         f"target {tuple(want_shape)}")
    return np.ascontiguousarray(flat)


def _detect_spconv_layout(w_probe: np.ndarray, out_channels: int) -> str:
    """Decide the checkpoint's sparse-weight layout from a NON-square layer
    (e.g. conv_input, in=4/5 ≠ out=16)."""
    if w_probe.shape[-1] == out_channels and w_probe.shape[0] != out_channels:
        return "spconv1"  # (kz, ky, kx, in, out)
    if w_probe.shape[0] == out_channels and w_probe.shape[-1] != out_channels:
        return "spconv2"  # (out, kz, ky, kx, in)
    raise ValueError(f"cannot decide spconv layout from probe {w_probe.shape} "
                     f"(out={out_channels}); square probe layer?")


def _put_sparse_conv(ms, wkey, params, path, report, layout):
    node = params
    for p in path[:-1]:
        node = node[p]
    want = np.asarray(node[path[-1]]).shape
    report.used.add(wkey)
    _put(params, path, _sparse_kernel(ms[wkey], want, layout), report, wkey)


def _unused(ms, report):
    return [k for k in ms
            if k not in report.used and not k.endswith("num_batches_tracked")]


def _put_masked_bn(t, params, stats, base, report, what):
    _put(params, base + ("scale",), t["weight"], report, what)
    _put(params, base + ("bias",), t["bias"], report, what)
    _put(stats, base + ("mean",), t["running_mean"], report, what)
    _put(stats, base + ("var",), t["running_var"], report, what)


def _convert_bev_and_head(ms, params, batch_stats, report):
    """backbone_2d blocks/deblocks + anchor-head 1x1 convs (shared by the
    PointPillar and SECOND converters)."""

    def indices(pattern):
        return sorted({int(m.group(1)) for k in ms
                       if (m := re.match(pattern, k))})

    ci = bi = 0
    for blk in indices(r"backbone_2d\.blocks\.(\d+)\."):
        for kind, t in _seq_layers(ms, f"backbone_2d.blocks.{blk}", report):
            if kind == "lin":
                _put(params, ("backbone_2d", f"Conv_{ci}", "kernel"),
                     _conv2d_kernel(t["weight"]), report, "backbone_2d")
                ci += 1
            else:
                _put(params, ("backbone_2d", f"BatchNorm_{bi}", "scale"),
                     t["weight"], report, "backbone_2d")
                _put(params, ("backbone_2d", f"BatchNorm_{bi}", "bias"),
                     t["bias"], report, "backbone_2d")
                _put(batch_stats, ("backbone_2d", f"BatchNorm_{bi}", "mean"),
                     t["running_mean"], report, "backbone_2d")
                _put(batch_stats, ("backbone_2d", f"BatchNorm_{bi}", "var"),
                     t["running_var"], report, "backbone_2d")
                bi += 1
        de = f"backbone_2d.deblocks.{blk}"
        if any(k.startswith(de) for k in ms):
            assert f"ConvTranspose_{blk}" in params["backbone_2d"], \
                "sub-unit upsample strides (plain conv deblocks) not supported"
            for kind, t in _seq_layers(ms, de, report):
                if kind == "lin":
                    _put(params, ("backbone_2d", f"ConvTranspose_{blk}", "kernel"),
                         _convtranspose2d_kernel(t["weight"]), report, de)
                else:
                    _put(params, ("backbone_2d", f"BatchNorm_{bi}", "scale"),
                         t["weight"], report, de)
                    _put(params, ("backbone_2d", f"BatchNorm_{bi}", "bias"),
                         t["bias"], report, de)
                    _put(batch_stats, ("backbone_2d", f"BatchNorm_{bi}", "mean"),
                         t["running_mean"], report, de)
                    _put(batch_stats, ("backbone_2d", f"BatchNorm_{bi}", "var"),
                         t["running_var"], report, de)
                    bi += 1

    for ref_name, ours in (("conv_cls", "Conv_0"), ("conv_box", "Conv_1"),
                           ("conv_dir_cls", "Conv_2")):
        wkey = f"dense_head.{ref_name}.weight"
        if wkey not in ms:
            continue
        report.used.update((wkey, f"dense_head.{ref_name}.bias"))
        _put(params, ("dense_head", ours, "kernel"),
             _conv2d_kernel(ms[wkey]), report, ref_name)
        _put(params, ("dense_head", ours, "bias"),
             ms[f"dense_head.{ref_name}.bias"], report, ref_name)


def convert_second_state(model_state, params, batch_stats):
    """Reference SECOND model_state → (params, batch_stats, report).

    backbone_3d (spconv VoxelBackBone8x) maps stage-for-stage onto our
    gather-scatter backbone: conv_input/conv1 SubM stacks → the same-named
    SparseBasicBlocks, each stage's strided opener → conv{s}_down(+_bn),
    its two SubM blocks → conv{s}_{a,b}, conv_out → conv_out(+_bn). MeanVFE
    has no parameters; backbone_2d / dense_head share the pillar path.
    """
    ms = {k: _np(v) for k, v in model_state.items()}
    params = copy.deepcopy(_to_plain(params))
    batch_stats = copy.deepcopy(_to_plain(batch_stats))
    report = _Report()
    b3 = ("backbone_3d",)
    # conv_input is never square (in 4/5 vs out 16) → safe layout probe
    layout = _detect_spconv_layout(
        ms["backbone_3d.conv_input.0.weight"],
        ms["backbone_3d.conv_input.1.weight"].shape[0])

    def subm_block(ref_prefix, our_name):
        layers = _seq_layers(ms, ref_prefix, report)
        assert [k for k, _ in layers] == ["lin", "bn"], (ref_prefix, layers)
        _put_sparse_conv(ms, f"{ref_prefix}.0.weight", params,
                         b3 + (our_name, "SubMConv3d_0", "kernel"), report,
                         layout)
        _put_masked_bn(layers[1][1], params, batch_stats,
                       b3 + (our_name, "MaskedBatchNorm_0"), report, ref_prefix)

    subm_block("backbone_3d.conv_input", "conv_input")
    subm_block("backbone_3d.conv1.0", "conv1")
    for s in (2, 3, 4):
        down = f"backbone_3d.conv{s}.0"
        layers = _seq_layers(ms, down, report)
        _put_sparse_conv(ms, f"{down}.0.weight", params,
                         b3 + (f"conv{s}_down", "kernel"), report, layout)
        _put_masked_bn(layers[1][1], params, batch_stats,
                       b3 + (f"conv{s}_down_bn",), report, down)
        subm_block(f"backbone_3d.conv{s}.1", f"conv{s}_a")
        subm_block(f"backbone_3d.conv{s}.2", f"conv{s}_b")
    out_layers = _seq_layers(ms, "backbone_3d.conv_out", report)
    _put_sparse_conv(ms, "backbone_3d.conv_out.0.weight", params,
                     b3 + ("conv_out", "kernel"), report, layout)
    _put_masked_bn(out_layers[1][1], params, batch_stats,
                   b3 + ("conv_out_bn",), report, "conv_out")

    _convert_bev_and_head(ms, params, batch_stats, report)
    report.skipped_ref = _unused(ms, report)
    return params, batch_stats, report


def convert_pointpillar_state(model_state, params, batch_stats):
    """Reference PointPillar model_state → (params, batch_stats, report).

    vfe.pfn_layers.k (Linear+BN1d) → vfe/Dense_k + MaskedBatchNorm_k (the
    feature order [xyzi, cluster, center] matches PillarVFE);
    backbone_2d.blocks/deblocks → the flax creation-order Conv_k /
    ConvTranspose_i / BatchNorm_k numbering of models.grid_detectors
    .BEVBackbone (per block: conv+bn ×(1+n_layers), then its deblock's
    ConvTranspose+bn); dense_head conv_cls/box/dir_cls → Conv_0/1/2.
    """
    ms = {k: _np(v) for k, v in model_state.items()}
    params = copy.deepcopy(_to_plain(params))
    batch_stats = copy.deepcopy(_to_plain(batch_stats))
    report = _Report()

    def indices(pattern):
        return sorted({int(m.group(1)) for k in ms
                       if (m := re.match(pattern, k))})

    # PFN layers
    for k in indices(r"vfe\.pfn_layers\.(\d+)\."):
        report.used.update(kk for kk in ms if kk.startswith(f"vfe.pfn_layers.{k}."))
        _put(params, ("vfe", f"Dense_{k}", "kernel"),
             _dense_kernel(ms[f"vfe.pfn_layers.{k}.linear.weight"]), report, "vfe")
        _put(params, ("vfe", f"MaskedBatchNorm_{k}", "scale"),
             ms[f"vfe.pfn_layers.{k}.norm.weight"], report, "vfe")
        _put(params, ("vfe", f"MaskedBatchNorm_{k}", "bias"),
             ms[f"vfe.pfn_layers.{k}.norm.bias"], report, "vfe")
        _put(batch_stats, ("vfe", f"MaskedBatchNorm_{k}", "mean"),
             ms[f"vfe.pfn_layers.{k}.norm.running_mean"], report, "vfe")
        _put(batch_stats, ("vfe", f"MaskedBatchNorm_{k}", "var"),
             ms[f"vfe.pfn_layers.{k}.norm.running_var"], report, "vfe")

    _convert_bev_and_head(ms, params, batch_stats, report)
    report.skipped_ref = _unused(ms, report)
    return params, batch_stats, report


def _put_bn2d(ms, prefix, params, stats, base, report):
    """torch BatchNorm2d tensors at `prefix.` → flax BatchNorm at base."""
    report.used.update(k for k in ms if k.startswith(prefix + "."))
    _put(params, base + ("scale",), ms[prefix + ".weight"], report, prefix)
    _put(params, base + ("bias",), ms[prefix + ".bias"], report, prefix)
    _put(stats, base + ("mean",), ms[prefix + ".running_mean"], report, prefix)
    _put(stats, base + ("var",), ms[prefix + ".running_var"], report, prefix)


def _put_conv2d(ms, key, params, base, report, bias=False):
    report.used.add(key + ".weight")
    _put(params, base + ("kernel",), _conv2d_kernel(ms[key + ".weight"]),
         report, key)
    if bias and key + ".bias" in ms:
        report.used.add(key + ".bias")
        _put(params, base + ("bias",), ms[key + ".bias"], report, key)


def convert_caddn_ddn_state(model_state, params, batch_stats):
    """DeepLabV3 DDN weights → CaDDN DeepLab-path params (models/
    ddn_deeplabv3.py).

    Accepts either a bare torchvision deeplabv3_resnet50/101 state dict
    (``backbone.conv1.weight`` … — the checkpoint the reference downloads,
    ddn_template.py:80-86) or a full pcdet CaDDN ``model_state``
    (``vfe.ffn.ddn.model.`` prefix, plus ``vfe.ffn.channel_reduce``).
    Non-DDN CaDDN tensors (map_to_bev / backbone_2d / dense_head) are left
    to their init and listed in report.skipped_ref.
    """
    ms = {k: _np(v) for k, v in model_state.items()}
    params = copy.deepcopy(_to_plain(params))
    batch_stats = copy.deepcopy(_to_plain(batch_stats))
    report = _Report()

    pre = ("vfe.ffn.ddn.model."
           if any(k.startswith("vfe.ffn.ddn.model.") for k in ms) else "")
    P, S = params, batch_stats

    def put_bb(torch_name, flax_path, bias=False):
        _put_conv2d(ms, pre + torch_name, P, ("ddn",) + flax_path, report,
                    bias=bias)

    def put_bn(torch_name, flax_path):
        _put_bn2d(ms, pre + torch_name, P, S, ("ddn",) + flax_path, report)

    # stem
    put_bb("backbone.conv1", ("conv1",))
    put_bn("backbone.bn1", ("bn1",))
    # bottleneck layers (torch backbone.layerL.B.* → flax ddn/layerL_B/*)
    blocks = sorted({
        (int(m.group(1)), int(m.group(2)))
        for k in ms
        if (m := re.match(re.escape(pre) + r"backbone\.layer(\d+)\.(\d+)\.", k))
    })
    for li, bi in blocks:
        t = f"backbone.layer{li}.{bi}."
        f = (f"layer{li}_{bi}",)
        for c in ("conv1", "conv2", "conv3"):
            put_bb(t + c, f + (c,))
        for b in ("bn1", "bn2", "bn3"):
            put_bn(t + b, f + (b,))
        if pre + t + "downsample.0.weight" in ms:
            put_bb(t + "downsample.0", f + ("down_conv",))
            put_bn(t + "downsample.1", f + ("down_bn",))
    # ASPP: classifier.0.convs.{0..3} = (conv, bn); convs.4 = pooling branch
    # (pool, conv, bn); project = (conv, bn)
    for i in range(4):
        put_bb(f"classifier.0.convs.{i}.0", ("aspp", f"conv{i}"))
        put_bn(f"classifier.0.convs.{i}.1", ("aspp", f"bn{i}"))
    put_bb("classifier.0.convs.4.1", ("aspp", "conv_pool"))
    put_bn("classifier.0.convs.4.2", ("aspp", "bn_pool"))
    put_bb("classifier.0.project.0", ("aspp", "project"))
    put_bn("classifier.0.project.1", ("aspp", "bn_project"))
    # head tail: classifier.1 conv3x3, classifier.2 bn, classifier.4 1x1+bias
    put_bb("classifier.1", ("head_conv",))
    put_bn("classifier.2", ("head_bn",))
    if pre + "classifier.4.weight" in ms:
        want = np.asarray(_get(P, ("ddn", "head_cls", "kernel"))).shape
        have = ms[pre + "classifier.4.weight"].shape[0]
        if want[-1] == have:
            put_bb("classifier.4", ("head_cls",), bias=True)
        # else: class-count mismatch — the reference's filter_pretrained_dict
        # drops this layer too (ddn_template.py:110-116)
    if pre and pre.startswith("vfe."):
        _put_conv2d(ms, "vfe.ffn.channel_reduce.conv", P, ("channel_reduce",),
                    report)
        _put_bn2d(ms, "vfe.ffn.channel_reduce.bn", P, S,
                  ("channel_reduce_bn",), report)
    report.skipped_ref = _unused(ms, report)
    return params, batch_stats, report


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def convert_torch_state(model_state, params, batch_stats):
    """Detect the checkpoint's model family and convert."""
    keys = list(model_state)
    if any(k.startswith("backbone_3d.SA_modules") for k in keys):
        return convert_pointrcnn_state(model_state, params, batch_stats)
    if any(k.startswith("vfe.pfn_layers") for k in keys):
        return convert_pointpillar_state(model_state, params, batch_stats)
    if any(k.startswith("backbone_3d.conv_input") for k in keys):
        return convert_second_state(model_state, params, batch_stats)
    if any(k.startswith("vfe.ffn.ddn.") or k.startswith("backbone.conv1")
           for k in keys):
        return convert_caddn_ddn_state(model_state, params, batch_stats)
    raise NotImplementedError(
        "unrecognized reference checkpoint family; supported: PointRCNN, "
        f"PointPillar, SECOND, CaDDN/DeepLabV3-DDN (got keys like {keys[:3]})")


def load_reference_pth(path, state):
    """Reference .pth checkpoint file → TrainState with converted weights.

    Accepts both the full training checkpoint ({model_state: ...}) and a
    bare state-dict file.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    model_state = blob.get("model_state", blob) if isinstance(blob, dict) else blob
    params, batch_stats, report = convert_torch_state(
        model_state, state.params, state.batch_stats)
    if report.skipped_ref:
        import warnings

        warnings.warn(
            f"{len(report.skipped_ref)} checkpoint tensors were NOT "
            f"converted (model keeps its init there), e.g. "
            f"{report.skipped_ref[:4]}", stacklevel=2)
    params = _tree_jnp(params)
    batch_stats = _tree_jnp(batch_stats)
    return state.replace(params=params, batch_stats=batch_stats), report


def _tree_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _tree_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
