"""Dev: x-windowed RoI pool A/B on the chip (one claim).

Measures, in ONE process with in-process toggling (set_pool_window +
cache drop): B=4 inference rate and B=8 train-step rate for the dense
pool vs MODEST_POOL_WINDOW in {6144, 4096}, plus a box-match quality
check of each windowed variant against the dense path on 8 scenes.

Usage: timeout 7200 python scripts_dev/pool_window_ab.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

_SAVED = sys.argv
sys.argv = ["tpu_mega1.py", "none"]
try:
    from tpu_mega1 import wait_healthy
finally:
    sys.argv = _SAVED

from modest_tpu.models.pointrcnn import PointRCNN, post_process
from modest_tpu.ops import pointnet2 as p2
from modest_tpu.ops.iou3d import boxes_iou_bev
from modest_tpu.train.state import create_train_state, make_train_step
from modest_tpu.utils.config import cfg_from_yaml_file

cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
rng = np.random.RandomState(0)
N = 12288


def scene_batch(batch):
    pts = rng.uniform(0, 1, (batch, N, 4)).astype(np.float32)
    pts[..., 0] *= 80
    pts[..., 1] = (pts[..., 1] - 0.5) * 80
    pts[..., 2] = (pts[..., 2] - 0.5) * 3 - 0.5
    gt = np.zeros((batch, 16, 8), np.float32)
    for b in range(batch):
        for j in range(10):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(j * 300, (j + 1) * 300)
            pts[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
            gt[b, j, :7] = [c[0], c[1], c[2], 4, 2, 1.6, 0.3]
            gt[b, j, 7] = 1
    return pts, gt


points, gt = scene_batch(4)
variables = model.init(
    {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
    jnp.asarray(points), jnp.asarray(gt), train=True)

ITERS = 10
inputs = [jnp.asarray(points + rng.randn(*points.shape).astype(np.float32) * 0.01)
          for _ in range(ITERS)]

tpts, tgt = scene_batch(8)
tx = optax.adam(1e-3)
state = create_train_state(model, tx, {"points": tpts, "gt_boxes": tgt})
tptsj, tgtj = jnp.asarray(tpts), jnp.asarray(tgt)
key = jax.random.PRNGKey(7)

wait_healthy()


def infer_rate():
    @jax.jit
    def infer(variables, pts):
        out = model.apply(variables, pts, train=False)
        final = post_process(out, cfg.MODEL.POST_PROCESSING)
        return final["boxes"], final["scores"], final["valid"]

    for _ in range(2):
        r = infer(variables, inputs[0])
        np.asarray(r[1])
    t0 = time.perf_counter()
    r = None
    for i in range(ITERS):
        r = infer(variables, inputs[i])
        if (i + 1) % 5 == 0:
            np.asarray(r[1])
    np.asarray(r[1])
    rate = 4 * ITERS / (time.perf_counter() - t0)

    dets = []
    for i in range(2):
        b, s, v = infer(variables, inputs[i])
        dets.append((np.asarray(b), np.asarray(s), np.asarray(v)))
    return rate, dets


def train_rate():
    step = make_train_step(model, cfg.MODEL, tx)
    st = jax.tree_util.tree_map(jnp.array, state)
    st, m = step(st, tptsj, tgtj, key)
    float(m["loss"])
    t0 = time.perf_counter()
    it = 8
    for _ in range(it):
        st, m = step(st, tptsj, tgtj, key)
    float(m["loss"])
    ms = (time.perf_counter() - t0) / it * 1e3
    return ms


def match_frac(ref_dets, ab_dets):
    tot = hit = 0
    for (rb, rs, rv), (ab, a_s, av) in zip(ref_dets, ab_dets):
        for i in range(rb.shape[0]):
            R, A = rb[i][rv[i]], ab[i][av[i]]
            tot += len(R)
            if len(R) == 0 or len(A) == 0:
                continue
            iou = np.asarray(boxes_iou_bev(jnp.asarray(R[:, :7]),
                                           jnp.asarray(A[:, :7])))
            used = np.zeros(len(A), bool)
            for j in np.argsort(-rs[i][rv[i]]):
                kbest = int(np.argmax(np.where(used, -1.0, iou[j])))
                if iou[j, kbest] >= 0.7 and not used[kbest]:
                    used[kbest] = True
                    hit += 1
    return hit / max(tot, 1)


results = {}
p2.set_pool_window(0)
rate0, dets0 = infer_rate()
ms0 = train_rate()
print(f"AB: dense      infer B=4 {rate0:6.2f} scans/s | train B=8 "
      f"{ms0:6.1f} ms = {8e3 / ms0:.1f} scans/s", flush=True)

for w in (6144, 4096):
    p2.set_pool_window(w)
    rate, dets = infer_rate()
    ms = train_rate()
    frac = match_frac(dets0, dets)
    print(f"AB: window {w} infer B=4 {rate:6.2f} scans/s | train B=8 "
          f"{ms:6.1f} ms = {8e3 / ms:.1f} scans/s | box match vs dense "
          f"{100 * frac:.2f}%", flush=True)
p2.set_pool_window(0)
print("AB: done", flush=True)
