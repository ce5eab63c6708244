"""Benchmark: PointRCNN (pointrcnn_dynamic_obj) inference throughput on one
chip — scans/sec at the reference's operating point (12288 pts/scan, full
proposal NMS + RoI refinement + post-processing NMS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against 12.5 scans/sec — the ~80 ms/scan single-GPU
PointRCNN inference figure commonly reported for OpenPCDet-class pipelines
(the reference repo publishes no numbers of its own; see BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 12.5
# driver runs `python bench.py` (B=4, the historical headline operating
# point); `python bench.py 8` or MODEST_BENCH_BATCH sweep other batches
BATCH = 4
WARMUP = 2
ITERS = 10


def _quality_gate(infer_fn, variables, inputs, threshold: float = 0.95):
    """On-chip exact-vs-approx detection gate (VERDICT r3 item 5).

    Runs 2 batches through the default TPU path and through
    MODEST_EXACT_OPS reference semantics, greedily matches post-NMS boxes
    at BEV IoU 0.7, and FAILS LOUDLY (nonzero exit, no metric line) if the
    match fraction drops below ``threshold`` — so a perf change that
    silently alters detections (e.g. the round-3 bf16-coordinate
    cancellation bug) can never produce a green BENCH_r*.json again.
    """
    import jax.numpy as jnp

    from modest_tpu.ops import pointnet2 as p2
    from modest_tpu.ops.iou3d import boxes_iou_bev

    def run(batch_inputs):
        out = []
        for pts in batch_inputs:
            boxes, scores, valid = infer_fn(variables, pts)
            out.append((np.asarray(boxes), np.asarray(scores), np.asarray(valid)))
        return out

    gate_inputs = inputs[:2]
    approx = run(gate_inputs)
    p2.set_exact_ops(True)
    try:
        exact = run(gate_inputs)
    finally:
        p2.set_exact_ops(False)

    tot_e = tot_match = 0
    for (ab, asc, av), (eb, esc, ev) in zip(approx, exact):
        for i in range(ab.shape[0]):
            A, E = ab[i][av[i]], eb[i][ev[i]]
            se = esc[i][ev[i]]
            tot_e += len(E)
            if len(A) == 0 or len(E) == 0:
                continue
            iou = np.asarray(boxes_iou_bev(jnp.asarray(E[:, :7]), jnp.asarray(A[:, :7])))
            used = np.zeros(len(A), bool)
            for j in np.argsort(-se):
                k = int(np.argmax(np.where(used, -1.0, iou[j])))
                if iou[j, k] >= 0.7 and not used[k]:
                    used[k] = True
                    tot_match += 1
    frac = tot_match / max(tot_e, 1)
    print(f"quality gate: exact boxes={tot_e} matched@IoU0.7={tot_match} "
          f"({100 * frac:.1f}%)", file=sys.stderr)
    if frac < threshold:
        print(f"QUALITY GATE FAILED: approx path matches only {100 * frac:.1f}% "
              f"of exact detections (threshold {100 * threshold:.0f}%) — the "
              "fast path is numerically broken; see BENCH.md round-3 "
              "cautionary note.", file=sys.stderr)
        sys.exit(1)


def main():
    import jax
    import jax.numpy as jnp

    from modest_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from modest_tpu.models.pointrcnn import PointRCNN, post_process
    from modest_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
    model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))

    rng = np.random.RandomState(0)
    n = 12288
    points = rng.uniform(0, 1, (BATCH, n, 4)).astype(np.float32)
    points[..., 0] = points[..., 0] * 80  # x in [0, 80]
    points[..., 1] = (points[..., 1] - 0.5) * 80
    points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
    # plant some car-like clusters so the NMS path sees realistic box counts
    for b in range(BATCH):
        for k in range(10):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * 300, (k + 1) * 300)
            points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]

    gt = np.zeros((BATCH, 8, 8), np.float32)
    gt[:, 0, :7] = [10, 0, -1.5, 4, 2, 1.6, 0.3]
    gt[:, 0, 7] = 1
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        jnp.asarray(points), jnp.asarray(gt), train=True,
    )

    @jax.jit
    def infer(variables, pts):
        out = model.apply(variables, pts, train=False)
        final = post_process(out, cfg.MODEL.POST_PROCESSING)
        return final["boxes"], final["scores"], final["valid"]

    # NOTE: block_until_ready can return early on the axon relay platform, so
    # completion is forced with a device→host transfer. Inference is measured
    # PIPELINED (production serving mode): all iterations are enqueued
    # back-to-back with distinct inputs and only the LAST result is fetched —
    # TPU programs execute in order on the device stream, so fetching the
    # final output proves every enqueued step finished, while the ~40 ms
    # relay dispatch round-trip amortizes over the batch instead of being
    # paid per step (it does not exist on a directly-attached host).
    inputs = [
        jnp.asarray(points + rng.randn(*points.shape).astype(np.float32) * 0.01)
        for _ in range(ITERS)
    ]
    for _ in range(WARMUP):
        r = infer(variables, inputs[0])
        np.asarray(r[1])

    def timed_run():
        # sync every SYNC_EVERY steps: keeps the relay queue shallow (deep
        # enqueues can trip FAILED_PRECONDITION) while still amortizing the
        # dispatch round-trip
        sync_every = 5
        t0 = time.perf_counter()
        r = None
        for i in range(ITERS):
            r = infer(variables, inputs[i])
            if (i + 1) % sync_every == 0:
                np.asarray(r[1])
        np.asarray(r[1])
        return time.perf_counter() - t0

    try:
        dt = timed_run()
    except Exception:
        dt = timed_run()  # one retry on transient relay errors
    scans_per_sec = BATCH * ITERS / dt

    if os.environ.get("MODEST_BENCH_NO_GATE", "0") in ("0", "", "false"):
        _quality_gate(infer, variables, inputs)

    print(json.dumps({
        "metric": "pointrcnn_inference_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))
    _perf_gate("pointrcnn_inference_scans_per_sec_per_chip", BATCH, scans_per_sec)


def _perf_gate(metric: str, batch: int, value: float, tolerance: float = 0.10):
    """Perf regression gate (VERDICT r4 item 2 — the subsystem whose absence
    let two consecutive end-of-round commits ship unbenched regressions).

    Compares the measured number against the last ACCEPTED value in the
    committed BENCH_BASELINE.json and exits nonzero on a >10% drop. The
    metric line is printed BEFORE this runs so the evidence is recorded
    either way. Skip during dev A/Bs with MODEST_BENCH_NO_PERF_GATE=1;
    raise the baseline only together with a re-published BENCH.md row.
    """
    if os.environ.get("MODEST_BENCH_NO_PERF_GATE", "0") not in ("0", "", "false"):
        return
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    try:
        with open(path) as f:
            accepted = json.load(f).get(metric, {}).get(str(batch))
    except (OSError, ValueError):
        accepted = None
    if accepted is None:
        print(f"perf gate: no accepted baseline for {metric} @ batch={batch}; "
              "skipping", file=sys.stderr)
        return
    floor = accepted * (1.0 - tolerance)
    if value < floor:
        print(f"PERF GATE FAILED: {value:.2f} scans/s is >{tolerance * 100:.0f}% "
              f"below the last accepted {accepted:.2f} (floor {floor:.2f}) for "
              f"batch={batch}. A device-path change regressed the flagship — "
              "fix it or explicitly re-baseline BENCH_BASELINE.json together "
              "with a BENCH.md entry explaining why.", file=sys.stderr)
        sys.exit(1)
    print(f"perf gate: {value:.2f} >= floor {floor:.2f} "
          f"(accepted {accepted:.2f}) ok", file=sys.stderr)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("batch", nargs="?", type=int,
                        default=int(os.environ.get("MODEST_BENCH_BATCH", "4")),
                        help="batch size per inference step (default 4)")
    BATCH = parser.parse_args().batch
    main()
