"""Dev: measured HBM bandwidth calibration + achieved train-step GB/s
(VERDICT r3 item 4).

The round-3 roofline number (60.2% of peak at B=4) came from XLA's cost
model, which sums operand+output bytes per op and ignores fusion — it is
an upper bound that reports a nonphysical 141% at B=8. This probe replaces
it with a MEASURED utilization:

1. Calibration: time kernels whose HBM traffic is known exactly —
   (a) big-array copy (read N + write N bytes) and (b) big-array sum
   (read N bytes, write ~0) — at several sizes. The asymptote is the
   achievable HBM GB/s on this chip through this relay (the practical
   peak, which also absorbs any relay/runtime fixed overhead the train
   step itself pays).
2. Achieved: wall-clock of the B=4/B=8 train step (same methodology as
   train_step_bench.py) combined with a FUSION-AWARE traffic estimate:
   the measured time of the known-traffic kernel at the cost-model's
   byte count brackets what the step could move at the calibrated rate.
   We report achieved GB/s = cost-model bytes / wall  (upper bound on
   traffic → upper bound on utilization) next to the calibrated peak,
   and the honest inversion: wall × calibrated GB/s = max bytes the step
   could have moved, shown as a fraction of cost-model bytes.

Usage: python scripts_dev/hbm_calibrate.py [batch ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

V5E_HBM_PEAK_GBS = 819.0


def _timed(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    # block_until_ready returns EARLY on the axon relay — a real device→host
    # fetch is the only reliable fence, else warmup work leaks into the
    # timed window (measured: it made an 8-pass kernel "slower" than 32)
    np.asarray(jax.device_get(jnp.ravel(out)[0] if hasattr(out, "ndim") else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # relay: block_until_ready can return early; force a tiny fetch
    np.asarray(jax.device_get(jnp.ravel(out)[0] if hasattr(out, "ndim") else out))
    return (time.perf_counter() - t0) / iters


def calibrate():
    """Measured HBM READ bandwidth with the relay's per-dispatch overhead
    differenced out: K full passes over a 256 MiB buffer inside ONE
    program (fori_loop with an iteration-dependent scale so XLA cannot
    fuse the passes into one read), at two K values — the slope is pure
    HBM traffic. Single-pass kernels are useless here: the relay costs
    5-100 ms per dispatch, swamping a ~1 ms read."""
    import functools

    print("== calibration: K-pass read kernel (overhead differenced) ==",
          flush=True)
    n = 256 * (1 << 20) // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames="k")
    def read_k(a, k):
        def body(i, acc):
            return acc + (a * (1.0 + 1e-9 * i.astype(jnp.float32))).sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    # pass counts large enough that each timed dispatch runs 100s of ms —
    # relay timing noise at this scale is tens of ms, which poisoned an
    # earlier 8-vs-32-pass version (slope came out negative)
    t64 = _timed(lambda a: read_k(a, 64), x, iters=4)
    t256 = _timed(lambda a: read_k(a, 256), x, iters=4)
    bw = (n * 4 * (256 - 64)) / (t256 - t64) / 1e9
    print(f"  64 passes {t64 * 1e3:7.1f} ms | 256 passes {t256 * 1e3:7.1f} ms "
          f"-> slope {bw:6.1f} GB/s "
          f"({100 * bw / V5E_HBM_PEAK_GBS:.1f}% of the 819 GB/s v5e spec)",
          flush=True)
    return bw


def train_step_wall(batch: int):
    import optax

    from modest_tpu.models.pointrcnn import PointRCNN
    from modest_tpu.train.state import create_train_state, make_train_step
    from modest_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file("configs/models/lyft_models/pointrcnn_dynamic_obj.yaml")
    model = PointRCNN(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES))
    rng = np.random.RandomState(0)
    n = 12288
    points = rng.uniform(0, 1, (batch, n, 4)).astype(np.float32)
    points[..., 0] *= 80
    points[..., 1] = (points[..., 1] - 0.5) * 80
    points[..., 2] = (points[..., 2] - 0.5) * 3 - 0.5
    gt = np.zeros((batch, 16, 8), np.float32)
    for b in range(batch):
        for k in range(10):
            c = rng.uniform([5, -30, -1.6], [70, 30, -1.4])
            sl = slice(k * 300, (k + 1) * 300)
            points[b, sl, :3] = c + rng.uniform(-1, 1, (300, 3)) * [2, 0.9, 0.7]
            gt[b, k, :7] = [c[0], c[1], c[2], 4, 2, 1.6, 0.3]
            gt[b, k, 7] = 1

    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, {"points": points, "gt_boxes": gt})
    step = make_train_step(model, cfg.MODEL, tx)
    pts, gtj = jnp.asarray(points), jnp.asarray(gt)
    key = jax.random.PRNGKey(7)

    state, metrics = step(state, pts, gtj, key)
    print(f"B={batch} loss: {float(metrics['loss']):.4f}", flush=True)

    # cost-model bytes for the same step (upper bound on real traffic)
    lowered = jax.jit(step).lower(state, pts, gtj, key)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        model_bytes = float(ca.get("bytes accessed", float("nan")))
    except Exception as e:  # relay may not expose cost analysis
        print(f"  (cost_analysis unavailable: {e})", flush=True)
        model_bytes = float("nan")

    iters = 10
    state, metrics = step(state, pts, gtj, key)  # warm
    float(metrics["loss"])  # real fence (block_until_ready returns early)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, pts, gtj, key)
    v = float(metrics["loss"])  # forces a sync through the relay
    wall = (time.perf_counter() - t0) / iters
    return wall, model_bytes, v


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    peak = calibrate()
    print("\n== train step achieved bandwidth ==", flush=True)
    for b in batches:
        wall, model_bytes, _ = train_step_wall(b)
        max_bytes = wall * peak * 1e9
        print(f"B={b}: wall {wall * 1e3:.1f} ms/step", flush=True)
        if np.isfinite(model_bytes):
            gbs = model_bytes / wall / 1e9
            print(f"  cost-model bytes {model_bytes / 1e9:.2f} GB -> "
                  f"{gbs:.1f} GB/s nominal = {100 * gbs / peak:.1f}% of the "
                  f"CALIBRATED {peak:.0f} GB/s "
                  f"({100 * gbs / V5E_HBM_PEAK_GBS:.1f}% of spec peak)", flush=True)
            print(f"  inversion: at the calibrated rate the step could move "
                  f"{max_bytes / 1e9:.1f} GB; cost model claims "
                  f"{model_bytes / 1e9:.2f} GB -> real traffic is "
                  f"{min(1.0, max_bytes / model_bytes) * 100:.0f}% of the "
                  f"cost-model claim at most"
                  if model_bytes > max_bytes else
                  f"  inversion: step could move {max_bytes / 1e9:.1f} GB at the "
                  f"calibrated rate; cost model claims {model_bytes / 1e9:.2f} GB "
                  f"-> utilization >= {100 * model_bytes / max_bytes:.0f}% only "
                  f"if the cost model were exact (it overcounts)", flush=True)


if __name__ == "__main__":
    main()
