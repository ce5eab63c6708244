"""Dev: round-5 follow-up chip queue (one claim, see tpu_mega1.py).

  1. eval stage wall at B=8 and B=16 — pinpoint the superlinear
     post-backbone stage behind the B=16 collapse (mega2 step 2: backbone
     2.03x but post-backbone 3.42x at 2x batch)
  2. seed-gen stage split + rates — diagnose mega2 step 6's 0.553/2.185
     scans/s (host microbench cleared the round-5 host changes: FrameBins
     build 8.4 ms, segments 1.5 ms, binned lowest 12x in 0.5 ms — all
     strictly faster than the code they replaced)
  3. exact-vs-approx AP parity with a 300-step pre-trained model (random
     init scored 0.00 AP on both paths — vacuous)
  4. headline B=4 re-confirm

Usage: timeout 10800 python scripts_dev/tpu_mega3.py [steps...]
"""
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_SAVED_ARGV = sys.argv
sys.argv = ["tpu_mega1.py", "none"]
try:
    from tpu_mega1 import wait_healthy
finally:
    sys.argv = _SAVED_ARGV

STEPS = sys.argv[1:] or ["1", "2", "3", "4"]
_CANARIED = []


def step(tag):
    def deco(fn):
        if tag in STEPS:
            if not _CANARIED:
                _CANARIED.append(True)
                wait_healthy()
            print(f"\nMEGA3: ==== step {tag}: {fn.__name__} ====", flush=True)
            t0 = time.time()
            try:
                fn()
                print(f"MEGA3: step {tag} done in {time.time() - t0:.0f}s",
                      flush=True)
            except Exception:
                traceback.print_exc()
                print(f"MEGA3: step {tag} FAILED", flush=True)
        return fn
    return deco


def _run_path(script, argv):
    import runpy

    saved = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(str(Path(__file__).resolve().parent / script),
                       run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            raise
    finally:
        sys.argv = saved


@step("1")
def eval_stage_wall():
    _run_path("eval_stage_wall.py", ["eval_stage_wall.py", "8", "16"])


@step("2")
def seed_gen_diagnose():
    _run_path("seed_gen_profile.py", ["seed_gen_profile.py"])
    import bench_pipeline as bp

    rng = np.random.RandomState(0)
    bp.bench_seed_gen(rng, frames=3)


@step("3")
def ap_parity_trained():
    _run_path("exact_ab_check.py",
              ["exact_ab_check.py", "--scenes", "200", "--train-steps", "300"])


@step("4")
def headline_b4():
    # tpu_mega2's @step decorators fire at import; arrange argv so only its
    # step 1 (headline B=4) runs
    saved = sys.argv
    sys.argv = ["tpu_mega2.py", "1"]
    try:
        import tpu_mega2  # noqa: F401
    finally:
        sys.argv = saved


if __name__ == "__main__":
    print("MEGA3: all requested steps attempted", flush=True)
