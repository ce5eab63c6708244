"""Dev: isolate the round-4 seed-gen regression — fused kNN+DBSCAN program
vs the round-3 two-dispatch path, with retry counts and stage walls.

Times, on identical prepped frames (bench_pipeline synth, Lyft density):
  a. fused _knn_dbscan_fused call (one dispatch)         [round-4 path]
  b. _knn_windowed_batch then _dbscan_device             [round-3 path]
  c. full dbscan_pp (host prep + post included)
  d. generate_mask_for_frame stage split (mask/dbscan/filter/fit)

Usage: timeout 3600 python scripts_dev/seedgen_ab.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from modest_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench_pipeline import synth_frame
from modest_tpu.pipeline import clustering as cl

rng = np.random.RandomState(0)
KW = dict(n_neighbors=70, radius=2.0, eps=0.1, min_samples=10)


def fetch(x):
    return np.asarray(jax.device_get(jnp.ravel(x)[0]))


def make_frames(nf):
    out = []
    for _ in range(nf):
        pts = synth_frame(rng)
        pp = rng.rand(len(pts)).astype(np.float32)
        pp[:60000] = 0.85
        pp[60000:60000 + 12 * 800] = 0.05
        # the pipeline clusters the above-plane+in-range subset (~36k pts);
        # approximate that here by dropping the dense ground sheet
        keep = np.ones(len(pts), bool)
        keep[:60000] = pts[:60000, 2] > -1.35
        out.append((pts[keep, :3], pp[keep]))
    return out


def main():
    frames = make_frames(4)
    print(f"frame sizes: {[f[0].shape[0] for f in frames]}", flush=True)

    # ---- shared prep (exactly dbscan_pp_many's) ----
    from modest_tpu.ops import pallas_dbscan as PD

    k = KW["n_neighbors"]
    radius, eps, ms = KW["radius"], KW["eps"], KW["min_samples"]
    row_chunk = 1024
    kc = 256
    n_max = max(f[0].shape[0] for f in frames)
    n_pad = cl._bucket(n_max, row_chunk)
    preps = [cl._dbscan_prep(x, p, n_pad, radius, kc) for x, p in frames]
    w_knn = cl._window_width(max(pr[4] for pr in preps), k, kc)
    xb = jnp.asarray(np.stack([pr[1] for pr in preps]))
    pb = jnp.asarray(np.stack([pr[2] for pr in preps]))
    vb = jnp.asarray(np.stack([pr[3] for pr in preps]))
    los, ws = [], []
    for pr in preps:
        lo, w = PD.window_rows(pr[1][:, 0], n_pad, radius)
        los.append(lo)
        ws.append(w)
    w = max(ws)
    lob = jnp.asarray(np.minimum(np.stack(los), n_pad // 128 - w // 128))
    print(f"n_pad={n_pad} w_knn={w_knn} w_dbscan={w} k={k}", flush=True)

    stat = dict(k=k, kc=kc, w_knn=min(w_knn, n_pad), n_pad=n_pad, w=w,
                min_samples=ms, eps=float(eps),
                radius2=float(radius * radius), rounds=12)

    # ---- a. fused one-dispatch ----
    def fused():
        pk, idx, d2 = cl._knn_dbscan_fused(xb, vb, pb, lob, radius, **stat)
        return pk

    pk = fused()
    flags = np.asarray(pk)[:, 0] & 1
    print(f"fused: converged at rounds=12: {bool((flags == 0).all())}", flush=True)
    fetch(pk)
    t0 = time.perf_counter()
    for _ in range(5):
        pk = fused()
    fetch(pk)
    ta = (time.perf_counter() - t0) / 5
    print(f"a. fused program:            {ta * 1e3:7.1f} ms / 4-frame group",
          flush=True)

    # ---- b. two dispatches (round-3 shape) ----
    def two_phase():
        if stat["w_knn"] < n_pad:
            idx, d2 = cl._knn_windowed_batch(xb, vb, k, kc, stat["w_knn"], radius)
        else:
            idx, d2 = cl._knn_batch(xb, vb, k, kc)
        return PD._dbscan_device(pb, vb, lob, idx, d2, n_pad=n_pad, w=w,
                                 min_samples=ms, eps=float(eps),
                                 radius2=float(radius * radius), rounds=12)

    pk2 = two_phase()
    np.testing.assert_array_equal(np.asarray(pk2), np.asarray(pk))
    t0 = time.perf_counter()
    for _ in range(5):
        pk2 = two_phase()
    fetch(pk2)
    tb = (time.perf_counter() - t0) / 5
    print(f"b. two-dispatch (round 3):   {tb * 1e3:7.1f} ms / 4-frame group",
          flush=True)

    # ---- b2. kNN alone ----
    def knn_only():
        return cl._knn_windowed_batch(xb, vb, k, kc, stat["w_knn"], radius)[1]

    d2o = knn_only()
    fetch(d2o)
    t0 = time.perf_counter()
    for _ in range(5):
        d2o = knn_only()
    fetch(d2o)
    print(f"b2. kNN half alone:          "
          f"{(time.perf_counter() - t0) / 5 * 1e3:7.1f} ms", flush=True)

    # ---- c. full dbscan_pp per frame ----
    for x, p in frames[:1]:
        cl.dbscan_pp(x, p, **KW)  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            cl.dbscan_pp(x, p, **KW)
        print(f"c. dbscan_pp single frame:   "
              f"{(time.perf_counter() - t0) / 3 * 1e3:7.1f} ms (host incl.)",
              flush=True)

    # ---- d. generate_mask_for_frame stage split ----
    import runpy
    saved = sys.argv
    sys.argv = ["seed_gen_profile.py"]
    try:
        runpy.run_path(str(Path(__file__).resolve().parent / "seed_gen_profile.py"),
                       run_name="__main__")
    finally:
        sys.argv = saved


if __name__ == "__main__":
    main()
