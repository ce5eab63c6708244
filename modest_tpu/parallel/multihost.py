"""Multi-host (multi-process) initialization.

Reference equivalent: pcdet common_utils.init_dist_slurm/init_dist_pytorch +
tools/scripts/slurm_*.sh (NCCL process groups). In JAX one call wires the
whole pod: jax.distributed.initialize discovers peers from the TPU runtime
(or coordinator env vars under SLURM/GCE), after which jax.devices() spans
all hosts and the same jit-over-Mesh train step scales — data loading is
sharded by process index instead of a DistributedSampler.
"""
from __future__ import annotations

import os


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Initialize JAX multi-process mode. No-ops on a single host.

    On TPU pods the arguments auto-discover; under SLURM they come from the
    environment (SLURM_NTASKS / SLURM_PROCID / the first node as coordinator)
    mirroring the reference's init_dist_slurm:130-155.
    """
    import jax

    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ["SLURM_PROCID"])
        if coordinator_address is None:
            nodelist = os.environ.get("SLURM_STEP_NODELIST", "localhost")
            first = _first_slurm_host(nodelist)
            port = os.environ.get("MODEST_TPU_COORD_PORT", "12996")
            coordinator_address = f"{first}:{port}"
    if num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _first_slurm_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist, handling dashed hostnames and
    bracketed ranges: "tpu-vm-[001-004,007],other" → "tpu-vm-001"
    (the reference shells out to `scontrol show hostname`,
    common_utils.py:137; parse locally to avoid the dependency)."""
    import re

    m = re.match(r"^([^\[,]+)\[([^\]]+)\]", nodelist)
    if m:
        prefix, ranges = m.group(1), m.group(2)
        first = ranges.split(",")[0].split("-")[0]
        return prefix + first
    return nodelist.split(",")[0]


def shard_indices_for_process(n_items: int, process_id: int | None = None,
                              num_processes: int | None = None):
    """Per-process slice of the dataset (DistributedSampler equivalent)."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    return list(range(pid, n_items, nproc))


def merge_results_dist(part_results: list, tmpdir, part_id: int | None = None,
                       num_parts: int | None = None):
    """Merge per-process eval results through a shared filesystem
    (reference common_utils.merge_results_dist:194-216).

    Every process dumps ``result_part_{pid}.pkl`` into ``tmpdir``; process 0
    waits for all parts, concatenates them in interleaved-shard order (the
    inverse of shard_indices_for_process) and returns the full list; other
    processes return None.
    """
    import pickle
    import time
    from pathlib import Path

    import jax

    import os

    pid = jax.process_index() if part_id is None else part_id
    nproc = jax.process_count() if num_parts is None else num_parts
    tmpdir = Path(tmpdir)
    tmpdir.mkdir(parents=True, exist_ok=True)
    # atomic publish: a reader can never observe a partially-written pickle
    final_path = tmpdir / f"result_part_{pid}.pkl"
    tmp_path = tmpdir / f".result_part_{pid}.pkl.tmp"
    with open(tmp_path, "wb") as f:
        pickle.dump(part_results, f)
    os.replace(tmp_path, final_path)
    if part_id is None and jax.process_count() > 1:
        # real multi-process run: barrier so process 0 can also safely
        # DELETE parts after merging (reference uses dist.barrier())
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("merge_results_dist_write")
    if pid != 0:
        return None
    parts = []
    for i in range(nproc):
        path = tmpdir / f"result_part_{i}.pkl"
        deadline = time.time() + 600
        while not path.exists():
            if time.time() > deadline:
                raise TimeoutError(f"missing eval part {path}")
            time.sleep(2)
        with open(path, "rb") as f:
            parts.append(pickle.load(f))
        path.unlink()  # never merge a stale part from a previous run
    # inverse interleave: item j of part i was global index i + j*nproc
    total = sum(len(p) for p in parts)
    merged = [None] * total
    for i, p in enumerate(parts):
        for j, r in enumerate(p):
            merged[i + j * nproc] = r
    return merged
