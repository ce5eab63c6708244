"""2-process jax.distributed integration test (VERDICT r1 item 9).

Launches two real CPU processes with a local coordinator; each initializes
jax.distributed via init_multihost, shards a synthetic eval workload with
shard_indices_for_process, and merges through merge_results_dist across the
process boundary (reference: torch.distributed.launch + merge_results_dist,
pcdet common_utils.py:157-216, tools/scripts/dist_test.sh).
"""
import os
import pickle
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, pickle, sys
import jax
jax.config.update("jax_platforms", "cpu")

from modest_tpu.parallel.multihost import (
    init_multihost, merge_results_dist, shard_indices_for_process)

pid = int(sys.argv[1]); tmpdir = sys.argv[2]; port = sys.argv[3]
ok = init_multihost(coordinator_address=f"127.0.0.1:{port}",
                    num_processes=2, process_id=pid)
assert ok, "init_multihost returned False for 2 processes"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

n_items = 11
idxs = shard_indices_for_process(n_items)
part = [{"frame_id": i, "by": pid} for i in idxs]

# cross-process collective: global mesh over both processes' devices; each
# process contributes its local slice; jit computes the global sum via psum
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from modest_tpu.parallel.mesh import make_mesh, shard_batch

mesh = make_mesh()
assert mesh.size == len(jax.devices()) >= 2
local = np.full((len(mesh.local_devices), 4), float(pid + 1), np.float32)
batch = shard_batch(mesh, {"x": local})
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(batch["x"])
n0 = mesh.size - len(mesh.local_devices) if pid == 1 else len(mesh.local_devices)
expect = 4.0 * (1 * n0 + 2 * (mesh.size - n0))
assert float(total) == expect, (float(total), expect)

# process-sharded loader: shared shuffle, interleaved slices
from modest_tpu.data.loader import DataLoader

class _DS:
    def __len__(self):
        return 8
    def __getitem__(self, i):
        return {"frame_id": f"{i:06d}",
                "points": np.full((4, 4), float(i), np.float32)}

loader = DataLoader(_DS(), 2, shuffle=True, seed=5, process_shard=(pid, 2))
frames = [fid for b in loader for fid in b["frame_id"]]
with open(os.path.join(tmpdir, f"frames_{pid}.pkl"), "wb") as f:
    pickle.dump(frames, f)

merged = merge_results_dist(part, tmpdir)
if pid == 0:
    assert merged is not None
    assert [r["frame_id"] for r in merged] == list(range(n_items)), merged
    with open(os.path.join(tmpdir, "merged_ok.pkl"), "wb") as f:
        pickle.dump(merged, f)
else:
    assert merged is None
print(f"proc {pid} ok", flush=True)
"""


def test_two_process_init_shard_merge(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = 23987
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(tmp_path), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    with open(tmp_path / "merged_ok.pkl", "rb") as f:
        merged = pickle.load(f)
    assert len(merged) == 11
    # interleaved sharding: even indices from proc 0, odd from proc 1
    assert all(r["by"] == r["frame_id"] % 2 for r in merged)
    # loader shards are disjoint and cover the shared shuffled order
    with open(tmp_path / "frames_0.pkl", "rb") as f:
        f0 = pickle.load(f)
    with open(tmp_path / "frames_1.pkl", "rb") as f:
        f1 = pickle.load(f)
    assert len(f0) == len(f1) == 4
    assert not (set(f0) & set(f1))
    assert set(f0) | set(f1) == {f"{i:06d}" for i in range(8)}
