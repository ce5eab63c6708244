"""compact_select (cumsum+scatter first-k-by-index) vs the index-rank top_k
formulation it replaces on the TPU path of roipoint_pool3d."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modest_tpu.ops import pointnet2 as p2


@pytest.mark.parametrize("n,k,p", [(128, 16, 0.3), (12288, 512, 0.02),
                                   (12288, 512, 0.2), (1024, 512, 0.9),
                                   (512, 512, 0.0)])
def test_compact_select_matches_topk(n, k, p):
    rng = np.random.RandomState(int(n + k + p * 100))
    mask = jnp.asarray(rng.rand(n) < p)
    cnt, idx = jax.jit(p2.compact_select, static_argnums=1)(mask, k)
    cnt = int(cnt)
    assert cnt == int(np.asarray(mask).sum())
    col = jnp.arange(n, dtype=jnp.int32)
    score = jnp.where(mask, -col.astype(jnp.float32), -jnp.inf)
    ts, ti = jax.lax.top_k(score, k)
    valid = int(np.isfinite(np.asarray(ts)).sum())
    np.testing.assert_array_equal(np.asarray(idx)[:min(cnt, k)],
                                  np.asarray(ti)[:valid])


def test_roipoint_pool_wrap_and_empty():
    """Full op through the compact path (force non-exact branch off-CPU is
    impossible here; instead call per-box math directly via the public op —
    CPU keeps the oracle path, so this guards the shared wrap/empty logic)."""
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-5, 5, (1, 256, 3)).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 256, 4).astype(np.float32))
    boxes = jnp.asarray(np.array([[[0, 0, 0, 2, 2, 2, 0.3],
                                   [50, 50, 50, 1, 1, 1, 0.0]]], np.float32))
    pooled, empty = p2.roipoint_pool3d(pts, feats, boxes, num_sampled_points=32)
    assert pooled.shape == (1, 2, 32, 7)
    assert int(empty[0, 0]) == 0 and int(empty[0, 1]) == 1
