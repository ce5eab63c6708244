"""Process-pool prefetch loader: ordering, determinism vs inline, pool
lifecycle (reuse across epochs, clean close), wrap padding, device prefetch.

The pool path is forced with `use_procs=True` — this host has one core, so
the auto heuristic would otherwise route every test through the inline
path and leave the fork-pool code (the production configuration on real
TPU-VM hosts) unexercised.
"""
import numpy as np

from modest_tpu.data.loader import DataLoader, prefetch_to_device


class _StubDataset:
    """Deterministic dataset: sample i is a constant-i point block."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "frame_id": f"{i:06d}",
            "points": np.full((16, 4), float(i), np.float32),
            "gt_boxes": np.full((2, 8), float(i), np.float32)[None][0].reshape(2, 8)[: 1 + i % 2],
        }


class _AugDataset(_StubDataset):
    """Adds np.random noise — exercises the per-batch seed plumbing that
    makes output bit-identical for ANY worker count."""

    def __getitem__(self, i):
        s = super().__getitem__(i)
        s["points"] = s["points"] + np.random.rand(16, 4).astype(np.float32)
        return s


def _batches(loader):
    return [(tuple(b["frame_id"]), b["points"].copy()) for b in loader]


def test_process_loader_matches_inline_order():
    ds = _StubDataset(13)
    sync = DataLoader(ds, 3, shuffle=True, seed=7, num_workers=0)
    proc = DataLoader(ds, 3, shuffle=True, seed=7, num_workers=3,
                      use_procs=True)
    sync.set_epoch(2)
    proc.set_epoch(2)
    a, b = _batches(sync), _batches(proc)
    proc.close()
    assert len(a) == len(b) == len(sync) == 4  # drop_last
    for (fa, pa), (fb, pb) in zip(a, b):
        assert fa == fb
        np.testing.assert_array_equal(pa, pb)


def test_process_loader_bit_identical_under_augmentation():
    """Augmentation RNG is seeded per (loader seed, epoch, batch): the fork
    pool must reproduce the inline stream bit-for-bit."""
    ds = _AugDataset(12)
    sync = DataLoader(ds, 4, shuffle=True, seed=11, num_workers=0)
    proc = DataLoader(ds, 4, shuffle=True, seed=11, num_workers=2,
                      use_procs=True)
    for epoch in (0, 1):
        sync.set_epoch(epoch)
        proc.set_epoch(epoch)
        for (fa, pa), (fb, pb) in zip(_batches(sync), _batches(proc)):
            assert fa == fb
            np.testing.assert_array_equal(pa, pb)
    proc.close()


def test_process_pool_reused_across_epochs_and_closes():
    ds = _StubDataset(8)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2, use_procs=True)
    assert len(_batches(loader)) == 4
    pool_first = loader._pool
    assert pool_first is not None
    loader.set_epoch(1)
    assert len(_batches(loader)) == 4
    assert loader._pool is pool_first  # ONE persistent pool, not per-epoch
    loader.close()
    assert loader._pool is None
    # iteration after close() transparently re-creates the pool
    assert len(_batches(loader)) == 4
    loader.close()


def test_process_loader_wrap_padding():
    ds = _StubDataset(5)
    loader = DataLoader(ds, 4, shuffle=False, drop_last=False, num_workers=2,
                        use_procs=True)
    batches = _batches(loader)
    loader.close()
    assert len(batches) == 2
    # tail batch wraps to the head to keep static shapes
    assert batches[1][0] == ("000004", "000000", "000001", "000002")


def test_process_loader_early_break_reusable():
    ds = _StubDataset(12)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2, use_procs=True)
    for i, b in enumerate(loader):
        if i == 1:
            break
    # iterating again after an early break yields the full epoch
    assert len(_batches(loader)) == 6
    loader.close()


def test_single_core_auto_heuristic_runs_inline():
    """With use_procs unset on a 1-core host the loader must not fork."""
    import multiprocessing as mp

    if (mp.cpu_count() or 1) > 1:
        import pytest

        pytest.skip("multi-core host: auto heuristic legitimately forks")
    ds = _StubDataset(6)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=4)
    assert len(_batches(loader)) == 3
    assert getattr(loader, "_pool", None) is None


def test_prefetch_to_device_passthrough():
    ds = _StubDataset(8)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2, use_procs=True)
    seen = [b["frame_id"] for b in prefetch_to_device(loader, None, size=2)]
    loader.close()
    assert seen == [[f"{2*i:06d}", f"{2*i+1:06d}"] for i in range(4)]


def test_prefetch_to_device_sharded():
    import jax

    from modest_tpu.parallel.mesh import make_mesh

    ds = _StubDataset(8)
    mesh = make_mesh(2)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=1)
    out = list(prefetch_to_device(loader, mesh, size=2))
    assert len(out) == 4
    arr = out[0]["points"]
    assert isinstance(arr, jax.Array) and arr.shape == (2, 16, 4)
    assert len(arr.sharding.device_set) == 2
    np.testing.assert_array_equal(np.asarray(arr)[0], np.full((16, 4), 0.0))
