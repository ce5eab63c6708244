"""Threaded prefetch loader: ordering, wrap padding, device prefetch."""
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


def _batches(loader):
    return [(tuple(b["frame_id"]), b["points"].copy()) for b in loader]


def test_threaded_loader_matches_sync_order():
    ds = _StubDataset(13)
    sync = DataLoader(ds, 3, shuffle=True, seed=7, num_workers=0)
    thr = DataLoader(ds, 3, shuffle=True, seed=7, num_workers=3)
    sync.set_epoch(2)
    thr.set_epoch(2)
    a, b = _batches(sync), _batches(thr)
    assert len(a) == len(b) == len(sync) == 4  # drop_last
    for (fa, pa), (fb, pb) in zip(a, b):
        assert fa == fb
        np.testing.assert_array_equal(pa, pb)


def test_threaded_loader_wrap_padding():
    ds = _StubDataset(5)
    loader = DataLoader(ds, 4, shuffle=False, drop_last=False, num_workers=2)
    batches = _batches(loader)
    assert len(batches) == 2
    # tail batch wraps to the head to keep static shapes
    assert batches[1][0] == ("000004", "000000", "000001", "000002")


def test_threaded_loader_early_break_reusable():
    ds = _StubDataset(12)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2)
    for i, b in enumerate(loader):
        if i == 1:
            break
    # iterating again after an early break yields the full epoch
    assert len(_batches(loader)) == 6


def test_prefetch_to_device_passthrough():
    ds = _StubDataset(8)
    loader = DataLoader(ds, 2, shuffle=False, num_workers=2)
    seen = [b["frame_id"] for b in prefetch_to_device(loader, None, size=2)]
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
