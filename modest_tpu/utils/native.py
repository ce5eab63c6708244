"""ctypes bindings for the native host-ops library (csrc/modest_host.cpp).

Builds the shared library on first use (g++ is baked into the image) and
falls back to the numpy implementations when a compiler is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[1] / "csrc"
_SO = _CSRC / "build" / "libmodest_host.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    src = _CSRC / "modest_host.cpp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = _CSRC / "modest_host.cpp"
        if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        c = ctypes
        lib.mh_load_velo.restype = c.c_int64
        lib.mh_load_velo.argtypes = [c.c_char_p, c.c_void_p, c.c_int64]
        lib.mh_fov_mask.restype = None
        lib.mh_fov_mask.argtypes = [c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p,
                                    c.c_double, c.c_double, c.c_void_p]
        lib.mh_points_in_boxes.restype = None
        lib.mh_points_in_boxes.argtypes = [c.c_void_p, c.c_int64, c.c_int64,
                                           c.c_void_p, c.c_int64, c.c_void_p]
        lib.mh_bev_overlap.restype = None
        lib.mh_bev_overlap.argtypes = [c.c_void_p, c.c_int64, c.c_void_p,
                                       c.c_int64, c.c_void_p]
        lib.mh_bev_iou.restype = None
        lib.mh_bev_iou.argtypes = [c.c_void_p, c.c_int64, c.c_void_p,
                                   c.c_int64, c.c_void_p]
        lib.mh_match_stats.restype = None
        lib.mh_match_stats.argtypes = [c.c_void_p, c.c_int64, c.c_int64,
                                       c.c_void_p, c.c_void_p, c.c_void_p,
                                       c.c_double, c.c_void_p, c.c_int64,
                                       c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def load_velo(path, max_points: int = 400_000):
    lib = get_lib()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    buf = np.empty((max_points, 4), np.float32)
    n = lib.mh_load_velo(str(path).encode(), _ptr(buf), max_points * 4)
    if n < 0:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return buf[:n].copy()


def fov_mask(points: np.ndarray, rect_3x4: np.ndarray, P_3x4: np.ndarray,
             img_shape) -> np.ndarray:
    """points (N,4) f32 velodyne → bool FOV mask (native or numpy)."""
    lib = get_lib()
    pts = np.ascontiguousarray(points[:, :4], np.float32)
    if lib is None:
        rect = pts[:, :3] @ rect_3x4[:, :3].T + rect_3x4[:, 3]
        uvw = rect @ P_3x4[:, :3].T + P_3x4[:, 3]
        uv = uvw[:, :2] / uvw[:, 2:3]
        depth = uvw[:, 2] - P_3x4[2, 3]
        return (
            (uv[:, 0] >= 0) & (uv[:, 0] < img_shape[1])
            & (uv[:, 1] >= 0) & (uv[:, 1] < img_shape[0])
            & (depth >= 0)
        )
    mask = np.empty(len(pts), np.uint8)
    lib.mh_fov_mask(
        _ptr(pts), len(pts),
        _ptr(np.ascontiguousarray(rect_3x4, np.float64)),
        _ptr(np.ascontiguousarray(P_3x4, np.float64)),
        float(img_shape[0]), float(img_shape[1]), _ptr(mask),
    )
    return mask.astype(bool)


def points_in_boxes_index(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(N,) index of the first containing rotated box, -1 if none."""
    lib = get_lib()
    if lib is None or len(boxes) == 0:
        from . import box_np

        return box_np.points_in_box_index(points[:, :3], boxes)
    pts = np.ascontiguousarray(points, np.float32)
    bxs = np.ascontiguousarray(boxes[:, :7], np.float32)
    out = np.empty(len(pts), np.int32)
    lib.mh_points_in_boxes(_ptr(pts), len(pts), pts.shape[1], _ptr(bxs), len(bxs), _ptr(out))
    return out.astype(np.int64)


def bev_iou(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """(N, M) rotated BEV IoU on the host (native; falls back to the JAX op)."""
    lib = get_lib()
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)))
    if lib is None:
        import jax.numpy as jnp

        from ..ops.iou3d import boxes_iou_bev

        return np.array(
            boxes_iou_bev(jnp.asarray(boxes_a[:, :7], jnp.float32),
                          jnp.asarray(boxes_b[:, :7], jnp.float32))
        )
    a = np.ascontiguousarray(boxes_a[:, :7], np.float32)
    b = np.ascontiguousarray(boxes_b[:, :7], np.float32)
    out = np.empty((len(a), len(b)), np.float64)
    lib.mh_bev_iou(_ptr(a), len(a), _ptr(b), len(b), _ptr(out))
    return out


def bev_overlap(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """(N, M) rotated BEV intersection areas on the host."""
    lib = get_lib()
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)))
    if lib is None:
        import jax.numpy as jnp

        from ..ops.iou3d import boxes_overlap_bev

        return np.array(
            boxes_overlap_bev(jnp.asarray(boxes_a[:, :7], jnp.float32),
                              jnp.asarray(boxes_b[:, :7], jnp.float32))
        )
    a = np.ascontiguousarray(boxes_a[:, :7], np.float32)
    b = np.ascontiguousarray(boxes_b[:, :7], np.float32)
    out = np.empty((len(a), len(b)), np.float64)
    lib.mh_bev_overlap(_ptr(a), len(a), _ptr(b), len(b), _ptr(out))
    return out


def match_stats(overlaps, scores, ignored_gt, ignored_det, min_overlap, thresholds):
    """Per-threshold (tp, fp, fn) via the native greedy matcher, or None if
    the library is unavailable (caller falls back to Python)."""
    lib = get_lib()
    if lib is None:
        return None
    ov = np.ascontiguousarray(overlaps, np.float64)
    sc = np.ascontiguousarray(scores, np.float64)
    ig = np.ascontiguousarray(ignored_gt, np.int64)
    idt = np.ascontiguousarray(ignored_det, np.int64)
    th = np.ascontiguousarray(thresholds, np.float64)
    out = np.zeros((len(th), 3), np.int64)
    lib.mh_match_stats(
        _ptr(ov), ov.shape[0], ov.shape[1] if ov.ndim == 2 else 0,
        _ptr(sc), _ptr(ig), _ptr(idt), float(min_overlap),
        _ptr(th), len(th), _ptr(out),
    )
    return out
