"""ctypes bindings for the native (C++) SVO builder/editor.

The native library (native/svo_native.cpp) implements the same
hash-consed octree semantics as the pure-Python SvoSpace — interning,
refcounts, path-copy edits, collapsed terrain build — at C++ speed; it
is the counterpart of the reference's Rust host engine. The library is
compiled on first use with g++ (no pip deps); if no compiler is
available, callers fall back to the Python implementation.

`NativeSvoSpace` mirrors the SvoSpace surface used by the rest of the
framework (get/set/height/capacity/num_nodes/serialize/mem_usage) plus a
bulk `build_terrain`.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

from voxtracer.world.svo import EMPTY, DeviceSvo

_SRC = Path(__file__).resolve().parents[2] / "native" / "svo_native.cpp"
_LIB = Path(__file__).resolve().parents[2] / "native" / "libvoxsvo.so"
_STAMP = _LIB.with_suffix(".so.srchash")

_lib = None


def _src_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()


def _build_library() -> bool:
    """Compile from source; stamp the binary with the source hash so a
    stale (or foreign) .so is never loaded — staleness is content-based,
    not mtime-based (mtimes are checkout-order artifacts after a clone)."""
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=300,
        )
        _STAMP.write_text(_src_hash())
        return True
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    fresh = (
        _LIB.exists()
        and _STAMP.exists()
        and _STAMP.read_text().strip() == _src_hash()
    )
    if not fresh:
        if not _build_library():
            return None
    lib = ctypes.CDLL(str(_LIB))
    lib.vx_new.restype = ctypes.c_void_p
    lib.vx_free.argtypes = [ctypes.c_void_p]
    for name, res in [
        ("vx_capacity", ctypes.c_uint32),
        ("vx_num_nodes", ctypes.c_uint32),
        ("vx_root", ctypes.c_uint32),
        ("vx_height", ctypes.c_uint32),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_void_p]
        fn.restype = res
    lib.vx_mem_usage.argtypes = [ctypes.c_void_p]
    lib.vx_mem_usage.restype = ctypes.c_uint64
    lib.vx_build_terrain.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.vx_build_terrain.restype = ctypes.c_uint32
    lib.vx_get.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vx_get.restype = ctypes.c_int
    lib.vx_leaf_at.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
    ]
    lib.vx_leaf_at.restype = ctypes.c_longlong
    lib.vx_set.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.vx_serialize.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
    lib.vx_serialize.restype = ctypes.c_uint32
    lib.vx_solid_leaf.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.vx_synced.argtypes = [ctypes.c_void_p]
    lib.vx_synced.restype = ctypes.c_int
    lib.vx_delta_size.argtypes = [ctypes.c_void_p]
    lib.vx_delta_size.restype = ctypes.c_uint32
    lib.vx_delta_drain.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vx_extract_boxes.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vx_extract_boxes.restype = ctypes.c_void_p
    lib.vx_boxes_count.argtypes = [ctypes.c_void_p]
    lib.vx_boxes_count.restype = ctypes.c_uint32
    lib.vx_boxes_fill.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vx_boxes_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


class NativeSvoSpace:
    """C++-backed SvoSpace with the same public surface."""

    def __init__(self):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native SVO library unavailable (no g++?)")
        self._lib = lib
        self._h = lib.vx_new()
        self.edited = False  # any point edit since construction

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vx_free(self._h)
            self._h = None

    # -- bulk build ---------------------------------------------------------
    def build_terrain(self, heights: np.ndarray, rgb=(0.5, 0.5, 0.5)):
        """heights: uint32[size, size] indexed [x, z], size = 2^k."""
        heights = np.ascontiguousarray(heights, np.uint32)
        size = heights.shape[0]
        log2 = int(size).bit_length() - 1
        assert 1 << log2 == size and heights.shape == (size, size)
        self._lib.vx_build_terrain(
            self._h,
            heights.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            log2, *[ctypes.c_float(c) for c in rgb],
        )

    # -- SvoSpace surface ----------------------------------------------------
    @property
    def root(self):
        r = self._lib.vx_root(self._h)
        return None if r == EMPTY else int(r)

    def height(self) -> int:
        return int(self._lib.vx_height(self._h))

    def capacity(self) -> int:
        return int(self._lib.vx_capacity(self._h))

    def num_nodes(self) -> int:
        return int(self._lib.vx_num_nodes(self._h))

    def mem_usage(self) -> int:
        return int(self._lib.vx_mem_usage(self._h))

    def get(self, p):
        rgb = (ctypes.c_float * 3)()
        ok = self._lib.vx_get(self._h, int(p[0]), int(p[1]), int(p[2]), rgb)
        return tuple(rgb) if ok else None

    def leaf_at(self, p):
        """Slot id of the block leaf at p, or None if air (the device
        table slot — see SvoSpace.leaf_at / world/boxes.SoupPatcher)."""
        v = self._lib.vx_leaf_at(self._h, int(p[0]), int(p[1]), int(p[2]))
        return None if v < 0 else int(v)

    def set(self, p, rgb):
        n = 1 << self.height()
        assert all(0 <= int(c) < n for c in p), (
            f"voxel {tuple(p)} outside [0, {n})^3"
        )
        self.edited = True
        # see world/svo.py set(): the renderer re-proves heights_exact
        # for heightfield-shaped edits (render/driver.apply_edits)
        self.heights_exact = False
        self.edit_count = getattr(self, "edit_count", 0) + 1
        if rgb is None:
            self._lib.vx_set(self._h, int(p[0]), int(p[1]), int(p[2]), 0,
                             0.0, 0.0, 0.0)
        else:
            self._lib.vx_set(self._h, int(p[0]), int(p[1]), int(p[2]), 1,
                             float(rgb[0]), float(rgb[1]), float(rgb[2]))

    def serialize(self) -> DeviceSvo:
        cap = max(self.capacity(), 1)
        table = np.empty((cap, 8), np.uint32)
        table.fill(EMPTY)
        root = self._lib.vx_serialize(
            self._h, table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        )
        solid = np.full((cap,), -1, np.int32)
        self._lib.vx_solid_leaf(
            self._h, solid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        dev = DeviceSvo(
            table=table, root=int(root), height=self.height(), solid_leaf=solid
        )
        dev.space = self  # lets extract_boxes take the native fast path
        return dev

    def extract_boxes_raw(self, cull_enclosed=True, max_size=8,
                          max_strip=16):
        """Native box-soup extraction (world/boxes.py pipeline in C++).

        Returns (lo int32[M,3], size int32[M,3] per-axis extents,
        leaf int32[M]) — consumed by world.boxes.extract_boxes, which
        wraps it into a BoxSoup with decoded albedos."""
        r = self._lib.vx_extract_boxes(
            self._h, int(bool(cull_enclosed)), int(max_size), int(max_strip)
        )
        try:
            m = int(self._lib.vx_boxes_count(r))
            lo = np.empty((m, 3), np.int32)
            size = np.empty((m, 3), np.int32)
            leaf = np.empty(m, np.int32)
            if m:
                self._lib.vx_boxes_fill(
                    r,
                    lo.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    size.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                )
        finally:
            self._lib.vx_boxes_free(r)
        return lo, size, leaf

    def serialize_delta(self):
        """Rows changed since the last serialize/serialize_delta, or None
        before a baseline full serialize (world/svo.py serialize_delta
        contract). Returns (rows, vals, solid, root, height, capacity)."""
        if not self._lib.vx_synced(self._h):
            return None
        k = int(self._lib.vx_delta_size(self._h))
        rows = np.empty(k, np.uint32)
        vals = np.empty((k, 8), np.uint32)
        solid = np.empty(k, np.int32)
        self._lib.vx_delta_drain(
            self._h,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            solid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        r = self._lib.vx_root(self._h)
        return (rows.astype(np.int64), vals, solid, int(r), self.height(),
                self.capacity())
