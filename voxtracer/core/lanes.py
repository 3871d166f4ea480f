"""Packed per-lane permutation gathers for wavefront compaction.

Compacting a wavefront (bucketed casts, the path integrator's shrinking
batches) permutes ~10-25 per-lane arrays at every bucket boundary. The
serialized-gather cost on this backend is per ROW — width is nearly
free well past 100 bytes (PERF.md: (B,128) rows gather FASTER per row
than (B,8)) — so taking each array separately pays the ~10 ns/row toll
once PER ARRAY, ~16x more than necessary. ``take_lanes`` bit-packs the
whole dict into one (B, K) i32 matrix, gathers rows ONCE, and unpacks:
measured ~2x on bucketed heightfield casts at 2M lanes, where the
boundary takes had cost more than the walk itself.

Bitcasts (f32/u32 <-> i32) are value-preserving bit moves; bools ride
as 0/1 i32. Supported leaf shapes: (B,) and (B, k).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pack(tree: dict):
    """dict of (B,)/(B,k) arrays -> ((B, K) i32, static meta)."""
    cols = []
    meta = []
    for k in sorted(tree):
        a = tree[k]
        a2 = a[:, None] if a.ndim == 1 else a
        meta.append((k, a.ndim, a2.shape[1], a.dtype))
        if a2.dtype in (jnp.float32, jnp.uint32):
            a2 = jax.lax.bitcast_convert_type(a2, jnp.int32)
        elif a2.dtype == jnp.bool_:
            a2 = a2.astype(jnp.int32)
        else:
            assert a2.dtype == jnp.int32, f"unsupported dtype {a2.dtype}"
        cols.append(a2)
    return jnp.concatenate(cols, axis=1), meta


def _unpack(packed, meta):
    out = {}
    o = 0
    for k, nd, w, dt in meta:
        sl = packed[:, o:o + w]
        o += w
        if dt in (jnp.float32, jnp.uint32):
            sl = jax.lax.bitcast_convert_type(sl, dt)
        elif dt == jnp.bool_:
            sl = sl != 0
        out[k] = sl[:, 0] if nd == 1 else sl
    return out


def take_lanes(tree: dict, perm):
    """``{k: v[perm] for k, v in tree.items()}`` as ONE row gather."""
    packed, meta = _pack(tree)
    return _unpack(packed[perm], meta)
