"""Hash-consed sparse voxel octree (SVO/DAG) world representation.

The world is a persistent octree of colored blocks, interned so identical
subtrees share one node (a DAG): a solid cube of edge 2^k costs O(k)
nodes. Nodes are reference-counted; point edits path-copy the spine and
decrement the old root.

This is the host-side builder/editor. The device-side representation is a
flat ``uint32[capacity, 8]`` node table (``serialize``): interior nodes
store 8 child slot indices (0xFFFFFFFF = empty octant), leaves store the
RGB albedo as three float32 bit patterns in children[0..3]. That layout
is gather-friendly on TPU: traversal is one row-gather per descent step,
and the table is uploaded once and stays HBM-resident.

Behavioral reference: src/svo.rs (hash-consing svo.rs:47-68, refcounts
svo.rs:70-82, point query svo.rs:84-100, path-copying set svo.rs:102-144)
and the GPU serialization of fragment.rs:274-313.

Octant child-index convention: bit0 = x, bit1 = y, bit2 = z
(svo.rs:89-91, worldgen.rs:77-80).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

EMPTY = 0xFFFFFFFF  # empty-octant / no-node sentinel in the device table

_BLOCK = 0  # cell kinds
_CHILDREN = 1


def _f32_bits(v: float) -> int:
    return int(np.float32(v).view(np.uint32))


def _bits_f32(b: int) -> float:
    return float(np.uint32(b).view(np.float32))


class SvoSpace:
    """Mutable hash-consed SVO. Node ids are slot indices (freed slots are
    reused), so ``capacity`` — the device-table length — stays compact."""

    def __init__(self):
        self._intern = {}  # cell key -> node id
        self._kind = []  # node id -> _BLOCK | _CHILDREN | None (free)
        self._payload = []  # node id -> (r,g,b) u32 bits | tuple of 8 child ids
        self._refcount = []
        self._level = []
        self._solid = []  # node id -> uniform solid-leaf id | -1 (maintained)
        self._free = []
        # slots changed since the last serialize()/serialize_delta(); only
        # tracked once a baseline full serialize exists (_synced)
        self._dirty: set = set()
        self._synced = False
        self.edited = False  # any point edit since construction
        self.root: Optional[int] = None

    # -- construction ------------------------------------------------------

    def _alloc(self, kind, payload, level) -> int:
        if self._free:
            nid = self._free.pop()
            self._kind[nid] = kind
            self._payload[nid] = payload
            self._refcount[nid] = 0
            self._level[nid] = level
        else:
            nid = len(self._kind)
            self._kind.append(kind)
            self._payload.append(payload)
            self._refcount.append(0)
            self._level.append(level)
            self._solid.append(-1)
        if self._synced:
            self._dirty.add(nid)
        return nid

    def create_block(self, rgb) -> int:
        """Intern a leaf node with the given RGB albedo (float32 exact)."""
        key = (_BLOCK, _f32_bits(rgb[0]), _f32_bits(rgb[1]), _f32_bits(rgb[2]))
        nid = self._intern.get(key)
        if nid is None:
            nid = self._alloc(_BLOCK, key[1:], 0)
            self._solid[nid] = nid
            self._intern[key] = nid
        return nid

    def create_children(self, children) -> Optional[int]:
        """Intern an interior node; all-empty children collapse to None
        (svo.rs:47-49). Child refcounts are bumped on first insert."""
        children = tuple(children)
        assert len(children) == 8
        if all(c is None for c in children):
            return None
        key = (_CHILDREN, children)
        nid = self._intern.get(key)
        if nid is None:
            level = 0
            for c in children:
                if c is not None:
                    self._refcount[c] += 1
                    level = max(level, self._level[c] + 1)
            nid = self._alloc(_CHILDREN, children, level)
            # maintained solid-leaf id: children are immutable once interned,
            # so this never needs revisiting (serialize uses it directly)
            if all(c is not None for c in children):
                sl = self._solid[children[0]]
                if sl >= 0 and all(self._solid[c] == sl for c in children[1:]):
                    self._solid[nid] = sl
            self._intern[key] = nid
        return nid

    def _decr(self, nid: int):
        self._refcount[nid] -= 1
        if self._refcount[nid] == 0:
            if self._kind[nid] == _BLOCK:
                key = (_BLOCK,) + self._payload[nid]
            else:
                key = (_CHILDREN, self._payload[nid])
            del self._intern[key]
            kind, payload = self._kind[nid], self._payload[nid]
            self._kind[nid] = None
            self._payload[nid] = None
            self._solid[nid] = -1
            self._free.append(nid)
            if self._synced:
                self._dirty.add(nid)
            if kind == _CHILDREN:
                for c in payload:
                    if c is not None:
                        self._decr(c)

    def set_root(self, node: Optional[int]):
        if node is not None:
            self._refcount[node] += 1
        if self.root is not None:
            self._decr(self.root)
        self.root = node

    # -- queries -----------------------------------------------------------

    def height(self) -> int:
        return 0 if self.root is None else self._level[self.root]

    def capacity(self) -> int:
        return len(self._kind)

    def num_nodes(self) -> int:
        return len(self._kind) - len(self._free)

    def nodes(self):
        """Iterate (node_id, cell) over live nodes (svo.rs:150-152); cell
        is ('block', (r, g, b)) or ('children', (8 ids or None))."""
        for nid, kind in enumerate(self._kind):
            if kind == _BLOCK:
                r, g, b = self._payload[nid]
                yield nid, ("block", (_bits_f32(r), _bits_f32(g), _bits_f32(b)))
            elif kind == _CHILDREN:
                yield nid, ("children", self._payload[nid])

    def get_node(self, nid: int):
        """Cell of a live node (svo.rs:154-156)."""
        kind = self._kind[nid]
        assert kind is not None, "dead node"
        if kind == _BLOCK:
            r, g, b = self._payload[nid]
            return ("block", (_bits_f32(r), _bits_f32(g), _bits_f32(b)))
        return ("children", self._payload[nid])

    def root_node(self) -> Optional[int]:
        return self.root

    def unwrap_children(self, nid: int):
        """Children tuple of an interior node (svo.rs:172-178)."""
        kind, payload = self._kind[nid], self._payload[nid]
        assert kind == _CHILDREN
        return payload

    def get(self, p) -> Optional[Tuple[float, float, float]]:
        """Point query: color of voxel at integer coords p, or None."""
        x, y, z = int(p[0]), int(p[1]), int(p[2])
        node = self.root
        for level in range(self.height() - 1, -1, -1):
            if node is None:
                return None
            c = 1 << level
            idx = (x >= c) | ((y >= c) << 1) | ((z >= c) << 2)
            node = self._payload[node][idx]
            x -= c if x >= c else 0
            y -= c if y >= c else 0
            z -= c if z >= c else 0
        if node is None:
            return None
        assert (x, y, z) == (0, 0, 0)
        r, g, b = self._payload[node]
        return (_bits_f32(r), _bits_f32(g), _bits_f32(b))

    def leaf_at(self, p) -> Optional[int]:
        """Point query: node id of the block leaf at p, or None if air.
        Node ids double as serialized table slots (serialize writes row
        nid for node nid), so this is also the device leaf slot — used
        by the incremental soup patcher (world/boxes.SoupPatcher)."""
        x, y, z = int(p[0]), int(p[1]), int(p[2])
        node = self.root
        for level in range(self.height() - 1, -1, -1):
            if node is None:
                return None
            c = 1 << level
            idx = (x >= c) | ((y >= c) << 1) | ((z >= c) << 2)
            node = self._payload[node][idx]
            x -= c if x >= c else 0
            y -= c if y >= c else 0
            z -= c if z >= c else 0
        return node

    # -- edits -------------------------------------------------------------

    def set(self, p, rgb: Optional[tuple]):
        """Path-copying point edit: place a block (rgb) or clear (None).

        No-ops when the voxel already has the requested value; otherwise
        rebuilds the root-to-leaf spine through the intern table and swaps
        the root with refcount transfer (svo.rs:102-144).

        Coordinates must lie in [0, 2^height): out-of-range coordinates
        would silently alias onto in-range voxels through the octant
        bit tests (e.g. y = 2^height descends the all-high path).
        """
        x, y, z = int(p[0]), int(p[1]), int(p[2])
        n = 1 << self.height()
        assert 0 <= x < n and 0 <= y < n and 0 <= z < n, (
            f"voxel {(x, y, z)} outside [0, {n})^3"
        )
        # counts EVERY call, no-ops included (edit_count below counts
        # only mutations): the renderer's heightfield-exact gate compares
        # this delta against its batch size, so a batch containing no-op
        # edits can never mask a set() that bypassed apply_edits
        # (render/driver._apply_hf_edits)
        self.set_calls = getattr(self, "set_calls", 0) + 1
        stack = []
        node = self.root
        for level in range(self.height() - 1, -1, -1):
            c = 1 << level
            idx = (x >= c) | ((y >= c) << 1) | ((z >= c) << 2)
            stack.append((node, idx))
            if node is not None:
                node = self._payload[node][idx]
            x -= c if x >= c else 0
            y -= c if y >= c else 0
            z -= c if z >= c else 0

        if node is not None:
            cur = self._payload[node]
            if rgb is not None and cur == (
                _f32_bits(rgb[0]),
                _f32_bits(rgb[1]),
                _f32_bits(rgb[2]),
            ):
                return
        elif rgb is None:
            return

        self.edited = True
        # until a coordinator re-proves it (render/driver.apply_edits),
        # the heightmap no longer certifiably describes the world; the
        # counter lets the coordinator detect edits it was never shown
        self.heights_exact = False
        self.edit_count = getattr(self, "edit_count", 0) + 1
        new_node = self.create_block(rgb) if rgb is not None else None
        while stack:
            n, idx = stack.pop()
            children = list(self._payload[n]) if n is not None else [None] * 8
            children[idx] = new_node
            new_node = self.create_children(children)

        if new_node is not None:
            self._refcount[new_node] += 1
        if self.root is not None:
            self._decr(self.root)
        self.root = new_node

    # -- device serialization ------------------------------------------------

    def serialize(self) -> "DeviceSvo":
        """Flatten to the device node table.

        Layout per live slot (fragment.rs:274-290 behavior): leaves write
        float32 RGB bit patterns into children[0..3]; interior nodes write
        child slot indices with EMPTY for absent octants; dead slots stay
        all-EMPTY. Also computes ``solid_leaf``: for each node whose
        subtree is entirely solid with one uniform color, the id of that
        leaf block (else -1) — the beam traversal treats such subtrees as
        single boxes (kernels/beam.py).
        """
        cap = max(self.capacity(), 1)
        table = np.full((cap, 8), EMPTY, dtype=np.uint32)
        for nid, kind in enumerate(self._kind):
            self._write_row(table[nid], nid, kind)
        solid = np.full((cap,), -1, dtype=np.int32)
        solid[: len(self._solid)] = self._solid
        root = EMPTY if self.root is None else self.root
        self._dirty.clear()
        self._synced = True
        return DeviceSvo(
            table=table, root=root, height=self.height(), solid_leaf=solid,
            space=self,
        )

    def _write_row(self, row, nid, kind):
        if kind == _BLOCK:
            row[:3] = self._payload[nid]
        elif kind == _CHILDREN:
            for i, c in enumerate(self._payload[nid]):
                if c is not None:
                    row[i] = c

    def serialize_delta(self):
        """Rows changed since the last ``serialize``/``serialize_delta``.

        Incremental device update for point edits (SURVEY §7.2-6): the
        host tracks dirty slots (allocated or freed since the last sync),
        so an edit uploads O(changed nodes) rows instead of the whole
        table (the reference re-uploads everything, fragment.rs:274-313).

        Returns ``(rows, vals, solid, root, height, capacity)`` — rows
        int64[K] ascending, vals uint32[K, 8], solid int32[K] — or None
        when no baseline full ``serialize`` has happened yet (callers
        must then do a full upload). Freed slots appear as all-EMPTY
        rows, so applying the delta reproduces ``serialize`` exactly.
        """
        if not self._synced:
            return None
        rows = np.array(sorted(self._dirty), dtype=np.int64)
        vals = np.full((len(rows), 8), EMPTY, dtype=np.uint32)
        solid = np.full((len(rows),), -1, dtype=np.int32)
        for k, nid in enumerate(rows):
            self._write_row(vals[k], nid, self._kind[nid])
            solid[k] = self._solid[nid]
        self._dirty.clear()
        root = EMPTY if self.root is None else self.root
        return rows, vals, solid, root, self.height(), self.capacity()

    def mem_usage(self) -> int:
        """Rough bytes estimate (table + intern map), for worldgen logs."""
        return self.capacity() * 8 * 4 + len(self._intern) * 96


@dataclass
class DeviceSvo:
    """Flat SVO ready for the device: one gather per traversal step.

    ``table``: uint32[capacity, 8]; ``root``: slot index or EMPTY;
    ``height``: tree height (world edge = 2^height voxels), static under
    jit; ``solid_leaf``: int32[capacity], the uniform leaf id of fully
    solid single-color subtrees (else -1), used by the beam traversal.
    """

    table: np.ndarray
    root: int
    height: int
    solid_leaf: np.ndarray | None = None
    # backref to the host space that produced this (set by
    # NativeSvoSpace.serialize); lets boxes.extract_boxes use the native
    # extractor instead of re-walking the table in numpy
    space: object = None

    def leaf_colors(self):
        """float32[capacity, 3] view of the leaf RGB bit patterns."""
        return np.ascontiguousarray(self.table[:, :3]).view(np.float32)


def from_dense(grid_solid: np.ndarray, grid_rgb: np.ndarray) -> SvoSpace:
    """Build an SvoSpace from a dense cubic grid (test/edit-scale worlds).

    grid_solid: bool[N,N,N] (N a power of two), grid_rgb: float32[N,N,N,3].
    Bottom-up vectorized interning: O(N^3) numpy work, Python only per
    unique node.
    """
    n = grid_solid.shape[0]
    assert n & (n - 1) == 0 and n >= 2
    space = SvoSpace()

    # Level 0: map each voxel to a leaf id or None.
    ids = np.full(grid_solid.shape, -1, dtype=np.int64)
    solid_idx = np.argwhere(grid_solid)
    colors = grid_rgb[grid_solid]
    color_bits = colors.astype(np.float32).view(np.uint32).reshape(-1, 3)
    uniq, inv = np.unique(color_bits, axis=0, return_inverse=True)
    leaf_ids = np.array(
        [
            space.create_block(tuple(np.asarray(u).view(np.float32)))
            for u in uniq
        ],
        dtype=np.int64,
    )
    if len(solid_idx):
        ids[tuple(solid_idx.T)] = leaf_ids[inv]

    level_ids = ids
    while level_ids.shape[0] > 1:
        m = level_ids.shape[0] // 2
        # children[i] with i = x | y<<1 | z<<2 — index (x, y, z) offsets
        octs = np.stack(
            [
                level_ids[ox::2, oy::2, oz::2]
                for oz in (0, 1)
                for oy in (0, 1)
                for ox in (0, 1)
            ],
            axis=-1,
        )  # (m, m, m, 8) in child-index order
        flat = octs.reshape(-1, 8)
        nonempty = (flat != -1).any(axis=1)
        new_ids = np.full(m * m * m, -1, dtype=np.int64)
        if nonempty.any():
            rows = flat[nonempty]
            uniq_rows, inv_rows = np.unique(rows, axis=0, return_inverse=True)
            created = np.array(
                [
                    space.create_children(
                        [None if c == -1 else int(c) for c in row]
                    )
                    for row in uniq_rows
                ],
                dtype=np.int64,
            )
            new_ids[nonempty] = created[inv_rows]
        level_ids = new_ids.reshape(m, m, m)

    root = None if level_ids[0, 0, 0] == -1 else int(level_ids[0, 0, 0])
    space.set_root(root)
    return space
