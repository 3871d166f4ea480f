"""Active-set box soup: device-side frustum cull for flagship worlds.

The 8192^3 terrain's exact box soup is ~53M boxes (world/boxes.py) —
projecting and pair-sorting all of them every frame would dominate the
rasterizer. This module keeps the FULL soup resident in HBM and
maintains a compacted *active subset*: boxes that could be hit by any
ray from cameras near the current pose. The subset refreshes only when
the camera leaves the validity volume of the last cull, so steady-state
frames pay zero cull cost.

Conservativeness argument (exactness contract): a box is culled only if
its bounding sphere lies outside an INFLATED frustum — the actual view
frustum widened by ``margin_deg`` on every side AND pushed outward by
the full translation budget ``keep_radius/2`` on every plane — plus a
``keep_radius`` ball around the camera. A later frame whose camera has
translated less than ``keep_radius/2`` and rotated less than
``margin_deg/2`` casts every primary ray inside that inflated frustum
(the angular margin covers the rotation; the plane slack covers the
translation at EVERY depth — the margin alone only covers translation
for boxes beyond ~trans/tan(margin), which is why the slack is added
explicitly), so culled boxes cannot be first hits, and the active-soup
raster frame equals the full-soup frame pixel-exactly
(tests/test_active.py, incl. a camera translated keep_radius/2 straight
at a side plane). Non-primary (bounce/NEE) rays must NOT use the
active set.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("cap", "nd", "occl_slack", "pool"))
def _cull(box_lo, box_size, box_attr, cam_pos, basis, fx, fy, keep_r,
          trans_r, cap: int, occl=None, nd: int = 0,
          occl_slack: float = 0.0, pool: int = 32):
    """Conservative frustum cull + compaction.

    box_lo/box_size: (M,3) i32; box_attr: (M,4) f32. Returns
    ((cap,3) lo, (cap,3) size, (cap,4) attr, n_active). All f32 math is
    built transiently from the compact inputs — the flagship soup is
    ~850 MB as i32 columns but would be ~6 GB held as packed+f32 copies.
    """
    M = box_lo.shape[0]
    lo_f = box_lo.astype(jnp.float32)
    half_f = box_size.astype(jnp.float32) * 0.5
    c = lo_f + half_f  # center
    r = jnp.linalg.norm(half_f, axis=-1)  # bounding-sphere radius
    # HIGHEST: TPU default matmul is bf16 passes — +-2 voxel error at
    # 8192-scale coordinates would eat into the conservative margin
    v = jnp.matmul(c - cam_pos, basis,
                   precision=jax.lax.Precision.HIGHEST)  # camera space
    vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
    # inflated side planes: |vx| <= vz*fx (+ slack). The slack must
    # cover BOTH the bounding sphere (r) and the full translation budget
    # of the reuse window (trans_r = keep_radius/2): a camera translated
    # by trans_r moves every plane by at most trans_r in world space, and
    # the angular margin alone only covers that shift for distant boxes
    # (a plane rotated by `margin` clears a translated plane only beyond
    # depth ~trans_r/tan(margin)). Plane normal norm is sqrt(1+f^2), so
    # slack = (r + trans_r) * sqrt(1+f^2); same budget on the vz>=0 and
    # keep-ball tests.
    slack = r + trans_r
    sx = slack * jnp.sqrt(1.0 + fx * fx)
    sy = slack * jnp.sqrt(1.0 + fy * fy)
    in_frustum = (
        (vz * fx + sx >= vx)
        & (vz * fx + sx >= -vx)
        & (vz * fy + sy >= vy)
        & (vz * fy + sy >= -vy)
        & (vz + slack >= 0.0)
    )
    near = jnp.linalg.norm(c - cam_pos, axis=-1) <= keep_r + r
    keep = in_frustum | near
    if occl is not None:
        # heightfield horizon cull: drop terrain provably hidden behind
        # nearer hills for every camera in the reuse volume
        # (world/occlusion.py — at flagship horizon poses the frustum
        # alone keeps ~92% of the soup)
        from voxtracer.world.occlusion import hidden_mask

        hidden = hidden_mask(occl, c, half_f, cam_pos, occl_slack, nd,
                             pool)
        keep = (in_frustum & ~hidden) | near
    n_active = jnp.sum(keep.astype(jnp.int32))
    midx = jnp.arange(M, dtype=jnp.int32)
    key = jnp.where(keep, midx, jnp.int32(M))
    idx = jax.lax.sort(key)[:cap]
    valid = idx < M
    safe = jnp.where(valid, idx, 0)
    lo_a = jnp.where(valid[:, None], box_lo[safe], 0)
    size_a = jnp.where(valid[:, None], box_size[safe], 0)  # inert: size 0
    attr_a = jnp.where(valid[:, None], box_attr[safe], 0.0)
    return lo_a, size_a, attr_a, n_active


class ActiveSoup:
    """HBM-resident full soup + lazily-refreshed active subset.

    ``active(cam_pos, basis)`` returns (box_lo, box_size, box_attr)
    device arrays for kernels.raster, refreshing the cull only when the
    camera exits the last cull's validity volume. When the visible set
    exceeds ``cap`` (horizon views of the flagship world keep ~90% of
    the soup), truncation would silently drop boxes the completeness
    logic cannot see — the FULL soup is returned instead
    (``overflowed`` reports it; the full-soup raster is ~1 s at
    flagship 1080p, so correctness costs only the cull's savings)."""

    def __init__(self, soup, width_px: int, height_px: int,
                 cap=1 << 24, margin_deg: float = 12.0,
                 keep_radius: float = 128.0, heights=None):
        """``heights``: optional (n, n) terrain heightmap enabling the
        conservative horizon occlusion cull (world/occlusion.py) on top
        of the frustum cull — the lever that makes flagship horizon
        poses tractable (frustum alone keeps ~92% of the soup).

        ``cap="auto"``: fit the compacted capacity to the first cull's
        demand (a power of two with 13% headroom) and grow it on later
        overflows instead of serving the full soup — the per-box raster
        stages (projection, tier select, pair emission) then run over
        ~n_active rows, not the full soup."""
        from voxtracer.kernels.raster import pack_box_attr

        self._lo = jnp.asarray(np.asarray(soup.lo, np.int32))
        self._size = jnp.asarray(np.asarray(soup.size, np.int32))
        self._attr = jnp.asarray(np.asarray(pack_box_attr(soup),
                                            np.float32))
        self._hmin2 = None
        self._nd = 0
        self._pool = 32
        if heights is not None:
            from voxtracer.world import occlusion as occ

            n = np.asarray(heights).shape[0]
            # pool scales with the world so the cull's reach (the
            # r_min floor, radial resolution) stays proportional:
            # 16 at 8192^3, 4 at 1024^3 and below. Measured at bench
            # poses: 77-80% of the 1024^3 soup culled at pool 4.
            self._pool = max(4, n // 512)
            if n % self._pool == 0 and n >= self._pool * 8:
                self._hmin2 = jnp.asarray(
                    occ.min_pool_heights(np.asarray(heights),
                                         self._pool))
                # radial reach: world diagonal (+1 for strict indexing)
                self._nd = int(np.ceil(n * 1.5 / self._pool)) + 1
        # occlusion validity budget: much smaller than keep_radius/2 —
        # slack widens every box's angular range and slope bounds, and
        # its vertical component must stay small next to the terrain
        # relief, so it scales with the pool (world/occlusion.py;
        # slack 8 vs 4 measured 71% vs 77% culled at 1024^3)
        self.occl_slack = float(max(4, self._pool))
        self._m = len(soup)
        self._auto = cap == "auto"
        self._fitted = False
        self.cap = self._m if self._auto else min(cap, self._m)
        self.margin = math.radians(margin_deg)
        self.keep_radius = float(keep_radius)
        # actual frustum half-extent tangents (camera.pixel_ndc mapping)
        hx = (width_px - 1) / height_px
        hy = 1.0
        # inflate by the angular margin
        self._fx = math.tan(min(math.atan(hx) + self.margin, 1.55))
        self._fy = math.tan(min(math.atan(hy) + self.margin, 1.55))
        self._pose = None  # (pos, basis) of the last cull
        self._rows = None
        self.n_active = 0

    def _trans_budget(self) -> float:
        if self._hmin2 is not None:
            return min(self.keep_radius / 2, self.occl_slack)
        return self.keep_radius / 2

    def _valid_for(self, cam_pos, basis) -> bool:
        if self._pose is None:
            return False
        p0, b0 = self._pose
        if np.linalg.norm(np.asarray(cam_pos) - p0) > self._trans_budget():
            return False
        # rotation between bases: largest angle any view direction moved
        dot = float(np.clip((np.trace(np.asarray(basis).T @ b0) - 1) / 2,
                            -1.0, 1.0))
        return math.acos(dot) <= self.margin / 2

    def _cull_at(self, cam_pos, basis, occl):
        return _cull(
            self._lo, self._size, self._attr,
            jnp.asarray(cam_pos), jnp.asarray(basis),
            jnp.float32(self._fx), jnp.float32(self._fy),
            jnp.float32(self.keep_radius),
            jnp.float32(self._trans_budget()), cap=self.cap,
            occl=occl, nd=self._nd,
            occl_slack=float(self._trans_budget()),
            pool=self._pool,
        )

    def active(self, cam_pos, basis):
        cam_pos = np.asarray(cam_pos, np.float32)
        basis = np.asarray(basis, np.float32)
        if not self._valid_for(cam_pos, basis):
            occl = None
            if self._hmin2 is not None:
                from voxtracer.world.occlusion import build_horizon

                occl = build_horizon(self._hmin2, jnp.asarray(cam_pos),
                                     self.occl_slack, self._nd,
                                     self._pool)
            lo_a, size_a, attr_a, n = self._cull_at(cam_pos, basis, occl)
            self.n_active = int(n)
            if self._auto and (not self._fitted
                               or self.n_active > self.cap):
                # fit the cap to the first cull's demand (grow-only on
                # later overflows: stable shapes keep the raster program
                # compiled once)
                fit = min(self._m, max(1 << 12, 1 << max(
                    (int(self.n_active * 1.13) - 1).bit_length(), 0)))
                if fit != self.cap:
                    stale = self.n_active > self.cap  # grown: arrays
                    # from the old cap truncated visible boxes
                    self.cap = fit
                    if self.cap < self._m:
                        lo_a, size_a, attr_a, n = self._cull_at(
                            cam_pos, basis, occl)
                        self.n_active = int(n)
                    elif stale:
                        lo_a = None  # serve the full soup below
                self._fitted = True
            if lo_a is None or self.n_active > self.cap:
                # truncation would silently drop visible boxes — serve
                # the full soup for this pose instead (zero-copy)
                self._rows = (self._lo, self._size, self._attr)
            else:
                self._rows = (lo_a, size_a, attr_a)
            self._pose = (cam_pos.copy(), basis.copy())
        return self._rows

    @property
    def overflowed(self) -> bool:
        return self.n_active > self.cap
