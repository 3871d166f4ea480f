"""Beam-accelerated primary visibility — the TPU-native answer to
per-ray octree pointer chasing.

Motivation (measured on v5e, see PERF.md): XLA gathers cost ~10 ns per
*row* no matter the row width, so traversal must (a) amortize tree
walking over pixel tiles and (b) fetch fat rows. This module does both:

1. **Augmented node rows** — serialize-time side table (N, 40) u32:
   ``[children(8) | child_solid_leaf(8) | child_rgb(8x3)]``. One row
   gather delivers everything needed to expand a node.
2. **Beam walk** — one conservative interval-arithmetic octree traversal
   per pixel tile (e.g. 8x8): each iteration expands one interior node —
   all 8 children are slab-tested against the beam's origin/direction
   bounds at once; solid children (incl. solid *subtrees*, via
   DeviceSvo.solid_leaf) are emitted as candidate boxes in the same
   iteration, interior children become pending stack entries. A solid
   cell that provably covers the whole beam caps further collection.
3. **Dense resolve** — every pixel slab-tests its ray against its tile's
   K candidate boxes (a fori running-min, nothing K-sized materializes)
   and takes the nearest: pure VPU math, zero gathers.
4. **Banding** — the frame is processed in horizontal bands
   (walk + resolve + per-ray fallback per band under lax.map), so sky
   bands exit in a handful of iterations instead of riding the worst
   beam of the whole frame.
5. **Fallback** — tiles that overflow K candidates, exceed the step
   budget, or straddle a direction-sign change are re-cast with the
   exact per-ray traversal (kernels.traverse.svo_raycast, active-masked).

The result matches svo_raycast's hit/t/normal/voxel semantics exactly
(identical slab arithmetic and x>y>z tie priority); candidate cells are
disjoint octree cells so nearest-entry equals first-hit. Rays starting
inside a solid candidate reproduce the t==0-skip rule by hitting the
next unit-grid plane within the box.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from voxtracer.core.vecmath import to_bits
from voxtracer.kernels.traverse import EPS, FAR, leaf_rgb, svo_raycast

AUG_WIDTH = 40

# near-to-far octant priority (by popcount) in mirrored space
_ORDER = (0, 1, 2, 4, 3, 5, 6, 7)


def build_aug_table(table_u32: np.ndarray, solid_leaf: np.ndarray) -> np.ndarray:
    """(N, 40) int32 augmented rows from the flat table + solid_leaf.

    Layout: [0:8] child ids (-1 empty); [8:16] solid_leaf per child
    (-1 = interior/mixed); [16:40] per-child leaf RGB float bits.
    """
    tbl = table_u32.view(np.int32).reshape(-1, 8)
    n = tbl.shape[0]
    aug = np.full((n, AUG_WIDTH), -1, np.int32)
    aug[:, 0:8] = tbl
    # NOTE: leaf rows carry float bit patterns in their child slots; they
    # are never expanded, but clamp indices so the build stays in bounds.
    child = np.clip(tbl, 0, n - 1)
    valid = (tbl >= 0) & (tbl < n)
    sl = np.where(valid, solid_leaf[child], -1)
    aug[:, 8:16] = sl
    has = sl >= 0
    rgb_bits = tbl[np.clip(sl, 0, n - 1)][..., :3]  # (N,8,3)
    rgb_bits = np.where(has[..., None], rgb_bits, 0)
    aug[:, 16:40] = rgb_bits.reshape(n, 24)
    return aug


def _first_in_order(mask):
    """Index (0..7) of the first set bit of ``mask`` in _ORDER priority;
    8 if mask == 0. Dense selects, no gathers."""
    out = jnp.full(mask.shape, 8, jnp.int32)
    for j in reversed(_ORDER):
        out = jnp.where((mask >> j) & 1 == 1, j, out)
    return out


def _onehot_read_i(stk, oh):
    return jnp.sum(jnp.where(oh, stk, 0), axis=1)


def _onehot_write_i(stk, oh, mask, val):
    return jnp.where(oh & mask[:, None], val[:, None], stk)


@partial(jax.jit, static_argnames=("height", "K", "max_steps", "skip_t0"))
def beam_walk(aug, root, height: int, o_lo, o_hi, d_lo, d_hi,
              K: int = 64, max_steps: int = 2048, skip_t0: bool = True,
              state=None):
    """Collect candidate solid boxes per beam (see module docstring).

    aug: (N, 40) int32 augmented node rows (build_aug_table).
    o_lo/o_hi, d_lo/d_hi: (Bb, 3) bounds over each beam's rays.

    The walk is *resumable*: a beam that fills its K candidate slots
    pauses with its pending stack intact; pass the returned ``state``
    back in to collect the next K boxes (the frame driver interleaves
    rounds with resolves). ``t_safe`` is the nearest possible entry of
    anything not yet collected — resolve hits strictly nearer are final.

    Returns (cands, state): cands has lvl (Bb, K) i32 (-1 unused),
    off (Bb, K, 3) i32 world cell corners, rgb (Bb, K, 3) f32,
    ok (Bb,) fully-collected flag, t_safe (Bb,) f32.
    """
    assert height >= 1
    assert K >= 8
    Bb = d_lo.shape[0]
    H = height
    S = H + 1
    bound = jnp.float32(1 << H)
    levels = jnp.arange(S, dtype=jnp.int32)[None, :]
    oct8 = jnp.arange(8, dtype=jnp.int32)
    obits8 = jnp.stack([oct8 & 1, (oct8 >> 1) & 1, (oct8 >> 2) & 1],
                       axis=-1).astype(jnp.float32)  # (8,3)

    # mirror to all-positive direction intervals
    flip = d_hi < 0.0
    incoherent = jnp.any((d_lo < 0.0) & (d_hi >= 0.0), axis=-1)
    dlo = jnp.where(flip, -d_hi, d_lo)
    dhi = jnp.where(flip, -d_lo, d_hi)
    dlo = jnp.maximum(dlo, EPS)  # the per-ray clamp (raytrace.wgsl:78)
    dhi = jnp.maximum(dhi, dlo)
    # pad inverse bounds by a few ulps so the interval brackets every
    # ray's exactly-rounded 1/d (collection must stay a superset)
    ilo = (1.0 / dhi) * (1.0 - 4e-7)
    ihi = (1.0 / dlo) * (1.0 + 4e-7)
    olo = jnp.where(flip, bound - o_hi, o_lo)
    ohi = jnp.where(flip, bound - o_lo, o_hi)
    mirror = to_bits(flip)  # (Bb,)

    root_b = jnp.broadcast_to(jnp.asarray(root, jnp.int32), (Bb,))

    if state is None:
        # pending stacks: at level h, ids_stk[:, h, :] are the interior
        # children (indexed by MIRRORED octant) of the node whose cell is
        # at level h+1; mask_stk bit j set = child j still to expand.
        ids_stk = jnp.full((Bb, S, 8), -1, jnp.int32)
        mask_stk = jnp.zeros((Bb, S), jnp.int32)
        # virtual pending entry for the root at level H, mirrored octant 0
        ids_stk = ids_stk.at[:, H, 0].set(root_b)
        mask_stk = mask_stk.at[:, H].set(1)
        state = dict(
            h=jnp.full((Bb,), H, jnp.int32),
            ids_stk=ids_stk,
            mask_stk=mask_stk,
            entry_stk=jnp.full((Bb, S, 8), jnp.float32(FAR))
            .at[:, H, 0].set(0.0),
            words=jnp.zeros((Bb, 3), jnp.int32),
            cap=jnp.full((Bb,), jnp.float32(FAR)),
            alive=(root_b >= 0) & ~incoherent,
        )
    else:
        # resume: paused beams become live again (stacks intact)
        state = dict(state)
    state.update(
        ncand=jnp.zeros((Bb,), jnp.int32),
        cand_lvl=jnp.full((Bb, K), -1, jnp.int32),
        cand_off=jnp.zeros((Bb, K, 3), jnp.int32),
        cand_rgb=jnp.zeros((Bb, K, 3), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
    )
    kslots = jnp.arange(K, dtype=jnp.int32)[None, :]

    state["paused"] = jnp.zeros((Bb,), jnp.bool_)

    def cond(st):
        return jnp.any(st["alive"] & ~st["paused"]) & (st["steps"] < max_steps)

    def body(st):
        h = st["h"]
        # pause before an expansion that might not fit its 8 emits; the
        # pending bit stays set, so a resumed round re-picks it
        pause_now = st["ncand"] > K - 8
        paused = st["paused"] | (st["alive"] & pause_now)
        alive = st["alive"] & ~paused
        oh = levels == h[:, None]

        mask = _onehot_read_i(st["mask_stk"], oh)
        pop = mask == 0
        j = _first_in_order(mask)  # mirrored octant of the pending child
        jc = jnp.clip(j, 0, 7)
        mask_stk = _onehot_write_i(
            st["mask_stk"], oh, alive & ~pop, mask & ~(1 << jc)
        )

        ids = jnp.sum(jnp.where(oh[..., None], st["ids_stk"], 0), axis=1)
        child = jnp.sum(
            jnp.where(oct8[None, :] == jc[:, None], ids, 0), axis=1
        )  # (Bb,) node id being expanded (cell at level h)

        # enter the child's cell: set word bits at level h
        jb = jnp.stack([jc & 1, (jc >> 1) & 1, (jc >> 2) & 1], axis=-1)
        hc = jnp.clip(h, 1, H)
        bit = jnp.int32(1) << hc[:, None]
        words = jnp.where(
            (alive & ~pop & (h < H))[:, None],
            (st["words"] & ~bit) | jb * bit,
            st["words"],
        )

        # --- expand: fetch the augmented row, test all 8 children -------
        row = aug[jnp.clip(child, 0, None)]  # (Bb, 40) one wide gather
        gchild = row[:, 0:8]
        gsl = row[:, 8:16]
        grgb = jax.lax.bitcast_convert_type(
            row[:, 16:40].reshape(Bb, 8, 3), jnp.float32
        )

        # grandchild cells: level h-1, offsets in mirrored space. The
        # table's child indices are world octants: mirrored slot m holds
        # world slot m ^ mirror.
        gm = oct8[None, :] ^ mirror[:, None]  # world index per mirrored slot
        sel8 = lambda a: jnp.sum(
            jnp.where(gm[..., None] == jnp.arange(8)[None, None, :],
                      a[:, None, :], 0), axis=-1,
        )
        gchild_m = sel8(gchild)  # (Bb,8) in mirrored slot order
        gsl_m = sel8(gsl)
        grgb_m = jnp.stack([sel8(grgb[..., c]) for c in range(3)], axis=-1)

        s_g = jnp.exp2((hc - 1).astype(jnp.float32))  # (Bb,)
        # expanded cell's offset = path bits >= h (bit h was just set)
        cell_off = (words & ~((jnp.int32(1) << hc[:, None]) - 1)).astype(jnp.float32)
        g_off = cell_off[:, None, :] + obits8[None] * s_g[:, None, None]

        ne_lo = g_off - ohi[:, None, :]
        ne_hi = g_off - olo[:, None, :]
        e_lo = jnp.minimum(ne_lo * ilo[:, None, :], ne_lo * ihi[:, None, :])
        e_hi = jnp.maximum(ne_hi * ilo[:, None, :], ne_hi * ihi[:, None, :])
        nx_lo = g_off + s_g[:, None, None] - ohi[:, None, :]
        nx_hi = g_off + s_g[:, None, None] - olo[:, None, :]
        x_lo = jnp.minimum(nx_lo * ilo[:, None, :], nx_lo * ihi[:, None, :])
        x_hi = jnp.maximum(nx_hi * ilo[:, None, :], nx_hi * ihi[:, None, :])
        entry_lo = jnp.maximum(jnp.max(e_lo, axis=-1), 0.0)  # (Bb,8)
        entry_hi = jnp.maximum(jnp.max(e_hi, axis=-1), 0.0)
        exit_lo = jnp.min(x_lo, axis=-1)
        exit_hi = jnp.min(x_hi, axis=-1)
        overlap = (entry_lo <= exit_hi) & (exit_hi > 0.0) & (
            entry_lo <= st["cap"][:, None]
        )

        act = (alive & ~pop)[:, None]
        hit_cell = act & overlap & (gchild_m >= 0)
        emit = hit_cell & (gsl_m >= 0)
        desc = hit_cell & (gsl_m < 0)

        # --- emit solid children as candidates (up to 8 at once; the
        # pause-at-K-8 rule guarantees capacity) -------------------------
        # assign K-slots in near-to-far (_ORDER) priority via prefix sums
        inv_rank = jnp.asarray(_ORDER, jnp.int32)  # octant at each rank
        emit_by_rank = emit[:, inv_rank]
        prefix = jnp.cumsum(emit_by_rank.astype(jnp.int32), axis=-1)
        slot_by_rank = st["ncand"][:, None] + prefix - 1
        nemit = prefix[:, -1]
        can = emit_by_rank

        off_by_rank = g_off[:, inv_rank, :]
        size_i = s_g.astype(jnp.int32)
        off_m = off_by_rank.astype(jnp.int32)
        off_w = jnp.where(
            flip[:, None, :],
            jnp.int32(1 << H) - off_m - size_i[:, None, None],
            off_m,
        )
        rgb_by_rank = grgb_m[:, inv_rank, :]

        cand_lvl, cand_off, cand_rgb = (
            st["cand_lvl"], st["cand_off"], st["cand_rgb"]
        )
        wsel = (
            kslots[:, :, None] == slot_by_rank[:, None, :]
        ) & can[:, None, :]  # (Bb, K, 8)
        cand_lvl = jnp.where(
            jnp.any(wsel, -1), (hc - 1)[:, None], cand_lvl
        )
        cand_off = jnp.where(
            jnp.any(wsel, -1)[..., None],
            jnp.einsum("bkr,brc->bkc", wsel.astype(jnp.int32), off_w),
            cand_off,
        )
        cand_rgb = jnp.where(
            jnp.any(wsel, -1)[..., None],
            jnp.einsum("bkr,brc->bkc", wsel.astype(jnp.float32), rgb_by_rank),
            cand_rgb,
        )
        ncand = st["ncand"] + nemit * (alive & ~pop).astype(jnp.int32)

        # full-beam cover: nearest solid box every ray must pass through
        cover = can & (entry_hi < exit_lo)[:, inv_rank]
        if skip_t0:
            cover = cover & (entry_lo[:, inv_rank] > 0.0)
        cover_t = jnp.min(
            jnp.where(cover, entry_hi[:, inv_rank], jnp.float32(FAR)), axis=-1
        )
        cap = jnp.minimum(st["cap"], cover_t)

        # --- pending interior children ----------------------------------
        dmask = jnp.sum(
            jnp.where(desc, jnp.int32(1) << oct8[None, :], 0), axis=-1
        )
        has_desc = (dmask != 0) & alive & ~pop
        ohd = levels == (hc - 1)[:, None]
        ids_stk = jnp.where(
            (ohd & has_desc[:, None])[..., None], gchild_m[:, None, :],
            st["ids_stk"],
        )
        entry_stk = jnp.where(
            (ohd & has_desc[:, None])[..., None],
            jnp.where(desc, entry_lo, jnp.float32(FAR))[:, None, :],
            st["entry_stk"],
        )
        mask_stk = _onehot_write_i(mask_stk, ohd, has_desc, dmask)

        h_new = jnp.where(pop & alive, h + 1,
                          jnp.where(has_desc, h - 1, h))
        alive_out = st["alive"] & (paused | (h_new <= H))

        return dict(
            h=h_new,
            ids_stk=ids_stk,
            mask_stk=mask_stk,
            entry_stk=entry_stk,
            words=words,
            ncand=ncand,
            cap=cap,
            alive=alive_out,
            paused=paused,
            steps=st["steps"] + 1,
            cand_lvl=cand_lvl,
            cand_off=cand_off,
            cand_rgb=cand_rgb,
        )

    st = jax.lax.while_loop(cond, body, state)
    # a beam is done when nothing remains on its pending stack
    ok = ~st["alive"] & ~incoherent
    # anything still pending was never expanded: its entry bounds what the
    # collected candidates can certify
    oct_bit = jnp.int32(1) << jnp.arange(8, dtype=jnp.int32)[None, None, :]
    pend = (st["mask_stk"][..., None] & oct_bit) != 0  # (Bb,S,8)
    pend_min = jnp.min(
        jnp.where(pend, st["entry_stk"], jnp.float32(FAR)), axis=(1, 2)
    )
    t_safe = jnp.where(incoherent, 0.0,
                       jnp.where(ok, jnp.float32(FAR), pend_min))
    cands = dict(
        lvl=st["cand_lvl"],
        off=st["cand_off"],
        rgb=st["cand_rgb"],
        ok=ok,
        t_safe=t_safe,
    )
    out_state = {
        k: st[k]
        for k in ("h", "ids_stk", "mask_stk", "entry_stk", "words", "cap",
                  "alive")
    }
    return cands, out_state


@partial(jax.jit, static_argnames=("height", "skip_t0"))
def resolve_candidates(cand_lvl, cand_off, cand_rgb, origin, dirs,
                       height: int, skip_t0: bool = True):
    """Nearest-candidate slab resolve (fori running-min over K).

    cand_*: (Bb, K[,3]) from beam_walk; origin (3,) or broadcastable;
    dirs (Bb, P, 3) unit directions grouped per beam.
    Returns per-ray dict: hit, t, normal, rgb, voxel — (Bb, P[,3]).

    All plane arithmetic runs in the traversal's *mirrored* space with
    the same EPS direction clamp and the same (plane - origin) * inv_d
    expressions, so slab t's are bit-identical to svo_raycast's crossing
    t's — pixel parity holds even for rays grazing cell corners.
    """
    d = dirs
    bound = jnp.float32(1 << height)
    o_w = jnp.broadcast_to(origin, d.shape)
    flip = d < 0.0
    d_sign = jnp.sign(d)
    dm = jnp.maximum(jnp.abs(d), EPS)
    inv = 1.0 / dm
    o = jnp.where(flip, bound - o_w, o_w)  # mirrored origin

    # unit-grid crossing from the origin (inside-a-solid skip_t0 rule);
    # in mirrored space every direction is positive
    plane = jnp.floor(o) + 1.0
    tu_k = (plane - o) * inv
    tu = jnp.min(tu_k, axis=-1)  # (Bb,P)
    ua = tu_k[..., 0] == tu
    ub = ~ua & (tu_k[..., 1] == tu)
    uc = ~ua & ~ub & (tu_k[..., 2] == tu)
    uaxis = jnp.stack([ua, ub, uc], axis=-1)
    plane_a = jnp.sum(jnp.where(uaxis, plane, 0.0), axis=-1)

    # Candidate boxes in mirrored space: (Bb, K, 3) exact-integer planes —
    # the same values the traversal derives from its offset words.
    present_k = cand_lvl >= 0  # (Bb, K)
    size_k = jnp.exp2(cand_lvl.astype(jnp.float32))[..., None]
    lo_k = cand_off.astype(jnp.float32)
    hi_k = lo_k + size_k
    # per-(beam, pixel) mirrored planes require flip (Bb,P,3):
    nearK = jnp.where(flip[:, :, None, :], bound - hi_k[:, None],
                      lo_k[:, None])  # (Bb,P,K,3)
    farK = jnp.where(flip[:, :, None, :], bound - lo_k[:, None],
                     hi_k[:, None])

    def scores():
        """Fused (Bb,P,K) candidate scores (regular + inside-special)."""
        e = (nearK - o[:, :, None, :]) * inv[:, :, None, :]
        x = (farK - o[:, :, None, :]) * inv[:, :, None, :]
        entry = jnp.max(e, axis=-1)
        exit_ = jnp.min(x, axis=-1)
        entry_eff = jnp.maximum(entry, 0.0)
        valid = present_k[:, None, :] & (entry <= exit_) & (exit_ > 0)
        if skip_t0:
            valid = valid & (entry_eff > 0.0)
        score = jnp.where(valid, entry_eff, jnp.float32(FAR))
        if skip_t0:
            far_a = jnp.sum(jnp.where(uaxis[:, :, None, :], farK, 0.0), -1)
            plane_ok = plane_a[:, :, None] + 1.0 <= far_a
            special_v = (
                present_k[:, None, :] & (entry <= 0.0) & (exit_ > 0.0)
                & (entry < exit_) & plane_ok
            )
            score2 = jnp.where(special_v, tu[:, :, None], jnp.float32(FAR))
        else:
            score2 = jnp.full_like(score, jnp.float32(FAR))
        return score, score2, e

    # pass 1: winner index + t (XLA fuses the broadcasts into the reduce)
    score, score2, _ = scores()
    sc = jnp.minimum(score, score2)
    best = jnp.argmin(sc, axis=-1)  # (Bb,P), first minimal k
    t = jnp.min(sc, axis=-1)
    hit = t < FAR

    # pass 2: reconstruct the winner's attributes via a one-hot reduce
    # (recomputed, so nothing (Bb,P,K)-shaped is ever materialized)
    score_b, score2_b, e_b = scores()
    boh = (jnp.arange(cand_lvl.shape[-1], dtype=best.dtype)[None, None, :]
           == best[..., None])
    sel3 = lambda a: jnp.sum(jnp.where(boh[..., None], a, 0.0), axis=-2)
    e_best = sel3(e_b)
    near_best = sel3(nearK)
    far_best = sel3(farK)
    rgb = sel3(jnp.broadcast_to(cand_rgb[:, None], nearK.shape))
    was_special = jnp.sum(jnp.where(boh, score2_b < score_b, False),
                          axis=-1) > 0

    ax = e_best[..., 0] == t
    ay = ~ax & (e_best[..., 1] == t)
    az = ~ax & ~ay & (e_best[..., 2] == t)
    axis3 = jnp.stack([ax, ay, az], axis=-1)
    axis3 = jnp.where(was_special[..., None], uaxis, axis3)
    normal = jnp.where(axis3, -d_sign, 0.0) * hit[..., None]
    rgb = rgb * hit[..., None]

    # integer voxel coordinate of the hit (editor API parity). Mirrored
    # face plane -> world voxel: flip ? bound - plane - 1 : plane.
    p_hit_m = o + dm * t[..., None]
    vox_m = jnp.clip(jnp.floor(p_hit_m), near_best, far_best - 1.0)
    face_m = jnp.where(was_special[..., None], plane, near_best)
    vox_m = jnp.where(axis3, face_m, vox_m)
    vox = jnp.where(flip, bound - vox_m - 1.0, vox_m).astype(jnp.int32)
    vox = jnp.where(hit[..., None], vox, 0)

    return dict(hit=hit, t=jnp.where(hit, t, 0.0), normal=normal, rgb=rgb,
                voxel=vox)


def beam_primary_frame_cast(table, aug, root, height: int, origin, dirs,
                            tile: int = 8, K: int = 64,
                            max_steps: int = 2048, skip_t0: bool = True,
                            bands: int = 1, rounds: int = 4,
                            fb_tiles: int = 128):
    """Full-frame primary cast via banded, multi-round beams with a
    per-ray fallback.

    dirs: (H, W, 3) unit directions (shared origin (3,)); ``bands``
    splits tile-rows into groups processed sequentially under lax.map;
    ``rounds`` resumes paused beams (K more candidates per round) before
    falling back, so only pathological tiles ever pay per-ray cost.
    Returns dict hit/t/normal/voxel/rgb shaped (H, W[,3]).
    """
    Hpx, Wpx, _ = dirs.shape
    assert Hpx % tile == 0 and Wpx % tile == 0
    ty, tx = Hpx // tile, Wpx // tile
    assert ty % bands == 0
    o = jnp.asarray(origin, jnp.float32)

    dt = dirs.reshape(ty, tile, tx, tile, 3).transpose(0, 2, 1, 3, 4)
    dt = dt.reshape(ty * tx, tile * tile, 3)

    def band_fn(dband):  # (Bb, P, 3) for one band
        d_lo = jnp.min(dband, axis=1)
        d_hi = jnp.max(dband, axis=1)
        ob = jnp.broadcast_to(o, d_lo.shape)
        # collect->resolve rounds under lax.scan: one walk compilation
        # regardless of round count (unrolled rounds blow up compile time)
        cands0, state0 = beam_walk(aug, root, height, ob, ob, d_lo, d_hi,
                                   K=K, max_steps=max_steps,
                                   skip_t0=skip_t0)
        res0 = resolve_candidates(cands0["lvl"], cands0["off"],
                                  cands0["rgb"], o, dband, height,
                                  skip_t0=skip_t0)

        def round_body(carry, _):
            state, best, _, _ = carry
            cands, state = beam_walk(aug, root, height, ob, ob, d_lo, d_hi,
                                     K=K, max_steps=max_steps,
                                     skip_t0=skip_t0, state=state)
            res = resolve_candidates(cands["lvl"], cands["off"],
                                     cands["rgb"], o, dband, height,
                                     skip_t0=skip_t0)
            bk = jnp.where(best["hit"], best["t"], jnp.float32(FAR))
            rk = jnp.where(res["hit"], res["t"], jnp.float32(FAR))
            take = rk < bk
            best = dict(
                hit=best["hit"] | res["hit"],
                t=jnp.where(take, res["t"], best["t"]),
                normal=jnp.where(take[..., None], res["normal"],
                                 best["normal"]),
                voxel=jnp.where(take[..., None], res["voxel"],
                                best["voxel"]),
                rgb=jnp.where(take[..., None], res["rgb"], best["rgb"]),
            )
            return (state, best, cands["ok"], cands["t_safe"]), None

        carry = (state0, res0, cands0["ok"], cands0["t_safe"])
        if rounds > 1:
            carry, _ = jax.lax.scan(round_body, carry, None,
                                    length=rounds - 1)
        _, res, ok, t_safe = carry
        cands = dict(ok=ok, t_safe=t_safe)
        # A pixel is final if its tile was fully collected, or its hit is
        # strictly nearer than anything the walk didn't collect.
        confirmed = cands["ok"][:, None] | (
            res["hit"] & (res["t"] < cands["t_safe"][:, None])
        )
        need_px = ~confirmed
        # The per-ray fallback only has to search up to the tentative hit
        # (it is real geometry — just possibly not the nearest), which
        # prunes the traversal sharply on grazing tiles.
        cap = jnp.where(res["hit"], res["t"] * 1.000001 + 1e-4,
                        jnp.float32(FAR))

        # Per-ray fallback, tile-compacted: gather cost in the traversal
        # loop is insensitive to lane masks (PERF.md), so shrink the lane
        # count by packing the (few) unfinished tiles densely first. A
        # zero-cost full-width pass afterwards guarantees exactness if
        # more than `fb_tiles` tiles remained (its while-loop exits
        # immediately when nothing is active).
        Bb = dband.shape[0]
        M = min(Bb, max(fb_tiles, 1))
        need_tile = jnp.any(need_px, axis=1)
        order = jnp.argsort(~need_tile)  # unfinished tiles first
        sel_idx = order[:M]
        fbc = svo_raycast(table, root, height, o, dband[sel_idx],
                          distance=cap[sel_idx], skip_t0=skip_t0,
                          active=need_px[sel_idx])
        take_c = need_px[sel_idx] & fbc["hit"]
        out = dict(hit=res["hit"], t=res["t"], normal=res["normal"],
                   voxel=res["voxel"], rgb=res["rgb"])
        rgb_c = leaf_rgb(table, fbc["node"])
        out["hit"] = out["hit"].at[sel_idx].set(
            jnp.where(need_px[sel_idx], fbc["hit"] | res["hit"][sel_idx],
                      res["hit"][sel_idx]))
        out["t"] = out["t"].at[sel_idx].set(
            jnp.where(take_c, fbc["t"], res["t"][sel_idx]))
        out["normal"] = out["normal"].at[sel_idx].set(
            jnp.where(take_c[..., None], fbc["normal"],
                      res["normal"][sel_idx]))
        out["voxel"] = out["voxel"].at[sel_idx].set(
            jnp.where(take_c[..., None], fbc["voxel"],
                      res["voxel"][sel_idx]))
        out["rgb"] = out["rgb"].at[sel_idx].set(
            jnp.where(take_c[..., None], rgb_c, res["rgb"][sel_idx]))

        # safety pass: anything beyond the compaction budget (exact, and
        # free when nothing is left active)
        handled = jnp.zeros((Bb,), jnp.bool_).at[sel_idx].set(True)
        left = need_px & ~handled[:, None]
        fb = svo_raycast(table, root, height, o, dband, distance=cap,
                         skip_t0=skip_t0, active=left)
        sel = left & fb["hit"]
        return dict(
            hit=jnp.where(left, fb["hit"] | out["hit"], out["hit"]),
            t=jnp.where(sel, fb["t"], out["t"]),
            normal=jnp.where(sel[..., None], fb["normal"], out["normal"]),
            voxel=jnp.where(sel[..., None], fb["voxel"], out["voxel"]),
            rgb=jnp.where(sel[..., None], leaf_rgb(table, fb["node"]),
                          out["rgb"]),
        )

    if bands > 1:
        per = (ty // bands) * tx
        out = jax.lax.map(
            band_fn, dt.reshape(bands, per, tile * tile, 3)
        )
        out = {k: v.reshape((ty * tx,) + v.shape[2:]) for k, v in out.items()}
    else:
        out = band_fn(dt)

    def ung(a):
        extra = a.shape[2:]
        a = a.reshape(ty, tx, tile, tile, *extra)
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape(Hpx, Wpx, *extra)

    return {k: ung(v) for k, v in out.items()}


def beam_shadow_mask(table, aug, root, height: int, origins, active, sun,
                     K: int = 64, max_steps: int = 2048, rounds: int = 2,
                     fb_tiles: int = 128):
    """Beam-amortized any-hit shadow test toward the sun.

    origins: (Bb, P, 3) per-ray shadow origins grouped by tile; active:
    (Bb, P) rays to test; sun: (3,) unit direction. One walk per tile
    with *origin intervals* (the tile's hit-point bounding box) and a
    point direction. Any candidate hit certifies shadowed (occluders are
    real geometry, nearest-ness is irrelevant); a fully-walked tile with
    no hit certifies lit; the rest fall back per-ray (tile-compacted).

    Returns shadowed (Bb, P) bool (False where not active).
    """
    big = jnp.float32(1 << height) * 4.0
    o_masked = jnp.where(active[..., None], origins, jnp.float32(0))
    # bounding box over the tile's active origins (inactive rays excluded)
    o_lo = jnp.min(jnp.where(active[..., None], origins, big), axis=1)
    o_hi = jnp.max(jnp.where(active[..., None], origins, -big), axis=1)
    none_active = ~jnp.any(active, axis=1)
    o_lo = jnp.where(none_active[:, None], 0.0, o_lo)
    o_hi = jnp.where(none_active[:, None], 0.0, o_hi)
    del o_masked
    sun_b = jnp.broadcast_to(sun, o_lo.shape)

    shadowed = jnp.zeros(active.shape, jnp.bool_)
    state = None
    for _ in range(rounds):
        cands, state = beam_walk(aug, root, height, o_lo, o_hi, sun_b,
                                 sun_b, K=K, max_steps=max_steps,
                                 state=state)
        res = resolve_candidates(cands["lvl"], cands["off"], cands["rgb"],
                                 origins, jnp.broadcast_to(sun, origins.shape),
                                 height)
        shadowed = shadowed | (active & res["hit"])
    need_px = active & ~shadowed & ~cands["ok"][:, None]

    # tile-compacted per-ray fallback + zero-cost safety pass
    Bb, P = active.shape
    M = min(Bb, max(fb_tiles, 1))
    need_tile = jnp.any(need_px, axis=1)
    order = jnp.argsort(~need_tile)
    sel_idx = order[:M]
    fbc = svo_raycast(table, root, height, origins[sel_idx],
                      jnp.broadcast_to(sun, (M, P, 3)),
                      skip_t0=True, active=need_px[sel_idx])
    shadowed = shadowed.at[sel_idx].set(
        shadowed[sel_idx] | (need_px[sel_idx] & fbc["hit"]))
    handled = jnp.zeros((Bb,), jnp.bool_).at[sel_idx].set(True)
    left = need_px & ~handled[:, None]
    fb = svo_raycast(table, root, height, origins,
                     jnp.broadcast_to(sun, origins.shape),
                     skip_t0=True, active=left)
    return shadowed | (left & fb["hit"])


def beam_shadow_frame(table, aug, root, height: int, origin, dirs, sun,
                      tile: int = 8, K: int = 64, max_steps: int = 2048,
                      bands: int = 1, rounds: int = 4,
                      shadow_eps: float = 1.0e-3):
    """Beam-traced config-2 shading: primary + hard sun shadows + sky
    (kernels.shade.shade_shadow semantics, beam-amortized end to end)."""
    from voxtracer.kernels.shade import sky_color

    Hpx, Wpx, _ = dirs.shape
    ty, tx = Hpx // tile, Wpx // tile
    r = beam_primary_frame_cast(table, aug, root, height, origin, dirs,
                                tile=tile, K=K, max_steps=max_steps,
                                bands=bands, rounds=rounds)
    # group per tile for the shadow pass
    grp = lambda a: a.reshape(ty, tile, tx, tile, *a.shape[2:]).swapaxes(
        1, 2).reshape(ty * tx, tile * tile, *a.shape[2:])
    o = jnp.asarray(origin, jnp.float32)
    p = o + dirs * r["t"][..., None] - dirs * shadow_eps
    shadowed = beam_shadow_mask(
        table, aug, root, height, grp(p), grp(r["hit"]), sun,
        K=K, max_steps=max_steps,
    )

    def ung(a):
        extra = a.shape[2:]
        a = a.reshape(ty, tx, tile, tile, *extra)
        return jnp.moveaxis(a, 2, 1).reshape(Hpx, Wpx, *extra)

    shadowed = ung(shadowed)
    lighting = jnp.sum(sun * r["normal"], axis=-1) / 2.0 + 1.0
    lighting = lighting * jnp.where(shadowed, 0.5, 1.0)
    surface = r["rgb"] * lighting[..., None]
    return jnp.where(r["hit"][..., None], surface, sky_color(dirs, sun))


def beam_primary_frame(table, aug, root, height: int, origin, dirs, sun,
                       tile: int = 8, K: int = 64, max_steps: int = 2048,
                       bands: int = 1, rounds: int = 4):
    """Beam-traced config-1 shading (software.rs:260-276 lighting)."""
    r = beam_primary_frame_cast(table, aug, root, height, origin, dirs,
                                tile=tile, K=K, max_steps=max_steps,
                                bands=bands, rounds=rounds)
    lighting = jnp.sum(sun * r["normal"], axis=-1) / 2.0 + 1.0
    return r["rgb"] * lighting[..., None] * r["hit"][..., None]
