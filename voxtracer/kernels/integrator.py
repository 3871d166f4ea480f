"""The spectral path-tracing integrator — the heart of the renderer.

One call traces one spectral path per ray in lockstep (wavefront form):
a bounded bounce loop over the whole batch with per-lane alive masks
replaces the reference's divergent per-thread loop. Per bounce
(behavioral reference: ``raytrace``, raytrace.wgsl:329-413):

1. cast planet/fog (atmosphere.raycast_planet) and the SVO capped at the
   fog event distance; the nearer event wins (raytrace.wgsl:342-347),
2. on miss: primary rays looking into the sun cone add the sun radiance;
   all missing rays terminate (raytrace.wgsl:349-355),
3. next-event estimation toward the sun disk: one planet cast + one SVO
   shadow cast; unshadowed surfaces add
   light * SUN_COLOR * albedo * brdf * (n·l) * 2pi * SUN_WEIGHT
   (raytrace.wgsl:362-383),
4. emissive rule: a hit whose rgba == (1,1,1,1) — i.e. a placed pure-white
   block — adds light * 10 * rgb * a (raytrace.wgsl:386-389),
5. cosine-hemisphere indirect bounce, light *= albedo * brdf * pi
   (raytrace.wgsl:390-397),
6. Russian roulette below throughput 0.5 (raytrace.wgsl:401-409).

The bounce loop is a bounded fori_loop (default 24; the reference's loop
is unbounded but Russian roulette makes survival past ~20 bounces
astronomically unlikely — truncation bias < 0.5^20).

RNG discipline: every stochastic stage consumes draws unconditionally
(masked lanes burn state) so jnp and Pallas backends agree bit-exactly.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from voxtracer.core import rng as vrng
from voxtracer.core import sampling
from voxtracer.core.lanes import take_lanes
from voxtracer.core.sampling import COS_SUN_RADIUS, PI, SUN_COLOR, SUN_WEIGHT
from voxtracer.core.spectra import fog_density, spectral_throughput
from voxtracer.core.vecmath import dot
from voxtracer.kernels import atmosphere
from voxtracer.kernels.traverse import (FAR, leaf_rgb, svo_raycast,
                                        svo_raycast_bucketed)

# Profiling-only stage ablations (module-level, read once at import so
# jit closures stay static): VOXT_PT_PROF="nee_off" replaces the NEE
# occlusion cast with "never blocked" — RADIANCE IS WRONG; the only use
# is timing the NEE walk's share of a fused PT batch on hardware
# (tools/bench_pt_quick.py --nee-off). Never set in production.
_PROF = os.environ.get("VOXT_PT_PROF", "")
# Experiment knob (perf only, bit-identical either way): how deep the
# fused batch's outer compaction descends — buckets shrink geometrically
# to max(B // DIV, 4096). Round-3 shipped DIV=64; core/lanes.py made
# boundaries ~cheap, so deeper descent is worth re-sweeping (VERDICT r3
# next #3b). Read once at import (jit closures stay static).
_FLOOR_DIV = int(os.environ.get("VOXT_PT_FLOOR_DIV", "64"))
# VOXT_PT_FUSE=1 turns the fused-NEE bounce loop on by default
# (trace_paths fuse_nee=None). Measured SLOWER on TPU (853x480/1024^3
# fused k=8: 0.871 vs 1.039 Mpaths/s): pooling the shadow and bounce
# populations makes the bucketed walk run at the POOLED width until
# total-alive crosses the next power of two, which costs more than the
# shared fixed costs save. Default OFF; the machinery stays (bit-exact,
# tests) for configs where the populations' alive curves align.
_FUSE = os.environ.get("VOXT_PT_FUSE", "0") == "1"


@partial(jax.jit, static_argnames=("height", "max_bounces", "fog_steps",
                                   "bit_size", "compact", "hf_offsets",
                                   "fuse_nee"))
def trace_paths(
    table,
    root,
    height: int,
    lut,
    start,
    direction,
    wavelength,
    sun,
    state,
    max_bounces: int = 24,
    fog_steps: int = 64,
    primary=None,
    bitworld=None,
    bit_size: int = 0,
    compact: bool = True,
    hf_mips=None,
    hf_offsets: tuple | None = None,
    terrain_rgb=None,
    sun_maps=None,
    hf_edit_bounds=None,
    fuse_nee: bool | None = None,
):
    """Trace one spectral path per ray; returns (state, radiance (...,3)).

    Args:
      table/root/height: flat SVO (kernels.traverse conventions).
      lut: (L, 3) wavelength->linear-RGB table.
      start: (...,3) ray origins; direction: (...,3) unit directions.
      wavelength: (...,) normalized wavelength in [0,1).
      sun: (3,) unit sun direction.
      state: (...,3) uint32 RNG state.
      primary: optional precomputed *uncapped* first-bounce SVO cast
        (dict hit/t/normal/rgb matching the batch shape) — e.g. from the
        beam engine (kernels.beam); bounce 0 then skips its per-ray
        traversal. An uncapped first hit nearer than the fog event is
        exactly what the capped cast would return (first-hit semantics).
      bitworld/bit_size: optional packed occupancy pyramid
        ((top, regions, bricks), world edge — world.bitgrid): world casts
        then use the gather-lean hierarchical bit DDA (kernels.bitdda)
        with colors resolved by one masked SVO descent per hit; the node
        table remains the color source. ~10x fewer gathers per bounce
        cast (PERF.md).
      hf_mips/hf_offsets/terrain_rgb: optional heightfield max-mip
        pyramid (kernels.heightfield.build_height_mips) for terrain
        worlds (pre-edit; see hf_edit_bounds for edited worlds):
        bounce/NEE casts then walk the 2-D quadtree
        (~15-40 gathers per lane vs the octree's hundreds — the whole
        cast cost is the serialized gather, PERF.md) and shade hits
        with ``terrain_rgb`` (the single interned terrain leaf color,
        bit-equal to leaf_rgb of that leaf, so radiance is identical).
        Takes precedence over ``bitworld``.
      sun_maps: optional conservative sun-visibility thresholds
        (kernels.sunshadow.build, arrays device-resident) for the same
        unedited-terrain worlds: NEE lanes the maps PROVE lit skip the
        shadow walk (two row gathers instead of ~7+); the residue takes
        the exact cast, so radiance is bit-identical
        (tests/test_sunshadow.py, tests/test_integrator.py).
      hf_edit_bounds: optional (2, 3) — or (K, 2, 3) box list — f32
        [lo, hi) covering every point
        edit since worldgen (inflated >= 1 voxel). Keeps the heightfield
        engine on EDITED terrain: lanes whose segment can see the bounds
        re-cast against the current node table, shading placed blocks by
        their own leaf; the rest keep the fast pre-edit walk
        (kernels.heightfield.hf_raycast_edited — lane-for-lane equal to
        the pure SVO cast on the edited world).
    """
    use_hf = hf_mips is not None
    if hf_edit_bounds is not None:
        sun_maps = None  # the maps prove PRE-edit visibility only

    def svo_cast(pos_, d_, distance=FAR, active=None):
        """Bounce/NEE casts are incoherent with heavy-tailed finish times,
        so compact finished lanes out of the traversal loop (bit-identical
        — kernels.traverse.svo_raycast_bucketed). Small batches stay on
        the plain cast (compaction overhead dominates)."""
        nb = 1
        for s in d_.shape[:-1]:
            nb *= int(s)
        if use_hf:
            from voxtracer.kernels.heightfield import (hf_raycast,
                                                       hf_raycast_edited)

            mb = 1024 if (compact and nb >= 16384) else 0
            if hf_edit_bounds is not None:
                return hf_raycast_edited(
                    hf_mips, hf_offsets, height, table, root,
                    hf_edit_bounds, pos_, d_, distance=distance,
                    active=active, min_bucket=mb)
            return hf_raycast(hf_mips, hf_offsets, height, pos_, d_,
                              distance=distance, active=active,
                              min_bucket=mb)
        if compact and nb >= 16384:
            # min_bucket=1024: deepest useful static compaction —
            # measured 1.9x over nb//8 on 409k-lane bounce casts
            # (the live-lane tail is long; 512/256 plateau, PERF.md)
            return svo_raycast_bucketed(
                table, root, height, pos_, d_, distance=distance,
                min_bucket=1024, active=active,
            )
        return svo_raycast(table, root, height, pos_, d_,
                           distance=distance, active=active)

    # Shadow rays resolve overwhelmingly near their origin (measured:
    # ~85% of blocked NEE casts block within t <= 8 at 1024^3 — terrain
    # self-shadowing), so NEE is two-stage: a cheap capped cast first
    # (the cap bounds traversal exit, so it walks ~cap voxel crossings),
    # then the full cast only for lanes it left unresolved. Any capped
    # hit is real geometry, so the combined blocked boolean is exact.
    NEE_NEAR = 8.0

    def nee_occluded(pos_, sun_dir, act):
        if "nee_off" in _PROF:  # profiling ablation (module doc)
            return jnp.zeros(act.shape, jnp.bool_)
        if use_hf:
            if sun_maps is not None:
                # provably-lit lanes skip the walk (sunshadow module
                # doc: lit implies the cast reports no hit for ANY
                # cone member, so the boolean is unchanged)
                from voxtracer.kernels.sunshadow import sun_clear

                lit = sun_clear(sun_maps, pos_)
                hit = svo_cast(pos_, sun_dir, active=act & ~lit)["hit"]
                return hit & ~lit
            # the heightfield walk resolves near occluders in a couple
            # of iterations anyway — one cast, same exact boolean
            return svo_cast(pos_, sun_dir, active=act)["hit"]
        near = svo_cast(pos_, sun_dir, distance=NEE_NEAR, active=act)
        blocked = near["hit"]
        far = svo_cast(pos_, sun_dir, active=act & ~blocked)
        return blocked | far["hit"]

    density = fog_density(wavelength)
    light = spectral_throughput(lut, wavelength)
    color = jnp.zeros_like(light)
    alive = jnp.ones(wavelength.shape, jnp.bool_)
    pos = jnp.broadcast_to(start, direction.shape).astype(jnp.float32)
    d = direction

    def bounce(carry, pre=None):
        i, state, pos, d, light, color, alive, density = carry

        state, planet = atmosphere.raycast_planet(
            state, pos, d, density, n_steps=fog_steps
        )
        cap = jnp.where(planet["hit"], planet["t"], FAR)
        if pre is not None:
            svo = pre
            use_svo = pre["hit"] & (pre["t"] <= cap)
            svo_rgb = pre["rgb"]
        elif bitworld is not None:
            from voxtracer.kernels.bitdda import bitgrid_raycast, svo_color_at

            svo = bitgrid_raycast(*bitworld, bit_size, pos, d, distance=cap)
            use_svo = svo["hit"] & (svo["t"] <= cap)
            svo_rgb = svo_color_at(table, root, height, svo["voxel"],
                                   use_svo & alive)
        else:
            svo = svo_cast(pos, d, distance=cap, active=alive)
            # nearer-event-wins like the reference (raytrace.wgsl:344-347):
            # the traversal's distance cap is advisory — a crossing taken
            # when no subvoxel bit is set can step past it (the reference
            # raycast has the same contour), so compare distances here.
            use_svo = svo["hit"] & (svo["t"] <= cap)
            if use_hf:
                svo_rgb = jnp.broadcast_to(
                    jnp.asarray(terrain_rgb, jnp.float32),
                    use_svo.shape + (3,),
                )
                if hf_edit_bounds is not None:
                    # re-cast lanes shade by their SVO leaf (placed
                    # blocks are not terrain-colored; emissive detection
                    # reads this rgb)
                    svo_rgb = jnp.where(
                        (svo["from_svo"] & svo["hit"])[..., None],
                        leaf_rgb(table, svo["node"]), svo_rgb,
                    )
            else:
                svo_rgb = leaf_rgb(table, svo["node"])

        hit_any = planet["hit"] | use_svo
        rgba = jnp.where(
            use_svo[..., None],
            jnp.concatenate([svo_rgb, jnp.ones_like(svo_rgb[..., :1])], -1),
            planet["rgba"],
        )
        t_hit = jnp.where(use_svo, svo["t"], planet["t"])
        normal = jnp.where(use_svo[..., None], svo["normal"], planet["normal"])

        # miss: primary rays see the sun disk directly (raytrace.wgsl:349-352)
        sun_disk = (i == 0) & (dot(d, sun) > COS_SUN_RADIUS)
        color = color + jnp.where(
            (alive & ~hit_any & sun_disk)[..., None], light * SUN_COLOR, 0.0
        )

        pos = jnp.where(
            (alive & hit_any)[..., None], pos + d * t_hit[..., None], pos
        )

        # --- next-event estimation toward the sun ---
        state, sun_dir = sampling.sample_sun(state, sun)
        facing = dot(sun_dir, normal) > 0.0
        state, sun_planet = atmosphere.raycast_planet(
            state, pos, sun_dir, density, n_steps=fog_steps
        )
        # only lanes whose NEE term can contribute need the world cast
        # (the cast consumes no RNG, so masking is radiance-exact)
        nee_act = alive & hit_any & facing & ~sun_planet["hit"]
        if bitworld is not None:
            from voxtracer.kernels.bitdda import bitgrid_raycast

            sun_occ = bitgrid_raycast(*bitworld, bit_size, pos,
                                      sun_dir)["hit"]
        else:
            sun_occ = nee_occluded(pos, sun_dir, nee_act)
        sun_visible = ~sun_planet["hit"] & ~sun_occ
        nee = (
            SUN_COLOR
            * rgba[..., :3]
            * sampling.brdf(d, sun_dir, normal)
            * (dot(normal, sun_dir) * 2.0 * PI * SUN_WEIGHT)[..., None]
        )
        color = color + jnp.where(
            (alive & hit_any & facing & sun_visible)[..., None], light * nee, 0.0
        )

        # --- emissive (pure-white placed blocks; raytrace.wgsl:386-389) ---
        emissive = jnp.all(rgba == 1.0, axis=-1)
        color = color + jnp.where(
            (alive & hit_any & emissive)[..., None],
            light * 10.0 * rgba[..., :3] * rgba[..., 3:4],
            0.0,
        )

        # --- indirect bounce ---
        state, ind_dir = sampling.cos_hemisphere(state, normal)
        light = jnp.where(
            (alive & hit_any)[..., None],
            light * rgba[..., :3] * (sampling.brdf(d, ind_dir, normal) * PI),
            light,
        )
        d = jnp.where((alive & hit_any)[..., None], ind_dir, d)

        # --- Russian roulette (raytrace.wgsl:401-409) ---
        T = 0.5
        state, rr = vrng.random3(state)
        rr_active = alive & hit_any & jnp.all(light < T, axis=-1)
        survive = rr[..., 0] < T
        light = jnp.where(
            (rr_active & survive)[..., None], light * (1.0 / T), light
        )
        alive = alive & hit_any & (~rr_active | survive)

        return (i + 1, state, pos, d, light, color, alive, density)

    # Early-exit bounce loop: stop as soon as every lane has terminated
    # (the reference loop is per-thread unbounded, raytrace.wgsl:341).
    #
    # Wavefront COMPACTION: a masked cast still pays full-width gathers
    # per traversal iteration (PERF.md), so the batch is squeezed into
    # statically-shrinking buckets (B -> B/2 -> B/4 -> B/8) as Russian
    # roulette kills lanes: each segment's while-loop additionally exits
    # once the live count fits the next bucket, survivors are argsort-
    # packed (per-lane RNG travels with the lane, so results are
    # bit-identical to the uncompacted loop), and dead lanes' colors are
    # scattered back during unwind. ~2.5x on the path-traced mode.
    B = int(wavelength.size)
    batch_shape = wavelength.shape
    buckets = []
    flattened = compact and B >= 8192
    if flattened:
        # geometric descent to B/64: a fused k-sample batch (B up to
        # several million lanes) otherwise rides its tail bounces at
        # B/8 width, paying full-width fog marches and elementwise math
        # for mostly-dead lanes (the per-level argsort+gather overhead
        # is small: XLA fuses the same-perm takes into one pass)
        b = B // 2
        floor = max(B // _FLOOR_DIV, 4096)
        while b >= floor:
            buckets.append(b)
            b //= 2
        flat = lambda a: a.reshape((B,) + a.shape[len(batch_shape):])
        state, pos, d, light, color, alive, density = map(
            flat, (state, pos, d, light, color, alive, density)
        )
        if primary is not None:
            primary = {k: flat(v) for k, v in primary.items()}

    # ---- fused-NEE loop (round 4) --------------------------------------
    # The production hf config runs a ROTATED bounce loop: each
    # iteration processes the PENDING bounce cast (carried from the
    # previous iteration), draws every stochastic stage, then issues
    # ONE 2B-lane bucketed walk serving bounce i's NEE shadow rays AND
    # bounce i+1's indirect rays together — both start at the same hit
    # point, so pooling them halves the per-cast fixed costs and lets
    # the compaction pools pack fast-retiring shadow lanes with bounce
    # lanes (NEE was ~26% of the sample as a separate cast, PERF.md).
    # Radiance is BIT-IDENTICAL to the unfused loop: the per-lane draw
    # SEQUENCE is unchanged ([planet, sun, sun_planet, cos, rr] per
    # bounce — bounce i+1's planet draw merely happens at iteration i's
    # tail instead of iteration i+1's head, and casts consume no RNG)
    # (tests/test_integrator.py::test_fused_nee_loop_bit_identical).
    # Drawing the fog event EARLY keeps the bounce half of the fused
    # walk distance-CAPPED — an uncapped variant measured 3.6x slower
    # on TPU (0.275 vs ~1.0 Mpaths/s): the fog cap is what retires
    # grazing sky-ward bounce lanes before the walk's horizon tail.
    # The one observable difference: the RETURNED chained state carries
    # one extra planet draw (the final iteration's tail), so it leads
    # the unfused loop's state by 3 pcg3d steps — radiance and all
    # in-loop draws are unaffected (trace_paths callers consume the
    # returned state only for progressive chaining, which remains
    # self-consistent).
    fuse = ((_FUSE if fuse_nee is None else fuse_nee) and use_hf
            and hf_edit_bounds is None
            and sun_maps is None and bitworld is None
            and "nee_off" not in _PROF and wavelength.ndim >= 1)

    def bounce_fused(carry):
        i, state, pos, d, light, color, alive, density, pend = carry

        cap = jnp.where(pend["p_hit"], pend["p_t"], FAR)
        use_svo = pend["s_hit"] & (pend["s_t"] <= cap)
        hit_any = pend["p_hit"] | use_svo
        rgba = jnp.where(
            use_svo[..., None],
            jnp.concatenate(
                [pend["s_rgb"], jnp.ones_like(pend["s_rgb"][..., :1])],
                -1),
            pend["p_rgba"],
        )
        t_hit = jnp.where(use_svo, pend["s_t"], pend["p_t"])
        normal = jnp.where(use_svo[..., None], pend["s_normal"],
                           pend["p_normal"])

        sun_disk = (i == 0) & (dot(d, sun) > COS_SUN_RADIUS)
        color = color + jnp.where(
            (alive & ~hit_any & sun_disk)[..., None],
            light * SUN_COLOR, 0.0)
        pos = jnp.where(
            (alive & hit_any)[..., None], pos + d * t_hit[..., None],
            pos)

        state, sun_dir = sampling.sample_sun(state, sun)
        facing = dot(sun_dir, normal) > 0.0
        state, sun_planet = atmosphere.raycast_planet(
            state, pos, sun_dir, density, n_steps=fog_steps)
        nee_act = alive & hit_any & facing & ~sun_planet["hit"]
        light_nee = light
        emissive = jnp.all(rgba == 1.0, axis=-1)

        nee = (SUN_COLOR * rgba[..., :3]
               * sampling.brdf(d, sun_dir, normal)
               * (dot(normal, sun_dir) * 2.0 * PI
                  * SUN_WEIGHT)[..., None])

        state, ind_dir = sampling.cos_hemisphere(state, normal)
        light = jnp.where(
            (alive & hit_any)[..., None],
            light * rgba[..., :3]
            * (sampling.brdf(d, ind_dir, normal) * PI),
            light)
        d_next = jnp.where((alive & hit_any)[..., None], ind_dir, d)

        T = 0.5
        state, rr = vrng.random3(state)
        rr_active = alive & hit_any & jnp.all(light < T, axis=-1)
        survive = rr[..., 0] < T
        light = jnp.where((rr_active & survive)[..., None],
                          light * (1.0 / T), light)
        alive_next = alive & hit_any & (~rr_active | survive)

        # bounce i+1's fog event, drawn at this iteration's tail (same
        # per-lane draw sequence; keeps the fused bounce half CAPPED)
        state, planet2 = atmosphere.raycast_planet(
            state, pos, d_next, density, n_steps=fog_steps)
        cap2 = jnp.where(planet2["hit"], planet2["t"], FAR)

        # the ONE fused walk: [NEE shadow | next bounce] lanes
        act_b = alive_next & (i + 1 < max_bounces)
        r2 = svo_cast(
            jnp.concatenate([pos, pos], axis=0),
            jnp.concatenate([sun_dir, d_next], axis=0),
            distance=jnp.concatenate(
                [jnp.full_like(cap2, FAR), cap2], axis=0),
            active=jnp.concatenate([nee_act, act_b], axis=0),
        )
        n0 = pos.shape[0]
        sun_occ = r2["hit"][:n0]
        sun_visible = ~sun_planet["hit"] & ~sun_occ
        color = color + jnp.where(
            (alive & hit_any & facing & sun_visible)[..., None],
            light_nee * nee, 0.0)
        # emissive AFTER the NEE add, matching `bounce`'s accumulation
        # order exactly: a lane with both terms nonzero in one bounce
        # (rgba all-ones) would otherwise break the bit-identity
        # guarantee through f32 addition order (ADVICE r4). Uses the
        # pre-bounce light (light_nee), like `bounce` does.
        color = color + jnp.where(
            (alive & hit_any & emissive)[..., None],
            light_nee * 10.0 * rgba[..., :3] * rgba[..., 3:4], 0.0)

        pend2 = dict(
            p_hit=planet2["hit"], p_t=planet2["t"],
            p_rgba=planet2["rgba"], p_normal=planet2["normal"],
            s_hit=r2["hit"][n0:], s_t=r2["t"][n0:],
            s_normal=r2["normal"][n0:],
            s_rgb=jnp.broadcast_to(
                jnp.asarray(terrain_rgb, jnp.float32), pos.shape),
        )
        return (i + 1, state, pos, d_next, light, color, alive_next,
                density, pend2)

    if fuse:
        trgb_b = jnp.broadcast_to(
            jnp.asarray(terrain_rgb, jnp.float32), pos.shape)
        state, planet0 = atmosphere.raycast_planet(
            state, pos, d, density, n_steps=fog_steps)
        cap0 = jnp.where(planet0["hit"], planet0["t"], FAR)
        if primary is not None:
            sv0 = dict(s_hit=primary["hit"], s_t=primary["t"],
                       s_normal=primary["normal"],
                       s_rgb=primary["rgb"])
        else:
            r0 = svo_cast(pos, d, distance=cap0, active=alive)
            sv0 = dict(s_hit=r0["hit"], s_t=r0["t"],
                       s_normal=r0["normal"], s_rgb=trgb_b)
        pend0 = dict(p_hit=planet0["hit"], p_t=planet0["t"],
                     p_rgba=planet0["rgba"],
                     p_normal=planet0["normal"], **sv0)
        carry = (jnp.int32(0), state, pos, d, light, color, alive,
                 density, pend0)
        body = bounce_fused
    else:
        carry = (jnp.int32(0), state, pos, d, light, color, alive,
                 density)
        if primary is not None:
            carry = bounce(carry, pre=primary)
        body = bounce

    def seg_cond(limit):
        def cond(c):
            ok = (c[0] < max_bounces) & jnp.any(c[6])
            if limit is not None:
                ok = ok & (jnp.sum(c[6]) > limit)
            return ok

        return cond

    unwinds = []
    for nxt in buckets:
        carry = jax.lax.while_loop(seg_cond(nxt), body, carry)
        i_, st_, pos_, d_, light_, color_, alive_, den_ = carry[:8]
        perm = jnp.argsort(~alive_)[:nxt]
        unwinds.append((color_, st_, perm, i_))
        # ONE packed row gather for the ~17 per-lane columns
        # (core/lanes.py): separate takes pay the serialized per-row
        # gather toll per ARRAY at every bucket boundary
        cols = dict(st=st_, pos=pos_, d=d_, light=light_,
                    color=color_, alive=alive_, den=den_)
        if fuse:
            cols.update({"pd_" + k: v for k, v in carry[8].items()})
        tk = take_lanes(cols, perm)
        carry = (i_, tk["st"], tk["pos"], tk["d"], tk["light"],
                 tk["color"], tk["alive"], tk["den"])
        if fuse:
            carry = carry + ({k[3:]: v for k, v in tk.items()
                              if k.startswith("pd_")},)

    carry = jax.lax.while_loop(seg_cond(None), body, carry)
    i_final, state, _, _, _, color = carry[:6]
    # Unwind the compaction: scatter the surviving lanes' colors AND RNG
    # states back through each bucket's permutation, so the returned
    # state is per-lane and full-shape regardless of compaction. Lanes
    # dropped at a bucket boundary additionally BURN the draws the
    # uncompacted loop's remaining iterations would have consumed (every
    # stochastic stage draws unconditionally — 11 random3 per bounce:
    # raycast_planet 3 + sample_sun 2 + raycast_planet 3 +
    # cos_hemisphere 2 + Russian roulette 1), so chained states are
    # bit-identical to the uncompacted loop for EVERY lane, dead or
    # alive (tests/test_integrator.py::test_compaction_chained_states).
    BOUNCE_DRAWS = 11
    for color_full, state_full, perm, i_b in reversed(unwinds):
        color = color_full.at[perm].set(color)
        state_burn = jax.lax.fori_loop(
            jnp.int32(0), (i_final - i_b) * BOUNCE_DRAWS,
            lambda _, s: vrng.pcg3d(s), state_full,
        )
        state = state_burn.at[perm].set(state)
    if flattened:
        color = color.reshape(batch_shape + (3,))
        state = state.reshape(batch_shape + (3,))
    return state, color


def _hf_env_primary(hf_mips, hf_offsets, height, cam_pos, d,
                    terrain_rgb, hf_sky_env):
    """Flagship hf-only PT primaries with the per-pose horizon-envelope
    resume (kernels/skyline.py build_skyline_env; round 4): camera rays
    start at the envelope's origin, so every jittered primary lane
    resumes at its certified-air ladder distance — the same 969->817 ms
    lever the exact frame rides. hf_sky_env: (E (bins, K), d0, g)
    pytree (d0/g may be traced). Bit-identical radiance: the resumed
    walk equals the plain walk (tests/test_skyline_env.py), and an
    uncapped first hit feeds trace_paths' pre path exactly like its own
    capped bounce-0 cast (trace_paths docstring)."""
    from voxtracer.kernels.heightfield import hf_raycast
    from voxtracer.kernels.skyline import skyline_env_tmin_traced

    sh = d.shape[:-1]
    dfl = d.reshape(-1, 3)
    tm = skyline_env_tmin_traced(hf_sky_env[0], dfl, hf_sky_env[1],
                                 hf_sky_env[2])
    pr = hf_raycast(hf_mips, hf_offsets, height,
                    jnp.asarray(cam_pos, jnp.float32), dfl,
                    min_bucket=4096, tile_steps=6, t_min=tm,
                    init_desc=3)
    return dict(
        hit=pr["hit"].reshape(sh),
        t=pr["t"].reshape(sh),
        normal=pr["normal"].reshape(sh + (3,)),
        rgb=jnp.broadcast_to(jnp.asarray(terrain_rgb, jnp.float32),
                             sh + (3,)),
    )


@partial(jax.jit, static_argnames=("height", "width_px", "height_px",
                                   "rows", "max_bounces", "fog_steps",
                                   "row_tiles", "bit_size", "soup_slots",
                                   "hf_offsets"))
def render_sample(
    table,
    root,
    height: int,
    lut,
    cam_pos,
    cam_basis,
    sun,
    frame_seed,
    width_px: int,
    height_px: int,
    row0=0,
    rows: int | None = None,
    max_bounces: int = 24,
    fog_steps: int = 64,
    row_tiles: int = 1,
    aug=None,
    soup=None,
    soup_bins=None,
    soup_slots=None,
    bitworld=None,
    bit_size: int = 0,
    hf_mips=None,
    hf_offsets: tuple | None = None,
    terrain_rgb=None,
    sun_maps=None,
    hf_edit_bounds=None,
    hf_sky_env=None,
):
    """One progressive sample: 1 spectral path per pixel (raytrace.wgsl:415-430).

    Per pixel: seed RNG from (frame_seed, pixel coords), draw one vec3 —
    xy is the sub-pixel jitter, z the wavelength — build the camera ray,
    trace. Returns the (rows, W, 3) radiance of this sample (the
    accumulator adds it). ``row0``/``rows`` select a horizontal band of
    the frame (used by the tile-sharded multi-chip path; the camera
    mapping is always relative to the full height_px frame).

    ``aug``: optional augmented node rows (kernels.beam.build_aug_table);
    when given (and the band is 8-aligned) the coherent first bounce is
    cast by the beam engine instead of per-ray traversal.

    ``soup``: optional (box_lo, box_size, box_attr) box-soup arrays
    (world.boxes / kernels.raster.pack_box_attr); the first bounce is
    then cast by the gather-free rasterizer on the jittered primary
    rays (fastest primary engine — PERF.md) and takes precedence over
    ``aug``. Row bands rasterize just their TILE-aligned band against
    the full-frame bins (banded resolve, kernels.raster band_rows).

    ``soup_bins``: optional pose-only raster state
    (kernels.raster.raster_bins with jittered=True at this pose/size) —
    skips re-binning the soup every sample; the Renderer caches it per
    pose.

    ``soup_slots``: optional static (pair_slots tuple, near_slots,
    fallback_tiles) capacities forwarded to the rasterizer — MUST match
    the capacities ``soup_bins`` was built with. The Renderer probes
    demand once per pose and passes sticky-grown capacities, so the hot
    path pays a pair sort sized to actual demand instead of the
    worst-case defaults (kernels.raster.fit_pair_slots).
    """
    from voxtracer.core import camera as vcam

    if rows is None:
        rows = height_px
    py, px = jnp.meshgrid(
        jnp.asarray(row0, jnp.int32) + jnp.arange(rows, dtype=jnp.int32),
        jnp.arange(width_px, dtype=jnp.int32),
        indexing="ij",
    )
    state = vrng.seed_pixels(frame_seed, px, py)
    state, rnd = vrng.random3(state)
    ld = vcam.pixel_ndc(px, py, width_px, height_px)
    d = vcam.ray_directions(cam_basis, ld, jitter=rnd[..., :2], height=height_px)
    wavelength = rnd[..., 2]
    pos = jnp.broadcast_to(jnp.asarray(cam_pos, jnp.float32), d.shape)

    primary = None
    if soup is not None:
        from voxtracer.kernels import raster as raster_mod

        slots_kw = {}
        if soup_slots is not None:
            slots_kw = dict(pair_slots=soup_slots[0],
                            near_slots=soup_slots[1],
                            fallback_tiles=soup_slots[2])
            if len(soup_slots) > 3 and soup_slots[3] is not None:
                wt = soup_slots[3]  # fit_widen_tiles caps, one per round
                slots_kw.update(widen_tiles=wt[0], widen2_tiles=wt[1],
                                widen3_tiles=wt[2])
        # unedited terrain world: the incomplete-tile fallback rides the
        # heightfield engine like the bounce/NEE casts already do (same
        # exactness contract; ~4x cheaper than the SVO traversal and far
        # less lane state — the flagship's 14k grazing horizon tiles made
        # the SVO fallback the dominant primary cost, PERF.md)
        if hf_mips is not None and terrain_rgb is not None \
                and hf_edit_bounds is None:
            slots_kw.update(hf_mips=hf_mips, hf_offsets=hf_offsets,
                            terrain_rgb=terrain_rgb)
        if rows == height_px:
            pr = raster_mod.raster_cast_exact(
                soup[0], soup[1], soup[2],
                jnp.asarray(cam_pos, jnp.float32), cam_basis, height,
                width_px, height_px, table=table, root=root, ray_dirs=d,
                bins=soup_bins, want_voxel=False, **slots_kw,
            )
        else:
            # row band (tile sharding): rasterize the TILE-aligned band
            # containing [row0, row0+rows) — the pose bins are
            # full-frame, only the resolve runs on the band — then
            # slice back. Padding rows' rays are seeded per-pixel like
            # any other, so the kept rows are bit-identical to the
            # full-frame cast (tests/test_dist.py).
            TILE = raster_mod.TILE
            th_f = -(-height_px // TILE)
            rp = min((rows + TILE - 1) // TILE * TILE + TILE,
                     th_f * TILE)
            r0a = jnp.clip((jnp.asarray(row0, jnp.int32) // TILE) * TILE,
                           0, th_f * TILE - rp)
            off = jnp.asarray(row0, jnp.int32) - r0a
            pyb, pxb = jnp.meshgrid(
                r0a + jnp.arange(rp, dtype=jnp.int32),
                jnp.arange(width_px, dtype=jnp.int32),
                indexing="ij",
            )
            stb = vrng.seed_pixels(frame_seed, pxb, pyb)
            _, rndb = vrng.random3(stb)
            ldb = vcam.pixel_ndc(pxb, pyb, width_px, height_px)
            db = vcam.ray_directions(cam_basis, ldb,
                                     jitter=rndb[..., :2],
                                     height=height_px)
            pr = raster_mod.raster_cast_exact(
                soup[0], soup[1], soup[2],
                jnp.asarray(cam_pos, jnp.float32), cam_basis, height,
                width_px, height_px, table=table, root=root, ray_dirs=db,
                bins=soup_bins, want_voxel=False, band_row0=r0a,
                band_rows=rp, **slots_kw,
            )
            take = lambda a: jax.lax.dynamic_slice_in_dim(a, off, rows, 0)
            pr = {k: take(pr[k]) for k in ("hit", "t", "normal", "rgb")}
        primary = dict(hit=pr["hit"], t=pr["t"], normal=pr["normal"],
                       rgb=pr["rgb"])
    elif aug is not None:
        from voxtracer.kernels import beam as beam_mod

        assert rows % 8 == 0 and width_px % 8 == 0, (
            "beam-primary path tracing needs 8-aligned dimensions"
        )
        pr = beam_mod.beam_primary_frame_cast(
            table, aug, root, height, jnp.asarray(cam_pos, jnp.float32), d,
            tile=8, K=64, max_steps=1024, rounds=4,
        )
        primary = dict(hit=pr["hit"], t=pr["t"], normal=pr["normal"],
                       rgb=pr["rgb"])
    elif (hf_mips is not None and hf_sky_env is not None
          and hf_edit_bounds is None):
        primary = _hf_env_primary(
            hf_mips, hf_offsets, height, cam_pos, d, terrain_rgb,
            hf_sky_env,
        )

    if row_tiles <= 1:
        _, radiance = trace_paths(
            table, root, height, lut, pos, d, wavelength, sun, state,
            max_bounces=max_bounces, fog_steps=fog_steps, primary=primary,
            bitworld=bitworld, bit_size=bit_size, hf_mips=hf_mips,
            hf_offsets=hf_offsets, terrain_rgb=terrain_rgb,
            sun_maps=sun_maps, hf_edit_bounds=hf_edit_bounds,
        )
        return radiance

    # Row-band tiling: each band gets its own lockstep loops, so finished
    # bands (sky, nearby geometry) stop iterating early instead of riding
    # the whole frame's worst-case lane.
    assert rows % row_tiles == 0
    rt = rows // row_tiles
    split = lambda a: a.reshape((row_tiles, rt) + a.shape[1:])

    if primary is None:
        def tile_fn(args):
            pos_t, d_t, wl_t, st_t = args
            _, c = trace_paths(
                table, root, height, lut, pos_t, d_t, wl_t, sun, st_t,
                max_bounces=max_bounces, fog_steps=fog_steps,
                bitworld=bitworld, bit_size=bit_size, hf_mips=hf_mips,
                hf_offsets=hf_offsets, terrain_rgb=terrain_rgb,
                sun_maps=sun_maps, hf_edit_bounds=hf_edit_bounds,
            )
            return c

        radiance = jax.lax.map(
            tile_fn, (split(pos), split(d), split(wavelength), split(state))
        )
    else:
        def tile_fn(args):
            pos_t, d_t, wl_t, st_t, pr_t = args
            _, c = trace_paths(
                table, root, height, lut, pos_t, d_t, wl_t, sun, st_t,
                max_bounces=max_bounces, fog_steps=fog_steps, primary=pr_t,
                bitworld=bitworld, bit_size=bit_size, hf_mips=hf_mips,
                hf_offsets=hf_offsets, terrain_rgb=terrain_rgb,
                sun_maps=sun_maps, hf_edit_bounds=hf_edit_bounds,
            )
            return c

        radiance = jax.lax.map(
            tile_fn,
            (split(pos), split(d), split(wavelength), split(state),
             {k: split(v) for k, v in primary.items()}),
        )
    return radiance.reshape((rows, width_px, 3))


@partial(jax.jit, static_argnames=("height", "width_px", "height_px",
                                   "max_bounces", "fog_steps", "row_tiles",
                                   "bit_size", "soup_slots", "fused",
                                   "hf_offsets"))
def render_samples(
    table, root, height: int, lut, cam_pos, cam_basis, sun, frame_seeds,
    width_px: int, height_px: int, max_bounces: int = 24,
    fog_steps: int = 64, row_tiles: int = 1, aug=None, soup=None,
    soup_bins=None, soup_slots=None, bitworld=None, bit_size: int = 0,
    fused: bool = True, hf_mips=None, hf_offsets: tuple | None = None,
    terrain_rgb=None, sun_maps=None, hf_edit_bounds=None,
    hf_sky_env=None,
):
    """Accumulate a batch of progressive samples in one device program.

    frame_seeds: (k, 3) uint32 — one RNG seed per sample. Returns the
    (H, W, 3) radiance SUM of the k samples (divide by k for the mean).

    ``fused`` (default): all k samples' paths are traced in ONE
    trace_paths call over k*H*W lanes instead of a per-sample scan.
    Per-lane radiance is bit-identical either way (each lane's RNG and
    arithmetic travel with it through compaction), but fusing pools the
    wavefront k times deeper: the compaction tail — many traversal
    iterations at live counts below the ~1k-lane per-iteration floor
    (PERF.md, the measured min_bucket plateau) — amortizes over k
    samples, which is where a serial sample's time goes. Primaries are
    still rasterized per sample (k cheap resolve passes against the
    shared pose bins). Falls back to the serial scan for the beam
    (``aug``) engine and row-banded tiling.
    """
    k = int(frame_seeds.shape[0])
    if fused and aug is None and k > 1:
        from voxtracer.core import camera as vcam

        py, px = jnp.meshgrid(
            jnp.arange(height_px, dtype=jnp.int32),
            jnp.arange(width_px, dtype=jnp.int32),
            indexing="ij",
        )

        def mk(seed):
            state = vrng.seed_pixels(seed, px, py)
            state, rnd = vrng.random3(state)
            ld = vcam.pixel_ndc(px, py, width_px, height_px)
            d = vcam.ray_directions(cam_basis, ld, jitter=rnd[..., :2],
                                    height=height_px)
            return state, d, rnd[..., 2]

        state, d, wavelength = jax.vmap(mk)(frame_seeds)  # (k, H, W, ..)
        pos = jnp.broadcast_to(
            jnp.asarray(cam_pos, jnp.float32), d.shape
        )

        primary = None
        if soup is not None:
            from voxtracer.kernels import raster as raster_mod

            slots_kw = {}
            if soup_slots is not None:
                slots_kw = dict(pair_slots=soup_slots[0],
                                near_slots=soup_slots[1],
                                fallback_tiles=soup_slots[2])
            if hf_mips is not None and terrain_rgb is not None \
                    and hf_edit_bounds is None:
                # unedited terrain: heightfield fallback (render_sample)
                slots_kw.update(hf_mips=hf_mips, hf_offsets=hf_offsets,
                                terrain_rgb=terrain_rgb)

            if soup_bins is None:
                # one pose-only binning shared by all k samples (the
                # Renderer passes its per-pose cache; headless/bench
                # paths get the same sharing in-program)
                soup_bins = raster_mod.raster_bins(
                    soup[0], soup[1], jnp.asarray(cam_pos, jnp.float32),
                    cam_basis, height, width_px, height_px,
                    near_slots=slots_kw.get("near_slots", 64),
                    pair_slots=slots_kw.get("pair_slots"), jittered=True,
                    box_attr=soup[2],
                )

            # ONE k-batched resolve: the per-tile candidate row gathers
            # (the resolve's serialized cost) are paid once for all k
            # jitters; the slab math — vector work — scales with k
            # (kernels/raster.py, bit-identical to k separate casts)
            pr = raster_mod.raster_cast_exact(
                soup[0], soup[1], soup[2],
                jnp.asarray(cam_pos, jnp.float32), cam_basis, height,
                width_px, height_px, table=table, root=root,
                ray_dirs=d, bins=soup_bins, want_voxel=False,
                **slots_kw,
            )
            primary = dict(hit=pr["hit"], t=pr["t"],
                           normal=pr["normal"], rgb=pr["rgb"])
        elif (hf_mips is not None and hf_sky_env is not None
              and hf_edit_bounds is None):
            # flagship hf-only primaries: per-pose horizon-envelope
            # resume over all k samples' jittered rays (_hf_env_primary)
            primary = _hf_env_primary(
                hf_mips, hf_offsets, height, cam_pos, d, terrain_rgb,
                hf_sky_env,
            )

        B = k * height_px * width_px
        fl = lambda a: a.reshape((B,) + a.shape[3:])
        if primary is not None:
            primary = {kk: fl(v) for kk, v in primary.items()}
        _, radiance = trace_paths(
            table, root, height, lut, fl(pos), fl(d), fl(wavelength),
            sun, fl(state), max_bounces=max_bounces, fog_steps=fog_steps,
            primary=primary, bitworld=bitworld, bit_size=bit_size,
            hf_mips=hf_mips, hf_offsets=hf_offsets, terrain_rgb=terrain_rgb,
            sun_maps=sun_maps, hf_edit_bounds=hf_edit_bounds,
        )
        r = radiance.reshape((k, height_px, width_px, 3))
        # serial sum, matching the scan path's accumulation order exactly
        acc = r[0]
        for i in range(1, k):
            acc = acc + r[i]
        return acc

    def body(acc, seed):
        s = render_sample(
            table, root, height, lut, cam_pos, cam_basis, sun, seed,
            width_px, height_px, max_bounces=max_bounces,
            fog_steps=fog_steps, row_tiles=row_tiles, aug=aug, soup=soup,
            soup_bins=soup_bins, soup_slots=soup_slots, bitworld=bitworld,
            bit_size=bit_size, hf_mips=hf_mips, hf_offsets=hf_offsets,
            terrain_rgb=terrain_rgb, sun_maps=sun_maps,
            hf_edit_bounds=hf_edit_bounds, hf_sky_env=hf_sky_env,
        )
        return acc + s, None

    init = jnp.zeros((height_px, width_px, 3), jnp.float32)
    acc, _ = jax.lax.scan(body, init, frame_seeds)
    return acc
