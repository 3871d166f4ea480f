"""Microbenchmarks of the XLA primitives that decide renderer architecture.

Run on the real TPU (no env override). Each primitive is timed at the
scale the rasterization pipeline would use: ~0.5-4M boxes, ~2-16M
fragments, 2M pixels. Results inform PERF.md; see the round-2 design
notes there.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, *args, reps=5, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / reps


def main():
    if jax.default_backend() != "cpu":  # CPU AOT entries are host-specific
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    P = 1920 * 1080  # pixels

    for F in (4_000_000, 16_000_000):
        keys = jnp.asarray(rng.random(F, np.float32))
        pix = jnp.asarray(rng.integers(0, P, F).astype(np.int32))
        payload = jnp.asarray(rng.integers(0, 1 << 30, F).astype(np.int32))

        dt = t(jax.jit(jnp.sort), keys)
        print(f"sort f32[{F}]: {dt*1e3:.1f} ms = {F/dt/1e6:.0f} M/s")

        f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        dt = t(f2, keys, payload)
        print(f"sort (f32,i32)[{F}]: {dt*1e3:.1f} ms = {F/dt/1e6:.0f} M/s")

        f3 = jax.jit(
            lambda k, p, q: jax.lax.sort((k, p, q), num_keys=1)
        )
        dt = t(f3, keys, payload, pix)
        print(f"sort (f32,i32,i32)[{F}]: {dt*1e3:.1f} ms = {F/dt/1e6:.0f} M/s")

        fsc = jax.jit(
            lambda pix, k: jnp.full(P, np.inf, jnp.float32).at[pix].min(k)
        )
        dt = t(fsc, pix, keys)
        print(f"scatter-min f32[{F}]->[{P}]: {dt*1e3:.1f} ms = {F/dt/1e6:.0f} M/s")

        fga = jax.jit(lambda buf, pix: buf[pix])
        buf = jnp.asarray(rng.random(P, np.float32))
        dt = t(fga, buf, pix)
        print(f"gather f32[{P}] at [{F}]: {dt*1e3:.1f} ms = {F/dt/1e6:.0f} M/s")

        fcs = jax.jit(jnp.cumsum)
        counts = jnp.asarray(rng.integers(0, 8, F).astype(np.int32))
        dt = t(fcs, counts)
        print(f"cumsum i32[{F}]: {dt*1e3:.1f} ms = {F/dt/1e6:.0f} M/s")
        print(flush=True)

    # segmented argmin alternative: sort by (pix, t) then boundary mask
    F = 4_000_000
    pix = jnp.asarray(rng.integers(0, P, F).astype(np.int32))
    tv = jnp.asarray(rng.random(F, np.float32))
    pl = jnp.asarray(rng.integers(0, 1 << 30, F).astype(np.int32))

    def zresolve(pix, tv, pl):
        spix, st, spl = jax.lax.sort((pix, tv, pl), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones(1, bool), spix[1:] != spix[:-1]]
        )
        out_t = jnp.full(P, np.inf, jnp.float32).at[
            jnp.where(first, spix, P)
        ].min(st, mode="drop")
        out_p = jnp.zeros(P, jnp.int32).at[
            jnp.where(first, spix, P)
        ].max(spl, mode="drop")
        return out_t, out_p

    dt = t(jax.jit(zresolve), pix, tv, pl)
    print(f"full z-resolve (2-key sort + 2 scatters) [{F}]->[{P}]: "
          f"{dt*1e3:.1f} ms = {F/dt/1e6:.0f} Mfrag/s")

    # row gather from a fat table (the tree-expansion step), 1M rows
    N = 1 << 20
    tbl = jnp.asarray(rng.integers(0, 1 << 30, (N, 8)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    fr = jax.jit(lambda tbl, idx: tbl[idx])
    dt = t(fr, tbl, idx)
    print(f"row gather (N,8)[{N}]: {dt*1e3:.1f} ms = {N/dt/1e6:.0f} Mrows/s")

    # matmul sanity: 4M x (3x4) transform
    M = 4_000_000
    pts = jnp.asarray(rng.random((M, 4), np.float32))
    mat = jnp.asarray(rng.random((4, 4), np.float32))
    fm = jax.jit(lambda a, b: a @ b)
    dt = t(fm, pts, mat)
    print(f"transform [{M}x4]@[4x4]: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
