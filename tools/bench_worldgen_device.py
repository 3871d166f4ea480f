"""TPU check of on-device worldgen noise (SURVEY 7.2-6): time the
heightmap eval on the accelerator (cold + cache-warm) vs the host CPU
backend, at the bench (1024) and flagship (8192) sizes. The octree
build consumes heights host-side either way, so the question is purely
whether the noise program pays for its transfer + dispatch once the
persistent compile cache holds it."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if jax.default_backend() != "cpu":  # CPU AOT entries are host-specific
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    from voxtracer.world.worldgen import heightmap

    for log2 in (10, 13):
        t0 = time.monotonic()
        h_host = heightmap(log2, device="cpu")
        t_host = time.monotonic() - t0
        t0 = time.monotonic()
        h_dev = heightmap(log2, device=None)  # default device (axon TPU)
        t_cold = time.monotonic() - t0
        t0 = time.monotonic()
        h_dev2 = heightmap(log2, device=None)
        t_warm = time.monotonic() - t0
        same = np.array_equal(np.asarray(h_host), np.asarray(h_dev))
        log(f"log2 {log2}: host {t_host:.2f}s  device cold {t_cold:.2f}s "
            f"warm {t_warm:.2f}s  equal={same} "
            f"(warm2 includes device->host readback of "
            f"{(1 << log2) ** 2 * 4 / 1e6:.0f} MB over the tunnel)")
        assert same or np.abs(
            np.asarray(h_host).astype(np.int64)
            - np.asarray(h_dev).astype(np.int64)).max() <= 1, \
            "device noise diverged beyond f32 ulp"
        del h_dev2


if __name__ == "__main__":
    main()
