"""Build-once cache of the flagship (8192^3) world artifacts.

Flagship iteration is dominated by setup — worldgen ~40 s, box-soup
extraction ~200 s, the horizon cull ~127 s — so perf debugging at that
scale pays ~6 minutes per attempt. This writes every host artifact the
flagship bench needs to one .npz; tools/bench_flagship.py (and any
ad-hoc probe) loads it in seconds.

Usage: python tools/flagship_cache.py [/tmp/flagship_cache.npz]
"""

from __future__ import annotations

import sys
import time

import numpy as np

DEFAULT = "/tmp/flagship_cache.npz"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    sys.path.insert(0, "/root/repo")
    from voxtracer.world import worldgen
    from voxtracer.world.boxes import extract_boxes

    t0 = time.monotonic()
    space = worldgen.generate(log2_size=13, verbose=False)
    dev = space.serialize()
    log(f"worldgen+serialize {time.monotonic() - t0:.1f}s, "
        f"{space.num_nodes()} nodes")
    t0 = time.monotonic()
    soup = extract_boxes(dev)
    log(f"soup {len(soup)} boxes in {time.monotonic() - t0:.1f}s")
    np.savez(
        out,
        table=dev.table,
        root=np.int64(dev.root),
        height=np.int64(dev.height),
        solid_leaf=(np.zeros(0, np.int32) if dev.solid_leaf is None
                    else np.asarray(dev.solid_leaf, np.int32)),
        heights=space.heights,
        terrain_rgb=np.asarray(space.terrain_rgb, np.float32),
        lo=soup.lo, size=soup.size, leaf=soup.leaf, rgb=soup.rgb,
    )
    log(f"wrote {out}")


def load(path: str = DEFAULT):
    """Return (dev-like namespace, BoxSoup, heights, terrain_rgb)."""
    from types import SimpleNamespace

    from voxtracer.world.boxes import BoxSoup

    z = np.load(path)
    sl = z["solid_leaf"]
    if sl.ndim == 0:  # caches written before the array form
        sl = np.zeros(0, np.int32) if int(sl) < 0 else None
    dev = SimpleNamespace(table=z["table"], root=int(z["root"]),
                          height=int(z["height"]),
                          solid_leaf=sl.astype(np.int32)
                          if sl is not None and len(sl) else None)
    soup = BoxSoup(lo=z["lo"], size=z["size"], leaf=z["leaf"],
                   rgb=z["rgb"], height=dev.height)
    return dev, soup, z["heights"], z["terrain_rgb"]


if __name__ == "__main__":
    main()
