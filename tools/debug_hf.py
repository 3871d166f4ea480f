"""Standalone hf_raycast debugger: capped-iteration python loop."""
import numpy as np
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from voxtracer.kernels.heightfield import (build_height_mips, _hf_init,
                                           _hf_body)
from voxtracer.kernels.traverse import svo_raycast
from voxtracer.world import worldgen

LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 5
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ITERS = 400

space = worldgen.generate(log2_size=LOG2, verbose=False)
dev = space.serialize()
table = jnp.asarray(dev.table.view(np.int32))
root = np.int32(dev.root)
flat, offs, h = build_height_mips(space.heights)

rng = np.random.default_rng(7)
n = 1 << LOG2
start = rng.uniform(0, n, (B, 3)).astype(np.float32)
d = rng.standard_normal((B, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)

st, co, d_sign, bs = _hf_init(flat, offs, h, jnp.asarray(start),
                              jnp.asarray(d), jnp.float32(1e12), True, None)
alive_hist = []
for i in range(ITERS):
    na = int(np.asarray(st["alive"]).sum())
    alive_hist.append(na)
    if na == 0:
        break
    st = _hf_body(st, co, flat, offs, h)
print("iters:", i, "alive history tail:", alive_hist[-10:])
if alive_hist[-1] > 0 and i == ITERS - 1:
    a = np.asarray(st["alive"])
    idx = np.argwhere(a).ravel()[:5]
    for j in idx:
        print(f"lane {j}: start={start[j]} d={d[j]} t={np.asarray(st['t'])[j]}"
              f" L={np.asarray(st['L'])[j]} cx={np.asarray(st['cx'])[j]}"
              f" cz={np.asarray(st['cz'])[j]}")
    sys.exit(1)

# compare against svo
sv = svo_raycast(table, root, h, jnp.asarray(start), jnp.asarray(d))
from voxtracer.kernels.heightfield import _hf_finalize
hf = _hf_finalize(st, d_sign, bs)
hit_a = np.asarray(sv["hit"]); hit_b = np.asarray(hf["hit"])
mism = hit_a != hit_b
both = hit_a & hit_b
mism |= both & (np.asarray(sv["t"]) != np.asarray(hf["t"]))
mism |= both & np.any(np.asarray(sv["normal"]) != np.asarray(hf["normal"]), -1)
vox_mism = both & np.any(np.asarray(sv["voxel"]) != np.asarray(hf["voxel"]), -1)
print(f"hits svo={hit_a.sum()} hf={hit_b.sum()} mism={mism.sum()} "
      f"voxmism={vox_mism.sum()}")
for j in np.argwhere(mism | vox_mism).ravel()[:8]:
    print(f"lane {j}: start={start[j]} d={d[j]}\n"
          f"  svo hit={hit_a[j]} t={np.asarray(sv['t'])[j]:.6f} "
          f"vox={np.asarray(sv['voxel'])[j]} n={np.asarray(sv['normal'])[j]}\n"
          f"  hf  hit={hit_b[j]} t={np.asarray(hf['t'])[j]:.6f} "
          f"vox={np.asarray(hf['voxel'])[j]} n={np.asarray(hf['normal'])[j]}")

# ---- single-lane trace ----
if len(sys.argv) > 3:
    lane = int(sys.argv[3])
    st1, co1, _, _ = _hf_init(flat, offs, h, jnp.asarray(start[lane:lane+1]),
                              jnp.asarray(d[lane:lane+1]), jnp.float32(1e12),
                              True, None)
    hm = np.asarray(flat[: (1 << LOG2) ** 2]).reshape(1 << LOG2, 1 << LOG2)
    print("start", start[lane], "d", d[lane])
    x0, z0 = int(start[lane][0]), int(start[lane][2])
    print("h around start col:", hm[max(0,x0-1):x0+2, max(0,z0-1):z0+2])
    for i in range(60):
        if not bool(np.asarray(st1["alive"])[0]):
            break
        print(f"i={i} t={float(np.asarray(st1['t'])[0]):.6f} "
              f"L={int(np.asarray(st1['L'])[0])} "
              f"cx={int(np.asarray(st1['cx'])[0])} "
              f"cz={int(np.asarray(st1['cz'])[0])} "
              f"axis={int(np.asarray(st1['axis'])[0])} "
              f"hit={bool(np.asarray(st1['hit'])[0])}")
        st1 = _hf_body(st1, co1, flat, offs, h)
    print("final hit", bool(np.asarray(st1["hit"])[0]),
          "t", float(np.asarray(st1["hit_t"])[0]),
          "vox", np.asarray(st1["hit_voxel"])[0])
