"""Cross-implementation fuzz: the Python and C++ SVO builders must agree
with a plain dict model under arbitrary edit sequences, and their
serialized tables must be traversal-equivalent."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxtracer.kernels.traverse import svo_raycast
from voxtracer.world.native import NativeSvoSpace, available
from voxtracer.world.svo import SvoSpace, from_dense


@pytest.mark.skipif(not available(), reason="no native builder")
def test_fuzz_edit_sequences(rng):
    n = 16
    for trial in range(5):
        # seed both implementations with the same floor terrain (height 4)
        solid = np.zeros((n, n, n), bool)
        solid[:, 0, :] = True
        rgb0 = np.zeros((n, n, n, 3), np.float32)
        rgb0[solid] = (0.5, 0.5, 0.5)
        py = from_dense(solid, rgb0)
        nat = NativeSvoSpace()
        nat.build_terrain(np.ones((n, n), np.uint32))
        model = {
            (x, 0, z): (0.5, 0.5, 0.5) for x in range(n) for z in range(n)
        }

        for _ in range(120):
            p = tuple(int(v) for v in rng.integers(0, n, 3))
            if rng.random() < 0.6:
                c = tuple(np.float32(v) for v in rng.random(3))
                py.set(p, c)
                nat.set(p, c)
                model[p] = tuple(float(np.float32(v)) for v in c)
            else:
                py.set(p, None)
                nat.set(p, None)
                model.pop(p, None)

        # point queries agree with the model
        for _ in range(80):
            p = tuple(int(v) for v in rng.integers(0, n, 3))
            want = model.get(p)
            got_py = py.get(p)
            got_nat = nat.get(p)
            if want is None:
                assert got_py is None and got_nat is None
            else:
                assert got_py is not None and got_nat is not None
                assert np.allclose(got_py, want, atol=1e-6)
                assert np.allclose(got_nat, want, atol=1e-6)

        # node counts match up to the bulk builder's pre-created solid-cube
        # chain (log2(n) interned-but-unreferenced nodes; the recursive
        # reference creates them lazily, worldgen.rs:67-72)
        assert abs(py.num_nodes() - nat.num_nodes()) <= 4

        # serialized tables are traversal-equivalent
        dpy, dnat = py.serialize(), nat.serialize()
        if dpy.root == 0xFFFFFFFF:
            assert dnat.root == 0xFFFFFFFF
            continue
        B = 256
        start = rng.random((B, 3)).astype(np.float32) * (3 * n) - n
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ra = svo_raycast(jnp.asarray(dpy.table.view(np.int32)),
                         np.int32(dpy.root), dpy.height,
                         jnp.asarray(start), jnp.asarray(d), skip_t0=False)
        rb = svo_raycast(jnp.asarray(dnat.table.view(np.int32)),
                         np.int32(dnat.root), dnat.height,
                         jnp.asarray(start), jnp.asarray(d), skip_t0=False)
        assert np.array_equal(np.asarray(ra["hit"]), np.asarray(rb["hit"]))
        both = np.asarray(ra["hit"])
        assert np.allclose(np.asarray(ra["t"])[both],
                           np.asarray(rb["t"])[both], atol=1e-5)
        assert np.array_equal(np.asarray(ra["voxel"])[both],
                              np.asarray(rb["voxel"])[both])
