"""Native (C++) BVH builder vs the numpy reference builder."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.accel import build_bvh, bvh_intersect, icosphere
from raytracing_engine_tpu.native.loader import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native builder"
)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    tgt = np.array([0.0, 4.0, 0.0]) + rng.normal(size=(n, 3)) * 1.5
    d = (tgt - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("method", ["median", "sah"])
def test_native_matches_python_traversal(method):
    mesh = icosphere(subdivisions=3, radius=1.0, center=(0.0, 4.0, 0.0))
    b_py = build_bvh(mesh, use_native=False, method=method)
    b_cc = build_bvh(mesh, use_native=True, method=method)
    o, d = _rays(512)
    t_py, _, _, _ = bvh_intersect(b_py, o, d)
    t_cc, _, _, _ = bvh_intersect(b_cc, o, d)
    np.testing.assert_allclose(
        np.asarray(t_cc), np.asarray(t_py), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("use_native", [False, True])
def test_sah_tree_is_tighter(use_native):
    """SAH's whole point: lower sum of interior-node surface areas (expected
    traversal cost) than the median split on an anisotropic mesh. Traversal
    RESULTS are tree-independent (closest hit commutes); this pins the
    QUALITY so a partitioner regression can't slip through silently."""
    from raytracing_engine_tpu.accel import torus_knot

    mesh = torus_knot(segments=180, sides=12)

    def cost(b):
        lo, hi = np.asarray(b.bb_min), np.asarray(b.bb_max)
        d = np.maximum(hi - lo, 0.0)
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        return float(area.sum())

    c_sah = cost(build_bvh(mesh, use_native=use_native, method="sah"))
    c_med = cost(build_bvh(mesh, use_native=use_native, method="median"))
    assert c_sah < 0.95 * c_med, f"SAH {c_sah:.1f} vs median {c_med:.1f}"


def test_native_structure_valid():
    mesh = icosphere(subdivisions=3, radius=1.0)
    b = build_bvh(mesh, use_native=True)
    n = b.bb_min.shape[0]
    skip = np.asarray(b.skip)
    assert (skip > np.arange(n)).all() and (skip <= n).all()
    assert sorted(np.asarray(b.perm).tolist()) == list(range(mesh.shape[0]))
    # leaves cover all triangles exactly once
    first = np.asarray(b.first_tri)
    cnt = np.asarray(b.tri_count)
    total = cnt[first >= 0].sum()
    assert total == mesh.shape[0]


def test_native_scales_to_70k():
    from raytracing_engine_tpu.accel import torus_knot
    import time

    mesh = torus_knot(segments=1100, sides=32)  # 70400 tris
    t0 = time.perf_counter()
    b = build_bvh(mesh, use_native=True)
    dt = time.perf_counter() - t0
    assert b.v0.shape[0] == 70400
    assert dt < 5.0, f"native build took {dt:.1f}s"
