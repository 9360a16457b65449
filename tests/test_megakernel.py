"""PT megakernel (interpret mode) vs the XLA wavefront core.

Both run _trace_core with the counter-based PCG stream keyed by global pixel
coordinates, so tile decomposition must not change the result beyond float
reassociation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels: compile-heavy

from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
from raytracing_engine_tpu.pathtracer import PTConfig
from raytracing_engine_tpu.pathtracer.scenes import (
    cornell_box,
    furnace_scene,
    material_spheres,
)
from raytracing_engine_tpu.pathtracer.wavefront import render_pt_fast

KEY = jax.random.PRNGKey(13)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])


@pytest.mark.parametrize("scene_fn,pos", [
    (material_spheres, jnp.zeros(3)),
    (cornell_box, jnp.array([0.0, 0.2, 0.0])),
])
def test_mega_matches_xla_pcg(scene_fn, pos):
    cfg = PTConfig(width=32, height=16, max_bounces=3, rng="pcg")
    scene = scene_fn()
    want, n_want = render_pt_fast(cfg, scene, pos, QUAT, 2, KEY)
    got, n_got = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY)
    d = np.abs(np.asarray(got) - np.asarray(want)).max(-1)
    assert (d > 1e-3).mean() < 0.01, f"{(d > 1e-3).mean():.3%} diverged"
    assert d.mean() < 1e-4
    assert abs(float(n_want) - float(n_got)) <= max(8.0, 1e-3 * float(n_want))


def test_mega_furnace_physics():
    cfg = PTConfig(width=32, height=16, max_bounces=3, rng="pcg")
    img, _ = render_pt_mega(cfg, furnace_scene(albedo=0.5, le=1.0),
                            jnp.zeros(3), QUAT, 32, KEY)
    img = np.asarray(img)
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]])
    np.testing.assert_allclose(corners, 1.0, atol=1e-4)


def test_mega_rejects_big_meshes():
    from raytracing_engine_tpu.accel import icosphere
    from raytracing_engine_tpu.pathtracer.scene import build_pt_scene

    tris = icosphere(subdivisions=2)
    scene = build_pt_scene(
        spheres=[], triangles=tris, tri_mats=np.zeros(len(tris), np.int32),
        materials=[{"albedo": (0.5,) * 3}],
    )
    cfg = PTConfig(width=16, height=16)
    with pytest.raises(ValueError):
        render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, KEY)


def _mesh_scene():
    from raytracing_engine_tpu.accel import icosphere
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    tris = icosphere(subdivisions=2, radius=1.2, center=(0.0, 5.0, 0.0))
    tri_mats = np.zeros(len(tris), np.int32)
    mats = [
        {"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
        {"albedo": (0, 0, 0), "emission": (8.0,) * 3, "kind": DIFFUSE},
        {"albedo": (0.5, 0.5, 0.6), "kind": DIFFUSE},
    ]
    scene = build_pt_scene(
        spheres=[((3.0, 3.0, 3.0), 1.0, 1), ((0.0, 5.0, -52.0), 50.0, 2)],
        triangles=tris, tri_mats=tri_mats, materials=mats,
    )
    return scene, tris, tri_mats


def test_mega_cluster_mode_matches_wavefront():
    """bvh=ClusterSet runs the whole bounce loop in-kernel via the
    hierarchical cluster sweep; must match the XLA wavefront with the same
    ClusterSet (same pcg stream; only hit-attr provenance differs)."""
    from raytracing_engine_tpu.accel.clusters import build_clusters

    scene, tris, tri_mats = _mesh_scene()
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=32, height=16, max_bounces=2, rng="pcg")
    pos = jnp.zeros(3)
    want, n_want = render_pt_fast(cfg, scene, pos, QUAT, 2, KEY, bvh=cs)
    got, n_got = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs)
    d = np.abs(np.asarray(got) - np.asarray(want)).max(-1)
    assert (d > 1e-3).mean() < 0.02, f"{(d > 1e-3).mean():.3%} diverged"
    assert d.mean() < 2e-4
    assert abs(float(n_want) - float(n_got)) <= max(8.0, 1e-3 * float(n_want))


@pytest.mark.parametrize("mode", [True, "compact", "compact_oct"])
def test_sorted_wavefront_bit_identical(mode):
    """Ray regrouping (full Morton argsort or the cumsum alive-partition)
    is a pure execution-order optimization: the regrouped render must
    equal the unsorted one exactly (same pcg stream keyed by original
    pixel coords, same per-ray arithmetic, exact un-permute)."""
    from raytracing_engine_tpu.accel.clusters import build_clusters

    scene, tris, tri_mats = _mesh_scene()
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=32, height=16, max_bounces=3, rng="pcg")
    pos = jnp.zeros(3)
    want, n_want = render_pt_fast(cfg, scene, pos, QUAT, 2, KEY, bvh=cs)
    got, n_got = render_pt_fast(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                sort=mode)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(n_want) == float(n_got)


@pytest.mark.parametrize("groups", [2, 4])
def test_mega_row_groups_bit_identical(groups):
    """Row-group-gated test issue (kc.groups): a skipped group had
    sub_hit all-false, so every skipped test would have failed its ok
    gate — the image must be bit-identical to whole-tile issue."""
    from raytracing_engine_tpu.accel.clusters import build_clusters

    scene, tris, tri_mats = _mesh_scene()
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=64, height=32, max_bounces=2, rng="pcg")
    pos = jnp.zeros(3)
    want, n_want = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                  tile=(8, 64))
    got, n_got = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                tile=(8, 64), groups=groups)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(n_want) == float(n_got)


def test_mega_striped_tiles_bit_identical():
    """The striped pixel mapping (stripes=k renders each VMEM tile as a
    squarer pixel block) is a pure execution-layout optimization: camera
    rays and the counter-based RNG are keyed on true global pixel
    coordinates, so every stripes value must produce the exact same image
    (pt_kernel un-permutes with pure reshapes)."""
    from raytracing_engine_tpu.accel.clusters import build_clusters

    scene, tris, tri_mats = _mesh_scene()
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=64, height=32, max_bounces=2, rng="pcg")
    pos = jnp.zeros(3)
    want, n_want = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                  tile=(8, 64), stripes=1)
    for stripes in (2, 4):
        got, n_got = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                    tile=(8, 64), stripes=stripes)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert float(n_want) == float(n_got)
