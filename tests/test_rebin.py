"""Rebin renderer (per-bounce megakernel + lax.sort regroup) parity.

render_pt_rebin must be BIT-IDENTICAL to render_pt_mega / render_pt_fast:
every RNG draw is counter-keyed on the ray's carried pixel coordinates, so
the image-wide regroup between bounce launches can only change which VMEM
tile executes a ray, never its arithmetic. (The regroup exists because
bounce sweeps run at ~6-10% occupancy spread over most tiles —
benchmarks/experiment_regroup.json — and transporting the whole ray state
through ONE variadic sort costs ~3 ms at 512^2 where per-plane gathers
cost ~50 ms: benchmarks/experiment_transport.json.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.pathtracer import PTConfig
from raytracing_engine_tpu.pathtracer.scene import (
    DIELECTRIC,
    DIFFUSE,
    METAL,
    build_pt_scene,
)
from raytracing_engine_tpu.ops.pallas.pt_kernel import (
    render_pt_mega,
    render_pt_rebin,
)

KEY = jax.random.PRNGKey(3)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])


def _mesh_scene(extra_mats=False):
    from raytracing_engine_tpu.accel import icosphere

    tris = icosphere(subdivisions=2, radius=1.2, center=(0.0, 5.0, 0.0))
    tri_mats = np.zeros(len(tris), np.int32)
    mats = [
        {"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
        {"albedo": (0, 0, 0), "emission": (8.0,) * 3, "kind": DIFFUSE},
        {"albedo": (0.5, 0.5, 0.6), "kind": DIFFUSE},
    ]
    spheres = [((3.0, 3.0, 3.0), 1.0, 1), ((0.0, 5.0, -52.0), 50.0, 2)]
    kw = {}
    if extra_mats:
        mats += [
            {"albedo": (0.9, 0.8, 0.7), "kind": METAL, "roughness": 0.3},
            {"albedo": (1.0, 1.0, 1.0), "kind": DIELECTRIC, "ior": 1.5},
        ]
        spheres += [((-2.5, 4.0, 0.5), 0.8, 3), ((2.5, 4.0, -0.5), 0.8, 4)]
        kw["env"] = ((0.2, 0.3, 0.5), (0.8, 0.9, 1.0))
    scene = build_pt_scene(spheres=spheres, triangles=tris,
                           tri_mats=tri_mats, materials=mats, **kw)
    return scene, tris, tri_mats


@pytest.mark.parametrize("rebin", ["oct", "morton", "oct,morton"])
def test_rebin_bit_identical_to_mega(rebin):
    from raytracing_engine_tpu.accel.clusters import build_clusters

    scene, tris, tri_mats = _mesh_scene()
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=32, height=16, max_bounces=2, rng="pcg")
    pos = jnp.zeros(3)
    want, n_want = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs)
    got, n_got = render_pt_rebin(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                 rebin=rebin)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(n_want) == float(n_got)


@pytest.mark.slow
def test_rebin_full_material_surface():
    """Metal + dielectric + gradient env + RR through the staged launches:
    exercises the optional state planes and static feature gates."""
    from raytracing_engine_tpu.accel.clusters import build_clusters

    scene, tris, tri_mats = _mesh_scene(extra_mats=True)
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=32, height=16, max_bounces=3, rng="pcg",
                   rr_start=2)
    pos = jnp.zeros(3)
    want, n_want = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs)
    got, n_got = render_pt_rebin(cfg, scene, pos, QUAT, 2, KEY, bvh=cs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(n_want) == float(n_got)


def test_rebin_requires_clusterset():
    scene, _, _ = _mesh_scene()
    cfg = PTConfig(width=16, height=16, rng="pcg")
    with pytest.raises(TypeError):
        render_pt_rebin(cfg, scene, jnp.zeros(3), QUAT, 1, KEY, bvh=None)


def test_rebin_instanced_matches_mega():
    """Two-level (KernelInstances) scenes through the rebin renderer: the
    per-bounce launches build the same in-kernel instance sweep as the
    megakernel — bit-identical result (config-5 PT's occupancy collapse is
    the same disease the regroup cures)."""
    from raytracing_engine_tpu.accel import build_bvh, icosphere
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import (
        make_instanced_clusters,
        make_instances,
    )

    mesh = icosphere(subdivisions=2, radius=1.2)
    cs = build_clusters(mesh, tri_mats=np.zeros(mesh.shape[0], np.int32))
    bvh = build_bvh(mesh)
    rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  np.float32)
    inst = make_instances(
        bvh,
        [(np.eye(3, dtype=np.float32), np.array([-1.5, 6.0, 0.0]), 1.0),
         (rz, np.array([1.8, 7.0, 0.6]), 0.75)],
        mats=np.array([0, 2], np.int32))
    scene = build_pt_scene(
        spheres=[((3.0, 5.0, 4.0), 1.0, 1), ((0.0, 6.0, -52.0), 50.0, 2)],
        materials=[{"albedo": (0.7, 0.6, 0.5), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (8.0,) * 3,
                    "kind": DIFFUSE},
                   {"albedo": (0.5, 0.5, 0.65), "kind": DIFFUSE}])
    ic = make_instanced_clusters(inst, cs, scene=scene)
    cfg = PTConfig(width=32, height=16, max_bounces=2, rng="pcg")
    pos = jnp.array([0.0, -2.0, 0.3])
    want, n_want = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=ic,
                                  tile=(8, 128))
    got, n_got = render_pt_rebin(cfg, scene, pos, QUAT, 2, KEY, bvh=ic,
                                 tile=(8, 128))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(n_want) == float(n_got)


def test_rebin_band_matches_full_rows():
    """row0/band_h band render == the same rows of the full render,
    bit-exact (global pixel keys carry through the per-band regroup) —
    the invariant the sharded rebin path rests on."""
    from raytracing_engine_tpu.accel.clusters import build_clusters

    scene, tris, tri_mats = _mesh_scene()
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=32, height=16, max_bounces=2, rng="pcg")
    pos = jnp.zeros(3)
    full, n_full = render_pt_rebin(cfg, scene, pos, QUAT, 2, KEY, bvh=cs)
    band0, n0 = render_pt_rebin(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                row0=0, band_h=8)
    band1, n1 = render_pt_rebin(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                row0=8, band_h=8)
    np.testing.assert_array_equal(np.asarray(band0), np.asarray(full)[:8])
    np.testing.assert_array_equal(np.asarray(band1), np.asarray(full)[8:])
    assert abs(float(n0) + float(n1) - float(n_full)) < 1e-3


def test_rebin_mesh_light_matches_mega():
    """Per-pass mesh lights through the rebin launches: the (1, 16) SMEM
    row per launch draws the same global-pass-keyed stream as the
    megakernel's (spp, 16) table — bit-identical images. (Closes the one
    scene class the flagship engine used to refuse.)"""
    from raytracing_engine_tpu.accel import icosphere
    from raytracing_engine_tpu.accel.clusters import build_clusters

    lamp = icosphere(subdivisions=2, radius=1.0, center=(0.0, 6.0, 2.5))
    floor = np.array(
        [[[-8, -2, -1.5], [8, -2, -1.5], [8, 14, -1.5]],
         [[-8, -2, -1.5], [8, 14, -1.5], [-8, 14, -1.5]]], np.float32)
    tris = np.concatenate([floor, lamp], axis=0)
    mats = np.array([0] * 2 + [1] * lamp.shape[0], np.int32)
    scene = build_pt_scene(
        spheres=[((1.2, 6.0, -0.6), 0.9, 2)],
        triangles=tris, tri_mats=mats,
        materials=[
            {"albedo": (0.65, 0.6, 0.55), "kind": DIFFUSE},
            {"albedo": (0, 0, 0), "emission": (6.0,) * 3, "kind": DIFFUSE},
            {"albedo": (0.4, 0.45, 0.7), "kind": DIFFUSE},
        ],
        mesh_lights=True,
    )
    cs = build_clusters(tris, tri_mats=mats)
    cfg = PTConfig(width=32, height=16, max_bounces=2, rng="pcg")
    pos = jnp.array([0.0, -1.0, 0.5])
    want, n_want = render_pt_mega(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                  tile=(8, 128))
    got, n_got = render_pt_rebin(cfg, scene, pos, QUAT, 2, KEY, bvh=cs,
                                 tile=(8, 128))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(n_want) == float(n_got)
