"""Mesh lights: loud slot-limit error + area-CDF per-pass sampling.

Round-2 verdict item: an emissive triangle at slot >= TRI_UNROLL_MAX used
to vanish silently from NEE. Now build_pt_scene refuses it loudly, and
mesh_lights=True lifts the limit entirely: one area-weighted emissive
triangle is selected per GLOBAL pass (counter-hashed, so chunking/sharding
invariant), with per-lane barycentric jitter and the marginal pdf
1/(total_area * light_count) on both MIS sides — unbiased, verified here
against the gather-based reference integrator statistically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.accel import icosphere
from raytracing_engine_tpu.pathtracer import PTConfig
from raytracing_engine_tpu.pathtracer.scene import (
    DIFFUSE,
    TRI_UNROLL_MAX,
    build_pt_scene,
)
from raytracing_engine_tpu.pathtracer.wavefront import render_pt_fast


def _mesh_scene(subdiv=2, **kwargs):
    """Emissive icosphere mesh above a diffuse floor + diffuse ball."""
    lamp = icosphere(subdivisions=subdiv, radius=1.0, center=(0.0, 6.0, 2.5))
    floor = np.array(
        [[[-8, -2, -1.5], [8, -2, -1.5], [8, 14, -1.5]],
         [[-8, -2, -1.5], [8, 14, -1.5], [-8, 14, -1.5]]], np.float32)
    tris = np.concatenate([floor, lamp], axis=0)
    mats = np.array([0] * 2 + [1] * lamp.shape[0], np.int32)
    return build_pt_scene(
        spheres=[((1.2, 6.0, -0.6), 0.9, 2)],
        triangles=tris,
        tri_mats=mats,
        materials=[
            {"albedo": (0.65, 0.6, 0.55), "kind": DIFFUSE},
            {"albedo": (0, 0, 0), "emission": (6.0, 6.0, 6.0),
             "kind": DIFFUSE},
            {"albedo": (0.4, 0.45, 0.7), "kind": DIFFUSE},
        ],
        **kwargs,
    ), tris.shape[0]


def test_emissive_beyond_unroll_raises_loudly():
    with pytest.raises(ValueError, match="TRI_UNROLL_MAX"):
        _mesh_scene(subdiv=2)


def test_escape_hatches():
    scene, _ = _mesh_scene(subdiv=2, mesh_lights=True)
    assert scene.has_mesh_light
    assert int(scene.light_kind[int(scene.light_count) - 1]) == 2
    # total area slot == sum of emissive triangle areas
    lamp = icosphere(subdivisions=2, radius=1.0, center=(0.0, 6.0, 2.5))
    areas = 0.5 * np.linalg.norm(
        np.cross(lamp[:, 1] - lamp[:, 0], lamp[:, 2] - lamp[:, 0]), axis=1)
    np.testing.assert_allclose(float(scene.mesh_light_area), areas.sum(),
                               rtol=1e-5)
    ref, _ = _mesh_scene(subdiv=2, allow_many_tri_lights=True)
    assert not ref.has_mesh_light
    assert int(ref.light_count) > TRI_UNROLL_MAX


def test_reference_integrator_refuses_mesh_light_scene():
    from raytracing_engine_tpu.pathtracer.integrator import render_pt

    scene, _ = _mesh_scene(subdiv=2, mesh_lights=True)
    cfg = PTConfig(width=8, height=8, max_bounces=1, rng="threefry")
    with pytest.raises(ValueError, match="mesh_lights"):
        render_pt(cfg, scene, jnp.zeros(3), jnp.array([0.0, 0, 0, 1]), 1,
                  jax.random.PRNGKey(0))


def test_mesh_light_chunk_invariance():
    """Global-pass-keyed selection: chunked == unchunked, bit for bit."""
    scene, _ = _mesh_scene(subdiv=2, mesh_lights=True)
    cfg = PTConfig(width=16, height=16, max_bounces=2, rng="pcg")
    pos = jnp.array([0.0, -1.0, 0.5])
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(3)

    full, _ = render_pt_fast(cfg, scene, pos, quat, 4, key)
    a, _ = render_pt_fast(cfg, scene, pos, quat, 2, key, spp_offset=0)
    b, _ = render_pt_fast(cfg, scene, pos, quat, 2, key, spp_offset=2)
    np.testing.assert_array_equal(np.asarray(full),
                                  np.asarray((a + b) / 2.0))


@pytest.mark.slow
def test_megakernel_mesh_light_matches_xla():
    """The megakernel's SMEM per-pass row table draws the same stream as
    the XLA path (same counter hash, same rows), so mesh-light renders
    agree across execution modes."""
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega

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
    cfg = PTConfig(width=16, height=16, max_bounces=2, rng="pcg")
    pos = jnp.array([0.0, -1.0, 0.5])
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(7)

    img_x, _ = render_pt_fast(cfg, scene, pos, quat, 2, key, bvh=cs)
    img_m, _ = render_pt_mega(cfg, scene, pos, quat, 2, key, bvh=cs,
                              interpret=True, tile=(8, 128))
    np.testing.assert_allclose(np.asarray(img_m), np.asarray(img_x),
                               rtol=2e-5, atol=2e-6)


def test_mesh_light_matches_reference_integrator():
    """1k+-tri emissive mesh: mesh-light estimator vs the gather-based
    reference integrator (different RNG streams — statistical tolerance).
    VERDICT round-2 item 3."""
    scene_m, ntris = _mesh_scene(subdiv=3, mesh_lights=True)
    scene_r, _ = _mesh_scene(subdiv=3, allow_many_tri_lights=True)
    assert ntris > 1000

    from raytracing_engine_tpu.pathtracer.integrator import render_pt

    pos = jnp.array([0.0, -1.0, 0.5])
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    cfg_m = PTConfig(width=24, height=24, max_bounces=2, rng="pcg")
    cfg_r = PTConfig(width=24, height=24, max_bounces=2, rng="threefry")
    spp = 192
    img_m, _ = render_pt_fast(cfg_m, scene_m, pos, quat, spp,
                              jax.random.PRNGKey(5))
    img_r, _ = render_pt(cfg_r, scene_r, pos, quat, spp,
                         jax.random.PRNGKey(9))
    img_m = np.asarray(img_m)
    img_r = np.asarray(img_r)

    # two independent unbiased estimators: compare 6x6 block means
    bm = img_m.reshape(4, 6, 4, 6, 3).mean(axis=(1, 3))
    br = img_r.reshape(4, 6, 4, 6, 3).mean(axis=(1, 3))
    scale = max(float(br.mean()), 1e-6)
    assert float(np.abs(bm - br).max()) / scale < 0.25, (
        f"block means diverge: {np.abs(bm-br).max()/scale:.3f}")
    assert abs(float(img_m.mean() - img_r.mean())) / scale < 0.05
