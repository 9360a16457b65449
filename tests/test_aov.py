"""First-hit AOV buffers (albedo/normal/depth): analytic anchors."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.pathtracer import PTConfig, render_aovs
from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

KEY = jax.random.PRNGKey(9)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])
POS = jnp.zeros(3)


def sphere_scene():
    return build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 1.0, 0)],
        materials=[{"albedo": (0.2, 0.5, 0.8), "kind": DIFFUSE}])


def test_aov_analytic_sphere():
    cfg = PTConfig(width=64, height=48)
    aovs = render_aovs(cfg, sphere_scene(), POS, QUAT, 8, KEY)
    alb = np.asarray(aovs["albedo"])
    nrm = np.asarray(aovs["normal"])
    dep = np.asarray(aovs["depth"])
    h, w = dep.shape

    # the 2x2 block around the optical axis (pixel centers sit half a
    # pixel off-axis; the symmetric average cancels the tilt):
    # ray ~(0,1,0) hits the front of the sphere at t ~ 5
    cy, cx = h // 2, w // 2
    assert abs(dep[cy - 1: cy + 1, cx - 1: cx + 1].mean() - 5.0) < 0.02
    np.testing.assert_allclose(alb[cy, cx], (0.2, 0.5, 0.8), atol=1e-5)
    # normal points back at the camera (two-sided orientation)
    nc = nrm[cy - 1: cy + 1, cx - 1: cx + 1].mean((0, 1))
    np.testing.assert_allclose(nc / np.linalg.norm(nc), (0.0, -1.0, 0.0),
                               atol=0.05)
    assert abs(np.linalg.norm(nrm[cy, cx]) - 1.0) < 1e-4

    # background: zero everywhere (depth-0 sky sentinel)
    assert dep[0, 0] == 0.0
    np.testing.assert_array_equal(alb[0, 0], 0.0)
    np.testing.assert_array_equal(nrm[0, 0], 0.0)


def test_aov_deterministic_and_mesh_bvh():
    from raytracing_engine_tpu.accel import build_bvh, icosphere

    mesh = icosphere(subdivisions=2, radius=1.0, center=(0.0, 6.0, 0.0))
    scene = build_pt_scene(
        triangles=mesh, tri_mats=np.zeros(len(mesh), np.int32),
        materials=[{"albedo": (0.9, 0.1, 0.1), "kind": DIFFUSE}])
    bvh = build_bvh(mesh)
    cfg = PTConfig(width=32, height=24)
    a = render_aovs(cfg, scene, POS, QUAT, 4, KEY, bvh=bvh)
    b = render_aovs(cfg, scene, POS, QUAT, 4, KEY, bvh=bvh)
    for k in ("albedo", "normal", "depth"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # mesh approximates the unit sphere: center depth within facet error
    dep = np.asarray(a["depth"])
    assert abs(dep[12, 16] - 5.0) < 0.1


def test_ao_plane():
    """Ray-traced AO: an open floor reads ~1, the crease where a sphere
    sits on the floor darkens, and sky pixels stay fully open."""
    mats = [{"albedo": (0.5, 0.5, 0.5), "kind": DIFFUSE}]
    scene = build_pt_scene(
        spheres=[((0.0, 8.0, -101.0), 100.0, 0),   # floor (top z=-1)
                 ((0.0, 8.0, 0.0), 1.0, 0)],       # ball resting on it
        materials=mats)
    cfg = PTConfig(width=64, height=48)
    aovs = render_aovs(cfg, scene, POS, QUAT, 32, KEY, ao_radius=2.0)
    ao = np.asarray(aovs["ao"])
    dep = np.asarray(aovs["depth"])
    nrm = np.asarray(aovs["normal"])
    # open floor far from the ball: fully unoccluded
    floor = (dep > 0) & (nrm[..., 2] > 0.9)
    open_floor = floor.copy()
    open_floor[:, 16:48] = False  # exclude columns near the ball
    assert ao[open_floor].mean() > 0.97
    # floor just next to the ball silhouette: visibly darkened
    h, w = dep.shape
    crease = floor & ~open_floor
    assert crease.any()
    assert ao[crease].min() < 0.75, ao[crease].min()
    # sky reads fully open
    assert (ao[dep == 0] == 1.0).all()
    # no AO requested -> no plane
    assert "ao" not in render_aovs(cfg, scene, POS, QUAT, 2, KEY)
