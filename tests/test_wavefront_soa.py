"""SoA wavefront integrator vs the reference stacked integrator.

Both consume the identical RNG stream (same keys, shapes, slicing), so with
the same scene/camera they must produce the same image up to float
reassociation — except for the rare ray whose hit/sample decision sits ON a
float boundary that reassociation flips, sending that one path somewhere
else entirely. The tests therefore bound the FRACTION of diverging pixels
(and the mean error), not the max.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.pathtracer import PTConfig, render_pt
from raytracing_engine_tpu.pathtracer.scenes import cornell_box, furnace_scene, material_spheres
from raytracing_engine_tpu.pathtracer.wavefront import render_pt_fast

KEY = jax.random.PRNGKey(5)
POS = jnp.zeros(3)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])


@pytest.mark.parametrize("scene_fn,pos", [
    (material_spheres, POS),
    (cornell_box, jnp.array([0.0, 0.2, 0.0])),
    (furnace_scene, POS),
])
def test_soa_matches_reference(scene_fn, pos):
    cfg = PTConfig(width=32, height=24, max_bounces=3)
    scene = scene_fn()
    a, na = render_pt(cfg, scene, pos, QUAT, 4, KEY)
    b, nb = render_pt_fast(cfg, scene, pos, QUAT, 4, KEY)
    d = np.abs(np.asarray(b) - np.asarray(a)).max(-1)
    assert (d > 1e-3).mean() < 0.01, f"{(d > 1e-3).mean():.3%} pixels diverged"
    assert d.mean() < 1e-4
    # ray counts may differ by a few boundary-flipped NEE candidates
    assert abs(float(na) - float(nb)) <= max(8.0, 1e-3 * float(na))


def test_soa_matches_reference_with_bvh():
    from raytracing_engine_tpu.accel import build_bvh, icosphere
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    tris = icosphere(subdivisions=2, radius=1.2, center=(0.0, 5.0, 0.0))
    mats = [
        {"albedo": (0.7, 0.5, 0.3), "kind": DIFFUSE},
        {"albedo": (0.0, 0.0, 0.0), "emission": (6.0, 6.0, 6.0), "kind": DIFFUSE},
    ]
    scene = build_pt_scene(
        spheres=[((3.0, 3.0, 3.0), 1.0, 1)],
        triangles=tris,
        tri_mats=np.zeros((tris.shape[0],), np.int32),
        materials=mats,
    )
    bvh = build_bvh(tris)
    cfg = PTConfig(width=24, height=16, max_bounces=2)
    a, _ = render_pt(cfg, scene, POS, QUAT, 4, KEY, bvh=bvh)
    b, _ = render_pt_fast(cfg, scene, POS, QUAT, 4, KEY, bvh=bvh)
    d = np.abs(np.asarray(b) - np.asarray(a)).max(-1)
    assert (d > 1e-3).mean() < 0.01
    assert d.mean() < 1e-4


def test_soa_furnace_physics():
    cfg = PTConfig(width=48, height=32, max_bounces=3)
    img, _ = render_pt_fast(cfg, furnace_scene(albedo=0.5, le=1.0), POS, QUAT, 64, KEY)
    img = np.asarray(img)
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]])
    np.testing.assert_allclose(corners, 1.0, atol=1e-4)
    h, w, _ = img.shape
    patch = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2]
    assert abs(patch.mean() - 0.5) < 0.04
