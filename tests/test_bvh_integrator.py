"""BVH-accelerated path tracing must match brute-force intersection, and
progressive checkpoint/resume must be chunking-invariant."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_engine_tpu.accel import build_bvh, icosphere
from raytracing_engine_tpu.pathtracer import PTConfig, render_pt
from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

KEY = jax.random.PRNGKey(11)


def _mesh_scene():
    tris = icosphere(subdivisions=2, radius=1.2, center=(0.0, 5.0, 0.0))
    mats = [
        {"albedo": (0.7, 0.5, 0.3), "kind": DIFFUSE},
        {"albedo": (0.0, 0.0, 0.0), "emission": (6.0, 6.0, 6.0), "kind": DIFFUSE},
        {"albedo": (0.6, 0.6, 0.7), "kind": DIFFUSE},
    ]
    spheres = [
        ((3.0, 3.0, 3.0), 1.0, 1),          # emissive
        ((0.0, 5.0, -101.2), 100.0, 2),     # ground
    ]
    scene = build_pt_scene(
        spheres=spheres,
        triangles=tris,
        tri_mats=np.zeros((tris.shape[0],), np.int32),
        materials=mats,
    )
    return scene, build_bvh(tris)


def test_bvh_render_matches_bruteforce():
    scene, bvh = _mesh_scene()
    cfg = PTConfig(width=24, height=16, max_bounces=3)
    pos = jnp.zeros(3)
    quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    img_brute, _ = render_pt(cfg, scene, pos, quat, 8, KEY)
    img_bvh, _ = render_pt(cfg, scene, pos, quat, 8, KEY, bvh=bvh)
    np.testing.assert_allclose(
        np.asarray(img_bvh), np.asarray(img_brute), rtol=1e-3, atol=1e-4
    )


def test_progressive_resume_invariant(tmp_path):
    """spp accumulated as 4+4 chunks == accumulated as 2+3+3, and a reload
    from the checkpoint continues identically."""
    from raytracing_engine_tpu.runtime.checkpoint import (
        ProgressiveState,
        load_checkpoint,
        progressive_render,
        save_checkpoint,
    )

    scene, bvh = _mesh_scene()
    cfg = PTConfig(width=16, height=16, max_bounces=2)

    def fresh():
        return ProgressiveState(
            accum=jnp.zeros((16, 16, 3), jnp.float32),
            spp_done=0,
            key=KEY,
            cam_pos=jnp.zeros(3),
            cam_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        )

    outs_a = list(progressive_render(cfg, scene, fresh(), 8, passes_per_chunk=4))
    final_a = outs_a[-1]

    ckpt = str(tmp_path / "state.npz")
    gen = progressive_render(cfg, scene, fresh(), 8, passes_per_chunk=2,
                             checkpoint_path=ckpt)
    next(gen)  # 2 spp done, checkpointed
    loaded = load_checkpoint(ckpt)
    assert loaded.spp_done == 2
    outs_b = list(progressive_render(cfg, scene, loaded, 8, passes_per_chunk=3))
    final_b = outs_b[-1]

    assert final_a.spp_done == final_b.spp_done == 8
    np.testing.assert_allclose(
        np.asarray(final_a.accum), np.asarray(final_b.accum), rtol=2e-5, atol=1e-5
    )


def test_checkpoint_roundtrip(tmp_path):
    from raytracing_engine_tpu.runtime.checkpoint import (
        ProgressiveState,
        load_checkpoint,
        save_checkpoint,
    )

    st = ProgressiveState(
        accum=jnp.ones((4, 4, 3)) * 2.5,
        spp_done=7,
        key=KEY,
        cam_pos=jnp.array([1.0, 2.0, 3.0]),
        cam_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
    )
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, st)
    lo = load_checkpoint(p)
    assert lo.spp_done == 7
    np.testing.assert_array_equal(np.asarray(lo.accum), np.asarray(st.accum))
    np.testing.assert_allclose(lo.image, np.asarray(st.accum) / 7)
