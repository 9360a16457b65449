"""Quaternion math vs first principles (reference utilities.glsl:26-29,
src/main.rs:402-414)."""

import numpy as np
import jax.numpy as jnp

from raytracing_engine_tpu.ops.quaternion import (
    quat_from_rotation_x,
    quat_from_rotation_z,
    quat_identity,
    quat_mul,
    quat_rotate,
)


def test_identity_rotation():
    v = jnp.array([1.2, -3.4, 0.7])
    out = quat_rotate(quat_identity(), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-6)


def test_rotation_z_quarter_turn():
    q = quat_from_rotation_z(jnp.float32(np.pi / 2))
    out = quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-6)


def test_rotation_x_quarter_turn():
    q = quat_from_rotation_x(jnp.float32(np.pi / 2))
    out = quat_rotate(q, jnp.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0, 1.0], atol=1e-6)


def test_mul_is_composition():
    qa = quat_from_rotation_z(jnp.float32(0.7))
    qb = quat_from_rotation_x(jnp.float32(-0.4))
    v = jnp.array([0.3, 1.0, -0.5])
    seq = quat_rotate(qa, quat_rotate(qb, v))
    combined = quat_rotate(quat_mul(qa, qb), v)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(combined), atol=1e-6)


def test_camera_quat_forward_vector():
    """from_rotation_z(-yaw)*from_rotation_x(pitch) maps +Y (forward) to
    (sin(yaw)cos(pitch), cos(yaw)cos(pitch), sin(pitch))."""
    from raytracing_engine_tpu.camera import Camera

    yaw, pitch = 0.3, 0.2
    cam = Camera(
        position=jnp.zeros(3), rotation=jnp.array([yaw, pitch], jnp.float32)
    )
    fwd = quat_rotate(cam.quat(), jnp.array([0.0, 1.0, 0.0]))
    expected = [
        np.sin(yaw) * np.cos(pitch),
        np.cos(yaw) * np.cos(pitch),
        np.sin(pitch),
    ]
    np.testing.assert_allclose(np.asarray(fwd), expected, atol=1e-6)


def test_rotation_preserves_length():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    q = quat_mul(quat_from_rotation_z(jnp.float32(1.1)),
                 quat_from_rotation_x(jnp.float32(-0.6)))
    out = quat_rotate(q, v)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(v), axis=-1),
        rtol=1e-5,
    )


def test_orbit_path_faces_target():
    """orbit_path yaw/pitch must aim the camera forward axis at the target."""
    from raytracing_engine_tpu.camera import Camera, orbit_path

    target = np.array([2.0, 3.0, 1.0])
    positions, rotations = orbit_path(8, radius=15.0, height=2.0, target=tuple(target))
    for i in range(8):
        cam = Camera(position=positions[i], rotation=rotations[i])
        fwd = np.asarray(quat_rotate(cam.quat(), jnp.array([0.0, 1.0, 0.0])))
        to_target = target - np.asarray(positions[i])
        to_target /= np.linalg.norm(to_target)
        assert np.dot(fwd, to_target) > 0.999, (i, fwd, to_target)
