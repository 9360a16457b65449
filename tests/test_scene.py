"""Scene pytree construction + the exact reference default scene
(src/main.rs:524-601)."""

import numpy as np
import jax
import pytest

from raytracing_engine_tpu.config import MAX_LIGHTS, MAX_OBJECTS
from raytracing_engine_tpu.scene import default_scene, make_scene


def test_default_scene_values():
    s = default_scene()
    assert int(s.obj_count) == 4
    assert int(s.mat_count) == 4
    assert int(s.light_count) == 2
    np.testing.assert_array_equal(
        np.asarray(s.obj_pos[:4]),
        [[5, 5, -1], [5, 4, 10], [-3, 3, -3], [4, -1, 0]],
    )
    np.testing.assert_array_equal(np.asarray(s.obj_radius[:4]), [3, 6, 1, 2])
    np.testing.assert_allclose(np.asarray(s.mat_shine[:4]), [1, 10, 1, 1])
    np.testing.assert_allclose(np.asarray(s.mat_ambient[:4]), [0.05] * 4)
    np.testing.assert_allclose(
        np.asarray(s.light_color[:2]), [[0.1, 0.5, 0.6], [1.2, 0.2, 0.3]]
    )


def test_padded_to_capacity():
    s = default_scene()
    assert s.obj_pos.shape == (MAX_OBJECTS, 3)
    assert s.light_pos.shape == (MAX_LIGHTS, 3)


def test_scene_is_pytree():
    s = default_scene()
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 12  # parity Scene (path-tracer PTScene differs)
    s2 = jax.tree_util.tree_map(lambda x: x, s)
    np.testing.assert_array_equal(np.asarray(s2.obj_pos), np.asarray(s.obj_pos))


def test_capacity_overflow_raises():
    objs = [((0.0, 0.0, 0.0), 1.0)] * (MAX_OBJECTS + 1)
    with pytest.raises(ValueError):
        make_scene(objs, [], [])
