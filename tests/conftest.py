"""Test harness config: run everything on CPU with 8 virtual devices.

This is the standard JAX fake-backend trick (SURVEY.md §4.4): multi-chip
tile/sample sharding is validated without a pod, and Pallas kernels run in
interpreter mode (they auto-detect a non-TPU backend). Must run before jax
is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compile cache: the interpret-mode kernel suites are
# dominated by compile time (measured: test_clusters.py 152 s cold ->
# 61 s warm). The cache key does NOT cover the host CPU's feature set for
# XLA:CPU AOT results — loading artifacts compiled on a machine with e.g.
# wider AVX-512 support SEGFAULTS on a lesser host (observed: xdist
# worker "Fatal Python error: Segmentation fault" after cpu_aot_loader
# feature-mismatch warnings) — so the directory is keyed by a hash of
# this host's cpuinfo flags. Opt out with JAX_COMPILATION_CACHE_DIR="" .
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    import hashlib

    try:
        with open("/proc/cpuinfo") as _f:
            _flags = next((ln for ln in _f if ln.startswith("flags")), "")
    except OSError:
        _flags = ""
    _tag = hashlib.sha1(_flags.encode()).hexdigest()[:12]
    # one subdir per xdist worker: concurrent cache WRITES from parallel
    # workers into one directory have segfaulted inside
    # compilation_cache.put_executable_and_time (zstd serialization) —
    # observed twice, only under -n auto; serial runs never crash
    _worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache", _tag, _worker,
    )
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# JAX_PLATFORMS is bound to jax.config at import time; if a pytest plugin
# already imported jax (before this conftest), the env var alone is too late.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg():
    from raytracing_engine_tpu.config import RenderConfig

    return RenderConfig(width=64, height=64)


@pytest.fixture(scope="session")
def scene():
    from raytracing_engine_tpu.scene import default_scene

    return default_scene()


@pytest.fixture(scope="session")
def camera_pose():
    """A slightly rotated/translated pose so no symmetry hides bugs."""
    import jax.numpy as jnp
    from raytracing_engine_tpu.camera import Camera

    cam = Camera(
        position=jnp.array([0.5, -2.0, 0.25], jnp.float32),
        rotation=jnp.array([0.15, -0.1], jnp.float32),
    )
    return np.asarray(cam.position), np.asarray(cam.quat())


_GOLDEN_NPZ = os.path.join(os.path.dirname(__file__), "golden", "golden_64.npz")


def _stored_golden(camera_pose):
    """Load the committed golden artifact if it matches the fixture pose.
    Regenerate with GOLDEN_REGEN=1 (runs the slow scalar renderer)."""
    if os.environ.get("GOLDEN_REGEN") or not os.path.exists(_GOLDEN_NPZ):
        return None
    z = np.load(_GOLDEN_NPZ)
    pos, quat = camera_pose
    if not (np.allclose(z["pos"], pos) and np.allclose(z["quat"], quat)):
        return None
    return z


@pytest.fixture(scope="session")
def golden_levels(small_cfg, scene, camera_pose):
    z = _stored_golden(camera_pose)
    if z is not None:
        n = small_cfg.level_count
        return [z[f"level_{i}"] for i in range(n)]
    from raytracing_engine_tpu.models import golden

    pos, quat = camera_pose
    return golden.render_depth_pyramid(small_cfg, scene, pos, quat)


@pytest.fixture(scope="session")
def golden_image(small_cfg, scene, camera_pose, golden_levels):
    z = _stored_golden(camera_pose)
    if z is not None:
        return z["image"]
    from raytracing_engine_tpu.models import golden

    pos, quat = camera_pose
    return golden.shade(small_cfg, scene, golden_levels[-1], pos, quat)
