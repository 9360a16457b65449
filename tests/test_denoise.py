"""À-trous AOV-guided denoiser: error reduction + edge preservation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_engine_tpu.pathtracer import (
    PTConfig,
    denoise,
    render_aovs,
    render_pt_fast,
)
from raytracing_engine_tpu.pathtracer.scenes import cornell_box

KEY = jax.random.PRNGKey(33)
QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])
POS = jnp.array([0.0, 0.2, 0.0])


@pytest.fixture(scope="module")
def cornell_render():
    scene = cornell_box()
    cfg = PTConfig(width=64, height=64, max_bounces=4)
    noisy, _ = render_pt_fast(cfg, scene, POS, QUAT, 4, KEY)
    ref, _ = render_pt_fast(cfg, scene, POS, QUAT, 256, jax.random.PRNGKey(99))
    aovs = render_aovs(cfg, scene, POS, QUAT, 8, KEY)
    out = denoise(noisy, aovs["albedo"], aovs["normal"], aovs["depth"])
    return (np.asarray(noisy), np.asarray(out), np.asarray(ref),
            {k: np.asarray(v) for k, v in aovs.items()})


def test_denoise_reduces_error(cornell_render):
    """Display-referred (tonemapped) MSE and the median pixel error both
    drop substantially; linear HDR MSE must at least not regress (bright
    specular pixels are the single-frame spatial filter's hard case)."""
    noisy, out, ref, _ = cornell_render

    def tm(x):
        return x / (1.0 + x)

    e_in = (tm(noisy) - tm(ref)) ** 2
    e_out = (tm(out) - tm(ref)) ** 2
    assert e_out.mean() < 0.65 * e_in.mean(), (e_in.mean(), e_out.mean())
    assert (np.median(e_out.mean(-1))
            < 0.5 * np.median(e_in.mean(-1)))
    lin_in = ((noisy - ref) ** 2).mean()
    lin_out = ((out - ref) ** 2).mean()
    assert lin_out < 1.15 * lin_in, (lin_in, lin_out)


def test_denoise_kills_fireflies():
    """A lone 1000x outlier in a flat region is clamped to the local
    level (center-excluded noise stats make the cap bind)."""
    rad = jnp.full((16, 16, 3), 0.3).at[8, 8].set(1000.0)
    alb = jnp.full((16, 16, 3), 0.6)
    nrm = jnp.zeros((16, 16, 3)).at[..., 2].set(1.0)
    dep = jnp.full((16, 16), 5.0)
    out = np.asarray(denoise(rad, alb, nrm, dep))
    assert out[8, 8, 0] < 0.5, out[8, 8, 0]
    assert abs(out[8, 9, 0] - 0.3) < 0.05


def test_denoise_preserves_albedo_edges(cornell_render):
    """The red/green wall hues must survive (albedo demodulation + normal
    edge-stops): wall pixels keep their dominant channel."""
    _, out, ref, _ = cornell_render
    h, w, _ = out.shape
    left = out[h // 2, 2]      # red wall
    right = out[h // 2, -3]    # green wall
    assert left[0] > 1.5 * left[1], left    # red stays red
    assert right[1] > 1.5 * right[0], right  # green stays green


def test_denoise_passthrough_sky(cornell_render):
    """depth==0 pixels (none in Cornell; synthesize) pass through."""
    noisy, _, _, aovs = cornell_render
    dep = aovs["depth"].copy()
    dep[:8, :8] = 0.0
    out = np.asarray(denoise(noisy, aovs["albedo"], aovs["normal"], dep))
    np.testing.assert_array_equal(out[:4, :4], noisy[:4, :4])


def test_denoise_flat_region_converges():
    """A constant image with constant guides is a fixed point."""
    rad = jnp.full((16, 16, 3), 0.3)
    alb = jnp.full((16, 16, 3), 0.6)
    nrm = jnp.zeros((16, 16, 3)).at[..., 2].set(1.0)
    dep = jnp.full((16, 16), 5.0)
    out = np.asarray(denoise(rad, alb, nrm, dep, iterations=3))
    np.testing.assert_allclose(out, 0.3, rtol=1e-5)
