"""Post-processing: tonemap curves and HDR bloom."""

import numpy as np

from raytracing_engine_tpu.utils import bloom, tonemap


def test_tonemap_curves():
    x = np.array([[[0.0, 0.5, 1.0]], [[2.0, 10.0, 100.0]]], np.float32)
    none = tonemap(x, "none")
    np.testing.assert_array_equal(none, x)
    rh = tonemap(x, "reinhard")
    np.testing.assert_allclose(rh, x / (1 + x), rtol=1e-6)
    assert rh.max() < 1.0
    aces = tonemap(x, "aces")
    assert 0.0 <= aces.min() and aces.max() <= 1.0
    # monotone in luminance
    assert (np.diff(aces[..., :].ravel()[np.argsort(x.ravel())]) >= -1e-6).all()
    # exposure scales before the curve; gamma brightens mids
    assert tonemap(x, "reinhard", exposure=2.0)[0, 0, 1] > rh[0, 0, 1]
    assert tonemap(x, "none", gamma=2.2)[0, 0, 1] > 0.5


def test_bloom_spreads_bright_energy():
    img = np.zeros((33, 33, 3), np.float32)
    img[16, 16] = 20.0  # a firefly-bright pixel on black
    out = bloom(img, threshold=1.0, radius=8, strength=0.5)
    # neighbors gain energy, far corners stay black
    assert out[16, 20, 0] > 0.005
    assert out[0, 0, 0] == 0.0
    # below-threshold content is untouched
    dim = np.full((9, 9, 3), 0.5, np.float32)
    np.testing.assert_array_equal(bloom(dim), dim)
    # added energy equals strength * above-threshold energy (Gaussian
    # blur conserves sums up to edge clamping, none here)
    assert abs((out - img).sum() - 0.5 * (img - 1.0).clip(0).sum()) < 1e-2
