"""Pyramid geometry vs the reference's sizing math (src/main.rs:203-234,
:301-307, :639)."""

import math

import pytest

from raytracing_engine_tpu.config import RenderConfig


def test_level_count_512():
    cfg = RenderConfig(width=512, height=512)
    assert cfg.level_count == 7  # log2(512/8)+1


def test_level_dims_512_powers_of_two():
    cfg = RenderConfig(width=512, height=512)
    assert cfg.level_dims == tuple((8 << i, 8 << i) for i in range(7))


def test_level_dims_1080p():
    cfg = RenderConfig(width=1920, height=1088)
    w, h = cfg.level_dims[-1]
    assert w >= 1920 and h >= 1088
    assert all(lw % 8 == 0 and lh % 8 == 0 for lw, lh in cfg.level_dims)
    # coarsest level is the ~8x8(×aspect) seed image
    assert cfg.level_dims[0][0] == 8


def test_finest_level_matches_resolution_when_multiple_of_8():
    cfg = RenderConfig(width=1920, height=1088)
    assert cfg.level_dims[-1] == (1920, 1088)


def test_image_size_finest_is_reciprocal_of_window():
    cfg = RenderConfig(width=512, height=256)
    sx, sy = cfg.level_image_size(cfg.level_count - 1)
    assert sx == 1.0 / 512 and sy == 1.0 / 256


def test_threshold_formula():
    cfg = RenderConfig(width=512, height=512)
    for i in range(cfg.level_count):
        expected = math.sqrt(2.0) * 8.0 * cfg.level_image_size(i)[0]
        assert cfg.level_threshold(i) == pytest.approx(expected)


def test_ratio_fov_aspect():
    cfg = RenderConfig(width=512, height=256, fov=1.0)
    assert cfg.ratio == (1.0, 0.5)  # [FOV, FOV*h/w] — src/main.rs:610


def test_seed_indexing_in_bounds():
    """Level i pixel // 2 always lands inside level i-1 (compute.glsl:81)."""
    for w, h in [(512, 512), (1920, 1088), (800, 600), (64, 64)]:
        if w % 8 or h % 8:
            continue
        cfg = RenderConfig(width=w, height=h)
        for i in range(1, cfg.level_count):
            lw, lh = cfg.level_dims[i]
            pw, ph = cfg.level_dims[i - 1]
            assert (lw - 1) // 2 < pw and (lh - 1) // 2 < ph


def test_rejects_bad_resolutions():
    with pytest.raises(ValueError):
        RenderConfig(width=100, height=64)
    with pytest.raises(ValueError):
        RenderConfig(width=64, height=128)
