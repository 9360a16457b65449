"""CLI frame-server smoke tests (CPU, tiny sizes)."""

import os

import numpy as np

from raytracing_engine_tpu.cli import main
from raytracing_engine_tpu.utils.image import read_png


def test_cli_render(tmp_path):
    out = str(tmp_path / "frames")
    main(["render", "--size", "64x64", "--out", out, "--engine", "jnp"])
    img = read_png(os.path.join(out, "frame_0000.png"))
    assert img.shape == (64, 64, 3)
    assert img.sum() > 0


def test_cli_orbit_resume_bit_identical(tmp_path):
    """--resume skips frames already on disk and fills the gaps with
    frames bit-identical to an uninterrupted run (orbit poses are a pure
    function of the frame index)."""
    full = str(tmp_path / "full")
    part = str(tmp_path / "part")
    args = ["orbit", "--size", "48x32", "--frames", "3", "--chunk", "2"]
    main(args + ["--out", full])
    main(args + ["--out", part])
    os.remove(os.path.join(part, "frame_0001.png"))
    before = read_png(os.path.join(part, "frame_0000.png")).copy()
    main(args + ["--out", part, "--resume"])
    for i in range(3):
        a = read_png(os.path.join(full, f"frame_{i:04d}.png"))
        b = read_png(os.path.join(part, f"frame_{i:04d}.png"))
        np.testing.assert_array_equal(a, b)
    # frame 0 was not re-rendered (mtime-free check: content unchanged)
    np.testing.assert_array_equal(
        before, read_png(os.path.join(part, "frame_0000.png")))


def test_cli_pt_with_checkpoint(tmp_path):
    out = str(tmp_path / "cornell.png")
    ck = str(tmp_path / "state.npz")
    main(["pt", "--scene", "cornell", "--size", "32x32", "--spp", "4",
          "--bounces", "2", "--checkpoint", ck, "--out", out])
    assert os.path.exists(out) and os.path.exists(ck)
    # resume adds more spp deterministically
    main(["pt", "--scene", "cornell", "--size", "32x32", "--spp", "8",
          "--bounces", "2", "--checkpoint", ck, "--out", out])
    from raytracing_engine_tpu.runtime.checkpoint import load_checkpoint

    assert load_checkpoint(ck).spp_done == 8


def test_cli_pt_obj_scene(tmp_path):
    """--scene obj --mesh file.obj: load a user mesh end-to-end."""
    import numpy as np

    from raytracing_engine_tpu.accel import icosphere, save_obj
    from raytracing_engine_tpu.cli import main
    from raytracing_engine_tpu.utils.image import read_png

    obj = str(tmp_path / "ball.obj")
    save_obj(obj, icosphere(subdivisions=1, radius=1.5, center=(0.0, 6.0, 0.0)))
    out = str(tmp_path / "obj.png")
    main(["pt", "--scene", "obj", "--mesh", obj, "--size", "64x32",
          "--spp", "2", "--bounces", "2", "--bvh", "--out", out])
    img = read_png(out)
    assert img.shape == (32, 64, 3)
    assert (img > 0).any()


def test_cli_pt_engine_rebin(tmp_path):
    """--engine rebin routes a cluster-mesh scene through the flagship
    per-bounce rebin engine (clusters are built even off-TPU so the CLI
    path is testable; interpret mode covers the kernels)."""
    import numpy as np

    from raytracing_engine_tpu.accel import icosphere, save_obj
    from raytracing_engine_tpu.cli import main
    from raytracing_engine_tpu.utils.image import read_png

    obj = str(tmp_path / "ball.obj")
    save_obj(obj, icosphere(subdivisions=1, radius=1.5,
                            center=(0.0, 6.0, 0.0)))
    out = str(tmp_path / "rebin.png")
    main(["pt", "--scene", "obj", "--mesh", obj, "--size", "64x32",
          "--spp", "1", "--bounces", "2", "--bvh",
          "--engine", "rebin", "--out", out])
    img = read_png(out)
    assert img.shape == (32, 64, 3)
    assert (img > 0).any()


def test_cli_pt_engine_rebin_needs_bvh():
    import pytest

    from raytracing_engine_tpu.cli import main

    with pytest.raises(SystemExit, match="rebin"):
        main(["pt", "--scene", "cornell", "--size", "32x32", "--spp", "1",
              "--bounces", "2", "--engine", "rebin"])
