"""JSON scene files (pathtracer/sceneio.py): schema, loud errors, CLI."""

import json
import os

import numpy as np
import pytest

from raytracing_engine_tpu.pathtracer.sceneio import load_scene_json


def _write(tmp_path, spec, name="scene.json"):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump(spec, f)
    return p


BASIC = {
    "materials": [
        {"albedo": [0.7, 0.6, 0.4]},
        {"albedo": [0, 0, 0], "emission": [10, 10, 10]},
        {"albedo": [0.9, 0.9, 0.9], "kind": "mirror"},
    ],
    "spheres": [
        {"center": [6, 4, 6], "radius": 1.5, "mat": 1},
        {"center": [0, 8, -103], "radius": 100.0, "mat": 0},
    ],
    "meshes": [
        {"icosphere": {"subdivisions": 1, "radius": 1.2}, "mat": 2,
         "translate": [0, 5, 0]},
        {"knot": {"segments": 40, "sides": 8}, "mat": 0, "scale": 0.5,
         "translate": [0, 8, 0]},
    ],
    "camera": {"position": [0, -1, 0], "quat": [0, 0, 0, 1]},
}


def test_load_basic_scene(tmp_path):
    b = load_scene_json(_write(tmp_path, BASIC))
    scene, tris, tri_mats = b.scene, b.tris, b.tri_mats
    pos, quat = b.cam_pos, b.cam_quat
    assert int(scene.sph_count) == 2
    assert int(scene.light_count) == 1  # the emissive sphere
    assert tris.shape[0] == 80 + 40 * 8 * 2  # icosphere(1) + knot tris
    assert tris.dtype == np.float32
    # per-mesh materials: first 80 tris mirror (2), rest diffuse (0)
    assert (tri_mats[:80] == 2).all() and (tri_mats[80:] == 0).all()
    # translate applied: icosphere centroid near (0, 5, 0)
    c = tris[:80].mean(axis=(0, 1))
    np.testing.assert_allclose(c, [0, 5, 0], atol=0.1)
    np.testing.assert_array_equal(pos, np.float32([0, -1, 0]))
    np.testing.assert_array_equal(quat, np.float32([0, 0, 0, 1]))


def test_json_scene_matches_python_built(tmp_path):
    """The JSON path must produce the same PTScene arrays as the same
    scene assembled in Python via build_pt_scene."""
    import jax.tree_util as jtu

    from raytracing_engine_tpu.accel import icosphere
    from raytracing_engine_tpu.pathtracer.scene import (
        DIFFUSE, MIRROR, build_pt_scene)

    got, *_ = load_scene_json(_write(tmp_path, {
        "materials": [{"albedo": [0.6, 0.5, 0.4]},
                      {"albedo": [0, 0, 0], "emission": [8, 8, 8]}],
        "spheres": [{"center": [3, 3, 3], "radius": 1, "mat": 1}],
        "meshes": [{"icosphere": {"subdivisions": 1, "radius": 1.2,
                                  "center": [0, 5, 0]}, "mat": 0}],
    }))
    tris = icosphere(subdivisions=1, radius=1.2, center=(0, 5, 0))
    want = build_pt_scene(
        spheres=[((3.0, 3.0, 3.0), 1.0, 1)],
        triangles=tris, tri_mats=np.zeros(len(tris), np.int32),
        materials=[{"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (8, 8, 8),
                    "kind": DIFFUSE}],
    )
    for a, b in zip(jtu.tree_leaves(got), jtu.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_obj_path_relative_to_json(tmp_path):
    from raytracing_engine_tpu.accel import icosphere, save_obj

    sub = tmp_path / "assets"
    os.makedirs(str(sub))
    save_obj(str(sub / "ball.obj"), icosphere(subdivisions=1))
    p = _write(tmp_path / "assets", {
        "materials": [{"albedo": [0.5, 0.5, 0.5]}],
        "meshes": [{"obj": "ball.obj", "mat": 0}],
    })
    assert load_scene_json(p).tris.shape[0] == 80


@pytest.mark.parametrize("spec,msg", [
    ({"material": []}, "unknown scene key"),
    ({"materials": [{"albedo": [1, 1, 1], "colour": 1}], }, "materials[0]"),
    ({"materials": [{"albedo": [1, 1, 1], "kind": "glass"}]}, "kind"),
    ({"materials": [], "spheres": [{"center": [0, 0, 0], "radius": 1,
                                    "mat": 0}]}, "out of range"),
    ({"materials": [{"albedo": [1, 1, 1]}],
      "meshes": [{"mat": 0}]}, "exactly one"),
    ({"materials": [{"albedo": [1, 1, 1]}],
      "camera": {"pos": [0, 0, 0]}}, "camera"),
])
def test_loud_schema_errors(tmp_path, spec, msg):
    with pytest.raises(ValueError, match=None) as e:
        load_scene_json(_write(tmp_path, spec))
    assert msg.split("[")[0] in str(e.value)


def test_cli_pt_json_scene(tmp_path):
    """End-to-end: cli pt --scene file.json renders (emissive sphere
    lights a diffuse mesh; nonzero image)."""
    from raytracing_engine_tpu.cli import main
    from raytracing_engine_tpu.utils.image import read_png

    p = _write(tmp_path, {
        "materials": [{"albedo": [0.6, 0.5, 0.4]},
                      {"albedo": [0, 0, 0], "emission": [20, 20, 20]}],
        "spheres": [{"center": [0, 5, 3], "radius": 1.5, "mat": 1}],
        "meshes": [{"icosphere": {"subdivisions": 1, "radius": 1.2,
                                  "center": [0, 5, 0]}, "mat": 0}],
        "camera": {"position": [0, -2, 0]},
    })
    out = str(tmp_path / "img.png")
    main(["pt", "--scene", p, "--size", "32x32", "--spp", "4",
          "--bounces", "2", "--out", out])
    img = read_png(out)
    assert img.shape == (32, 32, 3)
    assert img.sum() > 0


def test_instances_block(tmp_path):
    """'instances' loads the two-level spec: mesh + grid/explicit
    transforms, refuses combination with loose meshes, and the built
    InstancedClusters renders through the fast path."""
    import jax
    import jax.numpy as jnp

    spec = {
        "materials": [{"albedo": [0.6, 0.5, 0.4]},
                      {"albedo": [0, 0, 0], "emission": [10, 10, 10]}],
        "spheres": [{"center": [3, 4, 4], "radius": 0.8, "mat": 1}],
        "instances": {
            "mesh": {"icosphere": {"subdivisions": 1, "radius": 0.8}},
            "mat": 0,
            "grid": {"nx": 2, "ny": 2, "spacing": 2.0, "base": [0, 7, 0]},
            "transforms": [{"translate": [0, 5, -1], "rotate_z": 0.4,
                            "scale": 1.5}],
        },
    }
    b = load_scene_json(_write(tmp_path, spec))
    scene, tris, inst = b.scene, b.tris, b.instanced
    pos, quat = b.cam_pos, b.cam_quat
    assert tris is None and inst is not None
    assert len(inst["transforms"]) == 5  # 2x2 grid + 1 explicit
    assert inst["mesh"].shape[1:] == (3, 3)

    import numpy as np

    from raytracing_engine_tpu.accel import build_bvh
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import (
        make_instanced_clusters,
        make_instances,
    )
    from raytracing_engine_tpu.pathtracer import PTConfig, render_pt_fast

    bvh_i = build_bvh(inst["mesh"])
    cs = build_clusters(inst["mesh"], bvh=bvh_i,
                        tri_mats=np.full(len(inst["mesh"]), inst["mat"],
                                         np.int32))
    im = make_instances(bvh_i, inst["transforms"],
                        mats=np.full(5, inst["mat"], np.int32))
    ic = make_instanced_clusters(im, cs, scene=scene)
    cfg = PTConfig(width=24, height=16, max_bounces=2, rng="pcg")
    img, _ = render_pt_fast(cfg, scene, jnp.asarray(pos), jnp.asarray(quat),
                            2, jax.random.PRNGKey(0), bvh=ic)
    assert bool(jnp.isfinite(img).all()) and float(jnp.max(img)) > 0.0

    # loose meshes + instances is a loud error (loose mesh would vanish)
    bad = dict(spec)
    bad["meshes"] = [{"icosphere": {"subdivisions": 1}, "mat": 0}]
    import pytest

    with pytest.raises(ValueError, match="instances"):
        load_scene_json(_write(tmp_path, bad))
