"""Compiled-vs-interpret parity for every production Pallas kernel.

Small shapes keep per-kernel Mosaic compiles to a few seconds; tolerances
are tight (the interpret path runs the same jnp ops through XLA on the
same chip — only instruction scheduling differs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

QUAT = jnp.array([0.0, 0.0, 0.0, 1.0])
W, H = 256, 64


def _assert_close(a, b, atol=2e-5, rtol=1e-5, frac=0.0, label=""):
    a = np.asarray(a)
    b = np.asarray(b)
    bad = ~np.isclose(a, b, atol=atol, rtol=rtol)
    assert bad.mean() <= frac, (
        f"{label}: {bad.mean():.4%} elements diverge "
        f"(max abs {np.abs(a - b).max():.3g})"
    )


@pytest.fixture(scope="module")
def sphere_scene():
    from raytracing_engine_tpu.scene import default_scene

    return default_scene()


@pytest.fixture(scope="module")
def mesh_setup():
    from raytracing_engine_tpu.accel import build_bvh, icosphere
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.accel.instancing import grid_instances
    from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
        pack_instances,
    )

    mesh = icosphere(subdivisions=2, radius=1.2, center=(0.0, 5.0, 0.0))
    cs = build_clusters(mesh, tri_mats=np.zeros(mesh.shape[0], np.int32))
    bvh = build_bvh(mesh)
    inst = grid_instances(bvh, nx=3, ny=2, spacing=2.5, base=(0.0, 8.0, 0.0))
    return mesh, cs, inst, pack_instances(inst)


def _rays(h=H, w=W, seed=0):
    rng = np.random.default_rng(seed)
    o = tuple(jnp.zeros((h, w)) for _ in range(3))
    tx = rng.normal(0.0, 1.6, size=(h, w)).astype(np.float32)
    ty = np.full((h, w), 5.0, np.float32)
    tz = rng.normal(0.0, 1.6, size=(h, w)).astype(np.float32)
    n = np.sqrt(tx * tx + ty * ty + tz * tz)
    return o, (jnp.asarray(tx / n), jnp.asarray(ty / n), jnp.asarray(tz / n))


def test_depth_and_shade_kernels(sphere_scene):
    """Cone-march pyramid + shading, unfused and fused (compiled vs interpret)."""
    import raytracing_engine_tpu as rt
    from raytracing_engine_tpu.models import pallas_renderer

    cfg = rt.RenderConfig(width=W, height=H)
    pos = jnp.array([0.5, -2.0, 0.25])
    for fused in (True, False):
        got = pallas_renderer.render_jit(cfg, sphere_scene, pos, QUAT,
                                         interpret=False, fused=fused)
        want = pallas_renderer.render_jit(cfg, sphere_scene, pos, QUAT,
                                          interpret=True, fused=fused)
        _assert_close(got, want, label=f"conemarch fused={fused}",
                      frac=1e-4)  # isolated edge pixels may flip


def test_cluster_kernel(mesh_setup):
    from raytracing_engine_tpu.ops.pallas.cluster_intersect import (
        cluster_intersect,
    )

    mesh, cs, _, _ = mesh_setup
    o, d = _rays()
    got = cluster_intersect(cs, o, d, jnp.inf, attrs=True, interpret=False)
    want = cluster_intersect(cs, o, d, jnp.inf, attrs=True, interpret=True)
    for g, w, name in zip(got, want, ("t", "idx", "nx", "ny", "nz", "mat",
                                      "area")):
        _assert_close(g, w, label=f"cluster.{name}")

    # smooth (ROWS_SMOOTH) table: the compiled sweep's interpolated-normal
    # attrs must match interpret mode too (9 extra FMAs per test)
    from raytracing_engine_tpu.accel.clusters import build_clusters

    vn = np.asarray(mesh - np.array([0.0, 5.0, 0.0], np.float32)) / 1.2
    cs_s = build_clusters(mesh, vertex_normals=vn.astype(np.float32))
    got_s = cluster_intersect(cs_s, o, d, jnp.inf, attrs=True,
                              interpret=False)
    want_s = cluster_intersect(cs_s, o, d, jnp.inf, attrs=True,
                               interpret=True)
    for g, w, name in zip(got_s, want_s, ("t", "idx", "nx", "ny", "nz",
                                          "mat", "area")):
        _assert_close(g, w, label=f"cluster.smooth.{name}")

    got_ah = cluster_intersect(cs, o, d, 10.0, any_hit=True, interpret=False)
    want_ah = cluster_intersect(cs, o, d, 10.0, any_hit=True, interpret=True)
    # any-hit sweeps use pl.reciprocal(approx=True) on hardware (interpret
    # mode computes exactly), so rays grazing a triangle edge/plane can
    # legitimately flip occlusion — bound the fraction instead of demanding
    # equality (measured 0.11% on this silhouette-heavy ray set; binary
    # visibility bias at that rate is far below Monte-Carlo noise)
    flip = (np.asarray(got_ah[1]) >= 0) != (np.asarray(want_ah[1]) >= 0)
    assert flip.mean() <= 5e-3, f"{flip.mean():.4%} occlusion lanes flipped"


def test_instanced_kernel(mesh_setup):
    from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
        instanced_cluster_intersect,
    )

    mesh, cs, inst, tab = mesh_setup
    o, d = _rays(seed=3)
    got = instanced_cluster_intersect(tab, cs, o, d, attrs=True,
                                      interpret=False)
    want = instanced_cluster_intersect(tab, cs, o, d, attrs=True,
                                       interpret=True)
    for g, w, name in zip(got, want, ("t", "code", "nx", "ny", "nz")):
        _assert_close(g, w, label=f"instanced.{name}")


def test_megakernel_spheres():
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scenes import material_spheres

    cfg = PTConfig(width=W, height=H, max_bounces=3, rng="pcg")
    scene = material_spheres()
    key = jax.random.PRNGKey(5)
    got, n_g = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                              interpret=False)
    want, n_w = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                               interpret=True)
    _assert_close(got, want, label="megakernel", frac=1e-4, atol=1e-4)
    assert float(n_g) == float(n_w)


def test_megakernel_clusters(mesh_setup):
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    mesh, cs, _, _ = mesh_setup
    scene = build_pt_scene(
        spheres=[((3.0, 3.0, 3.0), 1.0, 1)],
        triangles=mesh, tri_mats=np.zeros(mesh.shape[0], np.int32),
        materials=[{"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (8.0,) * 3,
                    "kind": DIFFUSE}],
    )
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg")
    key = jax.random.PRNGKey(6)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, key, bvh=cs,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, key, bvh=cs,
                             interpret=True)
    _assert_close(got, want, label="megakernel-cluster", frac=1e-4, atol=1e-4)


def test_megakernel_row_groups_bit_identical_on_chip(mesh_setup):
    """groups=2 (shared-traversal row-group-gated test issue) must be
    bit-identical to the ungrouped sweep on REAL hardware — the CPU suite
    only proves it in interpret mode. (Perf lever measured negative and
    kept default-off; this pins its correctness contract on chip.)"""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    mesh, cs, _, _ = mesh_setup
    scene = build_pt_scene(
        spheres=[((3.0, 3.0, 3.0), 1.0, 1)],
        triangles=mesh, tri_mats=np.zeros(mesh.shape[0], np.int32),
        materials=[{"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (8.0,) * 3,
                    "kind": DIFFUSE}],
    )
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg")
    key = jax.random.PRNGKey(6)
    want, n_want = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, key,
                                  bvh=cs, interpret=False, tile=(16, 128))
    got, n_got = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, key,
                                bvh=cs, interpret=False, tile=(16, 128),
                                groups=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(n_want) == float(n_got)


def test_sharded_megakernel_one_device_mesh():
    """The shard_map-wrapped megakernel compiles and runs ON CHIP (the CI
    suite only ever exercises it on the CPU fake backend) and matches the
    direct megakernel render — VERDICT round-2 item 9."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.parallel import make_mesh, render_pt_sharded
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scenes import material_spheres

    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg")
    scene = material_spheres()
    key = jax.random.PRNGKey(7)
    got, n_g = render_pt_sharded(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                                 make_mesh(1, 1), mega=True, tile=(16, 128))
    want, n_w = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                               tile=(16, 128))
    _assert_close(got, want, label="sharded-mega", frac=1e-4, atol=1e-4)
    assert float(n_g) == float(n_w)


def test_render_sequence_on_chip(sphere_scene):
    """Batched K-frame serving (the production dispatch shape) compiled on
    chip equals per-frame renders of the same poses."""
    from raytracing_engine_tpu.config import RenderConfig
    from raytracing_engine_tpu.models import pallas_renderer
    from raytracing_engine_tpu.runtime import render_sequence

    cfg = RenderConfig(width=128, height=64)
    positions = jnp.asarray(np.array(
        [[0.0, 0.0, 0.0], [0.0, -1.0, 0.5], [0.5, -2.0, 0.0]], np.float32))
    quats = jnp.asarray(np.array(
        [[0, 0, 0, 1.0], [0.05, 0, 0, 0.9987], [0, 0, 0.05, 0.9987]],
        np.float32))
    seq = render_sequence(cfg, sphere_scene, positions, quats,
                          fn=pallas_renderer.render)
    frames = np.moveaxis(np.asarray(seq), 1, -1)
    for i in range(3):
        want = pallas_renderer.render(cfg, sphere_scene, positions[i],
                                      quats[i])
        _assert_close(frames[i], want, label=f"sequence[{i}]")


def test_instanced_soft_shadows_on_chip(mesh_setup):
    """Area-light soft shadows (N jittered any-hit launches) compiled vs
    interpret. Compiled any-hit uses the approximate reciprocal, so a tiny
    fraction of shadow decisions may flip — bounded here."""
    from raytracing_engine_tpu.models.instanced import render_instanced_phong

    mesh, cs, inst, tab = mesh_setup
    mat_albedo = jnp.asarray(np.array([[0.8, 0.6, 0.4]], np.float32))
    kwargs = dict(width=W, height=H, shadows=True, light_radius=0.8,
                  shadow_samples=2)
    got = render_instanced_phong(tab, cs, inst.mat, mat_albedo, jnp.zeros(3),
                                 jnp.float32(0.1), jnp.asarray([2.0, 3.0, 6.0]),
                                 interpret=False, **kwargs)
    want = render_instanced_phong(tab, cs, inst.mat, mat_albedo, jnp.zeros(3),
                                  jnp.float32(0.1), jnp.asarray([2.0, 3.0, 6.0]),
                                  interpret=True, **kwargs)
    _assert_close(got, want, label="instanced-soft", frac=2e-3, atol=1e-3)


def test_megakernel_mesh_light_on_chip(mesh_setup):
    """Mesh lights (per-pass SMEM row table) compiled vs interpret."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    mesh, cs_nomat, _, _ = mesh_setup
    from raytracing_engine_tpu.accel.clusters import build_clusters

    mats = np.ones(mesh.shape[0], np.int32)  # the whole icosphere emits
    cs = build_clusters(mesh, tri_mats=mats)
    scene = build_pt_scene(
        spheres=[((0.0, 5.0, -3.0), 1.2, 0)],
        triangles=mesh, tri_mats=mats,
        materials=[{"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (6.0,) * 3,
                    "kind": DIFFUSE}],
        mesh_lights=True,
    )
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg")
    key = jax.random.PRNGKey(8)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key, bvh=cs,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key, bvh=cs,
                             interpret=True)
    _assert_close(got, want, label="mesh-light", frac=1e-3, atol=1e-3)


def test_instanced_pt_megakernel_on_chip(mesh_setup):
    """Two-level (instanced) PT megakernel compiled vs interpret."""
    from raytracing_engine_tpu.accel.instancing import InstancedClusters
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    mesh, cs, inst, tab = mesh_setup
    scene = build_pt_scene(
        spheres=[((3.0, 3.0, 5.0), 1.0, 1)],
        materials=[{"albedo": (0.7, 0.55, 0.4), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (10.0,) * 3,
                    "kind": DIFFUSE}],
    )
    ic = InstancedClusters(inst_tab=tab, cs=cs)
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg")
    key = jax.random.PRNGKey(9)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, key, bvh=ic,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, key, bvh=ic,
                             interpret=True)
    _assert_close(got, want, label="instanced-pt", frac=1e-3, atol=1e-3)


def test_megakernel_round3_shading_on_chip():
    """Round-3 shading surface compiled on chip: dielectric + env light +
    checker texture + DOF + RR through the megakernel, compiled vs
    interpret parity on identical inputs."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import (
        DIELECTRIC,
        DIFFUSE,
        build_pt_scene,
    )

    mats = [
        {"albedo": (0.7, 0.6, 0.5), "kind": DIFFUSE,
         "checker": {"color": (0.2, 0.25, 0.35), "scale": 0.5}},
        {"kind": DIELECTRIC, "ior": 1.5},
        {"albedo": (0, 0, 0), "emission": (12.0,) * 3, "kind": DIFFUSE},
    ]
    scene = build_pt_scene(
        spheres=[((0.0, 8.0, -1001.0), 1000.0, 0),
                 ((0.0, 6.0, 0.2), 1.2, 1),
                 ((4.0, 3.0, 4.0), 0.8, 2)],
        materials=mats, env=((0.15, 0.15, 0.2), (0.5, 0.65, 0.95)))
    cfg = PTConfig(width=W, height=H, max_bounces=4, rng="pcg",
                   aperture=0.1, focus_dist=6.0, rr_start=2)
    key = jax.random.PRNGKey(7)
    got, n_g = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                              interpret=False)
    want, n_w = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                               interpret=True)
    _assert_close(got, want, label="round3-shading", frac=1e-4, atol=1e-4)
    assert float(n_g) == float(n_w)


def test_denoise_compiles_on_chip():
    """The denoiser is plain XLA (no Pallas) but gets a compiled-on-chip
    smoke run: AOVs + denoise on a real render, finite output, and the
    flat-region fixed point holds under TPU float semantics."""
    from raytracing_engine_tpu.pathtracer import (
        PTConfig,
        denoise,
        render_aovs,
        render_pt_fast,
    )
    from raytracing_engine_tpu.pathtracer.scenes import cornell_box

    cfg = PTConfig(width=64, height=64, max_bounces=3, rng="pcg")
    pos = jnp.array([0.0, 0.2, 0.0])
    key = jax.random.PRNGKey(9)
    img, _ = render_pt_fast(cfg, cornell_box(), pos, QUAT, 2, key)
    aovs = render_aovs(cfg, cornell_box(), pos, QUAT, 2, key)
    out = jax.block_until_ready(
        denoise(img, aovs["albedo"], aovs["normal"], aovs["depth"]))
    assert bool(jnp.isfinite(out).all())
    flat = denoise(jnp.full((16, 16, 3), 0.3), jnp.full((16, 16, 3), 0.6),
                   jnp.zeros((16, 16, 3)).at[..., 2].set(1.0),
                   jnp.full((16, 16), 5.0), iterations=2)
    np.testing.assert_allclose(np.asarray(flat), 0.3, rtol=1e-5)


def test_megakernel_textures_on_chip():
    """Round-3 texture surface compiled on chip: UV image textures +
    UV-space checker + tangent-space normal map + bilinear filtering
    through the megakernel (sphere analytic UVs AND mesh cluster-table
    UVs/tangents), compiled vs interpret parity on identical inputs."""
    import numpy as np

    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    tex = np.zeros((8, 8, 3), np.float32)
    tex[:4, :, 0] = 1.0
    tex[4:, :, 2] = 1.0
    nm = np.zeros((8, 8, 3), np.float32)
    z = np.sqrt(1.0 - 0.8 * 0.8)
    for yy in range(8):
        for xx in range(8):
            sgn = 1.0 if (xx + yy) % 2 == 0 else -1.0
            nm[yy, xx] = (np.array([sgn * 0.8, 0.0, z]) + 1.0) / 2.0
    mats = [
        {"albedo": (0.5, 0.5, 0.5), "kind": DIFFUSE,
         "image": {"pixels": tex, "scale": 2.0},
         "normal": {"pixels": nm, "scale": 4.0}},
        {"albedo": (0, 0, 0), "emission": (20.0,) * 3, "kind": DIFFUSE},
        {"albedo": (0.8, 0.3, 0.2), "kind": DIFFUSE,
         "checker": {"color": (0.1, 0.8, 0.2), "scale": 4.0, "space": "uv"}},
    ]
    key = jax.random.PRNGKey(5)
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg",
                   tex_filter="bilinear")

    # sphere scene: analytic UVs + tangents
    scene_s = build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 2.0, 0), ((0.0, 14.0, -103.0), 100.0, 1),
                 ((4.0, 6.0, 5.0), 1.5, 2)],
        materials=mats)
    got, _ = render_pt_mega(cfg, scene_s, jnp.zeros(3), QUAT, 2, key,
                            interpret=False, tile=(H, 128))
    want, _ = render_pt_mega(cfg, scene_s, jnp.zeros(3), QUAT, 2, key,
                             interpret=True, tile=(H, 128))
    _assert_close(got, want, label="textures-sphere", frac=1e-4, atol=1e-4)

    # mesh scene: cluster-table UVs, in-kernel tangent emission
    v = lambda x, zz: (x, 5.0, zz)  # noqa: E731
    tris = np.array([[v(-2, -2), v(2, -2), v(2, 2)],
                     [v(-2, -2), v(2, 2), v(-2, 2)]], np.float32)
    uvf = lambda x, zz: ((x + 2) / 4, (zz + 2) / 4)  # noqa: E731
    uvs = np.array([[uvf(-2, -2), uvf(2, -2), uvf(2, 2)],
                    [uvf(-2, -2), uvf(2, 2), uvf(-2, 2)]], np.float32)
    cs = build_clusters(tris, vertex_uvs=uvs)
    scene_m = build_pt_scene(
        spheres=[((0.0, 14.0, -103.0), 100.0, 1)],
        triangles=tris, tri_mats=np.zeros(2, np.int32), tri_uvs=uvs,
        materials=mats)
    got_m, _ = render_pt_mega(cfg, scene_m, jnp.zeros(3), QUAT, 2, key,
                              bvh=cs, interpret=False, tile=(H, 128))
    want_m, _ = render_pt_mega(cfg, scene_m, jnp.zeros(3), QUAT, 2, key,
                               bvh=cs, interpret=True, tile=(H, 128))
    _assert_close(got_m, want_m, label="textures-mesh", frac=1e-4, atol=1e-4)


def test_megakernel_metal_on_chip():
    """GGX rough-conductor shading compiled on chip: NDF sampling +
    Smith masking + NEE/MIS through the megakernel, compiled vs
    interpret parity on identical inputs."""
    import numpy as np

    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import (
        DIFFUSE,
        METAL,
        build_pt_scene,
    )

    scene = build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 2.0, 0), ((3.0, 4.0, 4.0), 1.0, 1),
                 ((0.0, 8.0, -1001.0), 1000.0, 2)],
        materials=[
            {"albedo": (0.9, 0.7, 0.4), "kind": METAL, "roughness": 0.3},
            {"albedo": (0, 0, 0), "emission": (25.0,) * 3, "kind": DIFFUSE},
            {"albedo": (0.5, 0.5, 0.5), "kind": DIFFUSE},
        ], env=((0.2, 0.2, 0.3), (0.6, 0.7, 1.0)))
    cfg = PTConfig(width=W, height=H, max_bounces=3, rng="pcg")
    key = jax.random.PRNGKey(3)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                             interpret=True)
    _assert_close(got, want, label="metal", frac=1e-4, atol=1e-4)
    assert float(np.asarray(got).mean()) > 1e-3


def test_rebin_on_chip_matches_mega(mesh_setup):
    """The rebin renderer (per-bounce megakernel + lax.sort regroup) must
    equal the single-launch megakernel BIT-FOR-BIT on chip — same pcg
    streams keyed on carried pixel coordinates, regrouping is pure
    execution order."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import (
        render_pt_mega,
        render_pt_rebin,
    )
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    mesh, cs, _, _ = mesh_setup
    scene = build_pt_scene(
        spheres=[((3.0, 3.0, 3.0), 1.0, 1)],
        triangles=mesh, tri_mats=np.zeros(mesh.shape[0], np.int32),
        materials=[{"albedo": (0.6, 0.5, 0.4), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (8.0,) * 3,
                    "kind": DIFFUSE}],
    )
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg")
    key = jax.random.PRNGKey(6)
    want, n_want = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 1, key,
                                  bvh=cs, interpret=False)
    for mode in ("morton", "none,morton"):
        got, n_got = render_pt_rebin(cfg, scene, jnp.zeros(3), QUAT, 1, key,
                                     bvh=cs, interpret=False, rebin=mode)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert float(n_want) == float(n_got)


def test_megakernel_env_map_on_chip():
    """HDR env map (alias-table NEE + MIS + escape fetch) compiled on
    chip vs interpret parity — the env tables ride VMEM lane rows and the
    per-lane fetches lower through the same take_along_axis path as the
    texture atlas."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import (
        DIFFUSE,
        METAL,
        build_pt_scene,
    )

    img = np.full((16, 128, 3), 0.2, np.float32)
    img[3, 40] = (120.0, 110.0, 90.0)  # sun texel
    scene = build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 2.0, 0), ((3.0, 4.0, 4.0), 1.0, 1),
                 ((0.0, 8.0, -1001.0), 1000.0, 2)],
        materials=[
            {"albedo": (0.7, 0.6, 0.5), "kind": DIFFUSE},
            {"albedo": (0, 0, 0), "emission": (25.0,) * 3, "kind": DIFFUSE},
            {"albedo": (0.8, 0.7, 0.5), "kind": METAL, "roughness": 0.3},
        ], env=img)
    cfg = PTConfig(width=W, height=H, max_bounces=3, rng="pcg")
    key = jax.random.PRNGKey(11)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                             interpret=True)
    _assert_close(got, want, label="env-map", frac=1e-4, atol=1e-4)
    assert float(np.asarray(got).mean()) > 1e-3


def test_megakernel_rough_dielectric_on_chip():
    """GGX rough dielectric (Walter microfacet refraction) compiled on
    chip vs interpret parity."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import (
        DIELECTRIC,
        DIFFUSE,
        build_pt_scene,
    )

    scene = build_pt_scene(
        spheres=[((0.0, 5.0, 0.0), 1.5, 0), ((2.5, 6.5, 1.5), 0.8, 1),
                 ((0.0, 8.0, -1001.0), 1000.0, 2)],
        materials=[
            {"kind": DIELECTRIC, "ior": 1.5, "roughness": 0.3},
            {"albedo": (0, 0, 0), "emission": (20.0,) * 3, "kind": DIFFUSE},
            {"albedo": (0.5, 0.5, 0.6), "kind": DIFFUSE},
        ], env=((0.2, 0.2, 0.3), (0.6, 0.7, 1.0)))
    cfg = PTConfig(width=W, height=H, max_bounces=4, rng="pcg")
    key = jax.random.PRNGKey(12)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                             interpret=True)
    _assert_close(got, want, label="rough-dielectric", frac=1e-4, atol=1e-4)
    assert float(np.asarray(got).mean()) > 1e-3


def test_megakernel_media_on_chip():
    """Single-scatter participating media (fog_scatter: equiangular NEE
    per segment) compiled on chip vs interpret parity — the equiangular
    sampling adds atan/tan transcendentals that had never run through
    Mosaic before this case."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    scene = build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 2.0, 0), ((0.0, 8.0, -1001.0), 1000.0, 1)],
        materials=[{"albedo": (0, 0, 0), "emission": (5.0,) * 3,
                    "kind": DIFFUSE},
                   {"albedo": (0.5, 0.5, 0.5), "kind": DIFFUSE}])
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg",
                   fog_density=0.15, fog_scatter=0.12)
    key = jax.random.PRNGKey(23)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                             interpret=True)
    _assert_close(got, want, label="media", frac=1e-4, atol=1e-4)
    assert float(np.asarray(got).mean()) > 1e-3


def test_megakernel_lane_mesh_lights_on_chip():
    """Per-lane mesh lights (mesh_lights='lane': channel-major row tables,
    lane-axis alias fetch) compiled on chip vs interpret parity."""
    from raytracing_engine_tpu.accel import icosphere
    from raytracing_engine_tpu.accel.clusters import build_clusters
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    tris = icosphere(subdivisions=2, radius=1.0, center=(0.0, 6.0, 2.5))
    tri_mats = np.ones(len(tris), np.int32)
    scene = build_pt_scene(
        spheres=[((0.0, 6.0, -51.0), 50.0, 0)],
        triangles=tris, tri_mats=tri_mats,
        materials=[{"albedo": (0.7, 0.7, 0.7), "kind": DIFFUSE},
                   {"albedo": (0, 0, 0), "emission": (12.0,) * 3,
                    "kind": DIFFUSE}],
        mesh_lights="lane")
    cs = build_clusters(tris, tri_mats=tri_mats)
    cfg = PTConfig(width=128, height=16, max_bounces=2, rng="pcg")
    key = jax.random.PRNGKey(29)
    got, n_got = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                                bvh=cs, interpret=False)
    want, n_want = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                                  bvh=cs, interpret=True)
    _assert_close(got, want, label="lane-mlt", frac=1e-4, atol=1e-4)
    assert float(n_got) == float(n_want)
    assert float(np.asarray(got).mean()) > 1e-3


def test_megakernel_aniso_ggx_on_chip():
    """Anisotropic GGX conductor (roughness_y: elliptical NDF sampling in
    the tangent frame) compiled on chip vs interpret parity.

    frac=1e-3 (not the usual 1e-4): the 0.09/0.36 ellipse is near-mirror
    along x, so compiled-vs-interpret fma/scheduling differences flip the
    GGX sample branch on ~0.05% of lanes (measured 0.0549%, max abs
    0.082) and each flipped lane's whole 3-bounce path diverges — the
    per-lane resampling signature, not a math drift (the NDF quadrature
    + engine-parity tests in tests/test_aniso_metal.py pin the math)."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import (
        DIFFUSE,
        METAL,
        build_pt_scene,
    )

    scene = build_pt_scene(
        spheres=[((0.0, 6.0, 0.0), 2.0, 0), ((3.0, 4.0, 4.0), 1.0, 1),
                 ((0.0, 8.0, -1001.0), 1000.0, 2)],
        materials=[
            {"albedo": (0.9, 0.7, 0.4), "kind": METAL, "roughness": 0.09,
             "roughness_y": 0.36},
            {"albedo": (0, 0, 0), "emission": (25.0,) * 3, "kind": DIFFUSE},
            {"albedo": (0.5, 0.5, 0.5), "kind": DIFFUSE},
        ], env=((0.2, 0.2, 0.3), (0.6, 0.7, 1.0)))
    cfg = PTConfig(width=W, height=H, max_bounces=3, rng="pcg")
    key = jax.random.PRNGKey(31)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                             interpret=True)
    _assert_close(got, want, label="aniso-ggx", frac=1e-3, atol=1e-4)
    assert float(np.asarray(got).mean()) > 1e-3


def test_megakernel_trilinear_mips_on_chip():
    """Trilinear mip filtering (ray-cone LOD over the packed mip chain;
    2 bilinear taps from per-level rects) compiled on chip vs interpret
    parity."""
    from raytracing_engine_tpu.ops.pallas.pt_kernel import render_pt_mega
    from raytracing_engine_tpu.pathtracer import PTConfig
    from raytracing_engine_tpu.pathtracer.scene import DIFFUSE, build_pt_scene

    img = np.zeros((16, 16, 3), np.float32)
    img[::2, ::2] = (1.0, 0.2, 0.1)
    img[1::2, 1::2] = (0.1, 0.2, 1.0)
    scene = build_pt_scene(
        spheres=[((0.0, 8.0, -51.0), 50.0, 0), ((0.0, 8.0, 4.0), 1.0, 1)],
        materials=[{"albedo": (1, 1, 1), "kind": DIFFUSE,
                    "image": {"pixels": img, "scale": 8.0}},
                   {"albedo": (0, 0, 0), "emission": (10.0,) * 3,
                    "kind": DIFFUSE}],
        env=((0.3, 0.3, 0.3), (0.5, 0.5, 0.5)), tex_mips=True)
    cfg = PTConfig(width=W, height=H, max_bounces=2, rng="pcg",
                   tex_filter="trilinear")
    key = jax.random.PRNGKey(37)
    got, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                            interpret=False)
    want, _ = render_pt_mega(cfg, scene, jnp.zeros(3), QUAT, 2, key,
                             interpret=True)
    _assert_close(got, want, label="trilinear-mips", frac=1e-4, atol=1e-4)
    assert float(np.asarray(got).mean()) > 1e-3
