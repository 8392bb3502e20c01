"""Point-query occlusion evaluation (ops/occlusion.py SceneCoeffs) vs rendered images.

The fused pipeline defaults to evaluating scene depth/silhouette at exactly the
pixels the validity checks sample (PipelineConfig.occlusion_queries) instead of
rasterizing (S, S) focused images each correspondence iteration.  These tests pin
the contract: queries reproduce the rasterized images pixel-for-pixel, and the
query-mode tracking cycle matches the image-mode cycle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu import pipeline
from m3t_tpu.ops import occlusion as occlusion_ops
from m3t_tpu.ops.raster import rasterize_np
from m3t_tpu.ops.region_fn import RegionConfig
from m3t_tpu.region_model import RegionModel
from tests import fixtures


@pytest.fixture(scope="module")
def query_scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("occl_query")
    tracked = fixtures.sphere_body("oq_tracked", radius=0.06, n_subdiv=2)
    occluder = fixtures.cube_body("oq_occluder", half=0.05)
    intr = fixtures.test_intrinsics(200, 150)

    pose_tracked = np.eye(4, dtype=np.float32)
    pose_tracked[2, 3] = 0.7
    pose_occluder = np.eye(4, dtype=np.float32)
    pose_occluder[0, 3] = -0.05
    pose_occluder[2, 3] = 0.5

    verts, ids = [], []
    for i, (body, pose) in enumerate([(tracked, pose_tracked),
                                      (occluder, pose_occluder)]):
        tri = body.triangle_vertices_f_body()
        verts.append(tri @ pose[:3, :3].T + pose[:3, 3])
        ids.append(np.full(len(tri), i + 1))
    _, id_img = rasterize_np(
        np.concatenate(verts), np.concatenate(ids), intr.fu, intr.fv, intr.ppu,
        intr.ppv, intr.width, intr.height, cull_backfaces=True)
    image = np.empty((intr.height, intr.width, 3), np.uint8)
    image[:] = [40, 120, 190]
    image[id_img == 1] = [160, 60, 50]
    image[id_img == 2] = [60, 170, 60]

    model = RegionModel("oq_model", tracked, str(tmp / "m.npz"), n_divides=1,
                        n_points=150, image_size=200)
    assert model.SetUp()
    geom = occlusion_ops.build_scene_geometry([[tracked, occluder]])
    scene_poses = jnp.asarray(np.stack([pose_tracked, pose_occluder])[None])
    return dict(tracked=tracked, occluder=occluder, intr=intr, image=image,
                pose_tracked=pose_tracked, pose_occluder=pose_occluder,
                model=model, geom=geom, scene_poses=scene_poses)


def _intr_t(intr):
    return (np.float32(intr.fu), np.float32(intr.fv),
            np.float32(intr.ppu), np.float32(intr.ppv))


def test_queries_match_rasterized_images(query_scene):
    """query_depth_id at every focused pixel == focused_render images."""
    s = query_scene
    intr = s["intr"]
    size = 200
    rend = occlusion_ops.focused_render(
        s["geom"], s["scene_poses"], _intr_t(intr), intr.width, intr.height, size)
    sc = occlusion_ops.focused_scene_coeffs(
        s["geom"], s["scene_poses"], _intr_t(intr), intr.width, intr.height, size)

    np.testing.assert_allclose(np.asarray(sc.corner_u), np.asarray(rend.corner_u))
    np.testing.assert_allclose(np.asarray(sc.scale), np.asarray(rend.scale))
    assert bool(sc.body_visible[0]) == bool(rend.body_visible[0])

    uu, vv = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32))
    depth_q, id_q = occlusion_ops.query_depth_id(
        sc.coeffs[0], sc.tri_valid[0], sc.sil_id[0], uu, vv)
    depth_q = np.asarray(depth_q)
    id_q = np.asarray(id_q)
    depth_img = np.asarray(rend.depth[0])
    combined_img = (np.asarray(rend.body_sil[0]) << 8) | np.asarray(
        rend.region_sil[0])

    assert np.isfinite(depth_img).mean() > 0.2, "scene must cover the crop"
    # Coverage decisions may differ only on exact-edge pixels (ulp-level
    # reassociation between the MXU matmul and the pointwise FMA); allow a
    # vanishing fraction of disagreement.
    same_cover = np.isfinite(depth_img) == np.isfinite(depth_q)
    assert same_cover.mean() > 0.9995
    both = np.isfinite(depth_img) & np.isfinite(depth_q)
    np.testing.assert_allclose(depth_q[both], depth_img[both], rtol=1e-5)
    assert (id_q[both] == combined_img[both]).mean() > 0.999


def test_pallas_query_kernel_matches_xla(query_scene):
    """The Pallas point-query kernel == the XLA broadcast formulation."""
    s = query_scene
    intr = s["intr"]
    sc = occlusion_ops.focused_scene_coeffs(
        s["geom"], s["scene_poses"], _intr_t(intr), intr.width, intr.height, 200)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.uniform(-10, 210, (150, 7)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-10, 210, (150, 7)).astype(np.float32))
    inv_p = occlusion_ops.query_inv_depth(sc.coeffs[0], sc.tri_valid[0], u, v)
    inv_x = occlusion_ops.query_inv_depth_xla(sc.coeffs[0], sc.tri_valid[0], u, v)
    np.testing.assert_allclose(np.asarray(inv_p), np.asarray(inv_x), rtol=1e-6)
    idq = occlusion_ops.query_id(sc.coeffs[0], sc.tri_valid[0], sc.sil_id[0], u, v)
    depth_i, id_i = occlusion_ops.query_depth_id(
        sc.coeffs[0], sc.tri_valid[0], sc.sil_id[0], u, v)
    np.testing.assert_array_equal(np.asarray(idq), np.asarray(id_i))
    # Batched through vmap (the pipeline's usage pattern).
    inv_b = jax.vmap(occlusion_ops.query_inv_depth)(
        sc.coeffs, sc.tri_valid, u[None], v[None])
    np.testing.assert_allclose(np.asarray(inv_b[0]), np.asarray(inv_x), rtol=1e-6)


@pytest.mark.parametrize("rgbd", [False, True])
def test_cycle_query_mode_equals_image_mode(query_scene, rgbd):
    """tracking_cycle with occlusion_queries on/off produces the same poses."""
    s = query_scene
    intr = s["intr"]
    cfg = RegionConfig(n_lines_max=150)
    base = pipeline.PipelineConfig(
        cfg=cfg, scales=(2, 1), standard_deviations=(5.0, 1.5),
        n_corr_iterations=2, region_model_occlusions=True, region_checking=True,
        use_depth=rgbd, depth_model_occlusions=rgbd, depth_silhouette_check=rgbd,
        depth_cfg=pipeline.DepthConfig(n_points_max=100))
    intr_t = _intr_t(intr)
    arrays = pipeline.RegionModelArrays.from_models([s["model"]], cfg.n_lines_max)
    occluder_poses = jnp.asarray(s["pose_occluder"])[None, None]
    images = jnp.asarray(s["image"])[None]
    state0 = pipeline.initialize_histograms(
        base, intr_t, images, arrays, jnp.asarray(s["pose_tracked"])[None])

    if rgbd:
        from m3t_tpu.depth_model import DepthModel

        verts, ids = [], []
        for i, (body, pose) in enumerate([(s["tracked"], s["pose_tracked"]),
                                          (s["occluder"], s["pose_occluder"])]):
            tri = body.triangle_vertices_f_body()
            verts.append(tri @ pose[:3, :3].T + pose[:3, 3])
            ids.append(np.full(len(tri), i + 1))
        depth_m, _ = rasterize_np(
            np.concatenate(verts), np.concatenate(ids), intr.fu, intr.fv,
            intr.ppu, intr.ppv, intr.width, intr.height, cull_backfaces=True)
        depth_u16 = np.where(np.isfinite(depth_m), depth_m / 0.001, 0.0)
        depth_images = jnp.asarray(depth_u16.astype(np.uint16))[None]
        import tempfile

        with tempfile.TemporaryDirectory() as dtmp:
            dm = DepthModel("oq_dm", s["tracked"], f"{dtmp}/dm.npz", n_divides=1,
                            n_points=100, image_size=200)
            assert dm.SetUp()
        darrays = pipeline.DepthModelArrays.from_models([dm], 100)
        run = lambda pcfg, st: pipeline.tracking_cycle_rgbd(
            pcfg, intr_t, intr_t, jnp.float32(0.001), images, depth_images,
            arrays, darrays, st, scene_geom=s["geom"],
            occluder_poses=occluder_poses)
    else:
        run = lambda pcfg, st: pipeline.tracking_cycle(
            pcfg, intr_t, images, arrays, st, scene_geom=s["geom"],
            occluder_poses=occluder_poses)

    st_q = run(base._replace(occlusion_queries=True), state0)
    st_i = run(base._replace(occlusion_queries=False), state0)
    np.testing.assert_allclose(np.asarray(st_q.body2camera_pose),
                               np.asarray(st_i.body2camera_pose), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_q.histogram_f),
                               np.asarray(st_i.histogram_f), atol=1e-6)
