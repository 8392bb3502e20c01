"""Occlusion handling / region checking on the fused TPU path (pipeline.tracking_cycle).

Two layers of evidence, mirroring how the reference tests its occlusion variants
(M3T/test/modality_test.cpp:175-279):
 1. equivalence — the on-device focused scene render and the resulting line validity
    must match the object-graph path (Focused*Renderer + region_fn) on the same scene;
 2. behavior — tracking a partially occluded body through ``tracking_cycle`` must stay
    accurate with occlusion handling enabled and reject the occluded lines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu import pipeline
from m3t_tpu.ops import occlusion as occlusion_ops
from m3t_tpu.ops import region_fast, region_fn
from m3t_tpu.ops.raster import rasterize_np
from m3t_tpu.ops.region_fn import (
    ModeledOcclusionInputs,
    RegionCheckInputs,
    RegionConfig,
    ViewPoints,
)
from m3t_tpu.region_model import RegionModel
from tests import fixtures


@pytest.fixture(scope="module")
def occluded_scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe_occl")
    tracked = fixtures.sphere_body("po_tracked", radius=0.06, n_subdiv=2)
    occluder = fixtures.cube_body("po_occluder", half=0.05)
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

    model = RegionModel("po_model", tracked, str(tmp / "m.npz"), n_divides=1,
                        n_points=150, image_size=200)
    assert model.SetUp()

    return dict(tracked=tracked, occluder=occluder, intr=intr, image=image,
                pose_tracked=pose_tracked, pose_occluder=pose_occluder,
                model=model)


def _pcfg(scene, **flags):
    cfg = RegionConfig(n_lines_max=150)
    return pipeline.PipelineConfig(cfg=cfg, scales=(2, 1),
                                   standard_deviations=(5.0, 1.5),
                                   n_corr_iterations=2, **flags)


def _intr_t(intr):
    return (np.float32(intr.fu), np.float32(intr.fv),
            np.float32(intr.ppu), np.float32(intr.ppv))


def _host_view(model, pose):
    t = pose[:3, 3]
    orientation = pose[:3, :3].T @ (t / np.linalg.norm(t))
    idx = int(np.argmax(model.orientations @ orientation))
    return ViewPoints(
        center_f_body=jnp.asarray(model.centers[idx]),
        normal_f_body=jnp.asarray(model.normals[idx]),
        foreground_distance=jnp.asarray(model.foreground_distances[idx]),
        background_distance=jnp.asarray(model.background_distances[idx]),
        measured_depth_offset=jnp.asarray(model.depth_offsets[idx, :, 5]),
        modeled_depth_offset=jnp.asarray(model.depth_offsets[idx, :, 5]),
    )


def test_focused_render_matches_object_graph_renderers(occluded_scene):
    """On-device focused_render == Focused*Renderer on the same scene."""
    from m3t_tpu.camera import ImageColorCamera
    from m3t_tpu.renderer import (FocusedBasicDepthRenderer,
                                  FocusedSilhouetteRenderer, IDType)
    from m3t_tpu.renderer_geometry import RendererGeometry

    s = occluded_scene
    s["tracked"].set_body2world_pose(s["pose_tracked"])
    s["occluder"].set_body2world_pose(s["pose_occluder"])
    camera = ImageColorCamera("po_cam", s["intr"], [s["image"]])
    assert camera.SetUp()
    rg = RendererGeometry("po_rg")
    rg.AddBody(s["tracked"])
    rg.AddBody(s["occluder"])
    assert rg.SetUp()
    depth_r = FocusedBasicDepthRenderer("po_dr", rg, camera)
    depth_r.AddReferencedBody(s["tracked"])
    depth_r.AddReferencedBody(s["occluder"])
    assert depth_r.SetUp()
    sil_r = FocusedSilhouetteRenderer("po_sr", rg, camera, id_type=IDType.REGION)
    sil_r.AddReferencedBody(s["tracked"])
    sil_r.AddReferencedBody(s["occluder"])
    assert sil_r.SetUp()
    assert depth_r.StartRendering() and sil_r.StartRendering()

    geom = occlusion_ops.build_scene_geometry([[s["tracked"], s["occluder"]]])
    scene_poses = jnp.asarray(
        np.stack([s["pose_tracked"], s["pose_occluder"]])[None])
    rend = occlusion_ops.focused_render(
        geom, scene_poses, _intr_t(s["intr"]), s["intr"].width, s["intr"].height)

    assert bool(rend.body_visible[0])
    np.testing.assert_allclose(float(rend.corner_u[0]), depth_r.corner_u, atol=1e-3)
    np.testing.assert_allclose(float(rend.corner_v[0]), depth_r.corner_v, atol=1e-3)
    np.testing.assert_allclose(float(rend.scale[0]), depth_r.scale, rtol=1e-5)
    d_host = np.asarray(depth_r.focused_depth_image())
    d_fast = np.asarray(rend.depth[0])
    both_fin = np.isfinite(d_host) & np.isfinite(d_fast)
    assert (np.isfinite(d_host) == np.isfinite(d_fast)).mean() > 0.999
    np.testing.assert_allclose(d_fast[both_fin], d_host[both_fin], atol=1e-4)
    s_host = np.asarray(sil_r.focused_silhouette_image())
    s_fast = np.asarray(rend.region_sil[0])
    assert (s_host == s_fast).mean() > 0.999


@pytest.mark.parametrize("mode", ["modeled", "region_check"])
def test_fused_validity_matches_host_path(occluded_scene, mode):
    """Line validity with occlusion inputs: fast path == region_fn path."""
    s = occluded_scene
    intr = s["intr"]
    pose = s["pose_tracked"]
    pcfg = _pcfg(s, region_model_occlusions=(mode == "modeled"),
                 region_checking=(mode == "region_check"))
    cfg = pcfg.cfg
    L = cfg.n_lines_max

    geom = occlusion_ops.build_scene_geometry([[s["tracked"], s["occluder"]]])
    scene_poses = jnp.asarray(np.stack([pose, s["pose_occluder"]])[None])
    rend = occlusion_ops.focused_render(
        geom, scene_poses, _intr_t(intr), intr.width, intr.height)

    occ = ModeledOcclusionInputs(rend.depth[0], rend.corner_u[0], rend.corner_v[0],
                                 rend.scale[0], rend.body_visible[0])
    chk = RegionCheckInputs(rend.region_sil[0], rend.corner_u[0], rend.corner_v[0],
                            rend.scale[0], geom.region_id[0], rend.body_visible[0])

    host = region_fn.calculate_correspondences(
        cfg, 2, _host_view(s["model"], pose), jnp.int32(L), jnp.asarray(pose),
        jnp.asarray(s["image"]),
        jnp.full((cfg.n_histogram_bins ** 3,), 0.5, jnp.float32),
        jnp.full((cfg.n_histogram_bins ** 3,), 0.5, jnp.float32),
        np.float32(intr.fu), np.float32(intr.fv), np.float32(intr.ppu),
        np.float32(intr.ppv), intr.width, intr.height, jnp.asarray(True),
        modeled_occlusion=occ if mode == "modeled" else None,
        region_check=chk if mode == "region_check" else None)

    intr_t = _intr_t(intr)
    arrays = pipeline.RegionModelArrays.from_models([s["model"]], L)
    poses = jnp.asarray(pose)[None]
    images = jnp.asarray(s["image"])[None]
    bin_crop, bin_cropT, cu, cv = pipeline._prepare_crops(pcfg, intr_t, images, poses)
    points = jax.vmap(lambda m, p: pipeline._select_view_cl(m, p))(arrays, poses)
    geo = jax.vmap(
        lambda p, po, u, v, mo, rc: region_fast.line_geometry(
            cfg, 2, p, jnp.int32(L), po, *intr_t, intr.width, intr.height,
            u, v, pcfg.crop_size, pcfg.lp, modeled_occlusion=mo, region_check=rc,
            handle_occlusions=jnp.asarray(True))
    )(points, poses, cu, cv,
      jax.tree_util.tree_map(lambda a: a[None], occ) if mode == "modeled" else None,
      jax.tree_util.tree_map(lambda a: a[None], chk)
      if mode == "region_check" else None)

    valid_h = np.asarray(host.valid)
    valid_f = np.asarray(geo.valid[0])[:L]
    n_no = int(np.asarray(region_fn.calculate_correspondences(
        cfg, 2, _host_view(s["model"], pose), jnp.int32(L), jnp.asarray(pose),
        jnp.asarray(s["image"]),
        jnp.full((cfg.n_histogram_bins ** 3,), 0.5, jnp.float32),
        jnp.full((cfg.n_histogram_bins ** 3,), 0.5, jnp.float32),
        np.float32(intr.fu), np.float32(intr.fv), np.float32(intr.ppu),
        np.float32(intr.ppv), intr.width, intr.height,
        jnp.asarray(True)).valid).sum())
    # The occluder hides a significant part of the contour.
    assert valid_h.sum() < n_no - 10, (valid_h.sum(), n_no)
    np.testing.assert_array_equal(valid_f, valid_h)


@pytest.mark.slow
def test_tracking_cycle_with_occlusion_handling(occluded_scene):
    """tracking_cycle stays locked on a partially occluded moving body."""
    s = occluded_scene
    intr = s["intr"]
    rng = np.random.default_rng(5)

    # Sequence: sphere translates in +x behind the static occluder.
    frames, poses_gt = [], []
    for k in range(5):
        pose = s["pose_tracked"].copy()
        pose[0, 3] = 0.004 * k
        poses_gt.append(pose)
        verts, ids = [], []
        for i, (body, p) in enumerate([(s["tracked"], pose),
                                       (s["occluder"], s["pose_occluder"])]):
            tri = body.triangle_vertices_f_body()
            verts.append(tri @ p[:3, :3].T + p[:3, 3])
            ids.append(np.full(len(tri), i + 1))
        _, id_img = rasterize_np(
            np.concatenate(verts), np.concatenate(ids), intr.fu, intr.fv,
            intr.ppu, intr.ppv, intr.width, intr.height, cull_backfaces=True)
        image = np.empty((intr.height, intr.width, 3), np.uint8)
        image[:] = [40, 120, 190]
        image[id_img == 1] = [160, 60, 50]
        image[id_img == 2] = [60, 170, 60]
        image = np.clip(image.astype(np.int16)
                        + rng.integers(-5, 6, image.shape), 0, 255).astype(np.uint8)
        frames.append(image)

    pcfg = _pcfg(s, region_model_occlusions=True, region_checking=True)
    intr_t = _intr_t(intr)
    arrays = pipeline.RegionModelArrays.from_models([s["model"]],
                                                    pcfg.cfg.n_lines_max)
    geom = occlusion_ops.build_scene_geometry([[s["tracked"], s["occluder"]]])
    occluder_poses = jnp.asarray(s["pose_occluder"])[None, None]

    state = pipeline.initialize_histograms(
        pcfg, intr_t, jnp.asarray(frames[0])[None], arrays,
        jnp.asarray(poses_gt[0])[None])
    for image in frames:
        state = pipeline.tracking_cycle(
            pcfg, intr_t, jnp.asarray(image)[None], arrays, state,
            scene_geom=geom, occluder_poses=occluder_poses)

    err = np.linalg.norm(
        np.asarray(state.body2camera_pose[0])[:3, 3] - poses_gt[-1][:3, 3])
    assert err < 0.008, f"pose error {err * 1000:.1f} mm under partial occlusion"
