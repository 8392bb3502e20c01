"""TextureModality completion: DAISY/FREAK descriptors, occlusion handling, and the
fused ICG+ hook (host feature extraction feeding device Tukey-GN terms)."""

import numpy as np
import pytest

from m3t_tpu.camera import ImageColorCamera
from m3t_tpu.renderer import FocusedSilhouetteRenderer, IDType
from m3t_tpu.renderer_geometry import RendererGeometry
from m3t_tpu.texture_modality import TextureModality
from tests import fixtures
from tests.test_texture_modality import _render_textured_frame


def _textured_setup(tmp_path, descriptor_type="ORB", n_frames=4, name="tf"):
    body = fixtures.sphere_body(f"{name}_sphere", radius=0.08, n_subdiv=2)
    intr = fixtures.test_intrinsics(320, 240)
    rng = np.random.default_rng(2)
    face_colors = rng.integers(40, 255,
                               size=(len(body.triangles), 3)).astype(np.uint8)
    poses = []
    for i in range(n_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.0015 * i
        pose[1, 3] = 0.001 * i
        pose[2, 3] = 0.5
        poses.append(pose)
    frames = [_render_textured_frame(body, intr, p, face_colors, rng=rng)
              for p in poses]
    camera = ImageColorCamera(f"{name}_cam", intr, frames)
    assert camera.SetUp()
    rg = RendererGeometry(f"{name}_rg")
    rg.AddBody(body)
    assert rg.SetUp()
    sil = FocusedSilhouetteRenderer(f"{name}_sil", rg, camera, image_size=200,
                                    id_type=IDType.BODY)
    sil.AddReferencedBody(body)
    assert sil.SetUp()
    modality = TextureModality(f"{name}_texture", body, camera, sil)
    modality.descriptor_type = descriptor_type
    modality.orb_n_features = 500
    return body, intr, poses, frames, camera, modality


@pytest.mark.parametrize("descriptor_type", ["DAISY", "FREAK"])
def test_native_descriptors_produce_matches(tmp_path, descriptor_type):
    """DAISY/FREAK (native implementations, reference
    texture_modality.h:77-88) must produce cross-frame matches on a textured
    body."""
    body, intr, poses, frames, camera, modality = _textured_setup(
        tmp_path, descriptor_type, name=f"nd_{descriptor_type}")
    assert modality.SetUp()

    body.set_body2world_pose(poses[0])
    camera.UpdateImage()
    modality.silhouette_renderer_ptr.StartRendering()
    assert modality.StartModality(0, 0)
    assert len(modality._points_keyframes), "keyframe reconstruction failed"

    camera.UpdateImage()  # frame 1
    body.set_body2world_pose(poses[1])
    assert modality.CalculateCorrespondences(1, 0)
    n_matches = len(modality.data_points_3d)
    assert n_matches > 20, (descriptor_type, n_matches)

    # Matched reprojection errors must be small (correct correspondences, not
    # random pairings): frame-1 projections of the keyframe 3D points.
    pose = camera.world2camera_pose @ poses[1]
    c = modality.data_points_3d @ pose[:3, :3].T + pose[:3, 3]
    proj = np.stack([c[:, 0] * intr.fu / c[:, 2] + intr.ppu,
                     c[:, 1] * intr.fv / c[:, 2] + intr.ppv], 1)
    err = np.linalg.norm(proj - modality.data_points_2d, axis=1)
    assert np.median(err) < 3.0, (descriptor_type, np.median(err))


def test_texture_occlusion_handling(tmp_path):
    """Modeled occlusions must reject keyframe points hidden by an occluder
    (texture modality occlusion handling, texture_modality.cpp:778-824)."""
    from m3t_tpu.renderer import FocusedBasicDepthRenderer

    body, intr, poses, frames, camera, modality = _textured_setup(
        tmp_path, "ORB", name="to")
    occluder = fixtures.cube_body("to_occluder", half=0.05)
    occ_pose = np.eye(4, dtype=np.float32)
    occ_pose[0, 3] = -0.04
    occ_pose[2, 3] = 0.35
    occluder.set_body2world_pose(occ_pose)

    rg = RendererGeometry("to_rg2")
    rg.AddBody(body)
    rg.AddBody(occluder)
    assert rg.SetUp()
    depth_renderer = FocusedBasicDepthRenderer("to_depth", rg, camera)
    depth_renderer.AddReferencedBody(body)
    depth_renderer.AddReferencedBody(occluder)
    assert depth_renderer.SetUp()

    body.set_body2world_pose(poses[0])
    camera.UpdateImage()

    modality.SetUp()
    modality.silhouette_renderer_ptr.StartRendering()
    assert modality.StartModality(0, 0)
    n_kf_without = len(modality._points_keyframes[0])
    assert n_kf_without > 20

    # Occlusion handling filters keyframe points at RECONSTRUCTION
    # (texture_modality.cpp ComputeKeyframeData): points behind the rendered
    # occluder must be rejected.
    modality2 = TextureModality("to_texture2", body, camera,
                                modality.silhouette_renderer_ptr)
    modality2.orb_n_features = 500
    modality2.ModelOcclusions(depth_renderer)
    assert modality2.SetUp()
    depth_renderer.StartRendering()
    assert modality2.StartModality(0, 0)
    n_kf_with = len(modality2._points_keyframes[0])
    assert 0 < n_kf_with < n_kf_without, (n_kf_with, n_kf_without)

    # The surviving keyframe points must be the unoccluded ones: none of them
    # may sit behind the occluder's rendered depth.
    unocc = modality2._unoccluded_modeled(
        modality2._points_keyframes[0],
        camera.world2camera_pose @ body.body2world_pose)
    assert unocc.all()


def test_fused_texture_terms_match_host(tmp_path):
    """Device Tukey-GN terms == host TextureModality gradient/Hessian."""
    import jax
    import jax.numpy as jnp

    from m3t_tpu import pipeline
    from m3t_tpu.ops import texture_fn

    body, intr, poses, frames, camera, modality = _textured_setup(
        tmp_path, "ORB", name="fh")
    assert modality.SetUp()
    body.set_body2world_pose(poses[0])
    camera.UpdateImage()
    modality.silhouette_renderer_ptr.StartRendering()
    assert modality.StartModality(0, 0)
    camera.UpdateImage()
    body.set_body2world_pose(poses[1])
    assert modality.CalculateCorrespondences(1, 0)
    assert len(modality.data_points_3d) > 20

    std = modality.standard_deviations[0]
    modality._variance = std * std
    assert modality.CalculateGradientAndHessian(1, 0, 0)

    tp = pipeline.texture_points_from_modalities([modality], k_max=256)
    pose = jnp.asarray(camera.world2camera_pose @ poses[1])
    g, h = jax.jit(texture_fn.calculate_gradient_and_hessian,
                   static_argnames=("tukey_norm_constant",))(
        jax.tree_util.tree_map(lambda a: a[0], tp), pose,
        np.float32(intr.fu), np.float32(intr.fv), np.float32(intr.ppu),
        np.float32(intr.ppv), np.float32(std),
        tukey_norm_constant=modality.tukey_norm_constant)
    scale_g = max(np.abs(modality.gradient).max(), 1e-6)
    scale_h = max(np.abs(modality.hessian).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(g) / scale_g,
                               modality.gradient / scale_g, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h) / scale_h,
                               modality.hessian / scale_h, atol=2e-4)


@pytest.mark.slow
def test_icgplus_fused_cycle(tmp_path):
    """ICG+ config (region + texture) through ONE fused pipeline entry point:
    host feature extraction feeds device GN terms each frame."""
    import jax.numpy as jnp

    from m3t_tpu import pipeline
    from m3t_tpu.ops.region_fn import RegionConfig
    from m3t_tpu.region_model import RegionModel

    body, intr, poses, frames, camera, modality = _textured_setup(
        tmp_path, "ORB", n_frames=5, name="ip")
    assert modality.SetUp()

    model = RegionModel("ip_model", body, str(tmp_path / "m.npz"), n_divides=1,
                        n_points=100, image_size=400)
    assert model.SetUp()
    pcfg = pipeline.PipelineConfig(
        cfg=RegionConfig(n_lines_max=100), scales=(2, 1),
        standard_deviations=(5.0, 1.5), n_corr_iterations=3,
        n_update_iterations=2, use_texture=True,
        texture_standard_deviations=(15.0, 5.0))
    intr_t = (np.float32(intr.fu), np.float32(intr.fv),
              np.float32(intr.ppu), np.float32(intr.ppv))
    arrays = pipeline.RegionModelArrays.from_models([model], 100)

    body.set_body2world_pose(poses[0])
    camera.UpdateImage()  # frame 0
    modality.silhouette_renderer_ptr.StartRendering()
    assert modality.StartModality(0, 0)
    state = pipeline.initialize_histograms(
        pcfg, intr_t, jnp.asarray(frames[0])[None], arrays,
        jnp.asarray(poses[0])[None])

    for i in range(1, len(frames)):
        camera.UpdateImage()  # frame i
        # Host texture correspondences at the current estimate.
        body.set_body2world_pose(np.asarray(state.body2camera_pose[0]))
        assert modality.CalculateCorrespondences(i, 0)
        tp = pipeline.texture_points_from_modalities([modality], k_max=256)
        state = pipeline.tracking_cycle(
            pcfg, intr_t, jnp.asarray(frames[i])[None], arrays, state,
            texture_points=tp)
        body.set_body2world_pose(np.asarray(state.body2camera_pose[0]))
        modality.silhouette_renderer_ptr.StartRendering()
        assert modality.CalculateResults(i)

    err = np.linalg.norm(
        np.asarray(state.body2camera_pose[0])[:3, 3] - poses[-1][:3, 3])
    assert err < 0.005, f"ICG+ fused error {err * 1000:.2f} mm"
