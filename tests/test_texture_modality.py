"""Texture modality test: keyframe reconstruction + ORB matching on a textured body."""

import numpy as np
import pytest

from m3t_tpu.detector import StaticDetector
from m3t_tpu.link import Link
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.renderer import FocusedSilhouetteRenderer, IDType
from m3t_tpu.renderer_geometry import RendererGeometry
from m3t_tpu.texture_modality import TextureModality
from m3t_tpu.tracker import Tracker
from tests import fixtures


def _render_textured_frame(body, intr, pose, face_colors, bg=(30, 30, 30), rng=None):
    """Each mesh face gets its own color -> plenty of ORB corners."""
    from m3t_tpu.ops.raster import rasterize_np

    tri = body.triangle_vertices_f_body()
    tri_cam = tri @ pose[:3, :3].T + pose[:3, 3]
    ids = np.arange(1, len(tri) + 1)
    _, id_img = rasterize_np(
        tri_cam, ids, intr.fu, intr.fv, intr.ppu, intr.ppv, intr.width, intr.height,
        cull_backfaces=True)
    image = np.empty((intr.height, intr.width, 3), np.uint8)
    image[:] = np.asarray(bg, np.uint8)
    covered = id_img > 0
    image[covered] = face_colors[id_img[covered] - 1]
    if rng is not None:
        image = np.clip(image.astype(np.int16) + rng.integers(-5, 6, image.shape),
                        0, 255).astype(np.uint8)
    return image


@pytest.mark.slow
def test_texture_tracking(tmp_path):
    from m3t_tpu.camera import ImageColorCamera

    body = fixtures.sphere_body("tex_sphere", radius=0.08, n_subdiv=2)
    intr = fixtures.test_intrinsics(320, 240)
    rng = np.random.default_rng(2)
    face_colors = rng.integers(40, 255, size=(len(body.triangles), 3)).astype(np.uint8)

    poses = []
    for i in range(4):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.0015 * i
        pose[1, 3] = 0.001 * i
        pose[2, 3] = 0.5
        poses.append(pose)
    frames = [_render_textured_frame(body, intr, p, face_colors, rng=rng)
              for p in poses]
    camera = ImageColorCamera("cam", intr, frames)
    assert camera.SetUp()

    rg = RendererGeometry("rg")
    rg.AddBody(body)
    silhouette_renderer = FocusedSilhouetteRenderer(
        "sil", rg, camera, image_size=200, id_type=IDType.BODY)
    silhouette_renderer.AddReferencedBody(body)

    modality = TextureModality("texture", body, camera, silhouette_renderer)
    modality.orb_n_features = 500

    link = Link("link", body)
    link.AddModality(modality)
    optimizer = Optimizer("opt", link, tikhonov_parameter_rotation=1000.0,
                          tikhonov_parameter_translation=30000.0)
    detector = StaticDetector("det", optimizer, link2world_pose=poses[0])
    tracker = Tracker("tracker", n_corr_iterations=4, n_update_iterations=2)
    tracker.AddOptimizer(optimizer)
    tracker.AddDetector(detector)
    assert tracker.SetUp()

    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(frames))

    # Keyframe reconstruction produced 3D points on the sphere surface.
    assert len(modality._points_keyframes)
    pts = modality._points_keyframes[-1]
    assert len(pts) > 10, "expected reconstructed keyframe points"
    radii = np.linalg.norm(pts, axis=1)
    assert np.all(radii < 0.085)

    err = np.linalg.norm(body.body2world_pose[:3, 3] - poses[-1][:3, 3])
    assert err < 0.004, f"texture tracking error {err}"
