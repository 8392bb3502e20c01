"""Per-modality visualization: correspondence lines / points / posterior overlays
are rendered and saved (region_modality.cpp:1660-1805 — the reference's de-facto
debugging observability)."""

import os

import numpy as np

from m3t_tpu.camera import ImageColorCamera, ImageDepthCamera
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from tests import fixtures


def test_region_modality_visualizations(tmp_path):
    body = fixtures.sphere_body("viz_body", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = 0.6
    frame = fixtures.render_synthetic_color_frame(
        body, intr, gt, noise_rng=np.random.default_rng(1))
    camera = ImageColorCamera("viz_cam", intr, [frame] * 2)
    assert camera.SetUp()
    camera.UpdateImage()
    body.set_body2world_pose(gt)

    model = RegionModel("viz_model", body, str(tmp_path / "m.npz"), n_divides=1,
                        n_points=100, image_size=200)
    assert model.SetUp()
    modality = RegionModality("viz_rm", body, camera, model)
    modality.n_lines_max = 100
    modality.scales = [2]
    modality.standard_deviations = [5.0]
    modality.save_visualizations = True
    modality.save_directory = str(tmp_path / "viz")
    modality.visualize_lines_correspondence = True
    modality.visualize_points_correspondence = True
    modality.visualize_points_histogram_image_correspondence = True
    modality.visualize_points_optimization = True
    modality.visualize_points_result = True
    assert modality.SetUp()
    assert modality.StartModality(0, 0)
    assert modality.CalculateCorrespondences(0, 0)
    assert modality.VisualizeCorrespondences(7)
    assert modality.CalculateGradientAndHessian(0, 0, 0)
    assert modality.VisualizeOptimization(7)
    assert modality.CalculateResults(0)
    assert modality.VisualizeResults(7)

    saved = sorted(os.listdir(tmp_path / "viz"))
    expected = ["viz_rm_color_image_correspondence_7.png",
                "viz_rm_color_image_optimization_7.png",
                "viz_rm_color_image_result_7.png",
                "viz_rm_histogram_image_correspondence_7.png",
                "viz_rm_lines_correspondence_7.png"]
    assert saved == expected, saved

    import cv2

    lines_img = cv2.imread(str(tmp_path / "viz" / expected[4])).astype(np.int16)
    points_img = cv2.imread(str(tmp_path / "viz" / expected[0]))
    # The line overlay painted strongly-colored correspondence-line pixels
    # (blends of the line/high-probability colors) onto the grayscale posterior
    # image.
    chroma = lines_img.max(-1) - lines_img.min(-1)
    assert (chroma > 60).sum() > 200, (chroma > 60).sum()
    # The point overlay marked centers on the camera image.
    assert (points_img == np.array([24, 184, 234])).all(-1).sum() > 30
    # The posterior image separates fg (dark) from bg (bright) after histogram
    # initialization.
    hist_img = cv2.imread(str(tmp_path / "viz" / expected[3]))
    assert hist_img.mean() > 10


def test_depth_modality_visualizations(tmp_path):
    from m3t_tpu.depth_model import DepthModel
    from m3t_tpu.depth_modality import DepthModality

    body = fixtures.sphere_body("vizd_body", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = 0.6
    depth = fixtures.render_synthetic_depth_frame(body, intr, gt)
    camera = ImageDepthCamera("vizd_cam", intr, [depth] * 2, 0.001)
    assert camera.SetUp()
    camera.UpdateImage()
    body.set_body2world_pose(gt)

    model = DepthModel("vizd_model", body, str(tmp_path / "dm.npz"), n_divides=1,
                       n_points=100, image_size=200)
    assert model.SetUp()
    modality = DepthModality("vizd_dm", body, camera, model)
    modality.n_points_max = 100
    modality.save_visualizations = True
    modality.save_directory = str(tmp_path / "vizd")
    modality.visualize_correspondences_correspondence = True
    modality.visualize_points_result = True
    modality.visualization_max_depth = 2.0
    assert modality.SetUp()
    assert modality.StartModality(0, 0)
    assert modality.CalculateCorrespondences(0, 0)
    assert modality.VisualizeCorrespondences(3)
    assert modality.VisualizeResults(3)
    saved = sorted(os.listdir(tmp_path / "vizd"))
    assert saved == ["vizd_dm_correspondences_correspondence_3.png",
                     "vizd_dm_depth_image_result_3.png"], saved
