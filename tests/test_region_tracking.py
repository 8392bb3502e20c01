"""End-to-end single-body region tracking on a synthetic sequence.

Mirrors the reference integration test philosophy (TrackerTest::OptimizePoseMatrix,
test/tracker_test.cpp:164-179): run the full pipeline and check pose convergence.
"""

import numpy as np
import pytest

from m3t_tpu.color_histograms import ColorHistograms
from m3t_tpu.detector import StaticDetector
from m3t_tpu.link import Link
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.tracker import Tracker
from tests import fixtures


def _make_sequence(body, intr, n_frames=6, step=0.002):
    poses = []
    for i in range(n_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = step * i
        pose[1, 3] = -0.5 * step * i
        pose[2, 3] = 0.6 + 0.5 * step * i
        poses.append(pose)
    return poses


@pytest.fixture(scope="module")
def tracking_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("region_model")
    body = fixtures.sphere_body("tracked_sphere", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(160, 120)
    poses = _make_sequence(body, intr)
    camera = fixtures.make_color_camera(body, poses, intr,
                                        noise_rng=np.random.default_rng(3))

    model = RegionModel("sphere_region_model", body, str(tmp / "sphere.npz"),
                        sphere_radius=0.8, n_divides=1, n_points=120, image_size=200)

    modality = RegionModality("sphere_region_modality", body, camera, model)
    modality.n_lines_max = 120
    modality.scales = [2, 1]
    modality.standard_deviations = [5.0, 1.5]

    link = Link("sphere_link", body)
    link.AddModality(modality)
    optimizer = Optimizer("sphere_optimizer", link)

    detector = StaticDetector("sphere_detector", optimizer,
                              link2world_pose=poses[0])

    tracker = Tracker("tracker", n_corr_iterations=4, n_update_iterations=2)
    tracker.AddOptimizer(optimizer)
    tracker.AddDetector(detector)
    assert tracker.SetUp()
    return {"body": body, "camera": camera, "poses": poses, "tracker": tracker,
            "optimizer": optimizer, "modality": modality, "model": model}


def test_model_generation(tracking_setup):
    model = tracking_setup["model"]
    assert model.set_up
    assert model.orientations.shape[0] == 42  # n_divides=1 icosahedron
    assert model.centers.shape == (42, 120, 3)
    # Contour points lie near the sphere surface.
    radii = np.linalg.norm(model.centers.reshape(-1, 3), axis=1)
    assert np.all(radii < 0.075)
    assert np.median(radii) > 0.05
    # Normals are unit length and roughly perpendicular to view directions.
    norms = np.linalg.norm(model.normals.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert model.max_contour_length > 0


def test_closest_view_selection(tracking_setup):
    model = tracking_setup["model"]
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.6  # body straight ahead of camera
    idx = model.GetClosestViewIndex(pose)
    # Orientation should be the view whose camera direction matches +z in body frame.
    assert np.dot(model.orientations[idx], [0, 0, 1]) > 0.9


def test_tracking_follows_motion(tracking_setup):
    tracker = tracking_setup["tracker"]
    body = tracking_setup["body"]
    poses = tracking_setup["poses"]
    camera = tracking_setup["camera"]
    camera.frame_index = 0

    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(poses))

    final_gt = poses[-1]
    estimate = body.body2world_pose
    translation_error = np.linalg.norm(estimate[:3, 3] - final_gt[:3, 3])
    # Sphere translation is observable in x/y + scale; require a few-mm accuracy.
    assert translation_error < 0.005, f"translation error {translation_error}"
    # Rotation of a sphere is unobservable; just require orthonormality is intact.
    rot = estimate[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)


def test_tracking_recovers_from_offset(tracking_setup):
    """Perturb the pose and check the optimizer pulls it back within a frame or two."""
    tracker = tracking_setup["tracker"]
    body = tracking_setup["body"]
    camera = tracking_setup["camera"]
    poses = tracking_setup["poses"]
    camera.frame_index = 0

    # Re-detect at a perturbed pose: 4 mm off.
    perturbed = poses[0].copy()
    perturbed[0, 3] += 0.004
    perturbed[1, 3] -= 0.003
    detector = tracker.detector_ptrs[0]
    detector.link2world_pose = perturbed

    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=3)
    err = np.linalg.norm(body.body2world_pose[:3, 3] - poses[2][:3, 3])
    assert err < 0.004, f"error after recovery {err}"
