"""Fused-backed serve mode (m3t_tpu/fused_serve.py).

The reference's whole point is the real-time serve loop (tracker.h:82-83); with
``use_fused_cycle=True`` the Tracker executes ExecuteTrackingStep + CalculateResults
through pipeline.tracking_cycle* when the object graph is expressible, with the host
per-modality loop as fallback and parity reference.
"""

import numpy as np
import pytest

from m3t_tpu.camera import ImageColorCamera, ImageDepthCamera
from m3t_tpu.depth_modality import DepthModality
from m3t_tpu.depth_model import DepthModel
from m3t_tpu.detector import StaticDetector
from m3t_tpu.link import Link
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.tracker import Tracker
from tests import fixtures


def _make_sequence(body, intr, n_frames=4, with_depth=False):
    rng = np.random.default_rng(19)
    poses = []
    frames = []
    depth_frames = []
    for i in range(n_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.002 * i
        pose[1, 3] = -0.001 * i
        pose[2, 3] = 0.6
        poses.append(pose)
        frames.append(fixtures.render_synthetic_color_frame(body, intr, pose,
                                                            noise_rng=rng))
        if with_depth:
            depth_frames.append(fixtures.render_synthetic_depth_frame(
                body, intr, pose))
    return poses, frames, depth_frames


def _build_tracker(prefix, body, intr, frames, model, use_fused,
                   depth_frames=None, depth_model=None, measure_occlusions=False):
    camera = ImageColorCamera(f"{prefix}_cam", intr, frames)
    assert camera.SetUp()
    modality = RegionModality(f"{prefix}_rm", body, camera, model)
    modality.n_lines_max = 100
    modality.scales = [2, 1]
    modality.standard_deviations = [5.0, 1.5]
    link = Link(f"{prefix}_link", body)
    link.AddModality(modality)
    dcamera = None
    if depth_frames:
        dcamera = ImageDepthCamera(f"{prefix}_dcam", intr, depth_frames,
                                   depth_scale=0.001)
        assert dcamera.SetUp()
        dm = DepthModality(f"{prefix}_dm", body, dcamera, depth_model)
        dm.n_points_max = 64
        dm.considered_distances = [0.03, 0.02]
        dm.standard_deviations = [0.05, 0.03]
        if measure_occlusions:
            dm.MeasureOcclusions()
            modality.MeasureOcclusions(dcamera)
        link.AddModality(dm)
    optimizer = Optimizer(f"{prefix}_opt", link)
    init = np.eye(4, dtype=np.float32)
    init[2, 3] = 0.6
    init[0, 3] = 0.004
    detector = StaticDetector(f"{prefix}_det", optimizer, link2world_pose=init)
    tracker = Tracker(f"{prefix}_tracker", n_corr_iterations=4,
                      n_update_iterations=2, use_fused_cycle=use_fused)
    tracker.AddOptimizer(optimizer)
    tracker.AddDetector(detector)
    assert tracker.SetUp()
    return tracker, body


@pytest.mark.slow
def test_fused_serve_matches_host_path(tmp_path):
    """RunTrackerProcess with use_fused_cycle=True routes through the fused
    pipeline (backend present) and reproduces the host path's poses."""
    intr = fixtures.test_intrinsics(160, 120)
    body = fixtures.sphere_body("fs_ball", radius=0.06, n_subdiv=2)
    model = RegionModel("fs_model", body, str(tmp_path / "m.npz"), n_divides=1,
                        n_points=100, image_size=400)
    assert model.SetUp()
    poses, frames, _ = _make_sequence(body, intr)

    results = {}
    for fused in (False, True):
        tracker, tracked_body = _build_tracker(
            f"fs{int(fused)}", body, intr, frames, model, fused)
        assert tracker.RunTrackerProcess(execute_detection=True,
                                         start_tracking=True,
                                         max_iterations=len(frames))
        if fused:
            assert tracker._fused_backend is not None, "fused routing not used"
        else:
            assert tracker._fused_backend is None
        results[fused] = np.asarray(tracked_body.body2world_pose).copy()

    # Monocular region tracking of a sphere observes depth weakly: xy must be
    # tight, z only loosely.
    err_xy = np.linalg.norm(results[True][:2, 3] - poses[-1][:2, 3])
    assert err_xy < 0.004, f"fused serve xy error {err_xy}"
    assert abs(results[True][2, 3] - poses[-1][2, 3]) < 0.02
    d = np.linalg.norm(results[True][:3, 3] - results[False][:3, 3])
    assert d < 0.002, f"fused vs host serve: {d * 1000:.2f} mm"


@pytest.mark.slow
def test_fused_serve_rgbd_with_measured_occlusions(tmp_path):
    """RGB-D graph with measured occlusions both ways serves fused and matches
    the host path."""
    intr = fixtures.test_intrinsics(160, 120)
    body = fixtures.sphere_body("fsd_ball", radius=0.06, n_subdiv=2)
    model = RegionModel("fsd_model", body, str(tmp_path / "m.npz"), n_divides=1,
                        n_points=100, image_size=400)
    dmodel = DepthModel("fsd_dmodel", body, str(tmp_path / "dm.npz"),
                        n_divides=1, n_points=64, image_size=200)
    assert model.SetUp() and dmodel.SetUp()
    poses, frames, depth_frames = _make_sequence(body, intr, with_depth=True)

    results = {}
    for fused in (False, True):
        tracker, tracked_body = _build_tracker(
            f"fsd{int(fused)}", body, intr, frames, model, fused,
            depth_frames=depth_frames, depth_model=dmodel,
            measure_occlusions=True)
        assert tracker.RunTrackerProcess(execute_detection=True,
                                         start_tracking=True,
                                         max_iterations=len(frames))
        if fused:
            assert tracker._fused_backend is not None
        results[fused] = np.asarray(tracked_body.body2world_pose).copy()

    err_gt = np.linalg.norm(results[True][:3, 3] - poses[-1][:3, 3])
    assert err_gt < 0.004, f"fused rgbd serve GT error {err_gt}"
    d = np.linalg.norm(results[True][:3, 3] - results[False][:3, 3])
    assert d < 0.002, f"fused vs host rgbd serve: {d * 1000:.2f} mm"


def test_fused_serve_falls_back_on_kinematic_tree(tmp_path):
    """A 2-link structure is not expressible: the tracker must print a notice,
    keep the host path, and still track."""
    from m3t_tpu.common import np_pose

    intr = fixtures.test_intrinsics(160, 120)
    parent = fixtures.sphere_body("fsk_p", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("fsk_c", radius=0.04, n_subdiv=2)
    model_p = RegionModel("fsk_mp", parent, str(tmp_path / "p.npz"), n_divides=1,
                          n_points=64, image_size=200)
    model_c = RegionModel("fsk_mc", child, str(tmp_path / "c.npz"), n_divides=1,
                          n_points=64, image_size=200)
    assert model_p.SetUp() and model_c.SetUp()

    root = np_pose(translation=[-0.03, 0.0, 0.6])
    b2j = np_pose(translation=[0.1, 0.0, 0.0])
    child_pose = root @ b2j
    frames = [fixtures.render_synthetic_color_frame(parent, intr, root)
              for _ in range(2)]
    camera = ImageColorCamera("fsk_cam", intr, frames)
    assert camera.SetUp()

    link_p = Link("fsk_lp", parent)
    mp = RegionModality("fsk_rmp", parent, camera, model_p)
    link_p.AddModality(mp)
    link_c = Link("fsk_lc", child, body2joint_pose=b2j,
                  free_directions=[False, False, True, False, False, False])
    mc = RegionModality("fsk_rmc", child, camera, model_c)
    link_c.AddModality(mc)
    link_p.AddChildLink(link_c)
    opt = Optimizer("fsk_opt", link_p)
    det = StaticDetector("fsk_det", opt, link2world_pose=root)
    tracker = Tracker("fsk_tracker", use_fused_cycle=True)
    tracker.AddOptimizer(opt)
    tracker.AddDetector(det)
    assert tracker.SetUp()
    assert tracker.RunTrackerProcess(execute_detection=True,
                                     start_tracking=True, max_iterations=2)
    assert tracker._fused_backend is None
    assert np.isfinite(parent.body2world_pose).all()
    del child_pose  # geometry sanity only


def test_fused_serve_falls_back_on_offset_depth_camera(tmp_path):
    """A depth camera with extrinsics differing from the color camera (the
    published OPT layout) must fall back to the host path: the fused RGB-D cycle
    evaluates depth terms in the color camera's frame."""
    from m3t_tpu.common import np_pose

    intr = fixtures.test_intrinsics(160, 120)
    body = fixtures.sphere_body("fso_ball", radius=0.06, n_subdiv=2)
    model = RegionModel("fso_model", body, str(tmp_path / "m.npz"), n_divides=1,
                        n_points=64, image_size=200)
    dmodel = DepthModel("fso_dmodel", body, str(tmp_path / "dm.npz"),
                        n_divides=1, n_points=64, image_size=200)
    assert model.SetUp() and dmodel.SetUp()
    poses, frames, depth_frames = _make_sequence(body, intr, n_frames=2,
                                                 with_depth=True)
    tracker, _ = _build_tracker("fso", body, intr, frames, model, True,
                                depth_frames=depth_frames, depth_model=dmodel)
    dcam = next(c for c in tracker.camera_ptrs
                if isinstance(c, ImageDepthCamera))
    dcam.set_world2camera_pose(np_pose(translation=[-0.0525, 0.0, 0.0]))
    assert tracker.RunTrackerProcess(execute_detection=True,
                                     start_tracking=True, max_iterations=2)
    assert tracker._fused_backend is None


def test_fused_serve_backend_rebuilds_when_tracking_set_changes(tmp_path):
    """The cached backend is keyed on the tracking optimizer set: StopTracking /
    StartTracking transitions must rebuild it for the new set."""
    intr = fixtures.test_intrinsics(160, 120)
    body_a = fixtures.sphere_body("fsc_a", radius=0.06, n_subdiv=2)
    body_b = fixtures.sphere_body("fsc_b", radius=0.05, n_subdiv=2)
    model_a = RegionModel("fsc_ma", body_a, str(tmp_path / "a.npz"), n_divides=1,
                          n_points=64, image_size=200)
    model_b = RegionModel("fsc_mb", body_b, str(tmp_path / "b.npz"), n_divides=1,
                          n_points=64, image_size=200)
    assert model_a.SetUp() and model_b.SetUp()
    _, frames, _ = _make_sequence(body_a, intr, n_frames=6)
    camera = ImageColorCamera("fsc_cam", intr, frames)
    assert camera.SetUp()

    def make_opt(prefix, body, model):
        m = RegionModality(f"{prefix}_rm", body, camera, model)
        m.n_lines_max = 64
        m.scales = [2, 1]
        m.standard_deviations = [5.0, 1.5]
        link = Link(f"{prefix}_link", body)
        link.AddModality(m)
        opt = Optimizer(f"{prefix}_opt", link)
        init = np.eye(4, dtype=np.float32)
        init[2, 3] = 0.6
        det = StaticDetector(f"{prefix}_det", opt, link2world_pose=init)
        return opt, det

    opt_a, det_a = make_opt("fsc_a", body_a, model_a)
    opt_b, det_b = make_opt("fsc_b", body_b, model_b)
    tracker = Tracker("fsc_tracker", n_corr_iterations=2,
                      n_update_iterations=1, use_fused_cycle=True)
    tracker.AddOptimizer(opt_a)
    tracker.AddOptimizer(opt_b)
    tracker.AddDetector(det_a)
    tracker.AddDetector(det_b)
    assert tracker.SetUp()

    # Track only A first.
    tracker.ExecuteDetection(start_tracking=True,
                             names_detecting={opt_a.name},
                             names_starting={opt_a.name})
    assert tracker.UpdateCameras(0)
    assert tracker.ExecuteDetectingStep(0)
    assert tracker.ExecuteStartingStep(0)
    assert tracker.ExecuteTrackingStep(0)
    backend_a = tracker._fused_backend
    assert backend_a is not None
    assert len(backend_a.optimizers) == 1

    # Add B: the backend must rebuild for the two-optimizer set.
    tracker.ExecuteDetection(start_tracking=True,
                             names_detecting={opt_b.name},
                             names_starting={opt_b.name})
    assert tracker.UpdateCameras(1)
    assert tracker.ExecuteDetectingStep(1)
    assert tracker.ExecuteStartingStep(1)
    assert tracker.ExecuteTrackingStep(1)
    backend_ab = tracker._fused_backend
    assert backend_ab is not None and backend_ab is not backend_a
    assert len(backend_ab.optimizers) == 2

    # Stop B again: rebuild back to one optimizer.
    tracker.StopTracking({opt_b.name})
    assert tracker.UpdateCameras(2)
    assert tracker.ExecuteTrackingStep(2)
    assert tracker._fused_backend is not None
    assert len(tracker._fused_backend.optimizers) == 1
    assert np.isfinite(body_a.body2world_pose).all()
    assert np.isfinite(body_b.body2world_pose).all()
