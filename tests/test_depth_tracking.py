"""Depth modality unit + ICG-style region+depth fusion end-to-end tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu.depth_modality import DepthModality
from m3t_tpu.depth_model import DepthModel
from m3t_tpu.detector import StaticDetector
from m3t_tpu.link import Link
from m3t_tpu.ops import depth_fn
from m3t_tpu.ops.depth_fn import DepthConfig, DepthViewPoints
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.tracker import Tracker
from tests import fixtures


def test_depth_correspondence_finds_plane():
    """Points on a synthetic plane at 1 m; shifted model points must find the plane."""
    width, height = 64, 48
    fu = fv = 100.0
    ppu, ppv = 31.5, 23.5
    depth_scale = 0.001
    depth_image = np.full((height, width), int(1.0 / depth_scale), np.uint16)

    P = 8
    xs = np.linspace(-0.1, 0.1, P)
    centers = np.stack([xs, np.zeros(P), np.full(P, 0.98)], 1).astype(np.float32)
    normals = np.tile(np.array([0, 0, -1.0], np.float32), (P, 1))
    points = DepthViewPoints(jnp.asarray(centers), jnp.asarray(normals),
                             jnp.zeros(P), jnp.zeros(P))
    cfg = DepthConfig(n_points_max=P)
    out = depth_fn.calculate_correspondences(
        cfg, 0.05, points, jnp.int32(P), jnp.eye(4), jnp.asarray(depth_image),
        fu, fv, ppu, ppv, width, height, jnp.float32(depth_scale),
        jnp.asarray(False),
    )
    dp = jax.tree_util.tree_map(np.asarray, out)
    assert dp.valid.all()
    # Correspondences lie on the plane z=1.
    np.testing.assert_allclose(dp.correspondence_center_f_camera[:, 2], 1.0, rtol=1e-5)
    # Gradient pulls the model points toward the plane (translation +z).
    g, H = depth_fn.calculate_gradient_and_hessian(out, jnp.eye(4), 0.05)
    g = np.asarray(g)
    assert g[5] > 0.0, f"z-gradient should push toward plane, got {g}"
    theta = np.linalg.solve(-np.asarray(H) + np.eye(6), g)
    assert 0.01 < theta[5] < 0.03, f"z-correction {theta[5]} should be ~0.02"


@pytest.fixture(scope="module")
def icg_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("icg")
    body = fixtures.sphere_body("icg_sphere", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(160, 120)
    poses = []
    for i in range(5):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.002 * i
        pose[1, 3] = -0.001 * i
        pose[2, 3] = 0.6 + 0.001 * i
        poses.append(pose)
    rng = np.random.default_rng(5)
    color_camera = fixtures.make_color_camera(body, poses, intr, noise_rng=rng)
    depth_camera = fixtures.make_depth_camera(body, poses, intr)

    region_model = RegionModel("icg_region_model", body, str(tmp / "r.npz"),
                               n_divides=1, n_points=120, image_size=200)
    depth_model = DepthModel("icg_depth_model", body, str(tmp / "d.npz"),
                             n_divides=1, n_points=120, image_size=200)

    region_modality = RegionModality("icg_region", body, color_camera, region_model)
    region_modality.n_lines_max = 120
    region_modality.scales = [2, 1]
    region_modality.standard_deviations = [5.0, 1.5]

    depth_modality = DepthModality("icg_depth", body, depth_camera, depth_model)
    depth_modality.n_points_max = 120
    depth_modality.considered_distances = [0.05, 0.02, 0.01]

    link = Link("icg_link", body)
    link.AddModality(region_modality)
    link.AddModality(depth_modality)
    optimizer = Optimizer("icg_optimizer", link)
    detector = StaticDetector("icg_detector", optimizer, link2world_pose=poses[0])

    tracker = Tracker("icg_tracker", n_corr_iterations=4, n_update_iterations=2)
    tracker.AddOptimizer(optimizer)
    tracker.AddDetector(detector)
    assert tracker.SetUp()
    return {"body": body, "poses": poses, "tracker": tracker,
            "color_camera": color_camera, "depth_camera": depth_camera,
            "depth_model": depth_model}


def test_depth_model_generation(icg_setup):
    m = icg_setup["depth_model"]
    assert m.set_up
    assert m.orientations.shape[0] == 42
    radii = np.linalg.norm(m.centers.reshape(-1, 3), axis=1)
    assert np.all(radii < 0.065)
    assert np.median(radii) > 0.04
    # Surface normals point outward (positive dot with position on a sphere).
    dots = np.sum(m.centers * m.normals, axis=-1).reshape(-1)
    assert (dots > 0).mean() > 0.95
    assert m.max_surface_area > 0


def test_icg_fusion_tracks(icg_setup):
    tracker = icg_setup["tracker"]
    body = icg_setup["body"]
    poses = icg_setup["poses"]
    icg_setup["color_camera"].frame_index = 0
    icg_setup["depth_camera"].frame_index = 0

    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(poses))
    err_t = np.linalg.norm(body.body2world_pose[:3, 3] - poses[-1][:3, 3])
    # Depth fusion pins down z much better than region alone.
    assert err_t < 0.003, f"translation error {err_t}"
