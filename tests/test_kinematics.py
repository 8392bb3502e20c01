"""Kinematic tree tests: multi-body tracking, constraint convergence, soft constraints.

The constraint-convergence test mirrors the reference's constraint_convergence experiment
(M3T/examples/constraint_convergence.cpp): misaligned links pulled together purely by
constraint residuals through the KKT system.
"""

import numpy as np
import pytest

from m3t_tpu.body import Body
from m3t_tpu.common import np_pose
from m3t_tpu.constraint import Constraint
from m3t_tpu.detector import StaticDetector
from m3t_tpu.link import Link, np_pose_variation
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.soft_constraint import SoftConstraint
from m3t_tpu.tracker import Tracker
from tests import fixtures


def _make_link(name, pose=None, free=None):
    link = Link(name, free_directions=free or [True] * 6)
    if pose is not None:
        link.set_link2world_pose(pose)
    assert link.SetUp()
    return link


def test_constraint_convergence():
    # Initial placement goes through joint2parent poses: child link2world poses are
    # recomputed from the tree on every UpdatePoses (link.cpp:232-233).
    pert = np_pose_variation(np.array([0.1, -0.15, 0.08, 0.02, -0.01, 0.03], np.float32))
    link1 = Link("l1", joint2parent_pose=np_pose(translation=[0, 0, 0.5]))
    link2 = Link("l2", joint2parent_pose=np_pose(translation=[0, 0, 0.5]) @ pert)
    assert link1.SetUp() and link2.SetUp()
    root = Link("root", free_directions=[False] * 6)
    root.AddChildLink(link1)
    root.AddChildLink(link2)
    assert root.SetUp()

    constraint = Constraint("c", link1, link2)
    assert constraint.SetUp()
    optimizer = Optimizer("o", root, tikhonov_parameter_rotation=10.0,
                          tikhonov_parameter_translation=100.0)
    optimizer.AddConstraint(constraint)
    assert optimizer.SetUp()

    for _ in range(20):
        assert optimizer.CalculateOptimization(0, 0, 0)
    rel = np.linalg.inv(link1.link2world_pose.astype(np.float64)) \
        @ link2.link2world_pose.astype(np.float64)
    assert np.linalg.norm(rel[:3, 3]) < 1e-4, f"translation residual {rel[:3, 3]}"
    np.testing.assert_allclose(rel[:3, :3], np.eye(3), atol=1e-4)


def test_soft_constraint_limits_deviation():
    link1 = Link("l1", joint2parent_pose=np_pose(translation=[0, 0, 0.5]))
    link2 = Link("l2", joint2parent_pose=np_pose(translation=[0.05, 0, 0.5]))
    assert link1.SetUp() and link2.SetUp()
    root = Link("root", free_directions=[False] * 6)
    root.AddChildLink(link1)
    root.AddChildLink(link2)
    assert root.SetUp()

    # Penalty strength comparable to Tikhonov damping: each link receives the full
    # correction (soft constraints add no cross-terms between links, mirroring
    # soft_constraint.cpp:113-131), so the undamped relative step would be 2x.
    soft = SoftConstraint("sc", link1, link2, max_distance_translation=0.01,
                          standard_deviation_translation=0.01,
                          constraint_directions=[False, False, False, True, True, True])
    assert soft.SetUp()
    optimizer = Optimizer("o", root, tikhonov_parameter_rotation=10.0,
                          tikhonov_parameter_translation=1e4)
    optimizer.AddSoftConstraint(soft)
    assert optimizer.SetUp()

    for _ in range(30):
        assert optimizer.CalculateOptimization(0, 0, 0)
    rel = np.linalg.inv(link1.link2world_pose.astype(np.float64)) \
        @ link2.link2world_pose.astype(np.float64)
    dist = np.linalg.norm(rel[:3, 3])
    assert dist < 0.012, f"soft constraint distance {dist} should shrink to ~max 0.01"
    assert dist > 0.005, "soft constraint should not collapse below max_distance"


def _render_two_body_frame(bodies, poses, intr, rng=None):
    from m3t_tpu.ops.raster import rasterize_np

    verts = []
    ids = []
    for i, (body, pose) in enumerate(zip(bodies, poses)):
        tri = body.triangle_vertices_f_body()
        verts.append(tri @ pose[:3, :3].T + pose[:3, 3])
        ids.append(np.full(len(tri), i + 1))
    _, id_img = rasterize_np(
        np.concatenate(verts), np.concatenate(ids), intr.fu, intr.fv, intr.ppu,
        intr.ppv, intr.width, intr.height, cull_backfaces=True)
    colors = [np.array([40, 120, 190]), np.array([170, 60, 40]),
              np.array([60, 170, 60])]
    image = np.empty((intr.height, intr.width, 3), np.uint8)
    image[:] = colors[0]
    for i in range(len(bodies)):
        image[id_img == i + 1] = colors[i + 1]
    if rng is not None:
        image = np.clip(image.astype(np.int16)
                        + rng.integers(-6, 7, image.shape), 0, 255).astype(np.uint8)
    return image


@pytest.mark.slow
def test_two_body_articulated_tracking(tmp_path):
    """Root sphere + child sphere on a 1-DoF revolute joint: track the joint angle."""
    from m3t_tpu.camera import ImageColorCamera

    parent = fixtures.sphere_body("parent_sphere", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("child_sphere", radius=0.04, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)

    arm = 0.13  # child body sits 13 cm from the joint along +x of the joint frame
    # body2joint maps body coords to joint coords; the child body origin sits at
    # (+arm, 0, 0) in the joint frame (link2world = parent @ joint2parent @ body2joint).
    body2joint_child = np_pose(translation=[arm, 0.0, 0.0])

    def child_pose(root_pose, angle):
        joint_rot = np_pose_variation(np.array([0, 0, angle, 0, 0, 0], np.float32))
        return root_pose @ joint_rot @ body2joint_child

    root_gt = np_pose(translation=[-0.05, 0.0, 0.7])
    angles = [0.0, 0.04, 0.08, 0.12, 0.16]
    rng = np.random.default_rng(11)
    frames = [
        _render_two_body_frame(
            [parent, child], [root_gt, child_pose(root_gt, a)], intr, rng)
        for a in angles
    ]
    camera = ImageColorCamera("cam", intr, frames)
    assert camera.SetUp()

    model_p = RegionModel("model_p", parent, str(tmp_path / "p.npz"), n_divides=1,
                          n_points=100, image_size=400)
    model_c = RegionModel("model_c", child, str(tmp_path / "c.npz"), n_divides=1,
                          n_points=100, image_size=400)

    mod_p = RegionModality("mod_p", parent, camera, model_p)
    mod_c = RegionModality("mod_c", child, camera, model_c)
    for m in (mod_p, mod_c):
        m.n_lines_max = 100
        m.scales = [2, 1]
        m.standard_deviations = [5.0, 1.5]

    link_p = Link("link_p", parent)
    link_p.AddModality(mod_p)
    link_c = Link("link_c", child, body2joint_pose=body2joint_child,
                  free_directions=[False, False, True, False, False, False],
                  fixed_body2joint_pose=True)
    link_c.AddModality(mod_c)
    link_p.AddChildLink(link_c)

    optimizer = Optimizer("struct", link_p)
    detector = StaticDetector("det", optimizer, link2world_pose=root_gt)
    tracker = Tracker("tracker", n_corr_iterations=4, n_update_iterations=2)
    tracker.AddOptimizer(optimizer)
    tracker.AddDetector(detector)
    assert tracker.SetUp()
    assert optimizer.degrees_of_freedom == 7

    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(frames))

    final_child_gt = child_pose(root_gt, angles[-1])
    err_c = np.linalg.norm(child.body2world_pose[:3, 3] - final_child_gt[:3, 3])
    err_p = np.linalg.norm(parent.body2world_pose[:3, 3] - root_gt[:3, 3])
    assert err_p < 0.005, f"parent error {err_p}"
    assert err_c < 0.01, f"child error {err_c} (arm swing {arm * angles[-1]:.3f} m)"
