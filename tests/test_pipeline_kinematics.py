"""Kinematic trees through the fused TPU pipeline (tracking_cycle_kinematic).

The same two-body revolute-joint scene as tests/test_kinematics.py's object-graph
test, run through the batched device path: per-link region terms -> adjoint-chain
KKT solve -> DOF update, all inside one jit.  Matches the host Tracker's result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu import pipeline
from m3t_tpu.common import np_pose
from m3t_tpu.link import Link, np_pose_variation
from m3t_tpu.ops import kinematics as kin_ops
from m3t_tpu.ops.raster import rasterize_np
from m3t_tpu.ops.region_fn import RegionConfig
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_model import RegionModel
from tests import fixtures


def _render_frame(bodies, poses, intr, rng=None):
    verts, ids = [], []
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
def test_articulated_tracking_fused_path(tmp_path):
    """Root sphere + child on a 1-DoF revolute joint, tracked on device."""
    parent = fixtures.sphere_body("pk_parent", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("pk_child", radius=0.04, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)

    arm = 0.13
    body2joint_child = np_pose(translation=[arm, 0.0, 0.0])

    def child_pose(root_pose, angle):
        joint_rot = np_pose_variation(
            np.array([0, 0, angle, 0, 0, 0], np.float32))
        return root_pose @ joint_rot @ body2joint_child

    root_gt = np_pose(translation=[-0.05, 0.0, 0.7])
    angles = [0.0, 0.04, 0.08, 0.12, 0.16]
    rng = np.random.default_rng(11)
    frames = [
        _render_frame([parent, child], [root_gt, child_pose(root_gt, a)], intr, rng)
        for a in angles
    ]

    model_p = RegionModel("pk_model_p", parent, str(tmp_path / "p.npz"),
                          n_divides=1, n_points=100, image_size=400)
    model_c = RegionModel("pk_model_c", child, str(tmp_path / "c.npz"),
                          n_divides=1, n_points=100, image_size=400)
    assert model_p.SetUp() and model_c.SetUp()

    # Object graph for topology only (the fused path takes over the tracking).
    link_p = Link("pk_link_p", parent)
    link_c = Link("pk_link_c", child, body2joint_pose=body2joint_child,
                  free_directions=[False, False, True, False, False, False],
                  fixed_body2joint_pose=True)
    link_p.AddChildLink(link_c)
    assert link_c.SetUp() and link_p.SetUp()
    link_p.set_link2world_pose(root_gt)
    optimizer = Optimizer("pk_struct", link_p)
    assert optimizer.SetUp()
    assert optimizer.degrees_of_freedom == 7

    kin = kin_ops.build_kinematic_model([optimizer])
    jp0 = kin_ops.initial_joint2parent([optimizer])
    assert kin.parent.shape == (1, 2)

    cfg = RegionConfig(n_lines_max=100)
    pcfg = pipeline.PipelineConfig(cfg=cfg, scales=(2, 1),
                                   standard_deviations=(5.0, 1.5),
                                   n_corr_iterations=4, n_update_iterations=2)
    intr_t = (np.float32(intr.fu), np.float32(intr.fv),
              np.float32(intr.ppu), np.float32(intr.ppv))
    arrays = pipeline.RegionModelArrays.from_models([model_p, model_c], 100)

    state = pipeline.initialize_kinematic_histograms(
        pcfg, intr_t, jnp.asarray(frames[0])[None], arrays, kin, jp0[None][0])
    for image in frames[1:]:
        state = pipeline.tracking_cycle_kinematic(
            pcfg, intr_t, jnp.asarray(image)[None], arrays, kin, state)

    b2c = np.asarray(pipeline.kinematic_body_poses(kin, state))[0]
    final_child_gt = child_pose(root_gt, angles[-1])
    err_p = np.linalg.norm(b2c[0][:3, 3] - root_gt[:3, 3])
    err_c = np.linalg.norm(b2c[1][:3, 3] - final_child_gt[:3, 3])
    # Spheres leave the root pose weakly observable (gauge freedom); the
    # absolute-GT bound is loose, the fused-vs-host agreement below is tight.
    assert err_p < 0.01, f"parent error {err_p}"
    assert err_c < 0.015, f"child error {err_c}"

    # The joint constraint must hold exactly: the child pose decomposes as
    # root @ Rz(theta) @ body2joint (the 1-DoF parameterization is structural).
    rel = np.linalg.inv(b2c[0].astype(np.float64)) @ b2c[1].astype(np.float64)
    joint = rel @ np.linalg.inv(body2joint_child.astype(np.float64))
    assert abs(joint[2, 3]) < 1e-6 and abs(joint[0, 3]) < 1e-6

    # Equivalence with the host object-graph path (link.py/optimizer.py) on the
    # SAME frames: both paths implement the same algorithm, so the final link
    # poses must agree closely (the spheres make root orientation a gauge
    # freedom, so pose-vs-pose is the meaningful comparison, not joint angle
    # vs ground truth).
    from m3t_tpu.camera import ImageColorCamera
    from m3t_tpu.detector import StaticDetector
    from m3t_tpu.region_modality import RegionModality
    from m3t_tpu.tracker import Tracker

    camera = ImageColorCamera("pk_cam", intr, frames)
    assert camera.SetUp()
    mod_p = RegionModality("pk_mod_p", parent, camera, model_p)
    mod_c = RegionModality("pk_mod_c", child, camera, model_c)
    for m in (mod_p, mod_c):
        m.n_lines_max = 100
        m.scales = [2, 1]
        m.standard_deviations = [5.0, 1.5]
    h_link_p = Link("pk_h_link_p", parent)
    h_link_p.AddModality(mod_p)
    h_link_c = Link("pk_h_link_c", child, body2joint_pose=body2joint_child,
                    free_directions=[False, False, True, False, False, False])
    h_link_c.AddModality(mod_c)
    h_link_p.AddChildLink(h_link_c)
    h_opt = Optimizer("pk_h_struct", h_link_p)
    detector = StaticDetector("pk_det", h_opt, link2world_pose=root_gt)
    tracker = Tracker("pk_tracker", n_corr_iterations=4, n_update_iterations=2)
    tracker.AddOptimizer(h_opt)
    tracker.AddDetector(detector)
    assert tracker.SetUp()
    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(frames))

    for j, body in enumerate([parent, child]):
        d = np.linalg.norm(b2c[j][:3, 3] - body.body2world_pose[:3, 3])
        assert d < 0.004, f"fused vs host {body.name}: {d * 1000:.2f} mm"


@pytest.mark.slow
def test_articulated_batch_of_structures(tmp_path):
    """Two independent structures tracked in one kinematic cycle call."""
    parent = fixtures.sphere_body("pk2_parent", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("pk2_child", radius=0.04, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)
    arm = 0.13
    body2joint_child = np_pose(translation=[arm, 0.0, 0.0])

    def child_pose(root_pose, angle):
        joint_rot = np_pose_variation(
            np.array([0, 0, angle, 0, 0, 0], np.float32))
        return root_pose @ joint_rot @ body2joint_child

    model_p = RegionModel("pk2_model_p", parent, str(tmp_path / "p.npz"),
                          n_divides=1, n_points=100, image_size=400)
    model_c = RegionModel("pk2_model_c", child, str(tmp_path / "c.npz"),
                          n_divides=1, n_points=100, image_size=400)
    assert model_p.SetUp() and model_c.SetUp()

    roots = [np_pose(translation=[-0.05, 0.0, 0.7]),
             np_pose(translation=[-0.03, 0.01, 0.75])]
    angle_rates = [0.04, -0.03]
    rng = np.random.default_rng(3)
    frames = []  # (T, S) images
    for k in range(4):
        per_struct = []
        for s_idx in range(2):
            a = angle_rates[s_idx] * k
            per_struct.append(_render_frame(
                [parent, child], [roots[s_idx], child_pose(roots[s_idx], a)],
                intr, rng))
        frames.append(per_struct)

    optimizers = []
    for s_idx in range(2):
        link_p = Link(f"pk2_lp{s_idx}", parent)
        link_c = Link(f"pk2_lc{s_idx}", child, body2joint_pose=body2joint_child,
                      free_directions=[False, False, True, False, False, False])
        link_p.AddChildLink(link_c)
        assert link_c.SetUp() and link_p.SetUp()
        link_p.set_link2world_pose(roots[s_idx])
        opt = Optimizer(f"pk2_o{s_idx}", link_p)
        assert opt.SetUp()
        optimizers.append(opt)

    kin = kin_ops.build_kinematic_model(optimizers)
    jp0 = kin_ops.initial_joint2parent(optimizers)

    cfg = RegionConfig(n_lines_max=100)
    pcfg = pipeline.PipelineConfig(cfg=cfg, scales=(2, 1),
                                   standard_deviations=(5.0, 1.5),
                                   n_corr_iterations=4, n_update_iterations=2)
    intr_t = (np.float32(intr.fu), np.float32(intr.fv),
              np.float32(intr.ppu), np.float32(intr.ppv))
    # Link-major flatten: [s0_parent, s0_child, s1_parent, s1_child].
    arrays = pipeline.RegionModelArrays.from_models(
        [model_p, model_c, model_p, model_c], 100)

    state = pipeline.initialize_kinematic_histograms(
        pcfg, intr_t, jnp.asarray(np.stack(frames[0])), arrays, kin, jp0)
    for per_struct in frames:
        state = pipeline.tracking_cycle_kinematic(
            pcfg, intr_t, jnp.asarray(np.stack(per_struct)), arrays, kin, state)

    b2c = np.asarray(pipeline.kinematic_body_poses(kin, state))
    for s_idx in range(2):
        gt_c = child_pose(roots[s_idx], angle_rates[s_idx] * 3)
        err_p = np.linalg.norm(b2c[s_idx, 0][:3, 3] - roots[s_idx][:3, 3])
        err_c = np.linalg.norm(b2c[s_idx, 1][:3, 3] - gt_c[:3, 3])
        assert err_p < 0.012, f"structure {s_idx} parent error {err_p}"
        assert err_c < 0.015, f"structure {s_idx} child error {err_c}"


@pytest.mark.slow
def test_closed_chain_constraint_fused(tmp_path):
    """End-to-end closed-chain tracking through the fused kinematic cycle: the
    revolute joint is expressed as a 6-DoF child plus a hard Lagrange constraint
    leaving only z-rotation free (constraint.cpp residual/Jacobian inside the
    KKT solve, the configuration of examples/constraint_convergence.cpp), and
    the result matches the host object-graph tracker with the same constraint.
    """
    from m3t_tpu.camera import ImageColorCamera
    from m3t_tpu.constraint import Constraint
    from m3t_tpu.detector import StaticDetector
    from m3t_tpu.region_modality import RegionModality
    from m3t_tpu.tracker import Tracker

    parent = fixtures.sphere_body("cc_parent", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("cc_child", radius=0.04, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)
    arm = 0.13
    body2joint_child = np_pose(translation=[arm, 0.0, 0.0])

    def child_pose(root_pose, angle):
        joint_rot = np_pose_variation(
            np.array([0, 0, angle, 0, 0, 0], np.float32))
        return root_pose @ joint_rot @ body2joint_child

    root_gt = np_pose(translation=[-0.05, 0.0, 0.7])
    angles = [0.0, 0.04, 0.08, 0.12, 0.16]
    rng = np.random.default_rng(29)
    frames = [
        _render_frame([parent, child], [root_gt, child_pose(root_gt, a)], intr, rng)
        for a in angles
    ]

    model_p = RegionModel("cc_model_p", parent, str(tmp_path / "p.npz"),
                          n_divides=1, n_points=100, image_size=400)
    model_c = RegionModel("cc_model_c", child, str(tmp_path / "c.npz"),
                          n_divides=1, n_points=100, image_size=400)
    assert model_p.SetUp() and model_c.SetUp()

    def build_graph(prefix, camera=None):
        link_p = Link(f"{prefix}_link_p", parent)
        # 6-DoF child; the revolute behavior comes from the hard constraint.
        link_c = Link(f"{prefix}_link_c", child,
                      free_directions=[True] * 6,
                      joint2parent_pose=body2joint_child)
        if camera is not None:
            for link, body, model in ((link_p, parent, model_p),
                                      (link_c, child, model_c)):
                m = RegionModality(f"{prefix}_{body.name}_rm", body, camera,
                                   model)
                m.n_lines_max = 100
                m.scales = [2, 1]
                m.standard_deviations = [5.0, 1.5]
                link.AddModality(m)
        link_p.AddChildLink(link_c)
        link_p.set_link2world_pose(root_gt)
        constraint = Constraint(
            f"{prefix}_c", link_p, link_c,
            body22joint2_pose=body2joint_child,
            constraint_directions=[True, True, False, True, True, True])
        opt = Optimizer(f"{prefix}_struct", link_p)
        opt.AddConstraint(constraint)
        if camera is None:
            # Tracker.SetUp handles ordered setup in the host twin.
            assert link_c.SetUp() and link_p.SetUp()
            assert constraint.SetUp()
            assert opt.SetUp()
        return opt

    opt = build_graph("cc")
    kin = kin_ops.build_kinematic_model([opt])
    assert int(np.asarray(kin.c_valid).sum()) == 1
    jp0 = kin_ops.initial_joint2parent([opt])

    cfg = RegionConfig(n_lines_max=100)
    pcfg = pipeline.PipelineConfig(cfg=cfg, scales=(2, 1),
                                   standard_deviations=(5.0, 1.5),
                                   n_corr_iterations=4, n_update_iterations=2)
    intr_t = (np.float32(intr.fu), np.float32(intr.fv),
              np.float32(intr.ppu), np.float32(intr.ppv))
    arrays = pipeline.RegionModelArrays.from_models([model_p, model_c], 100)

    state = pipeline.initialize_kinematic_histograms(
        pcfg, intr_t, jnp.asarray(frames[0])[None], arrays, kin, jp0)
    for image in frames[1:]:
        state = pipeline.tracking_cycle_kinematic(
            pcfg, intr_t, jnp.asarray(image)[None], arrays, kin, state)

    b2c = np.asarray(pipeline.kinematic_body_poses(kin, state))[0]
    final_child_gt = child_pose(root_gt, angles[-1])
    assert np.linalg.norm(b2c[0][:3, 3] - root_gt[:3, 3]) < 0.01
    assert np.linalg.norm(b2c[1][:3, 3] - final_child_gt[:3, 3]) < 0.015

    # The hard constraint must hold: joint2-in-joint1 is a pure z-rotation.
    rel = np.linalg.inv(b2c[0].astype(np.float64)) @ b2c[1].astype(np.float64)
    joint = rel @ np.linalg.inv(body2joint_child.astype(np.float64))
    assert np.linalg.norm(joint[:3, 3]) < 2e-4, joint[:3, 3]
    from scipy.spatial.transform import Rotation
    rotvec = Rotation.from_matrix(joint[:3, :3]).as_rotvec()
    assert np.linalg.norm(rotvec[:2]) < 2e-3, rotvec

    # Host object-graph twin with the SAME constraint configuration.
    camera = ImageColorCamera("cc_cam", intr, frames)
    assert camera.SetUp()
    h_opt = build_graph("cc_h", camera)
    detector = StaticDetector("cc_det", h_opt, link2world_pose=root_gt)
    tracker = Tracker("cc_tracker", n_corr_iterations=4, n_update_iterations=2)
    tracker.AddOptimizer(h_opt)
    tracker.AddDetector(detector)
    assert tracker.SetUp()
    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(frames))
    for j, body in enumerate([parent, child]):
        d = np.linalg.norm(b2c[j][:3, 3] - body.body2world_pose[:3, 3])
        # Looser than the revolute-parameterization test: the 12-DoF + Lagrange
        # system leaves more gauge freedom for the two paths to drift within.
        assert d < 0.006, f"fused vs host {body.name}: {d * 1000:.2f} mm"


def _render_depth_frame(bodies, poses, intr, depth_scale=0.001):
    verts, ids = [], []
    for i, (body, pose) in enumerate(zip(bodies, poses)):
        tri = body.triangle_vertices_f_body()
        verts.append(tri @ pose[:3, :3].T + pose[:3, 3])
        ids.append(np.full(len(tri), i + 1))
    depth, _ = rasterize_np(
        np.concatenate(verts), np.concatenate(ids), intr.fu, intr.fv, intr.ppu,
        intr.ppv, intr.width, intr.height, cull_backfaces=True)
    d = np.where(np.isfinite(depth), depth / depth_scale, 0.0)
    return np.clip(d, 0, 65535).astype(np.uint16)


@pytest.mark.slow
def test_articulated_rgbd_fused(tmp_path):
    """Per-link region + depth fusion in the kinematic cycle (the Mb-ICG/RTB
    configuration, link.cpp:184-193) matches the host object-graph tracker with
    Region+Depth modalities on every link."""
    from m3t_tpu.depth_model import DepthModel

    parent = fixtures.sphere_body("krd_parent", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("krd_child", radius=0.04, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)
    depth_scale = 0.001
    arm = 0.13
    body2joint_child = np_pose(translation=[arm, 0.0, 0.0])

    def child_pose(root_pose, angle):
        joint_rot = np_pose_variation(
            np.array([0, 0, angle, 0, 0, 0], np.float32))
        return root_pose @ joint_rot @ body2joint_child

    root_gt = np_pose(translation=[-0.05, 0.0, 0.7])
    angles = [0.0, 0.04, 0.08, 0.12]
    rng = np.random.default_rng(17)
    color_frames = []
    depth_frames = []
    for a in angles:
        poses = [root_gt, child_pose(root_gt, a)]
        color_frames.append(_render_frame([parent, child], poses, intr, rng))
        depth_frames.append(_render_depth_frame([parent, child], poses, intr,
                                                depth_scale))

    model_p = RegionModel("krd_rm_p", parent, str(tmp_path / "rp.npz"),
                          n_divides=1, n_points=100, image_size=400)
    model_c = RegionModel("krd_rm_c", child, str(tmp_path / "rc.npz"),
                          n_divides=1, n_points=100, image_size=400)
    dmodel_p = DepthModel("krd_dm_p", parent, str(tmp_path / "dp.npz"),
                          n_divides=1, n_points=64, image_size=200)
    dmodel_c = DepthModel("krd_dm_c", child, str(tmp_path / "dc.npz"),
                          n_divides=1, n_points=64, image_size=200)
    assert model_p.SetUp() and model_c.SetUp()
    assert dmodel_p.SetUp() and dmodel_c.SetUp()

    link_p = Link("krd_lp", parent)
    link_c = Link("krd_lc", child, body2joint_pose=body2joint_child,
                  free_directions=[False, False, True, False, False, False])
    link_p.AddChildLink(link_c)
    assert link_c.SetUp() and link_p.SetUp()
    link_p.set_link2world_pose(root_gt)
    optimizer = Optimizer("krd_struct", link_p)
    assert optimizer.SetUp()

    kin = kin_ops.build_kinematic_model([optimizer])
    jp0 = kin_ops.initial_joint2parent([optimizer])

    cfg = RegionConfig(n_lines_max=100)
    pcfg = pipeline.PipelineConfig(
        cfg=cfg, scales=(2, 1), standard_deviations=(5.0, 1.5),
        n_corr_iterations=4, n_update_iterations=2, use_depth=True,
        considered_distances=(0.03, 0.02),
        depth_standard_deviations=(0.05, 0.03))
    pcfg = pcfg._replace(depth_cfg=pcfg.depth_cfg._replace(n_points_max=64))
    intr_t = (np.float32(intr.fu), np.float32(intr.fv),
              np.float32(intr.ppu), np.float32(intr.ppv))
    arrays = pipeline.RegionModelArrays.from_models([model_p, model_c], 100)
    darrays = pipeline.DepthModelArrays.from_models([dmodel_p, dmodel_c], 64)

    state = pipeline.initialize_kinematic_histograms(
        pcfg, intr_t, jnp.asarray(color_frames[0])[None], arrays, kin, jp0)
    for t in range(1, len(angles)):
        state = pipeline.tracking_cycle_kinematic(
            pcfg, intr_t, jnp.asarray(color_frames[t])[None], arrays, kin, state,
            depth_intr=intr_t, depth_scale=jnp.float32(depth_scale),
            depth_images=jnp.asarray(depth_frames[t])[None],
            depth_model=darrays)

    b2c = np.asarray(pipeline.kinematic_body_poses(kin, state))[0]
    final_child_gt = child_pose(root_gt, angles[-1])
    assert np.linalg.norm(b2c[0][:3, 3] - root_gt[:3, 3]) < 0.005
    assert np.linalg.norm(b2c[1][:3, 3] - final_child_gt[:3, 3]) < 0.01

    # Host object-graph twin: Region + Depth modality per link (rtb config).
    from m3t_tpu.camera import ImageColorCamera, ImageDepthCamera
    from m3t_tpu.depth_modality import DepthModality
    from m3t_tpu.detector import StaticDetector
    from m3t_tpu.region_modality import RegionModality
    from m3t_tpu.tracker import Tracker

    camera = ImageColorCamera("krd_cam", intr, color_frames)
    dcamera = ImageDepthCamera("krd_dcam", intr, depth_frames,
                               depth_scale=depth_scale)
    assert camera.SetUp() and dcamera.SetUp()

    def host_link(name, body, rmodel, dmodel, **kw):
        link = Link(name, body, **kw)
        rm = RegionModality(f"{name}_rm", body, camera, rmodel)
        rm.n_lines_max = 100
        rm.scales = [2, 1]
        rm.standard_deviations = [5.0, 1.5]
        dm = DepthModality(f"{name}_dm", body, dcamera, dmodel)
        dm.n_points_max = 64
        dm.considered_distances = [0.03, 0.02]
        dm.standard_deviations = [0.05, 0.03]
        link.AddModality(rm)
        link.AddModality(dm)
        return link

    h_link_p = host_link("krd_h_lp", parent, model_p, dmodel_p)
    h_link_c = host_link("krd_h_lc", child, model_c, dmodel_c,
                         body2joint_pose=body2joint_child,
                         free_directions=[False, False, True, False, False,
                                          False])
    h_link_p.AddChildLink(h_link_c)
    h_opt = Optimizer("krd_h_struct", h_link_p)
    detector = StaticDetector("krd_det", h_opt, link2world_pose=root_gt)
    tracker = Tracker("krd_tracker", n_corr_iterations=4, n_update_iterations=2)
    tracker.AddOptimizer(h_opt)
    tracker.AddDetector(detector)
    assert tracker.SetUp()
    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(angles))

    for j, body in enumerate([parent, child]):
        d = np.linalg.norm(b2c[j][:3, 3] - body.body2world_pose[:3, 3])
        assert d < 0.004, f"fused-rgbd vs host {body.name}: {d * 1000:.2f} mm"
