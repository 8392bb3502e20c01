"""Device kinematics (ops/kinematics.py) vs the host object-graph optimizer.

The fused path's adjoint-chained Jacobians, KKT assembly, and constraint math must
reproduce m3t_tpu/link.py + constraint.py + optimizer.py (themselves parity-tested
against the reference) on identical structures.
"""

import numpy as np

from m3t_tpu.common import np_pose
from m3t_tpu.constraint import Constraint
from m3t_tpu.link import Link, np_pose_variation
from m3t_tpu.ops import kinematics
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.soft_constraint import SoftConstraint

import jax
import jax.numpy as jnp


def _constraint_setup():
    pert = np_pose_variation(
        np.array([0.1, -0.15, 0.08, 0.02, -0.01, 0.03], np.float32))
    link1 = Link("kd_l1", joint2parent_pose=np_pose(translation=[0, 0, 0.5]))
    link2 = Link("kd_l2", joint2parent_pose=np_pose(translation=[0, 0, 0.5]) @ pert)
    assert link1.SetUp() and link2.SetUp()
    root = Link("kd_root", free_directions=[False] * 6)
    root.AddChildLink(link1)
    root.AddChildLink(link2)
    assert root.SetUp()
    constraint = Constraint("kd_c", link1, link2)
    assert constraint.SetUp()
    optimizer = Optimizer("kd_o", root, tikhonov_parameter_rotation=10.0,
                          tikhonov_parameter_translation=100.0)
    optimizer.AddConstraint(constraint)
    assert optimizer.SetUp()
    return optimizer


def test_constraint_newton_steps_match_host():
    """20 constraint-only Newton steps: device == host link poses at every step."""
    opt_host = _constraint_setup()
    opt_dev = _constraint_setup()

    model = kinematics.build_kinematic_model([opt_dev])
    jp = jnp.asarray(kinematics.initial_joint2parent([opt_dev]))
    zeros_g = jnp.zeros((1, model.parent.shape[1], 6), jnp.float32)
    zeros_h = jnp.zeros((1, model.parent.shape[1], 6, 6), jnp.float32)

    step = jax.jit(lambda jp: kinematics.update_structures(
        model, jp, zeros_g, zeros_h, 10.0, 100.0))

    for it in range(20):
        assert opt_host.CalculateOptimization(0, 0, it)
        jp = step(jp)
        b2c = kinematics.forward_kinematics(
            jax.tree_util.tree_map(lambda a: a[0], model), jp[0])
        for j, link in enumerate(opt_host.ReferencedLinks()):
            np.testing.assert_allclose(
                np.asarray(b2c[j]), link.link2world_pose, atol=2e-4,
                err_msg=f"iteration {it}, link {link.name}")

    rel = np.linalg.inv(np.asarray(b2c[1], np.float64)) @ np.asarray(b2c[2],
                                                                     np.float64)
    assert np.linalg.norm(rel[:3, 3]) < 1e-4
    np.testing.assert_allclose(rel[:3, :3], np.eye(3), atol=1e-4)


def _soft_setup():
    link1 = Link("kds_l1", joint2parent_pose=np_pose(translation=[0, 0, 0.5]))
    link2 = Link("kds_l2", joint2parent_pose=np_pose(translation=[0.05, 0, 0.5]))
    assert link1.SetUp() and link2.SetUp()
    root = Link("kds_root", free_directions=[False] * 6)
    root.AddChildLink(link1)
    root.AddChildLink(link2)
    assert root.SetUp()
    soft = SoftConstraint(
        "kds_sc", link1, link2, max_distance_translation=0.01,
        standard_deviation_translation=0.01,
        constraint_directions=[False, False, False, True, True, True])
    assert soft.SetUp()
    optimizer = Optimizer("kds_o", root, tikhonov_parameter_rotation=10.0,
                          tikhonov_parameter_translation=1e4)
    optimizer.AddSoftConstraint(soft)
    assert optimizer.SetUp()
    return optimizer


def test_soft_constraint_steps_match_host():
    opt_host = _soft_setup()
    opt_dev = _soft_setup()

    model = kinematics.build_kinematic_model([opt_dev])
    jp = jnp.asarray(kinematics.initial_joint2parent([opt_dev]))
    zeros_g = jnp.zeros((1, model.parent.shape[1], 6), jnp.float32)
    zeros_h = jnp.zeros((1, model.parent.shape[1], 6, 6), jnp.float32)

    step = jax.jit(lambda jp: kinematics.update_structures(
        model, jp, zeros_g, zeros_h, 10.0, 1e4))

    for it in range(30):
        assert opt_host.CalculateOptimization(0, 0, it)
        jp = step(jp)

    b2c = kinematics.forward_kinematics(
        jax.tree_util.tree_map(lambda a: a[0], model), jp[0])
    for j, link in enumerate(opt_host.ReferencedLinks()):
        np.testing.assert_allclose(np.asarray(b2c[j]), link.link2world_pose,
                                   atol=5e-4, err_msg=f"link {link.name}")
    rel = np.linalg.inv(np.asarray(b2c[1], np.float64)) @ np.asarray(b2c[2],
                                                                     np.float64)
    dist = np.linalg.norm(rel[:3, 3])
    assert 0.005 < dist < 0.012, dist


def test_jacobians_match_host_chain():
    """Adjoint-chained Jacobians on a 3-deep revolute chain match link.py."""
    rng = np.random.default_rng(2)
    links = []
    prev = None
    for i in range(3):
        pert = np_pose_variation(rng.normal(0, 0.1, 6).astype(np.float32))
        link = Link(
            f"kdj_{i}",
            body2joint_pose=np_pose(translation=rng.normal(0, 0.1, 3)) @ pert,
            joint2parent_pose=np_pose(translation=[0.02 * i, 0, 0.4]),
            free_directions=([True] * 6 if i == 0
                             else [False, False, True, False, False, False]))
        assert link.SetUp()
        if prev is not None:
            prev.AddChildLink(link)
            assert prev.SetUp()
        links.append(link)
        prev = link
    opt = Optimizer("kdj_o", links[0])
    assert opt.SetUp()

    # Host Jacobians: walk tree like Optimizer.CalculateDataLinks does.
    def walk(link, parent):
        assert link.CalculateJacobian(parent)
        for child in link.child_link_ptrs:
            walk(child, link)

    walk(links[0], None)

    model = kinematics.build_kinematic_model([opt])
    jp = jnp.asarray(kinematics.initial_joint2parent([opt]))
    m0 = jax.tree_util.tree_map(lambda a: a[0], model)
    jac_dev = np.asarray(kinematics.link_jacobians(m0, jp[0]))  # (NL, 6, NL*6)

    # The host packs free directions into dof columns; expand to the full-width
    # layout for comparison.
    dof_cols = []
    for j, link in enumerate(links):
        for d in range(6):
            if link.free_directions[d]:
                dof_cols.append(j * 6 + d)
    for j, link in enumerate(links):
        expanded = np.zeros((6, len(links) * 6), np.float32)
        expanded[:, dof_cols] = link.jacobian
        np.testing.assert_allclose(jac_dev[j], expanded, atol=1e-5,
                                   err_msg=f"link {j}")
