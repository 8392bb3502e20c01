"""Batched on-device kinematic trees for the fused TPU pipeline.

The object-graph path runs Link/Constraint/Optimizer per structure in host numpy
(m3t_tpu/link.py, optimizer.py) — fine for parity, far too slow to batch.  This module
is the TPU-native equivalent of m3t/src/link.cpp + constraint.cpp + soft_constraint.cpp
+ optimizer.cpp: fixed-topology structures become static-shape arrays (links padded to
NL, constraints to NC/NS), the adjoint-chained Jacobians and the (dof + c)^2 KKT system
are assembled with dense linear algebra, and a batch of S independent structures is
solved with one batched ``jnp.linalg.solve`` — so whole articulated scenes run inside
one jit alongside the region/depth kernels.

Parameterization: instead of packing free directions into a compacted dof vector
(optimizer.cpp:304-346 with per-link first_jacobian_index), every link keeps its full
6 twist coordinates and non-free directions are pinned exactly: their Jacobian columns
are zeroed, which zeroes their KKT rows/columns, and the diagonal is set to 1 with a
zero right-hand side, so theta == 0 there and the solution on free coordinates equals
the reference's compacted solve.  Padded links/constraints are pinned the same way.

Pose-update convention: the root link's "parent" frame is the camera frame, i.e. the
state stores ``joint2parent`` for every link with ``joint2parent_root =
body2camera_root @ joint2body_root``.  The reference's root update
``link2world' = link2world @ joint2body @ variation @ body2joint`` (link.cpp:236-238)
then coincides with the child rule ``joint2parent' = joint2parent @ variation``
(fixed_body2joint_pose == true, link.cpp:228-233), so one rule serves the whole tree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from m3t_tpu.common import (
    adjoint,
    pose_inverse,
    pose_variation,
    skew,
    so3_log,
    xcotx,
)


class KinematicModel(NamedTuple):
    """Static description of a batch of S kinematic structures (NL padded links).

    Topology must be topologically ordered: ``parent[l] < l`` (root links have
    parent == -1).  ``free`` is a float mask over twist coordinates [wx wy wz tx ty
    tz] (link.h:56-66); padded links have ``link_valid == False`` and contribute
    nothing.  Hard constraints (constraint.cpp) and soft constraints
    (soft_constraint.cpp) are padded to NC / NS with ``*_valid`` masks.
    """

    parent: jnp.ndarray          # (S, NL) int32, -1 for roots
    body2joint: jnp.ndarray      # (S, NL, 4, 4)
    joint2body: jnp.ndarray      # (S, NL, 4, 4) precomputed inverse
    free: jnp.ndarray            # (S, NL, 6) f32 mask
    link_valid: jnp.ndarray      # (S, NL) bool
    # hard constraints
    c_link1: jnp.ndarray         # (S, NC) int32
    c_link2: jnp.ndarray         # (S, NC) int32
    c_body12joint1: jnp.ndarray  # (S, NC, 4, 4)
    c_body22joint2: jnp.ndarray  # (S, NC, 4, 4)
    c_dirs: jnp.ndarray          # (S, NC, 6) f32 mask
    c_valid: jnp.ndarray         # (S, NC) bool
    # soft constraints
    s_link1: jnp.ndarray         # (S, NS) int32
    s_link2: jnp.ndarray         # (S, NS) int32
    s_body12joint1: jnp.ndarray  # (S, NS, 4, 4)
    s_body22joint2: jnp.ndarray  # (S, NS, 4, 4)
    s_dirs: jnp.ndarray          # (S, NS, 6) f32 mask
    s_max_rotation: jnp.ndarray  # (S, NS)
    s_max_translation: jnp.ndarray   # (S, NS)
    s_std_rotation: jnp.ndarray      # (S, NS)
    s_std_translation: jnp.ndarray   # (S, NS)
    s_valid: jnp.ndarray         # (S, NS) bool

    @property
    def n_links(self) -> int:
        return self.parent.shape[-1]


def _identity_like(pose_batch):
    return jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), pose_batch.shape)


def forward_kinematics(model: KinematicModel, joint2parent):
    """body2camera poses for one structure (link.cpp:228-241 composition).

    joint2parent: (NL, 4, 4).  Returns (NL, 4, 4).
    """
    nl = model.parent.shape[0]
    eye = jnp.eye(4, dtype=jnp.float32)
    poses = jnp.zeros((nl, 4, 4), jnp.float32)
    for l in range(nl):
        p = model.parent[l]
        parent_pose = jnp.where(p >= 0, poses[jnp.clip(p, 0, nl - 1)], eye)
        poses = poses.at[l].set(parent_pose @ joint2parent[l] @ model.body2joint[l])
    return poses


def link_jacobians(model: KinematicModel, joint2parent):
    """Adjoint-chained tree Jacobians (link.cpp:159-182), full-width layout.

    Returns (NL, 6, NL*6): row block l maps the packed theta (NL*6) to link l's
    body-frame twist.  Non-free columns are exactly zero.
    """
    nl = model.parent.shape[0]
    d = nl * 6
    adj_own = adjoint(model.joint2body) * model.free[:, None, :]   # (NL, 6, 6)
    jac = jnp.zeros((nl, 6, d), jnp.float32)
    for l in range(nl):
        p = model.parent[l]
        parent2body = pose_inverse(joint2parent[l] @ model.body2joint[l])
        chained = adjoint(parent2body) @ jac[jnp.clip(p, 0, nl - 1)]
        chained = jnp.where(p >= 0, chained, jnp.zeros_like(chained))
        own = jnp.zeros((6, d), jnp.float32)
        own = jax.lax.dynamic_update_slice(own, adj_own[l], (0, l * 6))
        jac = jac.at[l].set(chained + own)
    return jac


def _angle_axis(rot):
    w = so3_log(rot)
    angle = jnp.linalg.norm(w)
    axis = jnp.where(angle > 1e-12, w / jnp.where(angle > 0, angle, 1.0),
                     jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    return angle, axis


def _variation_matrix(angle, axis):
    """Rotation-vector variation matrix (constraint.cpp:226-232)."""
    half = 0.5 * angle
    xc = xcotx(half)
    return (xc * jnp.eye(3, dtype=jnp.float32) - half * skew(axis)
            + (1.0 - xc) * jnp.outer(axis, axis))


def _unprojected_jacobian(joint22joint1, body2joint1):
    """Full 6x6 UnprojectedConstraintJacobian (constraint.cpp:213-275)."""
    body2joint2 = pose_inverse(joint22joint1) @ body2joint1
    joint22body_t = pose_inverse(body2joint2)[:3, 3]
    rot1 = body2joint1[:3, :3]
    angle, axis = _angle_axis(joint22joint1[:3, :3])
    vm = _variation_matrix(angle, axis)
    rot_rows = jnp.concatenate([vm @ rot1, jnp.zeros((3, 3), jnp.float32)], axis=1)
    cross_rows = jnp.cross(jnp.broadcast_to(joint22body_t, (3, 3)), rot1)
    trans_rows = jnp.concatenate([cross_rows, rot1], axis=1)
    return jnp.concatenate([rot_rows, trans_rows], axis=0)


def constraint_terms(model: KinematicModel, body2camera, jac):
    """Residuals + projected constraint Jacobians for all NC hard constraints.

    body2camera: (NL, 4, 4) current link poses (any common frame works — the
    reference uses world, the pipeline uses camera); jac: (NL, 6, NL*6).
    Returns (residual (NC, 6), cjac (NC, 6, NL*6)), rows masked by
    c_dirs * c_valid.
    """
    nl = model.parent.shape[0]

    def one(l1, l2, b12j1, b22j2, dirs, valid):
        link12cam = body2camera[jnp.clip(l1, 0, nl - 1)]
        link22cam = body2camera[jnp.clip(l2, 0, nl - 1)]
        body22joint1 = b12j1 @ pose_inverse(link12cam) @ link22cam
        joint22joint1 = body22joint1 @ pose_inverse(b22j2)
        residual = jnp.concatenate([so3_log(joint22joint1[:3, :3]),
                                    joint22joint1[:3, 3]])
        j2 = _unprojected_jacobian(joint22joint1, body22joint1)
        j1 = _unprojected_jacobian(joint22joint1, b12j1)
        cjac = (j2 @ jac[jnp.clip(l2, 0, nl - 1)]
                - j1 @ jac[jnp.clip(l1, 0, nl - 1)])
        mask = dirs * valid.astype(jnp.float32)
        return residual * mask, cjac * mask[:, None]

    return jax.vmap(one)(model.c_link1, model.c_link2, model.c_body12joint1,
                         model.c_body22joint2, model.c_dirs, model.c_valid)


def soft_constraint_terms(model: KinematicModel, body2camera):
    """Per-link gradient/Hessian additions from soft constraints
    (soft_constraint.cpp:113-272).  Returns ((NL, 6), (NL, 6, 6))."""
    nl = model.parent.shape[0]
    ns = model.s_link1.shape[0]
    g_add = jnp.zeros((nl, 6), jnp.float32)
    h_add = jnp.zeros((nl, 6, 6), jnp.float32)
    if ns == 0:
        return g_add, h_add

    def rows(joint22joint1, body2joint1, dirs):
        """Masked full-space analogue of _unprojected_rows."""
        body2joint2 = pose_inverse(joint22joint1) @ body2joint1
        joint22body_t = pose_inverse(body2joint2)[:3, 3]
        rot1 = body2joint1[:3, :3]
        angle, axis = _angle_axis(joint22joint1[:3, :3])
        vm = _variation_matrix(angle, axis)
        rot_rows = jnp.concatenate([vm @ rot1, jnp.zeros((3, 3), jnp.float32)], 1)
        cross_rows = jnp.cross(jnp.broadcast_to(joint22body_t, (3, 3)), rot1)
        trans_rows = jnp.concatenate([cross_rows, rot1], 1)
        return rot_rows * dirs[:3, None], trans_rows * dirs[3:, None]

    def penalty(vec, mask, jac_rows, max_dist, std):
        """Quadratic penalty gradient/Hessian on the masked subspace."""
        vec_m = vec * mask
        dist = jnp.linalg.norm(vec_m)
        active = (dist > max_dist) & (jnp.sum(mask) > 0)
        safe = jnp.where(dist > 0, dist, 1.0)
        unit = vec_m / safe
        inv_var = 1.0 / (std * std)
        eye_m = jnp.diag(mask)
        m = eye_m - (max_dist / safe) * (eye_m - jnp.outer(unit, unit))
        g = -inv_var * (jac_rows.T @ (vec_m - unit * max_dist))
        h = -inv_var * (jac_rows.T @ m @ jac_rows)
        return (jnp.where(active, g, 0.0), jnp.where(active, h, 0.0))

    for i in range(ns):
        l1 = jnp.clip(model.s_link1[i], 0, nl - 1)
        l2 = jnp.clip(model.s_link2[i], 0, nl - 1)
        b12j1 = model.s_body12joint1[i]
        body22joint1 = b12j1 @ pose_inverse(body2camera[l1]) @ body2camera[l2]
        joint22joint1 = body22joint1 @ pose_inverse(model.s_body22joint2[i])
        dirs = model.s_dirs[i] * model.s_valid[i].astype(jnp.float32)
        w = so3_log(joint22joint1[:3, :3])
        t = joint22joint1[:3, 3]
        for sign, link, b2j1 in ((-1.0, l1, b12j1), (1.0, l2, body22joint1)):
            rot_rows, trans_rows = rows(joint22joint1, b2j1, dirs)
            g_r, h_r = penalty(w, dirs[:3], rot_rows, model.s_max_rotation[i],
                               model.s_std_rotation[i])
            g_t, h_t = penalty(t, dirs[3:], trans_rows,
                               model.s_max_translation[i],
                               model.s_std_translation[i])
            g_add = g_add.at[link].add(sign * g_r + sign * g_t)
            h_add = h_add.at[link].add(h_r + h_t)
    return g_add, h_add


def solve_structure(model: KinematicModel, joint2parent, gradients, hessians,
                    tikhonov_rotation, tikhonov_translation,
                    apply_soft_constraints: bool = True):
    """One Newton step for one structure (optimizer.cpp:144-167, 304-346).

    gradients (NL, 6) / hessians (NL, 6, 6) are the per-link modality sums in
    body frame (link.cpp:184-193).  Returns updated joint2parent (NL, 4, 4).
    """
    nl = model.parent.shape[0]
    nc = model.c_link1.shape[0]
    d = nl * 6
    size = d + nc * 6

    body2camera = forward_kinematics(model, joint2parent)
    jac = link_jacobians(model, joint2parent)

    lv = model.link_valid.astype(jnp.float32)
    g = gradients * lv[:, None]
    h = hessians * lv[:, None, None]
    if apply_soft_constraints and model.s_link1.shape[0] > 0:
        g_add, h_add = soft_constraint_terms(model, body2camera)
        g = g + g_add * lv[:, None]
        h = h + h_add * lv[:, None, None]

    b = jnp.zeros((size,), jnp.float32)
    a = jnp.zeros((size, size), jnp.float32)
    # AddProjectedGradientsAndHessians (optimizer.cpp:304-321).
    b = b.at[:d].set(jnp.einsum("lrd,lr->d", jac, g))
    a = a.at[:d, :d].set(-jnp.einsum("lrd,lrs,lse->de", jac, h, jac))

    if nc > 0:
        residual, cjac = constraint_terms(model, body2camera, jac)
        b = b.at[d:].set(residual.reshape(-1))
        rows = -cjac.reshape(nc * 6, d)
        a = a.at[d:, :d].set(rows)
        a = a.at[:d, d:].set(rows.T)

    # Diagonal: Tikhonov on free coordinates (optimizer.h:52-53, cpp:159); exact
    # pinning (diag 1, rhs 0) on non-free/padded coordinates and inactive
    # constraint rows, whose rows/columns are all-zero by construction.
    col_free = (model.free * lv[:, None]).reshape(-1)
    tik = jnp.concatenate([
        jnp.full((3,), tikhonov_rotation, jnp.float32),
        jnp.full((3,), tikhonov_translation, jnp.float32)])
    tik = jnp.tile(tik, nl)
    row_active = (model.c_dirs
                  * model.c_valid.astype(jnp.float32)[:, None]).reshape(-1)
    diag = jnp.concatenate([
        jnp.where(col_free > 0, a[jnp.arange(d), jnp.arange(d)] + tik, 1.0),
        jnp.where(row_active > 0, a[jnp.arange(d, size), jnp.arange(d, size)], 1.0),
    ])
    a = a.at[jnp.arange(size), jnp.arange(size)].set(diag)
    b = b * jnp.concatenate([col_free > 0, row_active > 0])

    # NOTE: an unrolled LDLT (like pipeline._ldlt_solve_6x6) was measured
    # slightly SLOWER here (11.1k vs 11.7k bf/s at S=256, NL=2): the KKT solve
    # is not the kinematic cycle's bottleneck and the deep scalar dependency
    # chain fuses poorly under the structure vmap — the batched LU custom-call
    # stays.
    theta = jnp.linalg.solve(a, b)
    theta = jnp.where(jnp.any(jnp.isnan(theta)), jnp.zeros_like(theta), theta)
    theta_links = theta[:d].reshape(nl, 6) * model.free * lv[:, None]
    # fixed_body2joint_pose == true update rule for every link (see module
    # docstring for why the root obeys the same rule in camera frame).
    variation = pose_variation(theta_links)
    return joint2parent @ variation


def update_structures(model: KinematicModel, joint2parent, gradients, hessians,
                      tikhonov_rotation, tikhonov_translation):
    """Batched Newton step: vmap of solve_structure over the S structures.

    joint2parent (S, NL, 4, 4); gradients (S, NL, 6); hessians (S, NL, 6, 6).
    """
    return jax.vmap(
        lambda m, jp, g, h: solve_structure(m, jp, g, h, tikhonov_rotation,
                                            tikhonov_translation)
    )(model, joint2parent, gradients, hessians)


# --------------------------------------------------------------------------------------
# Host-side builders (object graph -> device arrays)
# --------------------------------------------------------------------------------------


def build_kinematic_model(optimizers, n_links: int | None = None,
                          n_constraints: int | None = None,
                          n_soft_constraints: int | None = None) -> KinematicModel:
    """Build a batched KinematicModel from host Optimizer object graphs.

    Links are indexed in the pre-order walk of each optimizer's tree
    (Optimizer.ReferencedLinks), which guarantees parent[l] < l.  Links with
    ``fixed_body2joint_pose == False`` are rejected — the fused path supports the
    (default) fixed convention only; use the object-graph Tracker otherwise.
    """
    structs = []
    for opt in optimizers:
        links = opt.ReferencedLinks()
        index = {id(l): i for i, l in enumerate(links)}
        parents = []

        def find_parent(link, links=links, index=index):
            for cand in links:
                if any(child is link for child in cand.child_link_ptrs):
                    return index[id(cand)]
            return -1

        for l in links:
            if not l.fixed_body2joint_pose and find_parent(l) >= 0:
                raise ValueError(
                    f"link {l.name}: fixed_body2joint_pose=False is not supported "
                    "on the fused kinematic path")
            parents.append(find_parent(l))
        structs.append((opt, links, index, parents))

    nl = max(len(s[1]) for s in structs)
    if n_links is not None:
        nl = max(nl, n_links)
    nc = max((len(s[0].constraint_ptrs) for s in structs), default=0)
    if n_constraints is not None:
        nc = max(nc, n_constraints)
    ns = max((len(s[0].soft_constraint_ptrs) for s in structs), default=0)
    if n_soft_constraints is not None:
        ns = max(ns, n_soft_constraints)

    s = len(structs)
    parent = np.full((s, nl), -1, np.int32)
    body2joint = np.tile(np.eye(4, dtype=np.float32), (s, nl, 1, 1))
    free = np.zeros((s, nl, 6), np.float32)
    link_valid = np.zeros((s, nl), bool)
    c_link1 = np.zeros((s, nc), np.int32)
    c_link2 = np.zeros((s, nc), np.int32)
    c_b12j1 = np.tile(np.eye(4, dtype=np.float32), (s, nc, 1, 1))
    c_b22j2 = np.tile(np.eye(4, dtype=np.float32), (s, nc, 1, 1))
    c_dirs = np.zeros((s, nc, 6), np.float32)
    c_valid = np.zeros((s, nc), bool)
    s_link1 = np.zeros((s, ns), np.int32)
    s_link2 = np.zeros((s, ns), np.int32)
    s_b12j1 = np.tile(np.eye(4, dtype=np.float32), (s, ns, 1, 1))
    s_b22j2 = np.tile(np.eye(4, dtype=np.float32), (s, ns, 1, 1))
    s_dirs = np.zeros((s, ns, 6), np.float32)
    s_max_rot = np.zeros((s, ns), np.float32)
    s_max_trans = np.zeros((s, ns), np.float32)
    s_std_rot = np.ones((s, ns), np.float32)
    s_std_trans = np.ones((s, ns), np.float32)
    s_valid = np.zeros((s, ns), bool)

    for i, (opt, links, index, parents) in enumerate(structs):
        for j, l in enumerate(links):
            parent[i, j] = parents[j]
            body2joint[i, j] = l.body2joint_pose
            free[i, j] = np.asarray(l.free_directions, np.float32)
            link_valid[i, j] = True
        for k, c in enumerate(opt.constraint_ptrs):
            c_link1[i, k] = index[id(c.link1_ptr)]
            c_link2[i, k] = index[id(c.link2_ptr)]
            c_b12j1[i, k] = c.body12joint1_pose
            c_b22j2[i, k] = c.body22joint2_pose
            c_dirs[i, k] = np.asarray(c.constraint_directions, np.float32)
            c_valid[i, k] = True
        for k, sc in enumerate(opt.soft_constraint_ptrs):
            s_link1[i, k] = index[id(sc.link1_ptr)]
            s_link2[i, k] = index[id(sc.link2_ptr)]
            s_b12j1[i, k] = sc.body12joint1_pose
            s_b22j2[i, k] = sc.body22joint2_pose
            s_dirs[i, k] = np.asarray(sc.constraint_directions, np.float32)
            s_max_rot[i, k] = sc.max_distance_rotation
            s_max_trans[i, k] = sc.max_distance_translation
            s_std_rot[i, k] = sc.standard_deviation_rotation
            s_std_trans[i, k] = sc.standard_deviation_translation
            s_valid[i, k] = True

    j2b = np.linalg.inv(body2joint.astype(np.float64)).astype(np.float32)
    return KinematicModel(
        parent=jnp.asarray(parent), body2joint=jnp.asarray(body2joint),
        joint2body=jnp.asarray(j2b), free=jnp.asarray(free),
        link_valid=jnp.asarray(link_valid),
        c_link1=jnp.asarray(c_link1), c_link2=jnp.asarray(c_link2),
        c_body12joint1=jnp.asarray(c_b12j1), c_body22joint2=jnp.asarray(c_b22j2),
        c_dirs=jnp.asarray(c_dirs), c_valid=jnp.asarray(c_valid),
        s_link1=jnp.asarray(s_link1), s_link2=jnp.asarray(s_link2),
        s_body12joint1=jnp.asarray(s_b12j1), s_body22joint2=jnp.asarray(s_b22j2),
        s_dirs=jnp.asarray(s_dirs), s_max_rotation=jnp.asarray(s_max_rot),
        s_max_translation=jnp.asarray(s_max_trans),
        s_std_rotation=jnp.asarray(s_std_rot),
        s_std_translation=jnp.asarray(s_std_trans), s_valid=jnp.asarray(s_valid))


def initial_joint2parent(optimizers, world2camera=None, n_links: int | None = None):
    """State initialization: per-link joint2parent poses in the camera frame.

    Root links get ``joint2parent = world2camera @ link2world @ joint2body`` (see
    module docstring); child links keep their joint2parent.  Returns
    (S, NL, 4, 4) numpy.
    """
    w2c = (np.eye(4, dtype=np.float32) if world2camera is None
           else np.asarray(world2camera, np.float32))
    per_struct = []
    for opt in optimizers:
        links = opt.ReferencedLinks()
        parents = set()
        for l in links:
            for child in l.child_link_ptrs:
                parents.add(id(child))
        poses = []
        for l in links:
            if id(l) in parents:
                poses.append(np.asarray(l.joint2parent_pose, np.float32))
            else:
                j2b = np.linalg.inv(
                    l.body2joint_pose.astype(np.float64)).astype(np.float32)
                poses.append(w2c @ l.link2world_pose @ j2b)
        per_struct.append(np.stack(poses))
    nl = max(p.shape[0] for p in per_struct)
    if n_links is not None:
        nl = max(nl, n_links)
    out = np.tile(np.eye(4, dtype=np.float32), (len(per_struct), nl, 1, 1))
    for i, p in enumerate(per_struct):
        out[i, : p.shape[0]] = p
    return out
