"""Core math and shared utilities (TPU-native redesign of M3T's ``common.h``).

Reference parity: m3t/include/m3t/common.h:19-77 (Transform3fA, Intrinsics, skew, xcotx).
Poses are plain ``(4, 4)`` float32 row-major matrices (world-from-body style, named
``a2b_pose`` = transform that maps coordinates in frame ``a`` to frame ``b``), so the whole
framework stays pytree-friendly and jit/vmap-compatible instead of relying on an Eigen
affine-transform class hierarchy.

Twist convention (matches M3T): ``theta = [w_x, w_y, w_z, t_x, t_y, t_z]`` — rotation first,
translation second.  A pose variation is ``Trans(t) @ Rot(exp(skew(w)))`` applied in the
local (joint/body) frame, cf. m3t/src/link.cpp:221-239.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Pose/geometry math must be exact float32: the reference's golden tolerances (pose to
# 1e-5 relative, tracker_test.cpp:164-179) are unreachable with bf16-class matmuls.
jax.config.update("jax_default_matmul_precision", "highest")


class Intrinsics(NamedTuple):
    """Pinhole camera intrinsics (reference: m3t/include/m3t/common.h:25-29)."""

    fu: float
    fv: float
    ppu: float
    ppv: float
    width: int
    height: int


# --------------------------------------------------------------------------------------
# SO(3) / SE(3)
# --------------------------------------------------------------------------------------


def skew(v):
    """Skew-symmetric matrix of a 3-vector (reference: common.h:66-71)."""
    v = jnp.asarray(v)
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues' formula: exp of skew(w). Safe at w -> 0."""
    w = jnp.asarray(w, jnp.float32)
    theta2 = jnp.sum(w * w, axis=-1)
    # Taylor fallbacks around zero keep this differentiable (no sqrt(0) in either branch)
    # and exact in float32.
    small = theta2 < 1e-12
    safe_theta2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe_theta2)
    s = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    c = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_theta2)
    k = skew(w)
    # K^2 == w w^T - theta^2 I exactly; the outer product avoids matmul rounding.
    k2 = w[..., :, None] * w[..., None, :] - theta2[..., None, None] * jnp.eye(3, dtype=w.dtype)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + s[..., None, None] * k + c[..., None, None] * k2


def so3_log(rot):
    """Rotation vector of a rotation matrix. Safe near identity; not at theta == pi."""
    rot = jnp.asarray(rot, jnp.float32)
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    axis_unnorm = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta < 1e-6
    # axis_unnorm = 2 sin(theta) * axis ; w = theta * axis
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta))),
    )
    return factor[..., None] * axis_unnorm


def pose_from_rt(rotation, translation):
    rotation = jnp.asarray(rotation, jnp.float32)
    translation = jnp.asarray(translation, jnp.float32)
    batch = jnp.broadcast_shapes(rotation.shape[:-2], translation.shape[:-1])
    pose = jnp.zeros(batch + (4, 4), jnp.float32)
    pose = pose.at[..., :3, :3].set(rotation)
    pose = pose.at[..., :3, 3].set(translation)
    pose = pose.at[..., 3, 3].set(1.0)
    return pose


def pose_variation(theta6):
    """Local pose variation ``Trans(t) @ Rot(exp(w))`` (reference: link.cpp:221-224)."""
    theta6 = jnp.asarray(theta6, jnp.float32)
    return pose_from_rt(so3_exp(theta6[..., :3]), theta6[..., 3:])


def pose_inverse(pose):
    pose = jnp.asarray(pose, jnp.float32)
    rot_t = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    t = -(rot_t @ pose[..., :3, 3:4])[..., 0]
    return pose_from_rt(rot_t, t)


def adjoint(pose):
    """6x6 adjoint mapping twists between frames (reference: link.cpp:341-348).

    With theta = [w, t]:  Ad = [[R, 0], [skew(p) R, R]].
    """
    pose = jnp.asarray(pose, jnp.float32)
    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3]
    top = jnp.concatenate([rot, jnp.zeros_like(rot)], axis=-1)
    bottom = jnp.concatenate([skew(trans) @ rot, rot], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(pose, points):
    """Apply (..., 4, 4) pose to (..., N, 3) points."""
    pose = jnp.asarray(pose, jnp.float32)
    points = jnp.asarray(points, jnp.float32)
    return points @ jnp.swapaxes(pose[..., :3, :3], -1, -2) + pose[..., None, :3, 3]


def rotate_vectors(pose, vectors):
    return jnp.asarray(vectors, jnp.float32) @ jnp.swapaxes(
        jnp.asarray(pose, jnp.float32)[..., :3, :3], -1, -2
    )


def xcotx(x):
    """x * cot(x), Taylor-stabilized near 0 (reference: common.h:73-77)."""
    x = jnp.asarray(x, jnp.float32)
    small = jnp.abs(x) < 1e-4
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 3.0, safe * jnp.cos(safe) / jnp.sin(safe))


# --------------------------------------------------------------------------------------
# Projection
# --------------------------------------------------------------------------------------


def project(intrinsics: Intrinsics, points_f_camera):
    """Project camera-frame points to pixel coordinates (u, v)."""
    p = jnp.asarray(points_f_camera, jnp.float32)
    z = p[..., 2]
    u = p[..., 0] * intrinsics.fu / z + intrinsics.ppu
    v = p[..., 1] * intrinsics.fv / z + intrinsics.ppv
    return jnp.stack([u, v], axis=-1)


def unproject(intrinsics: Intrinsics, uv, depth):
    uv = jnp.asarray(uv, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    x = (uv[..., 0] - intrinsics.ppu) * depth / intrinsics.fu
    y = (uv[..., 1] - intrinsics.ppv) * depth / intrinsics.fv
    return jnp.stack([x, y, depth], axis=-1)


# --------------------------------------------------------------------------------------
# Host-side helpers (numpy, used during setup / precompute)
# --------------------------------------------------------------------------------------


def np_pose(rotation=None, translation=None) -> np.ndarray:
    pose = np.eye(4, dtype=np.float32)
    if rotation is not None:
        pose[:3, :3] = np.asarray(rotation, np.float32)
    if translation is not None:
        pose[:3, 3] = np.asarray(translation, np.float32)
    return pose


def np_pose_inverse(pose: np.ndarray) -> np.ndarray:
    pose = np.asarray(pose, np.float32)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = pose[:3, :3].T
    out[:3, 3] = -pose[:3, :3].T @ pose[:3, 3]
    return out


# --------------------------------------------------------------------------------------
# Name-keyed component registries (reference: common.h:197-257)
# --------------------------------------------------------------------------------------


def add_ptr_if_name_not_exists(ptr, ptrs: list) -> bool:
    """Append component if no component with the same name exists (common.h:197-212)."""
    if any(p.name == ptr.name for p in ptrs):
        return False
    ptrs.append(ptr)
    return True


def get_ptr_if_name_exists(name: str, ptrs: list):
    for p in ptrs:
        if p.name == name:
            return p
    return None


def delete_ptr_if_name_exists(name: str, ptrs: list) -> bool:
    for i, p in enumerate(ptrs):
        if p.name == name:
            del ptrs[i]
            return True
    return False


def set_up_object_ptrs(ptrs: list) -> bool:
    """Call SetUp() on every component, reporting the first failure (common.h:244-257)."""
    for p in ptrs:
        if not p.SetUp():
            print(f"Failed to set up {type(p).__name__} {p.name}")
            return False
    return True


@dataclasses.dataclass
class Component:
    """Base for all named framework components.

    Mirrors the reference lifecycle ``constructor -> setters -> SetUp() -> set_up==True``
    (doc/high_level/developer.md, "Setup Functionalities").
    """

    name: str
    metafile_path: str | None = None

    def __post_init__(self):
        self.set_up = False

    def SetUp(self) -> bool:  # noqa: N802 (reference API parity)
        raise NotImplementedError
