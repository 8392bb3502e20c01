"""Tests for core SE(3)/projection math (m3t_tpu.common)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from m3t_tpu import common


def test_skew_cross_product(rng):
    a = rng.normal(size=3).astype(np.float32)
    b = rng.normal(size=3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(common.skew(a) @ b), np.cross(a, b), rtol=1e-5, atol=1e-6
    )


def test_so3_exp_matches_expm(rng):
    for scale in [1e-8, 1e-4, 0.1, 1.0, 3.0]:
        w = rng.normal(size=3) * scale
        expected = scipy.linalg.expm(np.asarray(common.skew(w), np.float64))
        np.testing.assert_allclose(
            np.asarray(common.so3_exp(w)), expected, rtol=1e-4, atol=1e-5
        )


def test_so3_log_roundtrip(rng):
    for scale in [1e-6, 0.1, 1.5, 3.0]:
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * scale
        rot = common.so3_exp(w)
        np.testing.assert_allclose(np.asarray(common.so3_log(rot)), w, rtol=1e-3, atol=1e-5)


def test_pose_variation_matches_reference_semantics(rng):
    # Reference: pose_variation = Trans(t) @ Rot(exp(skew(w))) (link.cpp:221-224).
    theta = rng.normal(size=6).astype(np.float32) * 0.3
    pose = np.asarray(common.pose_variation(theta))
    rot = scipy.linalg.expm(np.asarray(common.skew(theta[:3])))
    np.testing.assert_allclose(pose[:3, :3], rot, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], theta[3:], rtol=1e-5)
    np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=0)


def test_pose_inverse(rng):
    theta = rng.normal(size=6).astype(np.float32)
    pose = np.asarray(common.pose_variation(theta))
    inv = np.asarray(common.pose_inverse(pose))
    np.testing.assert_allclose(inv @ pose, np.eye(4), atol=1e-5)


def test_adjoint_transforms_twists(rng):
    # Adjoint property: variation_matrix(Ad @ theta) == pose @ variation_matrix(theta) @ pose^-1
    # holds to first order in theta.
    theta = rng.normal(size=6).astype(np.float32) * 1e-4
    pose = np.asarray(common.pose_variation(rng.normal(size=6).astype(np.float32)))
    adj = np.asarray(common.adjoint(pose))
    lhs = np.asarray(common.pose_variation(adj @ theta))
    rhs = pose @ np.asarray(common.pose_variation(theta)) @ np.asarray(
        common.pose_inverse(pose)
    )
    np.testing.assert_allclose(lhs, rhs, atol=5e-6)


def test_xcotx():
    x = jnp.array([1e-8, 1e-5, 0.1, 1.0, 2.0], jnp.float32)
    out = np.asarray(common.xcotx(x))
    expected = np.asarray(x) / np.tan(np.asarray(x))
    expected[0] = 1.0
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)


def test_project_unproject_roundtrip(rng):
    intr = common.Intrinsics(500.0, 510.0, 320.0, 240.0, 640, 480)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 0.5
    uv = common.project(intr, pts)
    back = common.unproject(intr, uv, pts[:, 2])
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-5, atol=1e-5)


def test_transform_points(rng):
    pose = np.asarray(common.pose_variation(rng.normal(size=6).astype(np.float32)))
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    out = np.asarray(common.transform_points(pose, pts))
    expected = pts @ pose[:3, :3].T + pose[:3, 3]
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
