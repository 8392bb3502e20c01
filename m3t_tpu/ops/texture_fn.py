"""Texture-modality device terms: Tukey-weighted reprojection Gauss-Newton.

Feature detection/description/matching runs on host (OpenCV or
m3t_tpu/utils/features.py — the reference's optional CUDA ORB plays the same role,
texture_modality.cpp:336-347); the resulting 3D-2D correspondences are static-shape
masked arrays whose gradient/Hessian terms are computed on device so the ICG+
configuration (region + depth + texture) runs through one fused pipeline entry
point.  Math mirrors TextureModality::CalculateGradientAndHessian
(texture_modality.cpp:397-444) == m3t_tpu/texture_modality.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TexturePoints(NamedTuple):
    """Matched keypoint correspondences for a batch of bodies (host-extracted).

    center_f_body: (B, K, 3) keyframe 3D points in body frame.
    image_uv: (B, K, 2) matched keypoint locations in the current image.
    valid: (B, K) bool mask (K is a static padding size).
    """

    center_f_body: jnp.ndarray
    image_uv: jnp.ndarray
    valid: jnp.ndarray


def calculate_gradient_and_hessian(points: TexturePoints, pose, fu, fv, ppu, ppv,
                                   standard_deviation,
                                   tukey_norm_constant: float = 20.0):
    """Per-body Tukey-weighted reprojection GN terms; returns ((6,), (6, 6)).

    Unbatched (vmap over bodies in the pipeline).
    """
    p = points.center_f_body
    rot = pose[:3, :3]
    c = p @ rot.T + pose[:3, 3]
    x, y, z = c[:, 0], c[:, 1], c[:, 2]
    z_ok = z > 1e-6
    z = jnp.where(z_ok, z, 1.0)
    proj = jnp.stack([x * fu / z + ppu, y * fv / z + ppv], axis=1)
    diff = proj - points.image_uv
    squared_error = jnp.sum(diff * diff, axis=1)
    error = jnp.sqrt(squared_error)

    k = tukey_norm_constant
    inside = jnp.abs(error) <= k
    tukey = jnp.where(inside,
                      (k * k / 6.0) * (1.0 - (1.0 - (error / k) ** 2) ** 3),
                      k * k / 6.0)
    variance = standard_deviation * standard_deviation
    weight = jnp.where(error > 1e-30, tukey / jnp.maximum(squared_error, 1e-30),
                       1.0) / variance
    weight = jnp.where(z_ok & points.valid, weight, 0.0)

    z2 = z * z
    zeros = jnp.zeros_like(z)
    dx_dX = jnp.stack([
        jnp.stack([fu / z, zeros, -x * fu / z2], axis=1),
        jnp.stack([zeros, fv / z, -y * fv / z2], axis=1),
    ], axis=1)                                   # (K, 2, 3)
    dx_dt = dx_dX @ rot                          # (K, 2, 3)
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    skews = jnp.stack([
        jnp.stack([zeros, -pz, py], axis=1),
        jnp.stack([pz, zeros, -px], axis=1),
        jnp.stack([-py, px, zeros], axis=1),
    ], axis=1)                                   # (K, 3, 3)
    dx_dtheta = jnp.concatenate([-(dx_dt @ skews), dx_dt], axis=2)  # (K, 2, 6)

    gradient = -jnp.einsum("n,nk,nkj->j", weight, diff, dx_dtheta,
                           preferred_element_type=jnp.float32)
    hessian = -jnp.einsum("n,nki,nkj->ij", weight, dx_dtheta, dx_dtheta,
                          preferred_element_type=jnp.float32)
    return gradient, hessian
