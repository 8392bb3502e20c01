"""Depth-modality functional core (redesign of m3t/src/depth_modality.cpp).

ICP-style point-to-plane correspondences on a depth image: per model point, a strided
window around the projection is searched for the nearest valid 3D point
(FindCorrespondence, depth_modality.cpp:826-884); the reference's dynamic window loop
becomes a fixed-size masked grid (window extent ``max_n_strides`` is static per
coarse-to-fine level since considered_distance and stride_length are config).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

KMAX_N_OCCLUSION_STRIDES = 5  # depth_modality.h:113


class DepthConfig(NamedTuple):
    """Static configuration (defaults: depth_modality.h:302-321)."""

    n_points_max: int = 200
    use_depth_scaling: bool = False
    stride_length: float = 0.005
    measured_occlusion_radius: float = 0.01
    measured_occlusion_threshold: float = 0.03
    modeled_occlusion_radius: float = 0.01
    modeled_occlusion_threshold: float = 0.03
    min_n_unoccluded_points: int = 0


class DepthViewPoints(NamedTuple):
    center_f_body: jnp.ndarray  # (P, 3)
    normal_f_body: jnp.ndarray  # (P, 3)
    measured_depth_offset: jnp.ndarray  # (P,)
    modeled_depth_offset: jnp.ndarray  # (P,)


class DepthDataPoints(NamedTuple):
    center_f_body: jnp.ndarray  # (P, 3)
    normal_f_body: jnp.ndarray  # (P, 3)
    correspondence_center_f_camera: jnp.ndarray  # (P, 3)
    valid: jnp.ndarray  # (P,)


class DepthModeledOcclusionInputs(NamedTuple):
    focused_depth: jnp.ndarray  # (S, S) float32 meters
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    body_visible: jnp.ndarray


class SilhouetteCheckInputs(NamedTuple):
    silhouette: jnp.ndarray  # (S, S) int32 body ids
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    body_id: jnp.ndarray
    body_visible: jnp.ndarray


class DepthModeledOcclusionQueryInputs(NamedTuple):
    """Point-query variant of :class:`DepthModeledOcclusionInputs` (SceneCoeffs)."""

    coeffs: jnp.ndarray        # (T, 12)
    tri_valid: jnp.ndarray     # (T,)
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    body_visible: jnp.ndarray
    image_size: jnp.ndarray    # () int32


class SilhouetteCheckQueryInputs(NamedTuple):
    """Point-query variant of :class:`SilhouetteCheckInputs` (body-id silhouette)."""

    coeffs: jnp.ndarray        # (T, 12)
    tri_valid: jnp.ndarray     # (T,)
    sil_body_id: jnp.ndarray   # (T,) int32 per-triangle body ids
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    body_id: jnp.ndarray
    body_visible: jnp.ndarray
    image_size: jnp.ndarray    # () int32


def _trunc(x):
    return jnp.trunc(x).astype(jnp.int32)


def _strided_window_min_free(depth_values, sample_ok, min_depth):
    occluding = sample_ok & (depth_values > 0) & (depth_values < min_depth[:, None, None])
    return ~jnp.any(occluding, axis=(1, 2))


def calculate_correspondences(
    cfg: DepthConfig,
    considered_distance: float,
    points: DepthViewPoints,
    n_points,
    body2camera_pose,
    depth_image,
    fu, fv, ppu, ppv, width: int, height: int,
    depth_scale,
    handle_occlusions,
    measure_occlusions: bool = False,
    modeled_occlusion: DepthModeledOcclusionInputs | None = None,
    silhouette_check: SilhouetteCheckInputs | None = None,
    presampled=None,
    measured_presampled=None,
) -> DepthDataPoints:
    """One correspondence pass (reference: CalculateCorrespondences, cpp:252-315).

    presampled: optional (d (P, K, K) f32 raw depth values, in_crop (P, K, K) bool)
    from ops/depth_fast.presample_windows — replaces the in-place window gather on the
    TPU pipeline path (identical values whenever the window lies inside the crop).
    measured_presampled: optional (d, ok) from
    ops/depth_fast.presample_occlusion_windows — same treatment for the
    measured-occlusion windows (IsPointUnoccludedMeasured).
    """
    P = cfg.n_points_max
    max_n_strides = int(considered_distance / cfg.stride_length + 0.5)
    max_n_strides = max(max_n_strides, 1)

    pose = jnp.asarray(body2camera_pose, jnp.float32)
    rot = pose[:3, :3]
    c = points.center_f_body @ rot.T + pose[:3, 3]
    z = c[:, 2]
    z_safe = jnp.where(z > 0, z, 1.0)
    cu = c[:, 0] * fu / z_safe + ppu
    cv = c[:, 1] * fv / z_safe + ppv

    valid = jnp.arange(P) < n_points
    valid &= z > 0.0
    i_cu = _trunc(cu + 0.5)
    i_cv = _trunc(cv + 0.5)
    valid &= (i_cu >= 0) & (i_cu <= width - 1) & (i_cv >= 0) & (i_cv <= height - 1)

    # Silhouette check (IsPointOnValidSilhouette, cpp:728-734): the body-id silhouette is
    # rendered in the FULL image frame by a focused renderer; sample at focused coords.
    if silhouette_check is not None:
        s = silhouette_check
        if isinstance(s, SilhouetteCheckQueryInputs):
            from m3t_tpu.ops import occlusion as occlusion_ops

            size = s.image_size
            fu_c = _trunc((cu - s.corner_u) * s.scale + 0.5)
            fv_c = _trunc((cv - s.corner_v) * s.scale + 0.5)
            inb = (fu_c >= 0) & (fu_c < size) & (fv_c >= 0) & (fv_c < size)
            vals = occlusion_ops.query_id(
                s.coeffs, s.tri_valid, s.sil_body_id,
                jnp.clip(fu_c, 0, size - 1), jnp.clip(fv_c, 0, size - 1))
        else:
            size = s.silhouette.shape[0]
            fu_c = _trunc((cu - s.corner_u) * s.scale + 0.5)
            fv_c = _trunc((cv - s.corner_v) * s.scale + 0.5)
            inb = (fu_c >= 0) & (fu_c < size) & (fv_c >= 0) & (fv_c < size)
            vals = s.silhouette[jnp.clip(fv_c, 0, size - 1),
                                jnp.clip(fu_c, 0, size - 1)]
        ok = inb & (vals == s.body_id)
        valid &= jnp.where(s.body_visible, ok, True)

    occl_ok = jnp.ones((P,), bool)
    if measure_occlusions:
        # IsPointUnoccludedMeasured (cpp:736-776)
        threshold = cfg.measured_occlusion_threshold
        if cfg.use_depth_scaling:
            threshold = threshold * z
        min_depth = (z - points.measured_depth_offset - threshold) / depth_scale
        if measured_presampled is not None:
            d, sample_ok = measured_presampled
            occl_ok &= _strided_window_min_free(d, sample_ok, min_depth)
        else:
            diameter = 2.0 * cfg.measured_occlusion_radius * fu
            if not cfg.use_depth_scaling:
                diameter = diameter / z_safe
            else:
                diameter = jnp.full_like(z_safe, diameter)
            stride = _trunc(diameter / KMAX_N_OCCLUSION_STRIDES + 1.0)
            n_strides = _trunc(diameter / stride.astype(jnp.float32) + 0.5)
            rounded_diameter = n_strides * stride
            rounded_radius = 0.5 * rounded_diameter.astype(jnp.float32)
            u_min0 = _trunc(cu - rounded_radius + 0.5)
            v_min0 = _trunc(cv - rounded_radius + 0.5)
            u_max = jnp.minimum(u_min0 + rounded_diameter, width - 1)
            v_max = jnp.minimum(v_min0 + rounded_diameter, height - 1)
            u_min = jnp.maximum(u_min0, 0)
            v_min = jnp.maximum(v_min0, 0)
            k = jnp.arange(KMAX_N_OCCLUSION_STRIDES + 1, dtype=jnp.int32)
            us = u_min[:, None] + k[None, :] * stride[:, None]
            vs = v_min[:, None] + k[None, :] * stride[:, None]
            u_ok = us <= u_max[:, None]
            v_ok = vs <= v_max[:, None]
            uu = jnp.clip(us, 0, width - 1)
            vv = jnp.clip(vs, 0, height - 1)
            d = depth_image[vv[:, :, None], uu[:, None, :]].astype(jnp.float32)
            occl_ok &= _strided_window_min_free(
                d, v_ok[:, :, None] & u_ok[:, None, :], min_depth)

    if modeled_occlusion is not None:
        # IsPointUnoccludedModeled (cpp:778-824)
        occ = modeled_occlusion
        size = (occ.image_size if isinstance(occ, DepthModeledOcclusionQueryInputs)
                else occ.focused_depth.shape[0])
        meter_to_pixel = fu * occ.scale
        if not cfg.use_depth_scaling:
            meter_to_pixel = meter_to_pixel / z_safe
        else:
            meter_to_pixel = jnp.full_like(z_safe, meter_to_pixel)
        diameter = 2.0 * cfg.modeled_occlusion_radius * meter_to_pixel
        stride = _trunc(diameter / KMAX_N_OCCLUSION_STRIDES + 1.0)
        n_strides = _trunc(diameter / stride.astype(jnp.float32) + 0.5)
        rounded_diameter = n_strides * stride
        rounded_radius = 0.5 * rounded_diameter.astype(jnp.float32)
        fcu = (cu - occ.corner_u) * occ.scale
        fcv = (cv - occ.corner_v) * occ.scale
        u_min0 = _trunc(fcu - rounded_radius + 0.5)
        v_min0 = _trunc(fcv - rounded_radius + 0.5)
        u_max = jnp.minimum(u_min0 + rounded_diameter, size - 1)
        v_max = jnp.minimum(v_min0 + rounded_diameter, size - 1)
        u_min = jnp.maximum(u_min0, 0)
        v_min = jnp.maximum(v_min0, 0)
        k = jnp.arange(KMAX_N_OCCLUSION_STRIDES + 1, dtype=jnp.int32)
        us = u_min[:, None] + k[None, :] * stride[:, None]
        vs = v_min[:, None] + k[None, :] * stride[:, None]
        u_ok = us <= u_max[:, None]
        v_ok = vs <= v_max[:, None]
        uu = jnp.clip(us, 0, size - 1)
        vv = jnp.clip(vs, 0, size - 1)
        sample_ok = v_ok[:, :, None] & u_ok[:, None, :]
        if isinstance(occ, DepthModeledOcclusionQueryInputs):
            from m3t_tpu.ops import occlusion as occlusion_ops

            pcount, kk = uu.shape
            gu = jnp.broadcast_to(uu[:, None, :], (pcount, kk, kk))
            gv = jnp.broadcast_to(vv[:, :, None], (pcount, kk, kk))
            inv = occlusion_ops.query_inv_depth(occ.coeffs, occ.tri_valid, gu, gv)
            min_rendered = occlusion_ops.inv_to_depth(
                jnp.max(jnp.where(sample_ok, inv, 0.0), axis=(1, 2)))
        else:
            d = occ.focused_depth[vv[:, :, None], uu[:, None, :]]
            min_rendered = jnp.min(jnp.where(sample_ok, d, jnp.inf), axis=(1, 2))
        threshold = cfg.modeled_occlusion_threshold
        if cfg.use_depth_scaling:
            threshold = threshold * z
        min_allowed = z - points.modeled_depth_offset - threshold
        free = min_rendered > min_allowed
        occl_ok &= jnp.where(occ.body_visible, free, True)

    # --- FindCorrespondence (cpp:826-884) ---------------------------------------------
    cd = considered_distance * z if cfg.use_depth_scaling else jnp.full_like(z, considered_distance)
    meter_to_pixel = fu / z_safe
    diameter = 2.0 * cd * meter_to_pixel
    stride = _trunc(diameter / max_n_strides + 1.0)
    n_strides = _trunc(diameter / stride.astype(jnp.float32) + 0.5)
    rounded_diameter = n_strides * stride
    rounded_radius = 0.5 * rounded_diameter.astype(jnp.float32)
    u_min0 = _trunc(cu - rounded_radius + 0.5)
    v_min0 = _trunc(cv - rounded_radius + 0.5)
    u_max = jnp.minimum(u_min0 + rounded_diameter, width - 1)
    v_max = jnp.minimum(v_min0 + rounded_diameter, height - 1)
    u_min = jnp.maximum(u_min0, 0)
    v_min = jnp.maximum(v_min0, 0)

    min_depth_value = jnp.minimum(0.0, (z - cd) / depth_scale)
    max_depth_value = (z + cd) / depth_scale

    K = max_n_strides + 1
    k = jnp.arange(K, dtype=jnp.int32)
    us = u_min[:, None] + k[None, :] * stride[:, None]  # (P, K)
    vs = v_min[:, None] + k[None, :] * stride[:, None]
    u_ok = us <= u_max[:, None]
    v_ok = vs <= v_max[:, None]
    uu = jnp.clip(us, 0, width - 1)
    vv = jnp.clip(vs, 0, height - 1)
    sample_ok = v_ok[:, :, None] & u_ok[:, None, :]
    if presampled is not None:
        d, in_crop = presampled
        sample_ok &= in_crop
    else:
        d = depth_image[vv[:, :, None], uu[:, None, :]].astype(jnp.float32)  # (P,Kv,Ku)
    in_range = (d > min_depth_value[:, None, None]) & (d < max_depth_value[:, None, None])
    ok = sample_ok & in_range

    d_m = d * depth_scale
    px = (uu[:, None, :].astype(jnp.float32) - ppu) * d_m / fu
    py = (vv[:, :, None].astype(jnp.float32) - ppv) * d_m / fv
    dx = px - c[:, None, None, 0]
    dy = py - c[:, None, None, 1]
    dz = d_m - c[:, None, None, 2]
    dist2 = dx * dx + dy * dy + dz * dz
    dist2 = jnp.where(ok, dist2, jnp.inf)
    flat = dist2.reshape(P, K * K)
    best = jnp.argmin(flat, axis=1)
    best_dist2 = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    found = best_dist2 < cd * cd

    bx = jnp.take_along_axis(px.reshape(P, K * K), best[:, None], axis=1)[:, 0]
    by = jnp.take_along_axis(py.reshape(P, K * K), best[:, None], axis=1)[:, 0]
    bz = jnp.take_along_axis(d_m.reshape(P, K * K), best[:, None], axis=1)[:, 0]
    correspondence = jnp.stack([bx, by, bz], axis=1)

    # Two-pass occlusion fallback (cpp:295-313).
    valid_with = valid & occl_ok & found
    n_with = jnp.sum(valid_with)
    use_occl = handle_occlusions & (n_with >= cfg.min_n_unoccluded_points)
    final_valid = jnp.where(use_occl, valid_with, valid & found)

    return DepthDataPoints(
        center_f_body=points.center_f_body,
        normal_f_body=points.normal_f_body,
        correspondence_center_f_camera=correspondence,
        valid=final_valid,
    )


def calculate_gradient_and_hessian(
    points: DepthDataPoints,
    body2camera_pose,
    standard_deviation: float,
):
    """Point-to-plane Gauss-Newton terms in body frame (cpp:333-381)."""
    pose = jnp.asarray(body2camera_pose, jnp.float32)
    rot_t = pose[:3, :3].T
    camera2body_t = -(rot_t @ pose[:3, 3])
    corr_body = points.correspondence_center_f_camera @ pose[:3, :3] + camera2body_t

    n = points.normal_f_body
    eps = jnp.sum(n * (points.center_f_body - corr_body), axis=1)
    cross = jnp.cross(corr_body, n)

    corr_depth = points.correspondence_center_f_camera[:, 2]
    depth_safe = jnp.where(corr_depth != 0, corr_depth, 1.0)
    weight = 1.0 / (standard_deviation * depth_safe)
    w2 = weight * weight
    wmask = jnp.where(points.valid, w2, 0.0)

    grad_rot = -jnp.sum((wmask * eps)[:, None] * cross, axis=0)
    grad_trans = -jnp.sum((wmask * eps)[:, None] * n, axis=0)
    gradient = jnp.concatenate([grad_rot, grad_trans])

    stacked = jnp.concatenate([cross, n], axis=1)  # (P, 6)
    hessian = -jnp.einsum("p,pi,pj->ij", wmask, stacked, stacked,
                          preferred_element_type=jnp.float32)
    return gradient, hessian
