"""Region-modality functional core (redesign of m3t/src/region_modality.cpp).

Everything here is pure, fixed-shape JAX: the reference's per-line scalar loops with
``continue``-style rejection (region_modality.cpp:390-465) become batched computation over
``(n_lines, line_length)`` with validity masks, so a whole frame's correspondence-line
pipeline is one fused XLA program (and vmaps cleanly over bodies / cameras / sequences).

Pipeline (reference call sites in parentheses):
  correspondences:  project model points (CalculateBasicLineData:1231-1250) -> validity
    (IsLineValid:1252-1291) -> per-pixel fg/bg posteriors and per-segment products
    (CalculateSegmentProbabilities:1433-1573) -> 12-bin posterior distribution
    (CalculateDistribution:1600-1637) -> moments (CalculateDistributionMoments:1639-1658)
  gradient/hessian: delta_cs Newton terms (CalculateGradientAndHessian:485-558)
  histograms:       strided line-pixel color collection (AddLinePixelColorsToTempHistograms:
    1025-1155)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from m3t_tpu.ops import histogram as hist_ops

KMAX_N_OCCLUSION_STRIDES = 5  # region_modality.h:145
KN_REGION_STRIDE = 5  # region_modality.h:146
KREGION_OFFSET = 2.0  # region_modality.h:147


class RegionConfig(NamedTuple):
    """Static configuration (defaults: region_modality.h:411-443)."""

    n_lines_max: int = 200
    function_length: int = 8
    distribution_length: int = 12
    function_amplitude: float = 0.43
    function_slope: float = 0.5
    learning_rate: float = 1.3
    n_global_iterations: int = 1
    min_continuous_distance: float = 3.0
    n_histogram_bins: int = 16
    unconsidered_line_length: float = 0.5
    max_considered_line_length: float = 20.0
    measured_occlusion_radius: float = 0.01
    measured_occlusion_threshold: float = 0.03
    modeled_occlusion_radius: float = 0.01
    modeled_occlusion_threshold: float = 0.03
    min_n_unoccluded_lines: int = 0

    @property
    def line_length_in_segments(self) -> int:
        # PrecalculateDistributionVariables (region_modality.cpp:926)
        return self.function_length + self.distribution_length - 1

    @property
    def min_expected_variance(self) -> float:
        # region_modality.cpp:931-935
        laplace = 1.0 / (2.0 * np.arctanh(2.0 * self.function_amplitude) ** 2)
        return float(max(laplace, self.function_slope))

    def function_lookups(self):
        """Smoothed step function lookup tables (PrecalculateFunctionLookup:910-923)."""
        i = np.arange(self.function_length, dtype=np.float32)
        x = i - (self.function_length - 1) / 2.0
        if self.function_slope == 0.0:
            f = 0.5 - self.function_amplitude * np.sign(x)
        else:
            f = 0.5 - self.function_amplitude * np.tanh(x / (2.0 * self.function_slope))
        return jnp.asarray(f, jnp.float32), jnp.asarray(1.0 - f, jnp.float32)


class ViewPoints(NamedTuple):
    """Gathered per-frame model points for one body (RegionModel::DataPoint,
    region_model.h:89-95)."""

    center_f_body: jnp.ndarray  # (L, 3)
    normal_f_body: jnp.ndarray  # (L, 3)
    foreground_distance: jnp.ndarray  # (L,)
    background_distance: jnp.ndarray  # (L,)
    measured_depth_offset: jnp.ndarray  # (L,)
    modeled_depth_offset: jnp.ndarray  # (L,)


class DataLines(NamedTuple):
    """Per-line correspondence state (RegionModality::DataLine)."""

    center_f_body: jnp.ndarray  # (L, 3)
    center_u: jnp.ndarray  # (L,)
    center_v: jnp.ndarray  # (L,)
    normal_u: jnp.ndarray  # (L,)
    normal_v: jnp.ndarray  # (L,)
    delta_r: jnp.ndarray  # (L,)
    normal_component_to_scale: jnp.ndarray  # (L,)
    distribution: jnp.ndarray  # (L, D)
    mean: jnp.ndarray  # (L,)
    measured_variance: jnp.ndarray  # (L,)
    valid: jnp.ndarray  # (L,) bool


class MeasuredOcclusionInputs(NamedTuple):
    depth_image: jnp.ndarray  # (H, W) uint16
    body2depth_camera_pose: jnp.ndarray  # (4, 4)
    fu: jnp.ndarray
    fv: jnp.ndarray
    ppu: jnp.ndarray
    ppv: jnp.ndarray
    depth_scale: jnp.ndarray
    # Optional (d (L, K, K) raw depth, ok (L, K, K)) from
    # ops/depth_fast.presample_occlusion_windows: replaces the scattered HBM
    # window gather on the fused TPU path (identical wherever the window lies
    # inside the body-centered depth crop).
    presampled: tuple | None = None


class ModeledOcclusionInputs(NamedTuple):
    focused_depth: jnp.ndarray  # (S, S) float32 meters, +inf background
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    body_visible: jnp.ndarray  # () bool


class RegionCheckInputs(NamedTuple):
    silhouette: jnp.ndarray  # (S, S) int32 region ids
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    region_id: jnp.ndarray  # () int32
    body_visible: jnp.ndarray  # () bool


class ModeledOcclusionQueryInputs(NamedTuple):
    """Point-query variant of :class:`ModeledOcclusionInputs`.

    Carries focused-space triangle coefficients (ops/occlusion.py SceneCoeffs)
    instead of a rasterized depth image; the occlusion check evaluates depth at
    exactly the sampled pixels — identical results, no (S, S) render.
    """

    coeffs: jnp.ndarray        # (T, 12)
    tri_valid: jnp.ndarray     # (T,)
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    body_visible: jnp.ndarray  # () bool
    image_size: jnp.ndarray    # () int32 focused image side


class RegionCheckQueryInputs(NamedTuple):
    """Point-query variant of :class:`RegionCheckInputs` (region-id silhouette)."""

    coeffs: jnp.ndarray        # (T, 12)
    tri_valid: jnp.ndarray     # (T,)
    sil_region_id: jnp.ndarray  # (T,) int32 per-triangle region ids
    corner_u: jnp.ndarray
    corner_v: jnp.ndarray
    scale: jnp.ndarray
    region_id: jnp.ndarray     # () int32
    body_visible: jnp.ndarray  # () bool
    image_size: jnp.ndarray    # () int32


def _trunc(x):
    return jnp.trunc(x).astype(jnp.int32)


def _project_lines(points: ViewPoints, body2camera_pose, fu, fv, ppu, ppv):
    pose = jnp.asarray(body2camera_pose, jnp.float32)
    rot = pose[:3, :3]
    center_cam = points.center_f_body @ rot.T + pose[:3, 3]
    z = center_cam[:, 2]
    z_safe = jnp.where(z > 0.0, z, 1.0)
    center_u = center_cam[:, 0] * fu / z_safe + ppu
    center_v = center_cam[:, 1] * fv / z_safe + ppv
    normal_xy = points.normal_f_body @ rot[:2].T  # body2camera_rotation_xy_
    norm = jnp.linalg.norm(normal_xy, axis=-1)
    normal_xy = normal_xy / jnp.where(norm > 0.0, norm, 1.0)[:, None]
    return center_cam, z, center_u, center_v, normal_xy[:, 0], normal_xy[:, 1]


def _measured_occlusion_free(cfg: RegionConfig, center_f_body, depth_offset,
                             occ: MeasuredOcclusionInputs, width, height):
    """IsLineUnoccludedMeasured (region_modality.cpp:1343-1389), batched over lines."""
    pose = occ.body2depth_camera_pose
    c = center_f_body @ pose[:3, :3].T + pose[:3, 3]
    z = c[:, 2]
    z_safe = jnp.where(z > 0.0, z, 1.0)
    cu = c[:, 0] * occ.fu / z_safe + occ.ppu
    cv = c[:, 1] * occ.fv / z_safe + occ.ppv

    meter_to_pixel = occ.fu / z_safe
    diameter = 2.0 * cfg.measured_occlusion_radius * meter_to_pixel
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

    min_depth = ((z - depth_offset - cfg.measured_occlusion_threshold)
                 / occ.depth_scale).astype(jnp.float32)

    if occ.presampled is not None:
        d, sample_ok = occ.presampled
    else:
        k = jnp.arange(KMAX_N_OCCLUSION_STRIDES + 1, dtype=jnp.int32)
        us = u_min[:, None] + k[None, :] * stride[:, None]  # (L, K)
        vs = v_min[:, None] + k[None, :] * stride[:, None]
        u_ok = us <= u_max[:, None]
        v_ok = vs <= v_max[:, None]
        uu = jnp.clip(us, 0, width - 1)
        vv = jnp.clip(vs, 0, height - 1)
        d = occ.depth_image[vv[:, :, None], uu[:, None, :]].astype(jnp.float32)
        sample_ok = v_ok[:, :, None] & u_ok[:, None, :]
    occluding = sample_ok & (d > 0) & (d < min_depth[:, None, None])
    return ~jnp.any(occluding, axis=(1, 2))


def _modeled_occlusion_grid(cfg: RegionConfig, center_u, center_v, depth,
                            fu, occ, image_size):
    """Sample grid of IsLineUnoccludedModeled (region_modality.cpp:1391-1431).

    Returns (uu (L, K), vv (L, K), sample_ok (L, K, K)) with the (kv, ku) sample
    at pixel (vv[kv], uu[ku])."""
    z_safe = jnp.where(depth > 0.0, depth, 1.0)
    meter_to_pixel = (fu / z_safe) * occ.scale
    diameter = 2.0 * cfg.modeled_occlusion_radius * meter_to_pixel
    stride = _trunc(diameter / KMAX_N_OCCLUSION_STRIDES + 1.0)
    n_strides = _trunc(diameter / stride.astype(jnp.float32) + 0.5)
    rounded_diameter = n_strides * stride
    rounded_radius = 0.5 * rounded_diameter.astype(jnp.float32)

    fcu = (center_u - occ.corner_u) * occ.scale
    fcv = (center_v - occ.corner_v) * occ.scale
    u_min0 = _trunc(fcu - rounded_radius + 0.5)
    v_min0 = _trunc(fcv - rounded_radius + 0.5)
    u_max = jnp.minimum(u_min0 + rounded_diameter, image_size - 1)
    v_max = jnp.minimum(v_min0 + rounded_diameter, image_size - 1)
    u_min = jnp.maximum(u_min0, 0)
    v_min = jnp.maximum(v_min0, 0)

    k = jnp.arange(KMAX_N_OCCLUSION_STRIDES + 1, dtype=jnp.int32)
    us = u_min[:, None] + k[None, :] * stride[:, None]
    vs = v_min[:, None] + k[None, :] * stride[:, None]
    u_ok = us <= u_max[:, None]
    v_ok = vs <= v_max[:, None]
    uu = jnp.clip(us, 0, image_size - 1)
    vv = jnp.clip(vs, 0, image_size - 1)
    sample_ok = v_ok[:, :, None] & u_ok[:, None, :]
    return uu, vv, sample_ok


def _modeled_occlusion_from_min_depth(cfg: RegionConfig, depth, depth_offset,
                                      occ, min_depth):
    min_allowed = depth - depth_offset - cfg.modeled_occlusion_threshold
    free = min_depth > min_allowed
    return jnp.where(occ.body_visible, free, True)


def modeled_occlusion_free(cfg: RegionConfig, center_u, center_v, depth, depth_offset,
                           fu, occ: ModeledOcclusionInputs, image_size: int):
    """IsLineUnoccludedModeled (region_modality.cpp:1391-1431), batched over lines."""
    uu, vv, sample_ok = _modeled_occlusion_grid(
        cfg, center_u, center_v, depth, fu, occ, image_size)
    if isinstance(occ, ModeledOcclusionQueryInputs):
        from m3t_tpu.ops import occlusion as occlusion_ops

        lcount, kk = uu.shape
        gu = jnp.broadcast_to(uu[:, None, :], (lcount, kk, kk))
        gv = jnp.broadcast_to(vv[:, :, None], (lcount, kk, kk))
        inv = occlusion_ops.query_inv_depth(occ.coeffs, occ.tri_valid, gu, gv)
        # min depth over samples == 1 / max inverse depth: divide after reducing.
        min_depth = occlusion_ops.inv_to_depth(
            jnp.max(jnp.where(sample_ok, inv, 0.0), axis=(1, 2)))
    else:
        d = occ.focused_depth[vv[:, :, None], uu[:, None, :]]  # (L, Kv, Ku)
        min_depth = jnp.min(jnp.where(sample_ok, d, jnp.inf), axis=(1, 2))
    return _modeled_occlusion_from_min_depth(cfg, depth, depth_offset, occ,
                                             min_depth)


def _region_check_grid(cfg: RegionConfig, fscale, center_u, center_v,
                       normal_u, normal_v, chk, image_size):
    """Sample strides of IsDynamicLineRegionSufficient (cpp:1293-1341).

    Returns (fg_u, fg_v, bg_u, bg_v (L, K) int32 clipped pixels, bg_inb (L, K))."""
    focused_min_cd = cfg.min_continuous_distance * fscale * chk.scale
    focused_stride = jnp.maximum(
        (focused_min_cd - KREGION_OFFSET) / KN_REGION_STRIDE, 0.0
    )
    fcu = 0.5 + (center_u - chk.corner_u) * chk.scale
    fcv = 0.5 + (center_v - chk.corner_v) * chk.scale

    i = jnp.arange(KN_REGION_STRIDE + 1, dtype=jnp.float32)
    off_u = (KREGION_OFFSET + i[None, :] * focused_stride) * normal_u[:, None]
    off_v = (KREGION_OFFSET + i[None, :] * focused_stride) * normal_v[:, None]

    # Foreground side has no bounds check in the reference.
    fg_u = jnp.clip(_trunc(fcu[:, None] - off_u), 0, image_size - 1)
    fg_v = jnp.clip(_trunc(fcv[:, None] - off_v), 0, image_size - 1)

    # Background side: break on leaving the image.
    bu = fcu[:, None] + off_u
    bv = fcv[:, None] + off_v
    inb = (bu >= 0) & (bu < image_size) & (bv >= 0) & (bv < image_size)
    inb = jnp.cumprod(inb.astype(jnp.int32), axis=1).astype(bool)
    bg_u = jnp.clip(_trunc(bu), 0, image_size - 1)
    bg_v = jnp.clip(_trunc(bv), 0, image_size - 1)
    return fg_u, fg_v, bg_u, bg_v, inb


def _region_check_from_vals(chk, fg_vals, bg_vals, bg_inb):
    fg_ok = jnp.all(fg_vals == chk.region_id, axis=1)
    bg_ok = jnp.all(~bg_inb | (bg_vals != chk.region_id), axis=1)
    return jnp.where(chk.body_visible, fg_ok & bg_ok, True)


def region_check_ok(cfg: RegionConfig, fscale, center_u, center_v, normal_u, normal_v,
                    chk: RegionCheckInputs, image_size: int):
    """IsDynamicLineRegionSufficient (region_modality.cpp:1293-1341), batched."""
    fg_u, fg_v, bg_u, bg_v, inb = _region_check_grid(
        cfg, fscale, center_u, center_v, normal_u, normal_v, chk, image_size)

    if isinstance(chk, RegionCheckQueryInputs):
        from m3t_tpu.ops import occlusion as occlusion_ops

        def sil_at(u_i, v_i):
            return occlusion_ops.query_id(
                chk.coeffs, chk.tri_valid, chk.sil_region_id, u_i, v_i)
    else:
        def sil_at(u_i, v_i):
            return chk.silhouette[v_i, u_i]

    fg_vals = sil_at(fg_u, fg_v)
    bg_vals = sil_at(bg_u, bg_v)
    return _region_check_from_vals(chk, fg_vals, bg_vals, inb)


def combined_scene_checks(cfg: RegionConfig, fscale, center_u, center_v,
                          normal_u, normal_v, z, modeled_depth_offset, fu,
                          region_check: RegionCheckQueryInputs | None,
                          modeled_occlusion: ModeledOcclusionQueryInputs | None):
    """Region checking + modeled occlusion via ONE culled scene evaluation.

    Both checks consume the same SceneCoeffs (pipeline._scene_region_inputs), and
    all their samples for one line sit within a few pixels of each other, so the
    fused pipeline batches them into a single Pallas point-query call
    (ops/occlusion.py _query_eval) instead of three separate kernel launches.
    Returns (region_ok (L,) | None, modeled_free (L,) | None) with
    identical semantics to :func:`region_check_ok` / :func:`modeled_occlusion_free`.
    """
    from m3t_tpu.ops import occlusion as occlusion_ops

    src = region_check if region_check is not None else modeled_occlusion
    image_size = src.image_size
    sil = (region_check.sil_region_id if region_check is not None
           else jnp.zeros(src.coeffs.shape[0], jnp.int32))

    qs_u, qs_v = [], []
    if modeled_occlusion is not None:
        uu, vv, sample_ok = _modeled_occlusion_grid(
            cfg, center_u, center_v, z, fu, modeled_occlusion, image_size)
        lcount, kk = uu.shape
        gu = jnp.broadcast_to(uu[:, None, :], (lcount, kk, kk)).reshape(lcount, -1)
        gv = jnp.broadcast_to(vv[:, :, None], (lcount, kk, kk)).reshape(lcount, -1)
        qs_u.append(gu)
        qs_v.append(gv)
    if region_check is not None:
        fg_u, fg_v, bg_u, bg_v, bg_inb = _region_check_grid(
            cfg, fscale, center_u, center_v, normal_u, normal_v, region_check,
            image_size)
        qs_u += [fg_u, bg_u]
        qs_v += [fg_v, bg_v]

    u_all = jnp.concatenate(qs_u, axis=1).astype(jnp.float32)
    v_all = jnp.concatenate(qs_v, axis=1).astype(jnp.float32)
    inv_all, id_all = occlusion_ops._query_eval(
        src.coeffs, src.tri_valid, sil, u_all, v_all)

    off = 0
    modeled_free = region_ok = None
    if modeled_occlusion is not None:
        inv = inv_all[:, : kk * kk].reshape(lcount, kk, kk)
        off = kk * kk
        min_depth = occlusion_ops.inv_to_depth(
            jnp.max(jnp.where(sample_ok, inv, 0.0), axis=(1, 2)))
        modeled_free = _modeled_occlusion_from_min_depth(
            cfg, z, modeled_depth_offset, modeled_occlusion, min_depth)
    if region_check is not None:
        kr = fg_u.shape[1]
        fg_vals = id_all[:, off: off + kr]
        bg_vals = id_all[:, off + kr: off + 2 * kr]
        region_ok = _region_check_from_vals(region_check, fg_vals, bg_vals, bg_inb)
    return region_ok, modeled_free


def calculate_correspondences(
    cfg: RegionConfig,
    scale: int,
    points: ViewPoints,
    n_lines,
    body2camera_pose,
    color_image,
    hist_f,
    hist_b,
    fu, fv, ppu, ppv, width: int, height: int,
    handle_occlusions,
    measured_occlusion: MeasuredOcclusionInputs | None = None,
    modeled_occlusion: ModeledOcclusionInputs | None = None,
    region_check: RegionCheckInputs | None = None,
    function_lookup_f=None,
    function_lookup_b=None,
) -> DataLines:
    """One correspondence pass (reference: CalculateCorrespondences, cpp:390-465).

    ``scale`` is static (one compiled variant per coarse-to-fine level, matching the
    reference's per-iteration scales {6,4,2,1}); everything else is traced.
    """
    L = cfg.n_lines_max
    S = cfg.line_length_in_segments
    D = cfg.distribution_length
    F = cfg.function_length
    line_length = S * scale
    fscale = float(scale)
    ll_minus_1 = line_length - 1
    ll_minus_1_half = (line_length - 1) * 0.5
    ll_half_minus_1 = line_length * 0.5 - 1.0

    if function_lookup_f is None:
        function_lookup_f, function_lookup_b = cfg.function_lookups()

    center_cam, z, center_u, center_v, normal_u, normal_v = _project_lines(
        points, body2camera_pose, fu, fv, ppu, ppv
    )

    line_index_ok = jnp.arange(L) < n_lines

    # --- IsLineValid (cpp:1252-1291) --------------------------------------------------
    continuous_distance = (
        jnp.minimum(points.background_distance, points.foreground_distance)
        * fu / (jnp.where(z > 0, z, 1.0) * fscale)
    )
    valid = line_index_ok
    valid &= continuous_distance >= cfg.min_continuous_distance
    valid &= z > 0.0
    i_cu = _trunc(center_u + 0.5)
    i_cv = _trunc(center_v + 0.5)
    valid &= (i_cu >= 0) & (i_cu <= width - 1) & (i_cv >= 0) & (i_cv <= height - 1)

    if region_check is not None:
        valid &= region_check_ok(
            cfg, fscale, center_u, center_v, normal_u, normal_v, region_check,
            region_check.silhouette.shape[0],
        )

    occl_ok = jnp.ones((L,), bool)
    if measured_occlusion is not None:
        occl_ok &= _measured_occlusion_free(
            cfg, points.center_f_body, points.measured_depth_offset,
            measured_occlusion,
            measured_occlusion.depth_image.shape[1],
            measured_occlusion.depth_image.shape[0],
        )
    if modeled_occlusion is not None:
        occl_ok &= modeled_occlusion_free(
            cfg, center_u, center_v, z, points.modeled_depth_offset, fu,
            modeled_occlusion, modeled_occlusion.focused_depth.shape[0],
        )

    # --- CalculateSegmentProbabilities (cpp:1433-1573) --------------------------------
    is_u_dom = jnp.abs(normal_v) < jnp.abs(normal_u)
    normal_p = jnp.where(is_u_dom, normal_u, normal_v)  # dominant-axis normal component
    normal_s = jnp.where(is_u_dom, normal_v, normal_u)
    center_p = jnp.where(is_u_dom, center_u, center_v)
    center_s = jnp.where(is_u_dom, center_v, center_u)
    size_p = jnp.where(is_u_dom, width, height)
    size_s = jnp.where(is_u_dom, height, width)
    # Degenerate contour normals (projected to ~zero) cannot define a line direction.
    normal_ok = jnp.abs(normal_p) > 0.0
    valid &= normal_ok
    step = normal_s / jnp.where(normal_ok, normal_p, 1.0)

    p0 = _trunc(center_p - ll_half_minus_1)
    p_end = p0 + ll_minus_1
    s_f0 = center_s + step * (p0.astype(jnp.float32) - center_p) + 0.5
    s_f_end = s_f0 + step * float(ll_minus_1)

    on_image = (
        (p0 >= 0) & (p_end <= size_p - 1)
        & (_trunc(s_f0) >= 0) & (_trunc(s_f0) <= size_s - 1)
        & (_trunc(s_f_end) >= 1) & (_trunc(s_f_end) <= size_s - 2)
    )
    valid &= on_image

    k = jnp.arange(line_length, dtype=jnp.int32)
    p_k = p0[:, None] + k[None, :]
    s_k = _trunc(s_f0[:, None] + k[None, :].astype(jnp.float32) * step[:, None])
    u_k = jnp.where(is_u_dom[:, None], p_k, s_k)
    v_k = jnp.where(is_u_dom[:, None], s_k, p_k)
    u_k = jnp.clip(u_k, 0, width - 1)
    v_k = jnp.clip(v_k, 0, height - 1)

    pixels = color_image[v_k, u_k]  # (L, LL, 3)
    pf, pb = hist_ops.lookup_probabilities(hist_f, hist_b, pixels, cfg.n_histogram_bins)

    # Per-segment products: forward lines fill segment k//scale, reverse lines fill
    # S-1 - k//scale (cpp:1458-1489).  Compute forward then flip where needed.
    seg_f = jnp.prod(pf.reshape(L, S, scale), axis=2)
    seg_b = jnp.prod(pb.reshape(L, S, scale), axis=2)
    forward = normal_p > 0
    seg_f = jnp.where(forward[:, None], seg_f, seg_f[:, ::-1])
    seg_b = jnp.where(forward[:, None], seg_b, seg_b[:, ::-1])

    if scale > 1:
        total = seg_f + seg_b
        nz = total > 0.0
        safe = jnp.where(nz, total, 1.0)
        seg_f = jnp.where(nz, seg_f / safe, 0.5)
        seg_b = jnp.where(nz, seg_b / safe, 0.5)

    normal_component_to_scale = jnp.abs(normal_p) / fscale
    delta_r = (
        jnp.floor(center_p - ll_minus_1_half + 0.5) + ll_minus_1_half - center_p
    ) / jnp.where(normal_ok, normal_p, 1.0)

    # --- CalculateDistribution (cpp:1600-1637) ----------------------------------------
    # dist[d] = prod_i seg_f[d+i]*lf[i] + seg_b[d+i]*lb[i]
    d_idx = jnp.arange(D)[:, None] + jnp.arange(F)[None, :]  # (D, F)
    windows_f = seg_f[:, d_idx]  # (L, D, F)
    windows_b = seg_b[:, d_idx]
    mixed = (windows_f * function_lookup_f[None, None, :]
             + windows_b * function_lookup_b[None, None, :])
    distribution = jnp.prod(mixed, axis=2)  # (L, D)
    area = jnp.sum(distribution, axis=1, keepdims=True)
    distribution = distribution / jnp.where(area > 0.0, area, 1.0)

    # --- CalculateDistributionMoments (cpp:1639-1658) ---------------------------------
    idx = jnp.arange(D, dtype=jnp.float32)
    mean_from_begin = jnp.sum(idx[None, :] * distribution, axis=1)
    var = jnp.sum(
        (idx[None, :] - mean_from_begin[:, None]) ** 2 * distribution, axis=1
    )
    mean = mean_from_begin - (D - 1) / 2.0
    measured_variance = jnp.maximum(var, cfg.min_expected_variance)

    # --- two-pass occlusion fallback (cpp:435-463) ------------------------------------
    valid_with = valid & occl_ok
    n_with = jnp.sum(valid_with)
    use_occlusions = handle_occlusions & (n_with >= cfg.min_n_unoccluded_lines)
    final_valid = jnp.where(use_occlusions, valid_with, valid)

    return DataLines(
        center_f_body=points.center_f_body,
        center_u=center_u,
        center_v=center_v,
        normal_u=normal_u,
        normal_v=normal_v,
        delta_r=delta_r,
        normal_component_to_scale=normal_component_to_scale,
        distribution=distribution,
        mean=mean,
        measured_variance=measured_variance,
        valid=final_valid,
    )


def calculate_gradient_and_hessian(
    cfg: RegionConfig,
    lines: DataLines,
    body2camera_pose,
    fu, fv, ppu, ppv,
    standard_deviation: float,
    global_iteration: bool,
):
    """Newton gradient/Hessian in body frame (reference: cpp:485-558).

    Returns (gradient (6,), hessian (6, 6)).  ``global_iteration`` selects the
    mean/variance form vs the local log-likelihood finite difference.
    """
    D = cfg.distribution_length
    pose = jnp.asarray(body2camera_pose, jnp.float32)
    rot = pose[:3, :3]
    variance = standard_deviation ** 2

    c = lines.center_f_body @ rot.T + pose[:3, 3]
    x, y, z = c[:, 0], c[:, 1], c[:, 2]
    z_safe = jnp.where(z != 0, z, 1.0)
    fu_z = fu / z_safe
    fv_z = fv / z_safe
    xfu_z = x * fu_z
    yfv_z = y * fv_z
    delta_cs = (
        lines.normal_u * (xfu_z + ppu - lines.center_u)
        + lines.normal_v * (yfv_z + ppv - lines.center_v)
        - lines.delta_r
    ) * lines.normal_component_to_scale

    if global_iteration:
        dll = (lines.mean - delta_cs) / lines.measured_variance
        valid = lines.valid
    else:
        dist_idx_upper = _trunc(delta_cs + (D + 1) / 2.0)
        dist_idx_lower = dist_idx_upper - 1
        in_range = (dist_idx_upper > 0) & (dist_idx_upper < D)
        iu = jnp.clip(dist_idx_upper, 0, D - 1)
        il = jnp.clip(dist_idx_lower, 0, D - 1)
        p_u = jnp.take_along_axis(lines.distribution, iu[:, None], axis=1)[:, 0]
        p_l = jnp.take_along_axis(lines.distribution, il[:, None], axis=1)[:, 0]
        safe_u = jnp.maximum(p_u, 1e-30)
        safe_l = jnp.maximum(p_l, 1e-30)
        dll = (jnp.log(safe_u) - jnp.log(safe_l)) * cfg.learning_rate / lines.measured_variance
        valid = lines.valid & in_range

    nts = lines.normal_component_to_scale
    dcenter = jnp.stack(
        [
            nts * lines.normal_u * fu_z,
            nts * lines.normal_v * fv_z,
            nts * (-lines.normal_u * xfu_z - lines.normal_v * yfv_z) / z_safe,
        ],
        axis=1,
    )  # (L, 3)
    dtrans = dcenter @ rot  # row vector times body2camera rotation (cpp:537)
    dtheta = jnp.concatenate(
        [jnp.cross(lines.center_f_body, dtrans), dtrans], axis=1
    )  # (L, 6)

    weight = cfg.min_expected_variance / (nts * nts * variance)
    wmask = jnp.where(valid, weight, 0.0)

    gradient = jnp.sum((wmask * dll)[:, None] * dtheta, axis=0)
    hessian = -jnp.einsum(
        "l,li,lj->ij", wmask / lines.measured_variance, dtheta, dtheta,
        preferred_element_type=jnp.float32,
    )
    return gradient, hessian


def add_line_pixel_colors(
    cfg: RegionConfig,
    points: ViewPoints,
    n_lines,
    body2camera_pose,
    color_image,
    memory_f,
    memory_b,
    fu, fv, ppu, ppv, width: int, height: int,
    handle_occlusions,
    measured_occlusion: MeasuredOcclusionInputs | None = None,
    modeled_occlusion: ModeledOcclusionInputs | None = None,
    region_check: RegionCheckInputs | None = None,
):
    """Collect fg/bg pixel colors into histogram memory (reference: cpp:1025-1155)."""
    L = cfg.n_lines_max
    max_steps = int(np.ceil(cfg.max_considered_line_length)) + 1

    center_cam, z, center_u, center_v, normal_u, normal_v = _project_lines(
        points, body2camera_pose, fu, fv, ppu, ppv
    )

    valid = jnp.arange(L) < n_lines
    valid &= z > 0.0
    i_cu = _trunc(center_u + 0.5)
    i_cv = _trunc(center_v + 0.5)
    valid &= (i_cu >= 0) & (i_cu <= width - 1) & (i_cv >= 0) & (i_cv <= height - 1)

    if measured_occlusion is not None:
        free = _measured_occlusion_free(
            cfg, points.center_f_body, points.measured_depth_offset, measured_occlusion,
            measured_occlusion.depth_image.shape[1],
            measured_occlusion.depth_image.shape[0],
        )
        valid &= jnp.where(handle_occlusions, free, True)
    if modeled_occlusion is not None:
        free = modeled_occlusion_free(
            cfg, center_u, center_v, z, points.modeled_depth_offset, fu,
            modeled_occlusion, modeled_occlusion.focused_depth.shape[0],
        )
        valid &= jnp.where(handle_occlusions, free, True)

    length_f = jnp.full((L,), cfg.max_considered_line_length, jnp.float32)
    length_b = jnp.full((L,), cfg.max_considered_line_length, jnp.float32)
    if region_check is not None:
        length_f, length_b = dynamic_region_distance(
            cfg, center_u, center_v, normal_u, normal_v, region_check,
            region_check.silhouette.shape[0],
        )

    z_safe = jnp.where(z > 0, z, 1.0)
    l_f = points.foreground_distance * fu / z_safe
    l_b = points.background_distance * fu / z_safe
    length_f = jnp.minimum(length_f, l_f - 2.0 * cfg.unconsidered_line_length)
    length_b = jnp.minimum(length_b, l_b - 2.0 * cfg.unconsidered_line_length)

    abs_nu = jnp.abs(normal_u)
    abs_nv = jnp.abs(normal_v)
    u_dom = abs_nu > abs_nv
    u_step = jnp.where(u_dom, jnp.sign(normal_u), normal_u / jnp.where(abs_nv > 0, abs_nv, 1.0))
    v_step = jnp.where(u_dom, normal_v / jnp.where(abs_nu > 0, abs_nu, 1.0), jnp.sign(normal_v))
    dom = jnp.where(u_dom, abs_nu, abs_nv)
    proj_len_f = _trunc(length_f * dom + 0.5)
    proj_len_b = _trunc(length_b * dom + 0.5)

    k = jnp.arange(max_steps, dtype=jnp.float32)

    def collect(sign, proj_len):
        u0 = center_u + sign * normal_u * cfg.unconsidered_line_length + 0.5
        v0 = center_v + sign * normal_v * cfg.unconsidered_line_length + 0.5
        us = u0[:, None] + sign * k[None, :] * u_step[:, None]
        vs = v0[:, None] + sign * k[None, :] * v_step[:, None]
        iu = _trunc(us)
        iv = _trunc(vs)
        inb = (iu >= 0) & (iu <= width - 1) & (iv >= 0) & (iv <= height - 1)
        inb = jnp.cumprod(inb.astype(jnp.int32), axis=1).astype(bool)  # break on OOB
        mask = inb & (jnp.arange(max_steps)[None, :] < proj_len[:, None]) & valid[:, None]
        iu = jnp.clip(iu, 0, width - 1)
        iv = jnp.clip(iv, 0, height - 1)
        return color_image[iv, iu], mask

    fg_px, fg_mask = collect(-1.0, proj_len_f)
    bg_px, bg_mask = collect(1.0, proj_len_b)
    memory_f = hist_ops.add_colors(memory_f, fg_px, fg_mask, cfg.n_histogram_bins)
    memory_b = hist_ops.add_colors(memory_b, bg_px, bg_mask, cfg.n_histogram_bins)
    return memory_f, memory_b


def dynamic_region_distance(cfg: RegionConfig, center_u, center_v, normal_u, normal_v,
                            chk: RegionCheckInputs, image_size: int):
    """DynamicRegionDistance (region_modality.cpp:1157-1229), batched over lines.

    Note: the reference has an apparent copy-paste slip at cpp:1223 (background search
    writes the *foreground* distance); we implement the documented intent — the background
    search limits the background distance.
    """
    L = center_u.shape[0]
    stride = cfg.max_considered_line_length / KN_REGION_STRIDE
    focused_stride = stride * chk.scale
    delta_start = KREGION_OFFSET / chk.scale - cfg.unconsidered_line_length
    i_start = jnp.maximum(_trunc(delta_start / stride + 1.0), 0)

    offset = cfg.unconsidered_line_length + i_start.astype(jnp.float32) * stride
    focused_offset = offset * chk.scale
    fcu = 0.5 + (center_u - chk.corner_u) * chk.scale
    fcv = 0.5 + (center_v - chk.corner_v) * chk.scale

    i = jnp.arange(KN_REGION_STRIDE + 1, dtype=jnp.float32)[None, :]
    active = i >= i_start.astype(jnp.float32)
    du = (focused_offset + (i - i_start) * focused_stride) * normal_u[:, None]
    dv = (focused_offset + (i - i_start) * focused_stride) * normal_v[:, None]

    def first_break(u, v, want_equal):
        oob = (u >= image_size) | (u < 0) | (v >= image_size) | (v < 0)
        iu = jnp.clip(_trunc(u), 0, image_size - 1)
        iv = jnp.clip(_trunc(v), 0, image_size - 1)
        vals = chk.silhouette[iv, iu]
        hit = (vals == chk.region_id) if want_equal else (vals != chk.region_id)
        stop_oob = oob & active
        stop_hit = hit & active & ~oob
        # index of first stop of either kind; distance semantics differ.
        any_stop = stop_oob | stop_hit
        first = jnp.argmax(any_stop, axis=1)
        has_stop = jnp.any(any_stop, axis=1)
        stopped_oob = jnp.take_along_axis(stop_oob, first[:, None], axis=1)[:, 0]
        return has_stop, first, stopped_oob

    # Foreground: walk inward; stop when pixel leaves the region (or image).
    has_f, first_f, oob_f = first_break(fcu[:, None] - du, fcv[:, None] - dv,
                                        want_equal=False)
    dist_f = jnp.full((L,), cfg.max_considered_line_length, jnp.float32)
    stop_i = first_f.astype(jnp.float32)
    at_start = first_f == i_start
    dist_hit = jnp.where(at_start, 0.0, stride * stop_i)
    dist_oob = stride * stop_i
    dist_f = jnp.where(has_f, jnp.where(oob_f, dist_oob, dist_hit), dist_f)

    # Background: walk outward; stop when pixel re-enters the region (or leaves image).
    has_b, first_b, oob_b = first_break(fcu[:, None] + du, fcv[:, None] + dv,
                                        want_equal=True)
    dist_b = jnp.full((L,), cfg.max_considered_line_length, jnp.float32)
    stop_i_b = first_b.astype(jnp.float32)
    at_start_b = first_b == i_start
    dist_hit_b = jnp.where(at_start_b, 0.0, stride * stop_i_b)
    dist_b = jnp.where(
        has_b,
        jnp.where(oob_b, cfg.max_considered_line_length, dist_hit_b),
        dist_b,
    )
    body_vis = chk.body_visible
    dist_f = jnp.where(body_vis, dist_f, cfg.max_considered_line_length)
    dist_b = jnp.where(body_vis, dist_b, cfg.max_considered_line_length)
    return dist_f, dist_b
