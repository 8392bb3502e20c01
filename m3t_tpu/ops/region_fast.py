"""TPU-fast region-modality core: Pallas dynamic-gather kernels + lane-major glue.

This module is the performance path for the region modality.  It reproduces the numerics
of ``m3t_tpu.ops.region_fn`` (itself a redesign of the reference's
``m3t/src/region_modality.cpp``) but restructures the computation for the TPU memory
system:

* The camera image is cropped once per body per cycle to a ``(C, C)`` window around the
  projected body center and converted to flat histogram-bin indices (reference bitshift
  scheme, color_histograms.cpp:61-69).  All later pixel access happens inside this crop.
* Correspondence lines keep the reference's staircase walk (region_modality.cpp:1433-1573:
  the dominant axis advances one pixel per step, the secondary axis is the truncation of
  an affine function).  Because the secondary coordinate is affine in the dominant one,
  a line's pixels can be fetched with TWO intra-register ``tpu.dynamic_gather`` ops
  (via ``jnp.take_along_axis`` inside Pallas): first select per (image-row, line) the
  wanted column, then select per (line, step) the wanted row — no XLA gather, no one-hot
  matmuls, no scalar loops.
* Per-pixel foreground/background probabilities are normalized (p_f + p_b == 1,
  region_modality.cpp:1575-1598), so a single f32 "ratio" table lookup per pixel
  suffices; the 4096-bin table is resident in VMEM as (32, 128) and resolved with 32
  broadcast-row lane-gathers.
* Everything per-line lives with lines in the LANE dimension ((channels, L) layout) so
  the VPU sees full 128-lane vectors instead of 3- or 6-wide minor dimensions.

Layouts:
  line params   (NPARAM=8, LP)      LP = padded line count (multiple of 128)
  kernel output (LP, KP)            KP = padded line length (multiple of 8)
  model points  (V, 3, L)           vs (V, L, 3) in the object-graph path
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3t_tpu.ops.region_fn import RegionConfig

# Parameter-row indices for the staircase kernel input.
_ROW_R0 = 0     # dominant-axis start, crop coords (integer-valued f32)
_ROW_S0 = 1     # secondary-axis affine offset at k == 0, crop coords (f32)
_ROW_STEP = 2   # secondary-axis slope per dominant-axis step (f32)
_ROW_UDOM = 3   # 1.0 if the u axis is dominant (sample the transposed crop)
_ROW_DIR = 4    # dominant-axis direction (+1 / -1) per step
_NPARAM = 8


def _use_interpret() -> bool:
    """Pallas interpret mode on CPU so the same code runs under the test mesh."""
    return jax.default_backend() == "cpu"


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ----------------------------------------------------------------------------------------
# Crop extraction / binning (XLA)
# ----------------------------------------------------------------------------------------


def crop_corners(center_u, center_v, crop_size: int, width: int, height: int):
    """Top-left crop corner per body so the crop stays inside the image."""
    cu = jnp.clip(jnp.round(center_u).astype(jnp.int32) - crop_size // 2,
                  0, max(width - crop_size, 0))
    cv = jnp.clip(jnp.round(center_v).astype(jnp.int32) - crop_size // 2,
                  0, max(height - crop_size, 0))
    return cu, cv


def binify_crops(images_planar, corner_u, corner_v, crop_size: int, n_bins: int):
    """Extract per-body crops from planar uint8 images and convert to bin indices.

    images_planar: (B, 3, H, W) uint8 in the image channel order used by the
    histograms (BGR for reference-compatible color cameras).  Returns
    (bin_crop (B, C, C) int32, bin_cropT (B, C, C) int32).
    """
    shift = 8 - (n_bins.bit_length() - 1)
    n = n_bins

    def one(img, cu, cv):
        crop = jax.lax.dynamic_slice(img, (0, cv, cu), (3, crop_size, crop_size))
        c = crop.astype(jnp.int32) >> shift
        return c[0] * (n * n) + c[1] * n + c[2]

    bin_crop = jax.vmap(one)(images_planar, corner_u, corner_v)
    return bin_crop, jnp.swapaxes(bin_crop, 1, 2)


def ratio_table(hist_f, hist_b):
    """Per-bin normalized foreground probability (region_modality.cpp:1575-1598).

    hist_f/hist_b: (..., n_bins**3).  Returns (..., 32, 128)-shaped f32 table for the
    kernel (pf + pb == 1 after normalization, so one value per bin suffices).
    """
    total = hist_f + hist_b
    nz = total > 0.0
    r = jnp.where(nz, hist_f / jnp.where(nz, total, 1.0), 0.5)
    return r.reshape(r.shape[:-1] + (r.shape[-1] // 128, 128))


# ----------------------------------------------------------------------------------------
# Pallas staircase-sampling kernels
# ----------------------------------------------------------------------------------------


def _ta(x, idx):
    return jnp.take_along_axis(x, idx, axis=1)


def _staircase_bins(crop_ref, cropT_ref, r0g, s0g, stg, udomg, dirg, kp: int, c: int):
    """Gather the (128 lines, kp steps) staircase samples for one line group.

    For line l, step k: row = r0[l] + dir[l]*k (crop coords, dominant axis), column =
    floor(s0[l] + dir[l]*k*step[l]) (secondary axis).  Implemented as two composed
    intra-register gathers; the closed-form column-at-row function is
    col(i) = floor(s0 + (i - r0)*step') with step' = step*dir (exact because
    dir*dir == 1).
    """
    n_stripes = c // 128
    i_iota = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 0).astype(jnp.float32)
    stp = stg * dirg
    c1f = jnp.floor(s0g + (i_iota - r0g) * stp)
    c1 = jnp.clip(c1f.astype(jnp.int32), 0, c - 1)

    def from_stripes(x):
        # Combine stripes: at iteration s keep previously-resolved values where
        # c1 < 128*s (they came from earlier stripes), else take stripe s's gather
        # (values for c1 >= 128*(s+1) get overwritten by later stripes).
        out = None
        for s in range(n_stripes):
            g = _ta(x[:, 128 * s:128 * (s + 1)], jnp.clip(c1 - 128 * s, 0, 127))
            out = g if out is None else jnp.where(c1 < 128 * s, out, g)
        return out

    p_v = from_stripes(crop_ref[:, :])
    p_u = from_stripes(cropT_ref[:, :])
    p = jnp.where(udomg > 0.5, p_u, p_v)                       # (c, 128) bins
    pt = p.T                                                    # (128, c)

    # The Mosaic gather needs idx.shape == x.shape: gather full 128-wide blocks
    # (as many as kp requires — lines longer than 128 pixels appear at the
    # coarsest reference scales, e.g. 19 segments x scale 7) and slice to kp.
    r0l = r0g.astype(jnp.float32).reshape(128, 1)
    dirl = dirg.reshape(128, 1)
    blocks = []
    for base in range(0, kp, 128):
        k_iota = base + jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        idx2 = jnp.clip(
            (r0l + dirl * k_iota.astype(jnp.float32)).astype(jnp.int32),
            0, c - 1)
        out = None
        for h in range(n_stripes):
            g = _ta(pt[:, 128 * h:128 * (h + 1)], jnp.clip(idx2 - 128 * h, 0, 127))
            out = g if out is None else jnp.where(idx2 < 128 * h, out, g)
        blocks.append(out)
    full = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=1)
    return full[:, :kp]                                         # (128, kp) int32


def _table_lookup(bins, table_ref):
    """bins (R, 128) int32 in [0, rows*128) -> values from a (rows, 128) f32 VMEM
    table ((32, 128) for the default 16^3 bins; (256, 128) for 32^3).

    The lane dimension must be 128 so indices address a full register row.
    """
    rows = table_ref.shape[0]
    row = bins >> 7
    lane = bins & 127
    acc = jnp.zeros(bins.shape, jnp.float32)
    for r in range(rows):
        t = jnp.broadcast_to(table_ref[r, :][None, :], bins.shape)
        acc = jnp.where(row == r, _ta(t, lane), acc)
    return acc


def _sample_kernel(params_ref, crop_ref, cropT_ref, table_ref, out_ref, *,
                   kp: int, lp: int, c: int, output: str):
    for g in range(lp // 128):
        sl = slice(128 * g, 128 * (g + 1))
        r0g = params_ref[_ROW_R0, sl][None, :]
        s0g = params_ref[_ROW_S0, sl][None, :]
        stg = params_ref[_ROW_STEP, sl][None, :]
        udomg = params_ref[_ROW_UDOM, sl][None, :]
        dirg = params_ref[_ROW_DIR, sl][None, :]
        bins = _staircase_bins(crop_ref, cropT_ref, r0g, s0g, stg, udomg, dirg, kp, c)
        bins_t = bins.T  # (kp, 128 lines): lines in lanes for the table lookup
        if output == "ratio":
            out_ref[:, sl] = _table_lookup(bins_t, table_ref)
        else:
            out_ref[:, sl] = bins_t


@functools.partial(jax.jit, static_argnames=("kp", "output"))
def sample_lines(params, bin_crop, bin_cropT, table, kp: int, output: str = "ratio"):
    """Batched staircase line sampling.

    params: (B, 8, LP) f32 line parameters (rows _ROW_*).
    bin_crop/bin_cropT: (B, C, C) int32 flat histogram-bin crops.
    table: (B, n_bins^3/128, 128) f32 per-bin values (ignored when output == 'bins').
    Returns (B, kp, LP): f32 ratio samples, or int32 bin indices (k in sublanes,
    lines in lanes).
    """
    b, _, lp = params.shape
    c = bin_crop.shape[-1]
    t_rows = table.shape[-2]
    kern = functools.partial(_sample_kernel, kp=kp, lp=lp, c=c, output=output)

    def kernel(params_ref, crop_ref, cropT_ref, table_ref, out_ref):
        kern(params_ref.at[0], crop_ref.at[0], cropT_ref.at[0], table_ref.at[0],
             out_ref.at[0])

    out_dtype = jnp.float32 if output == "ratio" else jnp.int32
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, _NPARAM, lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kp, lp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kp, lp), out_dtype),
        interpret=_use_interpret(),
    )(params, bin_crop, bin_cropT, table)


# ----------------------------------------------------------------------------------------
# Lane-major per-frame glue (vmapped over bodies by the pipeline)
# ----------------------------------------------------------------------------------------


class ViewPointsCL(NamedTuple):
    """Channel-major gathered model points for one body (cf. region_fn.ViewPoints)."""

    center_f_body: jnp.ndarray       # (3, L)
    normal_f_body: jnp.ndarray       # (3, L)
    foreground_distance: jnp.ndarray  # (L,)
    background_distance: jnp.ndarray  # (L,)
    measured_depth_offset: jnp.ndarray  # (L,)
    modeled_depth_offset: jnp.ndarray   # (L,)


class LineGeometry(NamedTuple):
    """Per-line projection results and staircase parameters (all (LP,))."""

    center_u: jnp.ndarray
    center_v: jnp.ndarray
    normal_u: jnp.ndarray
    normal_v: jnp.ndarray
    center_f_body: jnp.ndarray       # (3, LP)
    normal_p: jnp.ndarray
    delta_r: jnp.ndarray
    normal_component_to_scale: jnp.ndarray
    params: jnp.ndarray              # (8, LP) kernel input
    valid: jnp.ndarray               # (LP,) bool


class DataLinesCL(NamedTuple):
    """Lane-major correspondence state (cf. region_fn.DataLines)."""

    center_f_body: jnp.ndarray       # (3, LP)
    center_u: jnp.ndarray            # (LP,)
    center_v: jnp.ndarray
    normal_u: jnp.ndarray
    normal_v: jnp.ndarray
    delta_r: jnp.ndarray
    normal_component_to_scale: jnp.ndarray
    distribution: jnp.ndarray        # (D, LP)
    mean: jnp.ndarray                # (LP,)
    measured_variance: jnp.ndarray   # (LP,)
    valid: jnp.ndarray               # (LP,) bool


def _pad_lanes(x, lp):
    pad = lp - x.shape[-1]
    if pad <= 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)


def project_lines_cl(points: ViewPointsCL, pose, fu, fv, ppu, ppv):
    """Channel-major version of region_fn._project_lines (cpp:1231-1250)."""
    rot = pose[:3, :3]
    center_cam = rot @ points.center_f_body + pose[:3, 3][:, None]   # (3, L)
    z = center_cam[2]
    z_safe = jnp.where(z > 0.0, z, 1.0)
    center_u = center_cam[0] * fu / z_safe + ppu
    center_v = center_cam[1] * fv / z_safe + ppv
    normal_xy = rot[:2] @ points.normal_f_body                        # (2, L)
    norm = jnp.sqrt(normal_xy[0] ** 2 + normal_xy[1] ** 2)
    safe = jnp.where(norm > 0.0, norm, 1.0)
    return z, center_u, center_v, normal_xy[0] / safe, normal_xy[1] / safe


def line_geometry(cfg: RegionConfig, scale: int, points: ViewPointsCL, n_lines,
                  pose, fu, fv, ppu, ppv, width: int, height: int,
                  corner_u, corner_v, crop_size: int, lp: int,
                  region_check=None, measured_occlusion=None,
                  modeled_occlusion=None, handle_occlusions=None) -> LineGeometry:
    """Project model points and derive staircase parameters + validity.

    Mirrors region_fn.calculate_correspondences up to (and excluding) pixel access;
    adds the crop-coverage requirement (lines must stay inside the (C, C) crop).
    Optional occlusion handling mirrors the object-graph path exactly: region
    checking folds into IsLineValid (region_modality.cpp:1293-1341), measured /
    modeled occlusions go through the two-pass fallback that disables occlusion
    handling when fewer than min_n_unoccluded_lines survive (cpp:435-463).
    """
    s_seg = cfg.line_length_in_segments
    line_length = s_seg * scale
    fscale = float(scale)
    ll_minus_1 = line_length - 1
    ll_minus_1_half = (line_length - 1) * 0.5
    ll_half_minus_1 = line_length * 0.5 - 1.0

    z, center_u, center_v, normal_u, normal_v = project_lines_cl(
        points, pose, fu, fv, ppu, ppv)
    lcount = center_u.shape[-1]

    line_index_ok = jnp.arange(lcount) < n_lines
    continuous_distance = (
        jnp.minimum(points.background_distance, points.foreground_distance)
        * fu / (jnp.where(z > 0, z, 1.0) * fscale))
    valid = line_index_ok
    valid &= continuous_distance >= cfg.min_continuous_distance
    valid &= z > 0.0
    i_cu = jnp.trunc(center_u + 0.5).astype(jnp.int32)
    i_cv = jnp.trunc(center_v + 0.5).astype(jnp.int32)
    valid &= (i_cu >= 0) & (i_cu <= width - 1) & (i_cv >= 0) & (i_cv <= height - 1)

    is_u_dom = jnp.abs(normal_v) < jnp.abs(normal_u)
    normal_p = jnp.where(is_u_dom, normal_u, normal_v)
    normal_s = jnp.where(is_u_dom, normal_v, normal_u)
    center_p = jnp.where(is_u_dom, center_u, center_v)
    center_s = jnp.where(is_u_dom, center_v, center_u)
    size_p = jnp.where(is_u_dom, width, height)
    size_s = jnp.where(is_u_dom, height, width)
    normal_ok = jnp.abs(normal_p) > 0.0
    valid &= normal_ok
    step = normal_s / jnp.where(normal_ok, normal_p, 1.0)

    p0 = jnp.trunc(center_p - ll_half_minus_1).astype(jnp.int32)
    p_end = p0 + ll_minus_1
    s_f0 = center_s + step * (p0.astype(jnp.float32) - center_p) + 0.5
    s_f_end = s_f0 + step * float(ll_minus_1)
    t0 = jnp.trunc(s_f0).astype(jnp.int32)
    t_end = jnp.trunc(s_f_end).astype(jnp.int32)
    on_image = ((p0 >= 0) & (p_end <= size_p - 1)
                & (t0 >= 0) & (t0 <= size_s - 1)
                & (t_end >= 1) & (t_end <= size_s - 2))
    valid &= on_image

    # Crop coverage: every sampled pixel must fall inside the (C, C) crop.
    corner_p = jnp.where(is_u_dom, corner_u, corner_v)
    corner_s = jnp.where(is_u_dom, corner_v, corner_u)
    s_lo = jnp.minimum(t0, t_end)
    s_hi = jnp.maximum(t0, t_end)
    in_crop = ((p0 >= corner_p) & (p_end <= corner_p + crop_size - 1)
               & (s_lo >= corner_s) & (s_hi <= corner_s + crop_size - 1))
    valid &= in_crop

    # Region checking is part of IsLineValid (region_modality.cpp:1293-1341);
    # occlusions go through the two-pass fallback (cpp:435-463).  When both
    # checks come as point-query SceneCoeffs (the fused-pipeline default) they
    # share ONE per-line-culled scene evaluation.
    from m3t_tpu.ops import region_fn as _rfn
    rc_query = isinstance(region_check, _rfn.RegionCheckQueryInputs)
    mo_query = isinstance(modeled_occlusion, _rfn.ModeledOcclusionQueryInputs)
    combined_rc = combined_mo = None
    if (rc_query or mo_query) and (region_check is None or rc_query) \
            and (modeled_occlusion is None or mo_query):
        combined_rc, combined_mo = _rfn.combined_scene_checks(
            cfg, fscale, center_u, center_v, normal_u, normal_v, z,
            points.modeled_depth_offset, fu,
            region_check if rc_query else None,
            modeled_occlusion if mo_query else None)
    if region_check is not None:
        if combined_rc is not None:
            valid &= combined_rc
        else:
            rc_size = (region_check.image_size if rc_query
                       else region_check.silhouette.shape[0])
            valid &= _rfn.region_check_ok(
                cfg, fscale, center_u, center_v, normal_u, normal_v, region_check,
                rc_size)
    occl_ok = jnp.ones(valid.shape, bool)
    if measured_occlusion is not None:
        occl_ok &= _rfn._measured_occlusion_free(
            cfg, points.center_f_body.T, points.measured_depth_offset,
            measured_occlusion,
            measured_occlusion.depth_image.shape[1],
            measured_occlusion.depth_image.shape[0])
    if modeled_occlusion is not None:
        if combined_mo is not None:
            occl_ok &= combined_mo
        else:
            mo_size = (modeled_occlusion.image_size if mo_query
                       else modeled_occlusion.focused_depth.shape[0])
            occl_ok &= _rfn.modeled_occlusion_free(
                cfg, center_u, center_v, z, points.modeled_depth_offset, fu,
                modeled_occlusion, mo_size)
    if measured_occlusion is not None or modeled_occlusion is not None:
        valid_with = valid & occl_ok
        n_with = jnp.sum(valid_with)
        use_occlusions = ((jnp.asarray(True) if handle_occlusions is None
                           else handle_occlusions)
                          & (n_with >= cfg.min_n_unoccluded_lines))
        valid = jnp.where(use_occlusions, valid_with, valid)

    normal_component_to_scale = jnp.abs(normal_p) / fscale
    delta_r = (jnp.floor(center_p - ll_minus_1_half + 0.5) + ll_minus_1_half
               - center_p) / jnp.where(normal_ok, normal_p, 1.0)

    params = jnp.zeros((_NPARAM, lp), jnp.float32)
    params = params.at[_ROW_R0, :lcount].set((p0 - corner_p).astype(jnp.float32))
    params = params.at[_ROW_S0, :lcount].set(s_f0 - corner_s.astype(jnp.float32))
    params = params.at[_ROW_STEP, :lcount].set(step)
    params = params.at[_ROW_UDOM, :lcount].set(is_u_dom.astype(jnp.float32))
    params = params.at[_ROW_DIR].set(1.0)

    return LineGeometry(
        center_u=_pad_lanes(center_u, lp), center_v=_pad_lanes(center_v, lp),
        normal_u=_pad_lanes(normal_u, lp), normal_v=_pad_lanes(normal_v, lp),
        center_f_body=_pad_lanes(points.center_f_body, lp),
        normal_p=_pad_lanes(normal_p, lp),
        delta_r=_pad_lanes(delta_r, lp),
        normal_component_to_scale=_pad_lanes(normal_component_to_scale, lp),
        params=params, valid=_pad_lanes(valid, lp))


def lines_from_samples(cfg: RegionConfig, scale: int, geo: LineGeometry,
                       ratio_samples) -> DataLinesCL:
    """Segment products -> distribution -> moments (cpp:1458-1658), lane-major.

    ratio_samples: (KP, LP) normalized foreground probabilities from sample_lines
    (k in sublanes, lines in lanes).
    """
    s_seg = cfg.line_length_in_segments
    d = cfg.distribution_length
    f = cfg.function_length
    line_length = s_seg * scale
    lp = ratio_samples.shape[1]

    lookup_f, lookup_b = cfg.function_lookups()

    pf = ratio_samples[:line_length, :]
    pb = 1.0 - pf
    # (S, scale, LP) -> per-segment products (cpp:1458-1489); lines stay in lanes.
    seg_f_t = jnp.prod(pf.reshape(s_seg, scale, lp), axis=1)
    seg_b_t = jnp.prod(pb.reshape(s_seg, scale, lp), axis=1)
    forward = geo.normal_p > 0
    seg_f_t = jnp.where(forward[None, :], seg_f_t, seg_f_t[::-1, :])
    seg_b_t = jnp.where(forward[None, :], seg_b_t, seg_b_t[::-1, :])
    if scale > 1:
        total = seg_f_t + seg_b_t
        nzero = total > 0.0
        safe = jnp.where(nzero, total, 1.0)
        seg_f_t = jnp.where(nzero, seg_f_t / safe, 0.5)
        seg_b_t = jnp.where(nzero, seg_b_t / safe, 0.5)

    # distribution[d] = prod_i seg_f[d+i]*lf[i] + seg_b[d+i]*lb[i]  (cpp:1600-1637)
    dist = jnp.ones((d, lp), jnp.float32)
    for i in range(f):
        dist = dist * (seg_f_t[i:i + d] * lookup_f[i] + seg_b_t[i:i + d] * lookup_b[i])
    area = jnp.sum(dist, axis=0, keepdims=True)
    dist = dist / jnp.where(area > 0.0, area, 1.0)

    idx = jnp.arange(d, dtype=jnp.float32)[:, None]
    mean_from_begin = jnp.sum(idx * dist, axis=0)
    var = jnp.sum((idx - mean_from_begin[None, :]) ** 2 * dist, axis=0)
    mean = mean_from_begin - (d - 1) / 2.0
    measured_variance = jnp.maximum(var, cfg.min_expected_variance)

    return DataLinesCL(
        center_f_body=geo.center_f_body,
        center_u=geo.center_u, center_v=geo.center_v,
        normal_u=geo.normal_u, normal_v=geo.normal_v,
        delta_r=geo.delta_r,
        normal_component_to_scale=geo.normal_component_to_scale,
        distribution=dist, mean=mean, measured_variance=measured_variance,
        valid=geo.valid)


def gradient_hessian_cl(cfg: RegionConfig, lines: DataLinesCL, pose,
                        fu, fv, ppu, ppv, standard_deviation: float,
                        global_iteration: bool):
    """Lane-major Newton gradient/Hessian (cpp:485-558); returns ((6,), (6, 6))."""
    d = cfg.distribution_length
    rot = pose[:3, :3]
    variance = standard_deviation ** 2

    c = rot @ lines.center_f_body + pose[:3, 3][:, None]   # (3, LP)
    x, y, z = c[0], c[1], c[2]
    z_safe = jnp.where(z != 0, z, 1.0)
    fu_z = fu / z_safe
    fv_z = fv / z_safe
    xfu_z = x * fu_z
    yfv_z = y * fv_z
    delta_cs = (lines.normal_u * (xfu_z + ppu - lines.center_u)
                + lines.normal_v * (yfv_z + ppv - lines.center_v)
                - lines.delta_r) * lines.normal_component_to_scale

    if global_iteration:
        dll = (lines.mean - delta_cs) / lines.measured_variance
        valid = lines.valid
    else:
        dist_idx_upper = jnp.trunc(delta_cs + (d + 1) / 2.0).astype(jnp.int32)
        dist_idx_lower = dist_idx_upper - 1
        in_range = (dist_idx_upper > 0) & (dist_idx_upper < d)
        iu = jnp.clip(dist_idx_upper, 0, d - 1)
        il = jnp.clip(dist_idx_lower, 0, d - 1)
        # Per-lane row select from the (D, LP) distribution as a one-hot
        # contraction over the tiny D axis — an XLA gather here costs ~3x the
        # rest of the update iteration on TPU.
        rows = jax.lax.broadcasted_iota(jnp.int32, lines.distribution.shape, 0)
        p_u = jnp.sum(jnp.where(rows == iu[None, :], lines.distribution, 0.0),
                      axis=0)
        p_l = jnp.sum(jnp.where(rows == il[None, :], lines.distribution, 0.0),
                      axis=0)
        dll = (jnp.log(jnp.maximum(p_u, 1e-30)) - jnp.log(jnp.maximum(p_l, 1e-30))) \
            * cfg.learning_rate / lines.measured_variance
        valid = lines.valid & in_range

    nts = lines.normal_component_to_scale
    dcenter = jnp.stack([
        nts * lines.normal_u * fu_z,
        nts * lines.normal_v * fv_z,
        nts * (-lines.normal_u * xfu_z - lines.normal_v * yfv_z) / z_safe,
    ])                                                      # (3, LP)
    dtrans = rot.T @ dcenter                                 # (3, LP)
    cb = lines.center_f_body
    dtheta = jnp.concatenate([
        jnp.stack([cb[1] * dtrans[2] - cb[2] * dtrans[1],
                   cb[2] * dtrans[0] - cb[0] * dtrans[2],
                   cb[0] * dtrans[1] - cb[1] * dtrans[0]]),
        dtrans,
    ])                                                       # (6, LP)

    weight = cfg.min_expected_variance / (nts * nts * variance)
    wmask = jnp.where(valid, weight, 0.0)
    gradient = dtheta @ (wmask * dll)
    wh = wmask / lines.measured_variance
    hessian = -(dtheta * wh[None, :]) @ dtheta.T
    return gradient, hessian


# ----------------------------------------------------------------------------------------
# Histogram update walk (AddLinePixelColorsToTempHistograms, cpp:1025-1155)
# ----------------------------------------------------------------------------------------


def histogram_walk_geometry(cfg: RegionConfig, points: ViewPointsCL, n_lines, pose,
                            fu, fv, ppu, ppv, width: int, height: int,
                            corner_u, corner_v, crop_size: int, lp2: int):
    """Staircase params + masks for the fg/bg color-collection walks.

    Returns (params (8, lp2), mask (lp2, KP2)) where the first half of the lanes are
    the foreground walks and the second half the background walks.
    """
    max_steps = int(np.ceil(cfg.max_considered_line_length)) + 1
    kp2 = round_up(max_steps, 8)
    l = points.center_f_body.shape[-1]

    z, center_u, center_v, normal_u, normal_v = project_lines_cl(
        points, pose, fu, fv, ppu, ppv)

    valid = jnp.arange(l) < n_lines
    valid &= z > 0.0
    i_cu = jnp.trunc(center_u + 0.5).astype(jnp.int32)
    i_cv = jnp.trunc(center_v + 0.5).astype(jnp.int32)
    valid &= (i_cu >= 0) & (i_cu <= width - 1) & (i_cv >= 0) & (i_cv <= height - 1)

    z_safe = jnp.where(z > 0, z, 1.0)
    l_f = points.foreground_distance * fu / z_safe
    l_b = points.background_distance * fu / z_safe
    length_f = jnp.minimum(cfg.max_considered_line_length,
                           l_f - 2.0 * cfg.unconsidered_line_length)
    length_b = jnp.minimum(cfg.max_considered_line_length,
                           l_b - 2.0 * cfg.unconsidered_line_length)

    abs_nu = jnp.abs(normal_u)
    abs_nv = jnp.abs(normal_v)
    u_dom = abs_nu > abs_nv
    u_step = jnp.where(u_dom, jnp.sign(normal_u),
                       normal_u / jnp.where(abs_nv > 0, abs_nv, 1.0))
    v_step = jnp.where(u_dom, normal_v / jnp.where(abs_nu > 0, abs_nu, 1.0),
                       jnp.sign(normal_v))
    dom = jnp.where(u_dom, abs_nu, abs_nv)
    proj_len_f = jnp.trunc(length_f * dom + 0.5).astype(jnp.int32)
    proj_len_b = jnp.trunc(length_b * dom + 0.5).astype(jnp.int32)

    corner_p = jnp.where(u_dom, corner_u, corner_v).astype(jnp.float32)
    corner_s = jnp.where(u_dom, corner_v, corner_u).astype(jnp.float32)
    p_step = jnp.where(u_dom, u_step, v_step)   # +-1 on the dominant axis
    s_step = jnp.where(u_dom, v_step, u_step)
    size_p = jnp.where(u_dom, width, height)
    size_s = jnp.where(u_dom, height, width)

    k = jnp.arange(max_steps, dtype=jnp.float32)

    def side(sign, proj_len):
        u0 = center_u + sign * normal_u * cfg.unconsidered_line_length + 0.5
        v0 = center_v + sign * normal_v * cfg.unconsidered_line_length + 0.5
        p0f = jnp.where(u_dom, u0, v0)
        s0f = jnp.where(u_dom, v0, u0)
        # iu = trunc(u0 + sign*k*u_step): dominant axis advances by sign*p_step (+-1)
        # exactly per step, so trunc(p0f) + k*d is the integer dominant coordinate.
        dir_ = sign * p_step
        r0 = jnp.trunc(p0f)
        # Secondary coordinate at step k is trunc(s0f + k*(sign*s_step)).  The kernel
        # evaluates floor(s0c + (i - r0c)*stp*dir) at i = r0c + dir*k, i.e.
        # floor(s0c + k*stp) since dir*dir == 1 — so stp must be the per-step slope.
        stp = sign * s_step
        params = jnp.stack([
            r0 - corner_p,
            s0f - corner_s,
            stp,
            u_dom.astype(jnp.float32),
            dir_,
            jnp.zeros_like(r0), jnp.zeros_like(r0), jnp.zeros_like(r0),
        ])
        # Masks: within projected length, inside image, valid line.  The walk is
        # affine in k, so in-bounds k form an interval and the reference's
        # break-on-exit scan equals interval membership from k == 0.
        pk = r0[:, None] + (dir_[:, None] * k[None, :])
        sk = jnp.trunc(s0f[:, None] + sign * k[None, :] * s_step[:, None])
        inb = ((pk >= 0) & (pk <= size_p[:, None] - 1)
               & (sk >= 0) & (sk <= size_s[:, None] - 1))
        inb = inb & inb[:, :1]
        running = jnp.cumprod(inb.astype(jnp.int32), axis=1).astype(bool)
        mask = running & (jnp.arange(max_steps)[None, :] < proj_len[:, None]) \
            & valid[:, None]
        # crop coverage
        in_crop = ((pk >= corner_p[:, None]) & (pk <= corner_p[:, None] + crop_size - 1)
                   & (sk >= corner_s[:, None])
                   & (sk <= corner_s[:, None] + crop_size - 1))
        mask &= in_crop
        return params, mask

    params_f, mask_f = side(-1.0, proj_len_f)
    params_b, mask_b = side(1.0, proj_len_b)

    half = lp2 // 2
    params = jnp.concatenate([_pad_lanes(params_f, half), _pad_lanes(params_b, half)],
                             axis=1)
    mask = jnp.concatenate([
        jnp.pad(mask_f, ((0, half - l), (0, kp2 - max_steps))),
        jnp.pad(mask_b, ((0, half - l), (0, kp2 - max_steps))),
    ], axis=0)
    return params, mask


def _bin_counts_kernel(bins_ref, out_ref, *, n_cols: int, rows: int):
    """VMEM-blocked one-hot histogram: per 128-sample group, two tiny one-hots
    (both built with the samples in lanes — no transposes) feed an A·Bᵀ matmul
    into the (rows, 128) accumulator; nothing but the (padded) bin indices and
    the counts ever touch HBM."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    a_parts, b_parts = [], []
    for j in range(n_cols):
        group = bins_ref[j, :][None, :]                  # (1, 128) samples
        a_parts.append((row_iota == (group >> 7)).astype(jnp.float32))
        b_parts.append((lane_iota == (group & 127)).astype(jnp.float32))
    # One wide A·Bᵀ contraction over all samples (48 separate 128-sample
    # matmuls are MXU-latency-bound at ~3x the cost).
    a = jnp.concatenate(a_parts, axis=1)                  # (rows, n_cols*128)
    bm = jnp.concatenate(b_parts, axis=1)                 # (128l, n_cols*128)
    # counts[r, l] = sum_s a[r, s] * bm[l, s]  (0/1 values, exact in f32)
    out_ref[:, :] = jax.lax.dot_general(a, bm, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_bins_total",))
def bin_counts(bins, mask, n_bins_total: int = 4096):
    """Masked histogram counts via one-hot contractions on the MXU, blocked in
    VMEM by a Pallas kernel.

    bins: (B, N) int32, mask: (B, N) bool -> (B, n_bins_total) f32 counts.
    A plain XLA ``einsum`` over factored one-hots materializes (B, N, 128)
    operands in HBM (~1 GB per cycle at B=512) and costs ~6 ms; the kernel
    keeps the one-hots in registers, so only the 12 MB of bin indices move.
    Masked samples are folded into an out-of-range sentinel whose row one-hot
    never matches.
    """
    b, n = bins.shape
    rows = n_bins_total // 128
    sentinel = jnp.int32(n_bins_total)
    bins_m = jnp.where(mask, bins, sentinel)
    n_pad = round_up(max(n, 1), 128)
    if n_pad != n:
        bins_m = jnp.pad(bins_m, ((0, 0), (0, n_pad - n)),
                         constant_values=n_bins_total)
    n_cols = n_pad // 128
    groups = bins_m.reshape(b, n_cols, 128)

    kern = functools.partial(_bin_counts_kernel, n_cols=n_cols, rows=rows)

    def kernel(bins_ref, out_ref):
        kern(bins_ref.at[0], out_ref.at[0])

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n_cols, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    counts = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), jnp.float32),
        interpret=_use_interpret(),
    )(groups)
    return counts.reshape(b, n_bins_total)
