"""TPU-fast depth-modality window sampling: Pallas crop-gather presampling.

The depth modality's hot loop (FindCorrespondence, depth_modality.cpp:826-884) samples a
strided (K, K) window of the depth image around every projected model point.  As plain
XLA this is a (P, K, K) general gather from the full HBM-resident depth image per body —
the dominant cost of the fused RGB-D cycle.  This module restructures it exactly like the
region path (ops/region_fast.py): the depth image is cropped once per body per cycle to a
``(C, C)`` window around the projected body center, and the strided window samples are
fetched by the SAME Pallas staircase kernel — each (point, window-row) pair becomes one
"line" whose dominant axis walks ``K`` samples at ``stride`` pixels per step
(``DIR = stride``) along u at a fixed row (``STEP = 0``).

Numerics are identical to ops/depth_fn.calculate_correspondences whenever the search
window lies inside the crop; samples outside the crop are masked invalid.  The crop is
centered on the projected BODY ORIGIN, so a point's window survives only if its
projection plus the window radius fits within ``crop_size/2`` pixels of that center —
points of large or close bodies projecting outside the crop silently lose their search
window (the same crop-coverage caveat as the region path's line validity).  Choose
``crop_size`` larger than the maximum projected body extent plus the largest window
diameter; images smaller than the crop are zero-padded by the pipeline, making the
paths exact on them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3t_tpu.ops import region_fast
from m3t_tpu.ops.depth_fn import (KMAX_N_OCCLUSION_STRIDES, DepthConfig,
                                  _trunc)

# Parameter rows for the window kernel.
_ROW_U0 = 0    # dominant-axis (u) start, crop coords (integer-valued f32)
_ROW_ROW = 1   # fixed crop row (v) per line (integer-valued f32)
_ROW_STRIDE = 2  # pixels advanced per step along u (integer-valued f32)
_NPARAM = 4


def _window_kernel(params_ref, cropT_ref, out_ref, *, kp: int, lp: int, c: int):
    """out[k, l] = cropT[u0[l] + k*stride[l], row[l]] for one body.

    A reduced variant of region_fast._sample_kernel: the secondary coordinate is a
    CONSTANT row per line (STEP == 0), so only the transposed crop is needed and the
    first gather's column index is just that row.
    """
    n_stripes = c // 128
    for g in range(lp // 128):
        sl = slice(128 * g, 128 * (g + 1))
        u0 = params_ref[_ROW_U0, sl][None, :]           # (1, 128)
        row = params_ref[_ROW_ROW, sl][None, :]
        stride = params_ref[_ROW_STRIDE, sl][None, :]
        c1 = jnp.clip(row.astype(jnp.int32), 0, c - 1)
        c1 = jnp.broadcast_to(c1, (c, 128))
        # p[i, l] = cropT[i, row[l]] == crop[row[l], i]  (value along u at the row)
        p = None
        for s in range(n_stripes):
            gsl = region_fast._ta(cropT_ref[:, 128 * s:128 * (s + 1)],
                                  jnp.clip(c1 - 128 * s, 0, 127))
            p = gsl if p is None else jnp.where(c1 < 128 * s, p, gsl)
        pt = p.T                                         # (128 lines, c)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1).astype(jnp.float32)
        idx2 = jnp.clip((u0.reshape(128, 1) + stride.reshape(128, 1) * k_iota)
                        .astype(jnp.int32), 0, c - 1)
        out = None
        for h in range(n_stripes):
            gsl = region_fast._ta(pt[:, 128 * h:128 * (h + 1)],
                                  jnp.clip(idx2 - 128 * h, 0, 127))
            out = gsl if out is None else jnp.where(idx2 < 128 * h, out, gsl)
        out_ref[:, sl] = out[:, :kp].T                   # (kp, 128)


@functools.partial(jax.jit, static_argnames=("kp",))
def sample_windows(params, cropT, kp: int):
    """Batched strided row sampling: (B, 4, LP) params + (B, C, C) int32 transposed
    crops -> (B, kp, LP) int32 values."""
    b, _, lp = params.shape
    c = cropT.shape[-1]
    kern = functools.partial(_window_kernel, kp=kp, lp=lp, c=c)

    def kernel(params_ref, cropT_ref, out_ref):
        kern(params_ref.at[0], cropT_ref.at[0], out_ref.at[0])

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, _NPARAM, lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kp, lp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kp, lp), jnp.int32),
        interpret=region_fast._use_interpret(),
    )(params, cropT)


def pad_depth(depth_images, crop_size: int):
    """Zero-pad (B, H, W) so both spatial dims are >= crop_size (small test images)."""
    h, w = depth_images.shape[1], depth_images.shape[2]
    ph = max(crop_size - h, 0)
    pw = max(crop_size - w, 0)
    if ph or pw:
        depth_images = jnp.pad(depth_images, ((0, 0), (0, ph), (0, pw)))
    return depth_images


def depth_crops(depth_images, poses, fu, fv, ppu, ppv, crop_size: int):
    """Per-body int32 crops of (B, H, W) uint16 depth images around the projected
    body centers (+ transposed copies for the u-dominant kernel walk)."""
    padded = pad_depth(depth_images, crop_size)
    t = poses[:, :3, 3]
    z = jnp.where(t[:, 2] > 0, t[:, 2], 1.0)
    cu = t[:, 0] * fu / z + ppu
    cv = t[:, 1] * fv / z + ppv
    corner_u, corner_v = region_fast.crop_corners(
        cu, cv, crop_size, padded.shape[2], padded.shape[1])

    def one(img, u0, v0):
        return jax.lax.dynamic_slice(
            img, (v0, u0), (crop_size, crop_size)).astype(jnp.int32)

    crop = jax.vmap(one)(padded, corner_u, corner_v)
    return jnp.swapaxes(crop, 1, 2), corner_u, corner_v


def presample_windows(cfg: DepthConfig, considered_distance: float, centers_b, poses,
                      cropT, corner_u, corner_v, crop_size: int,
                      fu, fv, ppu, ppv):
    """Fetch the strided correspondence-search windows for a batch of bodies.

    centers_b: (B, P, 3) model-point centers (body frame) of the selected views.
    Returns (d (B, P, K, K) f32 raw depth values, in_crop (B, P, K, K) bool) in the
    same (kv, ku) ordering as the in-place gather in depth_fn (argmin ties break
    identically).
    """
    B, P = centers_b.shape[0], centers_b.shape[1]
    max_n_strides = max(int(considered_distance / cfg.stride_length + 0.5), 1)
    K = max_n_strides + 1

    rot = poses[:, :3, :3]
    c = jnp.einsum("bij,bpj->bpi", rot, centers_b) + poses[:, None, :3, 3]
    z = c[:, :, 2]
    z_safe = jnp.where(z > 0, z, 1.0)
    cu = c[:, :, 0] * fu / z_safe + ppu
    cv = c[:, :, 1] * fv / z_safe + ppv

    # Window geometry — identical to depth_fn.calculate_correspondences
    # (FindCorrespondence, depth_modality.cpp:826-884).
    if cfg.use_depth_scaling:
        cd = considered_distance * z
    else:
        cd = jnp.full_like(z, considered_distance)
    meter_to_pixel = fu / z_safe
    diameter = 2.0 * cd * meter_to_pixel
    stride = _trunc(diameter / max_n_strides + 1.0)
    n_strides = _trunc(diameter / stride.astype(jnp.float32) + 0.5)
    rounded_diameter = n_strides * stride
    rounded_radius = 0.5 * rounded_diameter.astype(jnp.float32)
    u_min0 = _trunc(cu - rounded_radius + 0.5)
    v_min0 = _trunc(cv - rounded_radius + 0.5)
    u_min = jnp.maximum(u_min0, 0)
    v_min = jnp.maximum(v_min0, 0)

    return _fetch_strided_windows(u_min, v_min, stride, corner_u, corner_v,
                                  cropT, crop_size, K)


def _fetch_strided_windows(u_min, v_min, stride, corner_u, corner_v, cropT,
                           crop_size: int, K: int):
    """Fetch (B, P, K, K) strided windows from the crops via the Pallas kernel.

    u_min/v_min/stride: (B, P) int32 window geometry in IMAGE coords.  Returns
    (d (B, P, Kv, Ku) f32 raw depth values, in_crop (B, P, Kv, Ku) bool); samples
    outside the body-centered crop are masked (the crop-coverage caveat in the
    module docstring)."""
    B, P = u_min.shape[0], u_min.shape[1]
    # Kernel line parameters: line l = p*K + kv walks K samples along u at stride px
    # per step at fixed crop row v_min_c + kv*stride.
    kv = jnp.arange(K, dtype=jnp.int32)
    u_min_c = (u_min - corner_u[:, None]).astype(jnp.float32)        # (B, P)
    v_rows = (v_min - corner_v[:, None])[:, :, None] + kv * stride[:, :, None]
    lp = region_fast.round_up(P * K, 128)

    def fill(row_bp_k):
        flat = row_bp_k.reshape(B, P * K)
        return jnp.pad(flat, ((0, 0), (0, lp - P * K)))

    params = jnp.zeros((B, _NPARAM, lp), jnp.float32)
    params = params.at[:, _ROW_U0].set(
        fill(jnp.broadcast_to(u_min_c[:, :, None], (B, P, K))))
    params = params.at[:, _ROW_ROW].set(fill(v_rows.astype(jnp.float32)))
    params = params.at[:, _ROW_STRIDE].set(
        fill(jnp.broadcast_to(stride[:, :, None].astype(jnp.float32), (B, P, K))))

    kp = region_fast.round_up(K, 8)
    out = sample_windows(params, cropT, kp=kp)
    # out[b, ku, p*K + kv] -> (B, P, Kv, Ku)
    d = (out[:, :K, : P * K].reshape(B, K, P, K)
         .transpose(0, 2, 3, 1).astype(jnp.float32))

    # Samples outside the crop were clipped by the kernel: mask them out.
    k = jnp.arange(K, dtype=jnp.int32)
    us_c = (u_min - corner_u[:, None])[:, :, None] + k * stride[:, :, None]  # (B,P,K)
    vs_c = v_rows
    u_in = (us_c >= 0) & (us_c < crop_size)
    v_in = (vs_c >= 0) & (vs_c < crop_size)
    in_crop = v_in[:, :, :, None] & u_in[:, :, None, :]
    return d, in_crop


def presample_occlusion_windows(radius: float, use_depth_scaling: bool, centers_b,
                                poses, cropT, corner_u, corner_v, crop_size: int,
                                fu, fv, ppu, ppv, width: int, height: int):
    """Fetch the strided MEASURED-OCCLUSION windows for a batch of bodies.

    The measured-occlusion checks (IsLineUnoccludedMeasured,
    region_modality.cpp:1343-1389; IsPointUnoccludedMeasured,
    depth_modality.cpp:736-776) sample a (K, K) strided window of the depth
    image around every projected model point — as plain XLA that is a scattered
    HBM gather per body per iteration, ~3x the cost of the whole base RGB-D
    cycle at B=256.  This fetches the identical windows from the body-centered
    depth crops with the Pallas staircase kernel instead.

    centers_b: (B, P, 3) model points (body frame), poses: (B, 4, 4) body to
    DEPTH-camera.  Returns (d (B, P, K, K) raw depth, ok (B, P, K, K) bool
    combining the reference's image-bounds sample mask with the crop-coverage
    mask) matching the in-place gather wherever the window lies in the crop.
    """
    K = KMAX_N_OCCLUSION_STRIDES + 1

    rot = poses[:, :3, :3]
    c = jnp.einsum("bij,bpj->bpi", rot, centers_b) + poses[:, None, :3, 3]
    z = c[:, :, 2]
    z_safe = jnp.where(z > 0, z, 1.0)
    cu = c[:, :, 0] * fu / z_safe + ppu
    cv = c[:, :, 1] * fv / z_safe + ppv

    diameter = 2.0 * radius * fu
    if use_depth_scaling:
        diameter = jnp.full_like(z_safe, diameter)
    else:
        diameter = diameter / z_safe
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

    d, in_crop = _fetch_strided_windows(u_min, v_min, stride, corner_u, corner_v,
                                        cropT, crop_size, K)
    k = jnp.arange(K, dtype=jnp.int32)
    u_ok = (u_min[:, :, None] + k * stride[:, :, None]) <= u_max[:, :, None]
    v_ok = (v_min[:, :, None] + k * stride[:, :, None]) <= v_max[:, :, None]
    ok = v_ok[:, :, :, None] & u_ok[:, :, None, :] & in_crop
    return d, ok
