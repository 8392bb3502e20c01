"""Fused batched tracking pipeline — the TPU performance path.

The component classes (tracker.py et al.) mirror the reference's flexible object graph for
feature parity; this module is the TPU-first serving path: ONE jitted function executes a
whole tracking cycle (all correspondence iterations x update iterations, histogram
adaptation included) for a BATCH of independent bodies/sequences, optionally fused over
multiple cameras per body with a gradient/Hessian reduction across the camera mesh axis.

Hot-path structure (see ops/region_fast.py for the kernels):
  1. per body: crop the image once around the projected body center, convert to flat
     histogram-bin indices (+ transposed copy) — XLA dynamic slices and vector ops.
  2. per correspondence iteration: project model points / staircase parameters in XLA
     (lane-major), fetch per-line probability samples with a Pallas dynamic-gather
     kernel, reduce to distributions/moments in XLA.
  3. per update iteration: lane-major gradient/Hessian einsums + batched 6x6 solve.
  4. histogram adaptation: Pallas staircase walk for fg/bg pixel bins + factored
     one-hot binning on the MXU.

Reference mapping: one call == Tracker::ExecuteTrackingStep + CalculateResults
(tracker.cpp:344-364) for every tracked body at once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from m3t_tpu.common import pose_variation
from m3t_tpu.ops import depth_fast
from m3t_tpu.ops import depth_fn
from m3t_tpu.ops import histogram as hist_ops
from m3t_tpu.ops import kinematics as kin_ops
from m3t_tpu.ops import occlusion as occlusion_ops
from m3t_tpu.ops import region_fast
from m3t_tpu.ops import texture_fn
from m3t_tpu.ops.texture_fn import TexturePoints
from m3t_tpu.ops.depth_fn import DepthConfig, DepthViewPoints
from m3t_tpu.ops.region_fast import ViewPointsCL
from m3t_tpu.ops.region_fn import (
    MeasuredOcclusionInputs,
    ModeledOcclusionInputs,
    ModeledOcclusionQueryInputs,
    RegionCheckInputs,
    RegionCheckQueryInputs,
    RegionConfig,
)


class RegionModelArrays(NamedTuple):
    """Stacked sparse-viewpoint model for a batch of bodies (HBM-resident).

    Point data is channel-major ((V, 3, L)) so per-line math runs with lines in the
    TPU lane dimension (region_fast.py docstring).
    """

    orientations: jnp.ndarray  # (B, V, 3)
    centers: jnp.ndarray  # (B, V, 3, L)
    normals: jnp.ndarray  # (B, V, 3, L)
    foreground_distances: jnp.ndarray  # (B, V, L)
    background_distances: jnp.ndarray  # (B, V, L)
    measured_depth_offsets: jnp.ndarray  # (B, V, L)
    modeled_depth_offsets: jnp.ndarray  # (B, V, L)
    contour_lengths: jnp.ndarray  # (B, V) — per-view silhouette contour length
    max_contour_length: jnp.ndarray  # (B,)

    @staticmethod
    def from_models(models, n_lines: int, measured_offset_id: int = 5,
                    modeled_offset_id: int = 5) -> "RegionModelArrays":
        """Stack host RegionModel objects (pads V across bodies)."""
        v_max = max(m.orientations.shape[0] for m in models)

        def pad(a):
            out = np.zeros((v_max,) + a.shape[1:], a.dtype)
            out[: a.shape[0]] = a
            return out

        def cl(a):  # (V, L, 3) -> (V, 3, L)
            return np.swapaxes(a, -1, -2)

        return RegionModelArrays(
            orientations=jnp.asarray(np.stack([pad(m.orientations) for m in models])),
            centers=jnp.asarray(
                np.stack([pad(cl(m.centers[:, :n_lines])) for m in models])),
            normals=jnp.asarray(
                np.stack([pad(cl(m.normals[:, :n_lines])) for m in models])),
            foreground_distances=jnp.asarray(
                np.stack([pad(m.foreground_distances[:, :n_lines]) for m in models])),
            background_distances=jnp.asarray(
                np.stack([pad(m.background_distances[:, :n_lines]) for m in models])),
            measured_depth_offsets=jnp.asarray(np.stack(
                [pad(m.depth_offsets[:, :n_lines, measured_offset_id]) for m in models])),
            modeled_depth_offsets=jnp.asarray(np.stack(
                [pad(m.depth_offsets[:, :n_lines, modeled_offset_id]) for m in models])),
            contour_lengths=jnp.asarray(np.stack(
                [pad(np.asarray(m.contour_lengths, np.float32)) for m in models])),
            max_contour_length=jnp.asarray(
                np.array([m.max_contour_length for m in models], np.float32)),
        )


class DepthModelArrays(NamedTuple):
    """Stacked depth sparse-viewpoint model for a batch of bodies."""

    orientations: jnp.ndarray  # (B, V, 3)
    centers: jnp.ndarray  # (B, V, P, 3)
    normals: jnp.ndarray  # (B, V, P, 3)
    measured_depth_offsets: jnp.ndarray  # (B, V, P)
    modeled_depth_offsets: jnp.ndarray  # (B, V, P)

    @staticmethod
    def from_models(models, n_points: int, measured_offset_id: int = 5,
                    modeled_offset_id: int = 5) -> "DepthModelArrays":
        v_max = max(m.orientations.shape[0] for m in models)

        def pad(a):
            out = np.zeros((v_max,) + a.shape[1:], a.dtype)
            out[: a.shape[0]] = a
            return out

        return DepthModelArrays(
            orientations=jnp.asarray(np.stack([pad(m.orientations) for m in models])),
            centers=jnp.asarray(np.stack([pad(m.centers[:, :n_points])
                                          for m in models])),
            normals=jnp.asarray(np.stack([pad(m.normals[:, :n_points])
                                          for m in models])),
            measured_depth_offsets=jnp.asarray(np.stack(
                [pad(m.depth_offsets[:, :n_points, measured_offset_id])
                 for m in models])),
            modeled_depth_offsets=jnp.asarray(np.stack(
                [pad(m.depth_offsets[:, :n_points, modeled_offset_id])
                 for m in models])),
        )


class TrackingState(NamedTuple):
    """Per-body mutable tracking state carried frame to frame."""

    body2camera_pose: jnp.ndarray  # (B, 4, 4)
    histogram_f: jnp.ndarray  # (B, n_bins^3)
    histogram_b: jnp.ndarray  # (B, n_bins^3)


class PipelineConfig(NamedTuple):
    cfg: RegionConfig = RegionConfig()
    scales: tuple = (6, 4, 2, 1)
    standard_deviations: tuple = (15.0, 5.0, 3.5, 1.5)
    n_corr_iterations: int = 5
    n_update_iterations: int = 2
    tikhonov_rotation: float = 1000.0
    tikhonov_translation: float = 30000.0
    learning_rate_f: float = 0.2
    learning_rate_b: float = 0.2
    crop_size: int = 256  # focused-crop side; must be a multiple of 128
    # ICG-style depth fusion (used when depth images + a depth model are provided).
    use_depth: bool = False
    depth_cfg: DepthConfig = DepthConfig()
    considered_distances: tuple = (0.05, 0.02, 0.01)
    depth_standard_deviations: tuple = (0.05, 0.03, 0.02)
    # Occlusion handling / region checking (requires a SceneGeometry input; the
    # focused scene is re-rendered on device every correspondence iteration,
    # tracker.cpp:448-451).
    # ICG+ texture fusion (host feature extraction feeding device GN terms).
    use_texture: bool = False
    texture_standard_deviations: tuple = (15.0, 5.0)
    tukey_norm_constant: float = 20.0
    region_model_occlusions: bool = False
    region_measure_occlusions: bool = False
    region_checking: bool = False
    depth_model_occlusions: bool = False
    depth_measure_occlusions: bool = False
    depth_silhouette_check: bool = False
    focused_image_size: int = 200
    z_min: float = 0.02
    z_max: float = 10.0
    occlusion_raster_chunk: int = 64
    # Adaptive coverage (region_modality.cpp:417-429): scale the traced line
    # count per body by the closest view's contour length, relative to
    # reference_contour_length (if > 0) or the model's max contour length.
    use_adaptive_coverage: bool = False
    reference_contour_length: float = 0.0
    # Point-query occlusion evaluation (default): the validity checks sample only
    # ~50 focused pixels per line/point, so instead of rasterizing (S, S) scene
    # images every correspondence iteration the scene's triangle coefficients are
    # evaluated at exactly the queried pixels (ops/occlusion.py SceneCoeffs) —
    # identical results, ~40x faster at B=512.  False falls back to full
    # focused_render images (useful for visualization and the rasterizer tests).
    occlusion_queries: bool = True

    @property
    def needs_scene_render(self) -> bool:
        return (self.region_model_occlusions or self.region_checking
                or self.depth_model_occlusions or self.depth_silhouette_check)

    def iteration_scale(self, corr_iteration: int):
        scale = self.scales[min(corr_iteration, len(self.scales) - 1)]
        std = self.standard_deviations[
            min(corr_iteration, len(self.standard_deviations) - 1)]
        return int(scale), float(std)

    def iteration_depth(self, corr_iteration: int):
        cd = self.considered_distances[
            min(corr_iteration, len(self.considered_distances) - 1)]
        std = self.depth_standard_deviations[
            min(corr_iteration, len(self.depth_standard_deviations) - 1)]
        return float(cd), float(std)

    @property
    def lp(self) -> int:
        return region_fast.round_up(max(self.cfg.n_lines_max, 1), 128)


def _view_index(orientations, pose):
    """On-device GetClosestView index for one body: argmax dot
    (region_model.cpp:105-127)."""
    t = pose[:3, 3]
    norm = jnp.linalg.norm(t)
    orientation = pose[:3, :3].T @ (t / jnp.where(norm > 0, norm, 1.0))
    return jnp.argmax(orientations @ orientation)


def _adaptive_n_lines(pcfg: PipelineConfig, model: RegionModelArrays, poses):
    """Per-body traced line count, scaled by the closest view's contour length
    when adaptive coverage is on (region_modality.cpp:417-429: int truncation of
    n_lines_max * ratio, clamped to the available model points).

    Returns a PYTHON int when adaptive coverage is off so the line masks stay
    XLA constants (a traced per-body count costs ~20 % region-cycle throughput
    for nothing)."""
    cfg = pcfg.cfg
    if not pcfg.use_adaptive_coverage:
        return int(cfg.n_lines_max)

    def one(m, p):
        idx = _view_index(m.orientations, p)
        contour_length = m.contour_lengths[idx]
        if pcfg.reference_contour_length > 0.0:
            ratio = jnp.minimum(
                1.0, contour_length / jnp.float32(pcfg.reference_contour_length))
        else:
            mcl = m.max_contour_length
            ratio = jnp.where(mcl > 0, contour_length / jnp.where(mcl > 0, mcl, 1.0),
                              1.0)
        return (jnp.float32(cfg.n_lines_max) * ratio).astype(jnp.int32)

    n = jax.vmap(one)(model, poses)
    return jnp.minimum(n, jnp.int32(model.centers.shape[-1]))


def _select_view_cl(model: RegionModelArrays, pose) -> ViewPointsCL:
    """On-device GetClosestView for one body: index + gather."""
    idx = _view_index(model.orientations, pose)
    return ViewPointsCL(
        center_f_body=model.centers[idx],
        normal_f_body=model.normals[idx],
        foreground_distance=model.foreground_distances[idx],
        background_distance=model.background_distances[idx],
        measured_depth_offset=model.measured_depth_offsets[idx],
        modeled_depth_offset=model.modeled_depth_offsets[idx],
    )


def _select_depth_view(model: DepthModelArrays, pose) -> DepthViewPoints:
    idx = _view_index(model.orientations, pose)
    return DepthViewPoints(
        center_f_body=model.centers[idx],
        normal_f_body=model.normals[idx],
        measured_depth_offset=model.measured_depth_offsets[idx],
        modeled_depth_offset=model.modeled_depth_offsets[idx],
    )


def _planar_u8(images):
    """Accept (B, H, W, 3) or planar (B, 3, H, W) uint8 images; return planar."""
    if images.shape[-1] == 3:
        return jnp.moveaxis(images, -1, 1)
    return images


def _pad_image(images_planar, crop_size: int):
    """Zero-pad so both spatial dims are >= crop_size (small test images)."""
    b, c, h, w = images_planar.shape
    ph = max(crop_size - h, 0)
    pw = max(crop_size - w, 0)
    if ph or pw:
        images_planar = jnp.pad(images_planar, ((0, 0), (0, 0), (0, ph), (0, pw)))
    return images_planar


def _prepare_crops(pcfg: PipelineConfig, intr, images, poses):
    """Prologue: per-body focused bin crops around the projected body origin."""
    fu, fv, ppu, ppv = intr
    planar = _pad_image(_planar_u8(images), pcfg.crop_size)
    t = poses[:, :3, 3]
    z = jnp.where(t[:, 2] > 0, t[:, 2], 1.0)
    cu = t[:, 0] * fu / z + ppu
    cv = t[:, 1] * fv / z + ppv
    corner_u, corner_v = region_fast.crop_corners(
        cu, cv, pcfg.crop_size, planar.shape[3], planar.shape[2])
    bin_crop, bin_cropT = region_fast.binify_crops(
        planar, corner_u, corner_v, pcfg.crop_size, pcfg.cfg.n_histogram_bins)
    return bin_crop, bin_cropT, corner_u, corner_v


def _ldlt_solve_6x6(a, b):
    """Unrolled batched LDLT solve for symmetric 6x6 systems: a (B, 6, 6), b (B, 6).

    The Tikhonov-regularized system is symmetric positive definite, so the
    reference's LDLT (optimizer.cpp:162-163) applies; XLA's batched
    ``jnp.linalg.solve`` lowers to an LU custom-call that costs ~0.8 ms per
    launch at B=512 on TPU, ~7 ms per cycle — this fully-vectorized unroll
    (every op elementwise over the batch) is free by comparison.
    """
    n = 6
    low = [[None] * n for _ in range(n)]
    diag = [None] * n
    for j in range(n):
        s = a[:, j, j]
        for k in range(j):
            s = s - low[j][k] * low[j][k] * diag[k]
        diag[j] = s
        for i in range(j + 1, n):
            t = a[:, i, j]
            for k in range(j):
                t = t - low[i][k] * low[j][k] * diag[k]
            low[i][j] = t / s
    y = [None] * n
    for i in range(n):
        t = b[:, i]
        for k in range(i):
            t = t - low[i][k] * y[k]
        y[i] = t
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i] / diag[i]
        for k in range(i + 1, n):
            t = t - low[k][i] * x[k]
        x[i] = t
    return jnp.stack(x, axis=1)


def _solve_and_update(pcfg: PipelineConfig, gradient, hessian, pose, group=None):
    """Batched Tikhonov-regularized Newton step (optimizer.cpp:144-167, single link).

    ``group`` (B,) int32 optionally ties slots to a shared pose: slot terms are
    segment-summed per group and gathered back before the solve, so every slot
    of a group takes the identical Newton step — the multi-region configuration
    where several RegionModalities (one per sub-body region model) sum into one
    Link (ycb_evaluator.cpp:427-453, link.cpp:184-193).  Group ids must be the
    index of the group's first slot, and grouped slots must start with equal
    poses.
    """
    if group is not None:
        b = gradient.shape[0]
        gradient = jax.ops.segment_sum(gradient, group, num_segments=b)[group]
        hessian = jax.ops.segment_sum(hessian, group, num_segments=b)[group]
    tikhonov = jnp.diag(jnp.asarray(
        [pcfg.tikhonov_rotation] * 3 + [pcfg.tikhonov_translation] * 3, jnp.float32))
    a = -hessian + tikhonov[None, :, :]
    theta = _ldlt_solve_6x6(a, gradient)
    theta = jnp.where(jnp.any(jnp.isnan(theta), axis=-1, keepdims=True),
                      jnp.zeros_like(theta), theta)
    # Single root link with identity body2joint: pose' = pose @ variation
    # (link.cpp:236-238 with body2joint == I).
    return pose @ jax.vmap(pose_variation)(theta)


def _region_terms(pcfg: PipelineConfig, intr, scale, points, poses, n_lines,
                  bin_crop, bin_cropT, rtab, corner_u, corner_v, width, height,
                  region_check=None, measured_occlusion=None,
                  modeled_occlusion=None, handle_occlusions=None):
    """One correspondence pass for the whole batch -> lane-major DataLines.

    The optional occlusion structures are batched over bodies (leading B axis);
    ``handle_occlusions`` is a (B,) traced bool (per body, so the reference's
    per-modality n_unoccluded_iterations counter maps onto batch entries).
    """
    fu, fv, ppu, ppv = intr
    cfg = pcfg.cfg
    kp = region_fast.round_up(cfg.line_length_in_segments * scale, 8)
    if isinstance(n_lines, (int, np.integer)):
        # Static count (adaptive coverage off): keep the line masks constants.
        nl_const = jnp.int32(n_lines)
        geo = jax.vmap(
            lambda p, pose, cu, cv, rc, mo, mdo, ho: region_fast.line_geometry(
                cfg, scale, p, nl_const, pose, fu, fv, ppu, ppv, width, height,
                cu, cv, pcfg.crop_size, pcfg.lp, region_check=rc,
                measured_occlusion=mo, modeled_occlusion=mdo,
                handle_occlusions=ho)
        )(points, poses, corner_u, corner_v, region_check, measured_occlusion,
          modeled_occlusion, handle_occlusions)
    else:
        n_lines = jnp.broadcast_to(jnp.asarray(n_lines, jnp.int32),
                                   (poses.shape[0],))
        geo = jax.vmap(
            lambda p, pose, cu, cv, rc, mo, mdo, ho, nl:
            region_fast.line_geometry(
                cfg, scale, p, nl, pose, fu, fv, ppu, ppv, width, height,
                cu, cv, pcfg.crop_size, pcfg.lp, region_check=rc,
                measured_occlusion=mo, modeled_occlusion=mdo,
                handle_occlusions=ho)
        )(points, poses, corner_u, corner_v, region_check, measured_occlusion,
          modeled_occlusion, handle_occlusions, n_lines)
    samples = region_fast.sample_lines(geo.params, bin_crop, bin_cropT, rtab, kp)
    lines = jax.vmap(
        lambda g, s: region_fast.lines_from_samples(cfg, scale, g, s)
    )(geo, samples)
    return lines


def _histogram_memories(pcfg: PipelineConfig, intr, points, poses, n_lines,
                        bin_crop, bin_cropT, rtab, corner_u, corner_v, width, height):
    """Fg/bg color collection along contour normals (cpp:1025-1155) for the batch."""
    fu, fv, ppu, ppv = intr
    cfg = pcfg.cfg
    lp2 = 2 * pcfg.lp
    if isinstance(n_lines, (int, np.integer)):
        nl_const = jnp.int32(n_lines)
        params, mask = jax.vmap(
            lambda p, pose, cu, cv: region_fast.histogram_walk_geometry(
                cfg, p, nl_const, pose, fu, fv, ppu, ppv, width, height,
                cu, cv, pcfg.crop_size, lp2)
        )(points, poses, corner_u, corner_v)
    else:
        n_lines = jnp.broadcast_to(jnp.asarray(n_lines, jnp.int32),
                                   (poses.shape[0],))
        params, mask = jax.vmap(
            lambda p, pose, cu, cv, nl: region_fast.histogram_walk_geometry(
                cfg, p, nl, pose, fu, fv, ppu, ppv, width, height,
                cu, cv, pcfg.crop_size, lp2)
        )(points, poses, corner_u, corner_v, n_lines)
    max_steps = int(np.ceil(cfg.max_considered_line_length)) + 1
    kp2 = region_fast.round_up(max_steps, 8)
    bins = region_fast.sample_lines(params, bin_crop, bin_cropT, rtab, kp2,
                                    output="bins")
    bins = jnp.swapaxes(bins, 1, 2)  # (B, lp2, kp2) to align with mask
    b = bins.shape[0]
    half = lp2 // 2
    n_total = cfg.n_histogram_bins ** 3
    mem_f = region_fast.bin_counts(bins[:, :half].reshape(b, -1),
                                   mask[:, :half].reshape(b, -1), n_total)
    mem_b = region_fast.bin_counts(bins[:, half:].reshape(b, -1),
                                   mask[:, half:].reshape(b, -1), n_total)
    return mem_f, mem_b


def _render_scene_for(pcfg: PipelineConfig, scene_geom, scene_poses, intr,
                      width: int, height: int):
    """Per-iteration scene evaluation: SceneCoeffs (query mode) or FocusedRender."""
    if pcfg.occlusion_queries:
        return occlusion_ops.focused_scene_coeffs(
            scene_geom, scene_poses, intr, width, height,
            pcfg.focused_image_size, pcfg.z_min, pcfg.z_max)
    return occlusion_ops.focused_render(
        scene_geom, scene_poses, intr, width, height,
        pcfg.focused_image_size, pcfg.z_min, pcfg.z_max,
        pcfg.occlusion_raster_chunk)


def _scene_region_inputs(pcfg: PipelineConfig, rend, scene_geom):
    """RegionCheck/ModeledOcclusion inputs from either scene-evaluation mode."""
    region_check = modeled = None
    if rend is None:
        return region_check, modeled
    if isinstance(rend, occlusion_ops.SceneCoeffs):
        size = jnp.full(rend.corner_u.shape, pcfg.focused_image_size, jnp.int32)
        if pcfg.region_checking:
            region_check = RegionCheckQueryInputs(
                rend.coeffs, rend.tri_valid, rend.sil_id & 255,
                rend.corner_u, rend.corner_v, rend.scale,
                scene_geom.region_id, rend.body_visible, size)
        if pcfg.region_model_occlusions:
            modeled = ModeledOcclusionQueryInputs(
                rend.coeffs, rend.tri_valid, rend.corner_u, rend.corner_v,
                rend.scale, rend.body_visible, size)
        return region_check, modeled
    if pcfg.region_checking:
        region_check = RegionCheckInputs(
            rend.region_sil, rend.corner_u, rend.corner_v, rend.scale,
            scene_geom.region_id, rend.body_visible)
    if pcfg.region_model_occlusions:
        modeled = ModeledOcclusionInputs(
            rend.depth, rend.corner_u, rend.corner_v, rend.scale,
            rend.body_visible)
    return region_check, modeled


def _scene_depth_inputs(pcfg: PipelineConfig, rend, scene_geom):
    """DepthModeledOcclusion/SilhouetteCheck inputs from either mode."""
    d_modeled = d_sil = None
    if rend is None:
        return d_modeled, d_sil
    if isinstance(rend, occlusion_ops.SceneCoeffs):
        size = jnp.full(rend.corner_u.shape, pcfg.focused_image_size, jnp.int32)
        if pcfg.depth_model_occlusions:
            d_modeled = depth_fn.DepthModeledOcclusionQueryInputs(
                rend.coeffs, rend.tri_valid, rend.corner_u, rend.corner_v,
                rend.scale, rend.body_visible, size)
        if pcfg.depth_silhouette_check:
            d_sil = depth_fn.SilhouetteCheckQueryInputs(
                rend.coeffs, rend.tri_valid, rend.sil_id >> 8,
                rend.corner_u, rend.corner_v, rend.scale,
                scene_geom.body_id, rend.body_visible, size)
        return d_modeled, d_sil
    if pcfg.depth_model_occlusions:
        d_modeled = depth_fn.DepthModeledOcclusionInputs(
            rend.depth, rend.corner_u, rend.corner_v, rend.scale,
            rend.body_visible)
    if pcfg.depth_silhouette_check:
        d_sil = depth_fn.SilhouetteCheckInputs(
            rend.body_sil, rend.corner_u, rend.corner_v, rend.scale,
            scene_geom.body_id, rend.body_visible)
    return d_modeled, d_sil


def _cycle_core(pcfg: PipelineConfig, intr, images, model: RegionModelArrays,
                state: TrackingState, depth_intr=None, depth_scale=None,
                depth_images=None, depth_model=None, scene_geom=None,
                occluder_poses=None, handle_occlusions=None,
                texture_points=None, pose_group=None,
                depth_n_points=None) -> TrackingState:
    """Full tracking cycle for a batch (shared by jit and shard_map paths)."""
    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr
    planar_shape = _planar_u8(images).shape
    height, width = planar_shape[2], planar_shape[3]
    use_depth = pcfg.use_depth and depth_images is not None
    render_scene = pcfg.needs_scene_render and scene_geom is not None
    if handle_occlusions is None:
        handle_occlusions = jnp.asarray(True)
    handle_occlusions = jnp.broadcast_to(jnp.asarray(handle_occlusions),
                                         (state.body2camera_pose.shape[0],))

    pose = state.body2camera_pose
    hist_f, hist_b = state.histogram_f, state.histogram_b
    bin_crop, bin_cropT, corner_u, corner_v = _prepare_crops(pcfg, intr, images, pose)
    rtab = region_fast.ratio_table(hist_f, hist_b)
    if use_depth:
        dfu, dfv, dppu, dppv = depth_intr
        dcropT, dcorner_u, dcorner_v = depth_fast.depth_crops(
            depth_images, pose, dfu, dfv, dppu, dppv, pcfg.crop_size)

    def scene_render(pose):
        # Correspondence renderers StartRendering (tracker.cpp:448-451): the full
        # scene (tracked body in slot 0 + occluders) at the CURRENT pose estimate.
        if occluder_poses is not None:
            scene_poses = jnp.concatenate([pose[:, None], occluder_poses], axis=1)
        else:
            scene_poses = pose[:, None]
        return _render_scene_for(pcfg, scene_geom, scene_poses, intr,
                                 width, height)

    def region_occlusion_inputs(rend, points, pose):
        region_check, modeled = _scene_region_inputs(pcfg, rend, scene_geom)
        measured = None
        if pcfg.region_measure_occlusions and depth_images is not None:
            dfu, dfv, dppu, dppv = depth_intr
            b = pose.shape[0]
            bc = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (b,))
            presampled = None
            if use_depth:
                # Pallas crop-window presampling for the measured-occlusion
                # windows (region_modality.cpp:1343-1389) — the scattered HBM
                # gather costs ~3x the base cycle otherwise.
                centers = jnp.swapaxes(points.center_f_body, 1, 2)  # (B, L, 3)
                presampled = depth_fast.presample_occlusion_windows(
                    pcfg.cfg.measured_occlusion_radius, False, centers, pose,
                    dcropT, dcorner_u, dcorner_v, pcfg.crop_size,
                    dfu, dfv, dppu, dppv, depth_images.shape[2],
                    depth_images.shape[1])
            measured = MeasuredOcclusionInputs(
                depth_images, pose, bc(dfu), bc(dfv), bc(dppu), bc(dppv),
                bc(depth_scale), presampled)
        return region_check, measured, modeled

    for corr_iteration in range(pcfg.n_corr_iterations):
        scale, std = pcfg.iteration_scale(corr_iteration)
        rend = scene_render(pose) if render_scene else None
        points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model, pose)
        n_lines = _adaptive_n_lines(pcfg, model, pose)
        region_check, measured, modeled = region_occlusion_inputs(rend, points,
                                                                 pose)
        lines = _region_terms(pcfg, intr, scale, points, pose, n_lines,
                              bin_crop, bin_cropT, rtab, corner_u, corner_v,
                              width, height, region_check=region_check,
                              measured_occlusion=measured,
                              modeled_occlusion=modeled,
                              handle_occlusions=handle_occlusions)
        if use_depth:
            cd, depth_std = pcfg.iteration_depth(corr_iteration)
            dfu, dfv, dppu, dppv = depth_intr
            d_modeled, d_sil = _scene_depth_inputs(pcfg, rend, scene_geom)
            # Window samples come from the body-centered crops via the Pallas
            # staircase kernel (ops/depth_fast.py) instead of per-body HBM gathers.
            dview = jax.vmap(lambda m, p: _select_depth_view(m, p))(depth_model, pose)
            dpre = depth_fast.presample_windows(
                pcfg.depth_cfg, cd, dview.center_f_body, pose, dcropT,
                dcorner_u, dcorner_v, pcfg.crop_size, dfu, dfv, dppu, dppv)
            mo_pre = None
            if pcfg.depth_measure_occlusions:
                mo_pre = depth_fast.presample_occlusion_windows(
                    pcfg.depth_cfg.measured_occlusion_radius,
                    pcfg.depth_cfg.use_depth_scaling, dview.center_f_body,
                    pose, dcropT, dcorner_u, dcorner_v, pcfg.crop_size,
                    dfu, dfv, dppu, dppv, depth_images.shape[2],
                    depth_images.shape[1])
            dnp = jnp.broadcast_to(
                jnp.asarray(pcfg.depth_cfg.n_points_max
                            if depth_n_points is None else depth_n_points,
                            jnp.int32), (pose.shape[0],))
            depth_points = jax.vmap(
                lambda dimg, dpv, p, dmo, dsc, pre, ho, mpre, np_:
                depth_fn.calculate_correspondences(
                    pcfg.depth_cfg, cd, dpv, np_, p, dimg,
                    dfu, dfv, dppu, dppv, depth_images.shape[2],
                    depth_images.shape[1], depth_scale, ho,
                    measure_occlusions=pcfg.depth_measure_occlusions,
                    modeled_occlusion=dmo, silhouette_check=dsc, presampled=pre,
                    measured_presampled=mpre)
            )(depth_images, dview, pose, d_modeled, d_sil, dpre,
              handle_occlusions, mo_pre, dnp)
        if pcfg.use_texture and texture_points is not None:
            tex_std = pcfg.texture_standard_deviations[
                min(corr_iteration, len(pcfg.texture_standard_deviations) - 1)]
        for update_iteration in range(pcfg.n_update_iterations):
            gradient, hessian = jax.vmap(
                lambda ln, p: region_fast.gradient_hessian_cl(
                    cfg, ln, p, fu, fv, ppu, ppv, std,
                    update_iteration < cfg.n_global_iterations)
            )(lines, pose)
            if use_depth:
                dg, dh = jax.vmap(
                    lambda dp, p: depth_fn.calculate_gradient_and_hessian(
                        dp, p, depth_std)
                )(depth_points, pose)
                gradient = gradient + dg
                hessian = hessian + dh
            if pcfg.use_texture and texture_points is not None:
                tg, th = jax.vmap(
                    lambda tp, p: texture_fn.calculate_gradient_and_hessian(
                        tp, p, fu, fv, ppu, ppv, tex_std,
                        pcfg.tukey_norm_constant)
                )(texture_points, pose)
                gradient = gradient + tg
                hessian = hessian + th
            pose = _solve_and_update(pcfg, gradient, hessian, pose,
                                     group=pose_group)

    # CalculateResults: online histogram adaptation (tracker.cpp:503-517).
    points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model, pose)
    n_lines = _adaptive_n_lines(pcfg, model, pose)
    mem_f, mem_b = _histogram_memories(pcfg, intr, points, pose, n_lines,
                                       bin_crop, bin_cropT, rtab,
                                       corner_u, corner_v, width, height)
    hist_f = jax.vmap(lambda h, m: hist_ops.calculate_histogram(
        h, m, pcfg.learning_rate_f))(hist_f, mem_f)
    hist_b = jax.vmap(lambda h, m: hist_ops.calculate_histogram(
        h, m, pcfg.learning_rate_b))(hist_b, mem_b)
    return TrackingState(pose, hist_f, hist_b)


@functools.partial(jax.jit, static_argnames=("pcfg",))
def tracking_cycle(pcfg: PipelineConfig, intr, images, model: RegionModelArrays,
                   state: TrackingState, scene_geom=None, occluder_poses=None,
                   handle_occlusions=None, texture_points=None,
                   pose_group=None) -> TrackingState:
    """One full tracking cycle for a batch of bodies.

    images: (B, H, W, 3) or planar (B, 3, H, W) uint8.
    scene_geom (ops.occlusion.SceneGeometry) + occluder_poses (B, NO-1, 4, 4)
    enable on-device modeled occlusions / region checking when the matching
    PipelineConfig flags are set; handle_occlusions is a traced bool (the
    reference disables occlusion handling for the first n_unoccluded_iterations
    after StartModality, region_modality.h:442).  pose_group (B,) int32 ties
    batch slots to one shared pose (multi-region sub-modalities summing into a
    single Link, see _solve_and_update).
    """
    return _cycle_core(pcfg, intr, images, model, state, scene_geom=scene_geom,
                       occluder_poses=occluder_poses,
                       handle_occlusions=handle_occlusions,
                       texture_points=texture_points, pose_group=pose_group)


@functools.partial(jax.jit, static_argnames=("pcfg",))
def tracking_cycle_rgbd(pcfg: PipelineConfig, intr, depth_intr, depth_scale, images,
                        depth_images, model: RegionModelArrays,
                        depth_model: DepthModelArrays,
                        state: TrackingState, scene_geom=None, occluder_poses=None,
                        handle_occlusions=None, texture_points=None,
                        pose_group=None, depth_n_points=None) -> TrackingState:
    """ICG-style region+depth fused cycle for a batch of bodies.

    depth_images (B, Hd, Wd) uint16 with shared depth camera intrinsics/scale
    (the reference's ICG configuration, ICG/readme.md:51-73).  Occlusion inputs
    as in :func:`tracking_cycle`; measured occlusions additionally use the depth
    images directly (region_modality.cpp:1343-1389).  pose_group (B,) int32
    ties batch slots to one shared pose and depth_n_points (B,) int32 sets the
    per-slot depth point budget (0 disables depth terms for non-primary
    multi-region slots, which all duplicate the entry's one DepthModality).
    """
    return _cycle_core(pcfg, intr, images, model, state, depth_intr=depth_intr,
                       depth_scale=depth_scale, depth_images=depth_images,
                       depth_model=depth_model, scene_geom=scene_geom,
                       occluder_poses=occluder_poses,
                       handle_occlusions=handle_occlusions,
                       texture_points=texture_points, pose_group=pose_group,
                       depth_n_points=depth_n_points)


def initialize_histograms(pcfg: PipelineConfig, intr, images, model: RegionModelArrays,
                          poses) -> TrackingState:
    """StartModality for the batch: build histograms at the initial poses (lr == 1)."""
    cfg = pcfg.cfg
    poses = jnp.asarray(poses)
    planar_shape = _planar_u8(images).shape
    height, width = planar_shape[2], planar_shape[3]
    n = cfg.n_histogram_bins ** 3
    b = poses.shape[0]

    bin_crop, bin_cropT, corner_u, corner_v = _prepare_crops(pcfg, intr, images, poses)
    rtab = jnp.zeros((b, n // 128, 128), jnp.float32)
    points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model, poses)
    mem_f, mem_b = _histogram_memories(pcfg, intr, points, poses,
                                       _adaptive_n_lines(pcfg, model, poses),
                                       bin_crop, bin_cropT, rtab,
                                       corner_u, corner_v, width, height)
    uniform = jnp.full((b, n), 1.0 / n, jnp.float32)
    hist_f = jax.vmap(lambda h, m: hist_ops.calculate_histogram(h, m, 1.0))(
        uniform, mem_f)
    hist_b = jax.vmap(lambda h, m: hist_ops.calculate_histogram(h, m, 1.0))(
        uniform, mem_b)
    return TrackingState(poses, hist_f, hist_b)


# --------------------------------------------------------------------------------------
# Multi-chip sharded step (SURVEY.md section 2.4: DP over bodies, camera-axis reduction)
# --------------------------------------------------------------------------------------


class MultiCameraState(NamedTuple):
    """Tracking state for the multi-camera sharded cycle.

    Pose is per body in the reference-camera frame (replicated over the camera axis);
    histograms are per (body, camera) — the reference gives every RegionModality its
    own ColorHistograms unless explicitly shared (region_modality.h:79-83).
    """

    body2reference_pose: jnp.ndarray  # (B, 4, 4)
    histogram_f: jnp.ndarray  # (B, C, n_bins^3)
    histogram_b: jnp.ndarray  # (B, C, n_bins^3)


def make_sharded_cycle(pcfg: PipelineConfig, mesh, intr, depth_intr=None,
                       with_depth: bool = False, with_scene: bool = False,
                       with_texture: bool = False):
    """Build a pjit-ted multi-camera tracking cycle over a (data, camera) mesh.

    Bodies are sharded across the ``data`` axis; each body is observed by ``camera``-axis
    many cameras whose per-camera gradient/Hessian contributions are reduced with a psum
    over ICI before the shared Newton step — the TPU-native analogue of the reference's
    multi-camera modality fusion (one Link summing several modalities,
    link.cpp:184-193).  The per-camera computation is the FULL single-chip cycle
    semantics: every correspondence iteration, global and local update iterations,
    per-camera histogram adaptation, optional ICG depth fusion (``with_depth``), and
    optional on-device occlusion rendering / region checking (``with_scene`` + the
    PipelineConfig occlusion flags) — for C == 1 the result is bit-identical to
    :func:`tracking_cycle` (tested in tests/test_parallel.py).

    Inputs of the returned function:
      images: (B, C, H, W, 3) uint8, sharded ("data", "camera")
      cam2ref_poses: (C, 4, 4) camera-to-reference-camera extrinsics, sharded ("camera",)
      model: RegionModelArrays sharded ("data",) on the body axis
      state: MultiCameraState with pose sharded ("data",) and histograms
             sharded ("data", "camera")
      with_depth adds (depth_images (B, C, Hd, Wd) u16, depth_scale scalar,
      depth_model DepthModelArrays sharded ("data",)); with_scene adds
      (scene_geom SceneGeometry sharded ("data",), occluder_poses (B, NO-1, 4, 4)
      in the REFERENCE camera frame, sharded ("data",)); with_texture adds
      (texture_points TexturePoints with leading (B, C) axes sharded
      ("data", "camera") — host feature matches per body and camera,
      pipeline.texture_points_from_modalities).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr

    def per_shard(images, cam2ref, model, pose, hist_f, hist_b, handle_occ,
                  *extra):
        # Local shapes: images (b, c, H, W, 3); cam2ref (c, 4, 4);
        # pose (b, 4, 4); hist_* (b, c, N); handle_occ (b,) bool.
        extra = list(extra)
        depth_images = depth_scale = depth_model = None
        scene_geom = occluder_poses = None
        texture_points = None
        if with_depth:
            depth_images, depth_scale, depth_model = extra[:3]
            extra = extra[3:]
        if with_scene:
            scene_geom, occluder_poses = extra[:2]
            extra = extra[2:]
        if with_texture:
            texture_points = extra[0]
        b, c = images.shape[0], images.shape[1]
        height, width = images.shape[2], images.shape[3]
        ref2cam = jnp.linalg.inv(cam2ref)

        flat = lambda x: x.reshape((b * c,) + x.shape[2:])
        images_f = flat(images)                      # (b*c, H, W, 3)
        hist_f_l = flat(hist_f)
        hist_b_l = flat(hist_b)
        model_f = jax.tree_util.tree_map(
            lambda a: jnp.repeat(a, c, axis=0), model)
        depth_images_f = flat(depth_images) if depth_images is not None else None
        depth_model_f = (jax.tree_util.tree_map(
            lambda a: jnp.repeat(a, c, axis=0), depth_model)
            if depth_model is not None else None)
        scene_geom_f = (jax.tree_util.tree_map(
            lambda a: jnp.repeat(a, c, axis=0), scene_geom)
            if scene_geom is not None else None)
        render_scene = pcfg.needs_scene_render and scene_geom_f is not None
        # Per-body occlusion-handling flag (region_modality.h:442: disabled for
        # the first n_unoccluded_iterations after StartModality), replicated to
        # every camera of the body.
        handle_occlusions = jnp.repeat(handle_occ, c)

        def cam_poses(pose):
            # (b, c, 4, 4) -> flat (b*c, 4, 4): body pose in each camera's frame.
            return jnp.einsum("cij,bjk->bcik", ref2cam, pose).reshape(b * c, 4, 4)

        def cam_scene_poses(pose):
            # Scene body poses per (body, camera): slot 0 tracked body + occluders,
            # all mapped from the reference frame into each camera's frame.
            scene = pose[:, None]
            if occluder_poses is not None:
                scene = jnp.concatenate([scene, occluder_poses], axis=1)
            return jnp.einsum("cij,bojk->bcoik", ref2cam,
                              scene).reshape(b * c, -1, 4, 4)

        pose_cam = cam_poses(pose)
        bin_crop, bin_cropT, corner_u, corner_v = _prepare_crops(
            pcfg, intr, images_f, pose_cam)
        rtab = region_fast.ratio_table(hist_f_l, hist_b_l)
        if with_depth and depth_images_f is not None:
            dfu, dfv, dppu, dppv = depth_intr
            dcropT, dcorner_u, dcorner_v = depth_fast.depth_crops(
                depth_images_f, pose_cam, dfu, dfv, dppu, dppv, pcfg.crop_size)
        if texture_points is not None:
            texture_points_f = jax.tree_util.tree_map(
                lambda a: a.reshape((b * c,) + a.shape[2:]), texture_points)

        for corr_iteration in range(pcfg.n_corr_iterations):
            scale, std = pcfg.iteration_scale(corr_iteration)
            pose_cam = cam_poses(pose)
            region_check = modeled = measured = None
            rend = None
            if render_scene:
                rend = _render_scene_for(pcfg, scene_geom_f,
                                         cam_scene_poses(pose), intr,
                                         width, height)
                region_check, modeled = _scene_region_inputs(
                    pcfg, rend, scene_geom_f)
            points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model_f, pose_cam)
            n_lines = _adaptive_n_lines(pcfg, model_f, pose_cam)
            if pcfg.region_measure_occlusions and depth_images_f is not None:
                dfu, dfv, dppu, dppv = depth_intr
                bc_ = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32),
                                                 (b * c,))
                centers = jnp.swapaxes(points.center_f_body, 1, 2)
                mpre = depth_fast.presample_occlusion_windows(
                    pcfg.cfg.measured_occlusion_radius, False, centers,
                    pose_cam, dcropT, dcorner_u, dcorner_v, pcfg.crop_size,
                    dfu, dfv, dppu, dppv, depth_images_f.shape[2],
                    depth_images_f.shape[1])
                measured = MeasuredOcclusionInputs(
                    depth_images_f, pose_cam, bc_(dfu), bc_(dfv), bc_(dppu),
                    bc_(dppv), bc_(depth_scale), mpre)
            lines = _region_terms(pcfg, intr, scale, points, pose_cam, n_lines,
                                  bin_crop, bin_cropT, rtab, corner_u, corner_v,
                                  width, height, region_check=region_check,
                                  measured_occlusion=measured,
                                  modeled_occlusion=modeled,
                                  handle_occlusions=handle_occlusions)
            if with_depth and depth_images_f is not None:
                cd, depth_std = pcfg.iteration_depth(corr_iteration)
                d_modeled, d_sil = _scene_depth_inputs(pcfg, rend, scene_geom_f)
                # Pallas crop-window presampling, like the single-chip path
                # (ops/depth_fast.py).
                dview = jax.vmap(lambda m, p: _select_depth_view(m, p))(
                    depth_model_f, pose_cam)
                dpre = depth_fast.presample_windows(
                    pcfg.depth_cfg, cd, dview.center_f_body, pose_cam, dcropT,
                    dcorner_u, dcorner_v, pcfg.crop_size, dfu, dfv, dppu, dppv)
                mo_pre = None
                if pcfg.depth_measure_occlusions:
                    mo_pre = depth_fast.presample_occlusion_windows(
                        pcfg.depth_cfg.measured_occlusion_radius,
                        pcfg.depth_cfg.use_depth_scaling, dview.center_f_body,
                        pose_cam, dcropT, dcorner_u, dcorner_v, pcfg.crop_size,
                        dfu, dfv, dppu, dppv, depth_images_f.shape[2],
                        depth_images_f.shape[1])
                depth_points = jax.vmap(
                    lambda dimg, dpv, p, dmo, dsc, pre, ho, mpre:
                    depth_fn.calculate_correspondences(
                        pcfg.depth_cfg, cd, dpv,
                        jnp.int32(pcfg.depth_cfg.n_points_max), p, dimg,
                        dfu, dfv, dppu, dppv, depth_images_f.shape[2],
                        depth_images_f.shape[1], depth_scale, ho,
                        measure_occlusions=pcfg.depth_measure_occlusions,
                        modeled_occlusion=dmo, silhouette_check=dsc,
                        presampled=pre, measured_presampled=mpre)
                )(depth_images_f, dview, pose_cam, d_modeled, d_sil, dpre,
                  handle_occlusions, mo_pre)
            if pcfg.use_texture and texture_points is not None:
                tex_std = pcfg.texture_standard_deviations[
                    min(corr_iteration,
                        len(pcfg.texture_standard_deviations) - 1)]
            for update_iteration in range(pcfg.n_update_iterations):
                pose_cam = cam_poses(pose)
                g_c, h_c = jax.vmap(
                    lambda ln, p: region_fast.gradient_hessian_cl(
                        cfg, ln, p, fu, fv, ppu, ppv, std,
                        update_iteration < cfg.n_global_iterations)
                )(lines, pose_cam)
                if with_depth and depth_images_f is not None:
                    dg, dh = jax.vmap(
                        lambda dp, p: depth_fn.calculate_gradient_and_hessian(
                            dp, p, depth_std)
                    )(depth_points, pose_cam)
                    g_c = g_c + dg
                    h_c = h_c + dh
                if pcfg.use_texture and texture_points is not None:
                    tg, th = jax.vmap(
                        lambda tp, p: texture_fn.calculate_gradient_and_hessian(
                            tp, p, fu, fv, ppu, ppv, tex_std,
                            pcfg.tukey_norm_constant)
                    )(texture_points_f, pose_cam)
                    g_c = g_c + tg
                    h_c = h_c + th
                # Gradient/Hessian live in the BODY frame (modality.h:135-136), so
                # contributions from different cameras sum directly.
                g = jnp.sum(g_c.reshape(b, c, 6), axis=1)
                h = jnp.sum(h_c.reshape(b, c, 6, 6), axis=1)
                g = jax.lax.psum(g, axis_name="camera")
                h = jax.lax.psum(h, axis_name="camera")
                pose = _solve_and_update(pcfg, g, h, pose)

        pose_cam = cam_poses(pose)
        points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model_f, pose_cam)
        n_lines = _adaptive_n_lines(pcfg, model_f, pose_cam)
        mem_f, mem_b = _histogram_memories(pcfg, intr, points, pose_cam, n_lines,
                                           bin_crop, bin_cropT, rtab,
                                           corner_u, corner_v, width, height)
        hist_f_l = jax.vmap(lambda h_, m_: hist_ops.calculate_histogram(
            h_, m_, pcfg.learning_rate_f))(hist_f_l, mem_f)
        hist_b_l = jax.vmap(lambda h_, m_: hist_ops.calculate_histogram(
            h_, m_, pcfg.learning_rate_b))(hist_b_l, mem_b)
        unflat = lambda x: x.reshape((b, c) + x.shape[1:])
        return pose, unflat(hist_f_l), unflat(hist_b_l)

    spec_bc = P("data", "camera")
    spec_b = P("data")
    spec_c = P("camera")
    spec_r = P()
    model_spec = RegionModelArrays(*([spec_b] * len(RegionModelArrays._fields)))

    in_specs = [spec_bc, spec_c, model_spec, spec_b, spec_bc, spec_bc, spec_b]
    if with_depth:
        depth_model_spec = DepthModelArrays(
            *([spec_b] * len(DepthModelArrays._fields)))
        in_specs += [spec_bc, spec_r, depth_model_spec]
    if with_scene:
        scene_spec = occlusion_ops.SceneGeometry(
            *([spec_b] * len(occlusion_ops.SceneGeometry._fields)))
        in_specs += [scene_spec, spec_b]
    if with_texture:
        in_specs += [TexturePoints(*([spec_bc] * len(TexturePoints._fields)))]

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(spec_b, spec_bc, spec_bc),
        # pallas_call outputs carry no varying-manual-axes metadata yet.
        check_vma=False,
    )

    @jax.jit
    def cycle(images, cam2ref_poses, model, state: MultiCameraState,
              *extra, handle_occlusions=None) -> MultiCameraState:
        if handle_occlusions is None:
            handle_occlusions = jnp.ones((images.shape[0],), bool)
        pose, hf, hb = sharded(images, cam2ref_poses, model,
                               state.body2reference_pose, state.histogram_f,
                               state.histogram_b, handle_occlusions, *extra)
        return MultiCameraState(pose, hf, hb)

    return cycle


def initialize_multicamera_histograms(pcfg: PipelineConfig, intr, images, cam2ref_poses,
                                      model: RegionModelArrays,
                                      poses) -> MultiCameraState:
    """StartModality for the multi-camera cycle (host-side, unsharded shapes)."""
    b, c = images.shape[0], images.shape[1]
    ref2cam = jnp.linalg.inv(cam2ref_poses)
    pose_cam = jnp.einsum("cij,bjk->bcik", ref2cam, jnp.asarray(poses))
    images_f = images.reshape((b * c,) + images.shape[2:])
    model_f = jax.tree_util.tree_map(lambda a: jnp.repeat(a, c, axis=0), model)
    st = initialize_histograms(pcfg, intr, images_f, model_f,
                               pose_cam.reshape(b * c, 4, 4))
    n = st.histogram_f.shape[-1]
    return MultiCameraState(jnp.asarray(poses),
                            st.histogram_f.reshape(b, c, n),
                            st.histogram_b.reshape(b, c, n))


class KinematicMultiCameraState(NamedTuple):
    """State for the sharded multi-camera kinematic cycle.

    DOF poses live in the REFERENCE camera frame (replicated over the camera
    axis); histograms are per (structure, link, camera) like the reference's
    per-modality ColorHistograms (region_modality.h:79-83).
    """

    joint2parent: jnp.ndarray  # (S, NL, 4, 4)
    histogram_f: jnp.ndarray   # (S, NL, C, n_bins^3)
    histogram_b: jnp.ndarray   # (S, NL, C, n_bins^3)


def make_sharded_kinematic_cycle(pcfg: PipelineConfig, mesh, intr,
                                 depth_intr=None, with_depth: bool = False,
                                 with_scene: bool = False,
                                 with_texture: bool = False):
    """Multi-camera articulated tracking over a (data, camera) mesh.

    The full M3T flagship configuration: kinematic structures sharded across the
    ``data`` axis, every structure observed by ``camera``-axis many cameras whose
    per-link gradient/Hessian contributions (body frame, so they sum directly)
    are psum-reduced over ICI before the batched adjoint-chain KKT solve
    (ops/kinematics.py update_structures) — one Link summing modalities from
    several cameras, link.cpp:184-193, scaled out.  ``with_depth`` adds per-link
    ICG depth fusion with the Pallas window presampling; ``with_scene`` adds
    per-iteration link-on-link occlusion evaluation (modeled occlusions /
    region checking / depth silhouette checks per the PipelineConfig flags,
    tracker.cpp:448-451); ``with_texture`` adds per-link ICG+ texture GN terms.

    Inputs of the returned function:
      images: (S, C, H, W, 3) uint8, sharded ("data", "camera")
      cam2ref_poses: (C, 4, 4), sharded ("camera",)
      model: RegionModelArrays with B == S * NL link-major bodies, sharded
             ("data",) — the data-axis size must divide S so shard boundaries
             align with whole structures
      kin: KinematicModel sharded ("data",)
      state: KinematicMultiCameraState (joint2parent sharded ("data",),
             histograms sharded ("data", None, "camera"))
      with_depth adds (depth_images (S, C, Hd, Wd) u16, depth_scale scalar,
      depth_model DepthModelArrays sharded ("data",)); with_scene adds
      (scene_geom SceneGeometry with B == S * NL per-link scenes
      (occlusion_ops.build_kinematic_scene_geometry) sharded ("data",),
      extra_occluder_poses (S, NE, 4, 4) in the REFERENCE frame sharded
      ("data",)); with_texture adds (texture_points TexturePoints with leading
      (S, NL, C) axes sharded ("data", None, "camera")).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr

    def per_shard(images, cam2ref, model, kin, jp, hist_f, hist_b, handle_occ,
                  *extra):
        extra = list(extra)
        depth_images = depth_scale = depth_model = None
        scene_geom = extra_occluder_poses = None
        texture_points = None
        if with_depth:
            depth_images, depth_scale, depth_model = extra[:3]
            extra = extra[3:]
        if with_scene:
            scene_geom, extra_occluder_poses = extra[:2]
            extra = extra[2:]
        if with_texture:
            texture_points = extra[0]
        s, c = images.shape[0], images.shape[1]
        nl = kin.parent.shape[1]
        height, width = images.shape[2], images.shape[3]
        ref2cam = jnp.linalg.inv(cam2ref)
        n = s * nl * c
        # Per-(structure, link) occlusion-handling flag (region_modality.h:442),
        # replicated per camera; flat order matches images_f: (s, l, cam).
        handle_occlusions = jnp.repeat(handle_occ.reshape(s * nl), c)

        # images per (structure, link, camera) -> flat (s*nl*c, H, W, 3)
        images_f = jnp.repeat(images, nl, axis=0).reshape((n,) + images.shape[2:])
        hist_f_l = hist_f.reshape(n, -1)
        hist_b_l = hist_b.reshape(n, -1)
        model_f = jax.tree_util.tree_map(lambda a: jnp.repeat(a, c, axis=0), model)
        if with_depth:
            depth_images_f = jnp.repeat(depth_images, nl, axis=0).reshape(
                (n,) + depth_images.shape[2:])
            depth_model_f = jax.tree_util.tree_map(
                lambda a: jnp.repeat(a, c, axis=0), depth_model)
        scene_geom_f = (jax.tree_util.tree_map(
            lambda a: jnp.repeat(a, c, axis=0), scene_geom)
            if scene_geom is not None else None)
        render_scene = pcfg.needs_scene_render and scene_geom_f is not None
        if texture_points is not None:
            texture_points_f = jax.tree_util.tree_map(
                lambda a: a.reshape((n,) + a.shape[3:]), texture_points)

        def cam_poses(jp):
            b2c_ref = jax.vmap(kin_ops.forward_kinematics)(kin, jp)  # (s, nl, 4, 4)
            pose = jnp.einsum("cij,sljk->slcik", ref2cam, b2c_ref)
            return pose.reshape(n, 4, 4)

        def cam_scene_poses(jp):
            # Per-link scene: slots 0..NL-1 are the structure's links (they
            # occlude each other) + NE extra occluders, mapped into each
            # camera's frame; flat (n, NO, 4, 4) in (s, l, cam) order.
            b2c_ref = jax.vmap(kin_ops.forward_kinematics)(kin, jp)
            scene = jnp.broadcast_to(b2c_ref[:, None], (s, nl, nl, 4, 4))
            if extra_occluder_poses is not None:
                ne = extra_occluder_poses.shape[1]
                extra_p = jnp.broadcast_to(extra_occluder_poses[:, None],
                                           (s, nl, ne, 4, 4))
                scene = jnp.concatenate([scene, extra_p], axis=2)
            scene_cam = jnp.einsum("cij,slojk->slcoik", ref2cam, scene)
            return scene_cam.reshape(n, -1, 4, 4)

        pose_cam = cam_poses(jp)
        bin_crop, bin_cropT, corner_u, corner_v = _prepare_crops(
            pcfg, intr, images_f, pose_cam)
        rtab = region_fast.ratio_table(hist_f_l, hist_b_l)
        if with_depth:
            dfu, dfv, dppu, dppv = depth_intr
            dcropT, dcorner_u, dcorner_v = depth_fast.depth_crops(
                depth_images_f, pose_cam, dfu, dfv, dppu, dppv, pcfg.crop_size)

        for corr_iteration in range(pcfg.n_corr_iterations):
            scale, std = pcfg.iteration_scale(corr_iteration)
            pose_cam = cam_poses(jp)
            region_check = modeled = None
            rend = None
            if render_scene:
                rend = _render_scene_for(pcfg, scene_geom_f,
                                         cam_scene_poses(jp), intr,
                                         width, height)
                region_check, modeled = _scene_region_inputs(
                    pcfg, rend, scene_geom_f)
            points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model_f, pose_cam)
            n_lines = _adaptive_n_lines(pcfg, model_f, pose_cam)
            lines = _region_terms(pcfg, intr, scale, points, pose_cam, n_lines,
                                  bin_crop, bin_cropT, rtab, corner_u, corner_v,
                                  width, height, region_check=region_check,
                                  modeled_occlusion=modeled,
                                  handle_occlusions=handle_occlusions)
            if with_depth:
                cd, depth_std = pcfg.iteration_depth(corr_iteration)
                d_modeled, d_sil = _scene_depth_inputs(pcfg, rend, scene_geom_f)
                dview = jax.vmap(lambda m, p: _select_depth_view(m, p))(
                    depth_model_f, pose_cam)
                dpre = depth_fast.presample_windows(
                    pcfg.depth_cfg, cd, dview.center_f_body, pose_cam, dcropT,
                    dcorner_u, dcorner_v, pcfg.crop_size, dfu, dfv, dppu, dppv)
                mo_pre = None
                if pcfg.depth_measure_occlusions:
                    mo_pre = depth_fast.presample_occlusion_windows(
                        pcfg.depth_cfg.measured_occlusion_radius,
                        pcfg.depth_cfg.use_depth_scaling, dview.center_f_body,
                        pose_cam, dcropT, dcorner_u, dcorner_v, pcfg.crop_size,
                        dfu, dfv, dppu, dppv, depth_images_f.shape[2],
                        depth_images_f.shape[1])
                depth_points = jax.vmap(
                    lambda dimg, dpv, p, dmo, dsc, pre, ho, mpre:
                    depth_fn.calculate_correspondences(
                        pcfg.depth_cfg, cd, dpv,
                        jnp.int32(pcfg.depth_cfg.n_points_max), p, dimg,
                        dfu, dfv, dppu, dppv, depth_images_f.shape[2],
                        depth_images_f.shape[1], depth_scale, ho,
                        measure_occlusions=pcfg.depth_measure_occlusions,
                        modeled_occlusion=dmo, silhouette_check=dsc,
                        presampled=pre, measured_presampled=mpre)
                )(depth_images_f, dview, pose_cam, d_modeled, d_sil, dpre,
                  handle_occlusions, mo_pre)
            if pcfg.use_texture and texture_points is not None:
                tex_std = pcfg.texture_standard_deviations[
                    min(corr_iteration,
                        len(pcfg.texture_standard_deviations) - 1)]
            for update_iteration in range(pcfg.n_update_iterations):
                pose_cam = cam_poses(jp)
                g_c, h_c = jax.vmap(
                    lambda ln, p: region_fast.gradient_hessian_cl(
                        cfg, ln, p, fu, fv, ppu, ppv, std,
                        update_iteration < cfg.n_global_iterations)
                )(lines, pose_cam)
                if with_depth:
                    dg, dh = jax.vmap(
                        lambda dp, p: depth_fn.calculate_gradient_and_hessian(
                            dp, p, depth_std)
                    )(depth_points, pose_cam)
                    g_c = g_c + dg
                    h_c = h_c + dh
                if pcfg.use_texture and texture_points is not None:
                    tg, th = jax.vmap(
                        lambda tp, p: texture_fn.calculate_gradient_and_hessian(
                            tp, p, fu, fv, ppu, ppv, tex_std,
                            pcfg.tukey_norm_constant)
                    )(texture_points_f, pose_cam)
                    g_c = g_c + tg
                    h_c = h_c + th
                # Body-frame terms sum over local cameras, then over the camera
                # mesh axis (modality.h:135-136).
                g = jnp.sum(g_c.reshape(s, nl, c, 6), axis=2)
                h = jnp.sum(h_c.reshape(s, nl, c, 6, 6), axis=2)
                g = jax.lax.psum(g, axis_name="camera")
                h = jax.lax.psum(h, axis_name="camera")
                jp = kin_ops.update_structures(
                    kin, jp, g, h, pcfg.tikhonov_rotation,
                    pcfg.tikhonov_translation)

        pose_cam = cam_poses(jp)
        points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model_f, pose_cam)
        mem_f, mem_b = _histogram_memories(pcfg, intr, points, pose_cam,
                                           _adaptive_n_lines(pcfg, model_f,
                                                             pose_cam),
                                           bin_crop, bin_cropT, rtab,
                                           corner_u, corner_v, width, height)
        hist_f_l = jax.vmap(lambda h_, m_: hist_ops.calculate_histogram(
            h_, m_, pcfg.learning_rate_f))(hist_f_l, mem_f)
        hist_b_l = jax.vmap(lambda h_, m_: hist_ops.calculate_histogram(
            h_, m_, pcfg.learning_rate_b))(hist_b_l, mem_b)
        unflat = lambda x: x.reshape((s, nl, c) + x.shape[1:])
        return jp, unflat(hist_f_l), unflat(hist_b_l)

    spec_sc = P("data", "camera")
    spec_s = P("data")
    spec_c = P("camera")
    spec_r = P()
    spec_slc = P("data", None, "camera")
    model_spec = RegionModelArrays(*([spec_s] * len(RegionModelArrays._fields)))
    kin_spec = kin_ops.KinematicModel(
        *([spec_s] * len(kin_ops.KinematicModel._fields)))

    spec_sl = P("data", None)
    in_specs = [spec_sc, spec_c, model_spec, kin_spec, spec_s, spec_slc,
                spec_slc, spec_sl]
    if with_depth:
        depth_model_spec = DepthModelArrays(
            *([spec_s] * len(DepthModelArrays._fields)))
        in_specs += [spec_sc, spec_r, depth_model_spec]
    if with_scene:
        scene_spec = occlusion_ops.SceneGeometry(
            *([spec_s] * len(occlusion_ops.SceneGeometry._fields)))
        in_specs += [scene_spec, spec_s]
    if with_texture:
        in_specs += [TexturePoints(*([spec_slc] * len(TexturePoints._fields)))]

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(spec_s, spec_slc, spec_slc),
        # pallas_call outputs carry no varying-manual-axes metadata yet.
        check_vma=False,
    )

    @jax.jit
    def cycle(images, cam2ref_poses, model, kin,
              state: KinematicMultiCameraState, *extra,
              handle_occlusions=None) -> KinematicMultiCameraState:
        if handle_occlusions is None:
            handle_occlusions = jnp.ones(state.joint2parent.shape[:2], bool)
        jp, hf, hb = sharded(images, cam2ref_poses, model, kin,
                             state.joint2parent, state.histogram_f,
                             state.histogram_b, handle_occlusions, *extra)
        return KinematicMultiCameraState(jp, hf, hb)

    return cycle


# --------------------------------------------------------------------------------------
# Articulated structures: kinematic trees in the fused pipeline (the M in M3T)
# --------------------------------------------------------------------------------------


class KinematicTrackingState(NamedTuple):
    """Per-structure tracking state: DOF poses + per-link histograms.

    ``joint2parent`` follows ops/kinematics.py's convention (the root link's parent
    frame is the camera frame); bodies are flattened link-major, i.e. body index
    b == s * NL + l for structure s, link l.
    """

    joint2parent: jnp.ndarray  # (S, NL, 4, 4)
    histogram_f: jnp.ndarray   # (S, NL, n_bins^3)
    histogram_b: jnp.ndarray   # (S, NL, n_bins^3)


def _kinematic_flat_poses(kin, joint2parent):
    b2c = jax.vmap(kin_ops.forward_kinematics)(kin, joint2parent)  # (S, NL, 4, 4)
    s, nl = b2c.shape[0], b2c.shape[1]
    return b2c, b2c.reshape(s * nl, 4, 4)


@functools.partial(jax.jit, static_argnames=("pcfg",))
def tracking_cycle_kinematic(pcfg: PipelineConfig, intr, images,
                             model: RegionModelArrays,
                             kin: kin_ops.KinematicModel,
                             state: KinematicTrackingState, scene_geom=None,
                             extra_occluder_poses=None,
                             handle_occlusions=None, depth_intr=None,
                             depth_scale=None, depth_images=None,
                             depth_model=None,
                             texture_points=None) -> KinematicTrackingState:
    """One tracking cycle for S articulated structures of NL links each.

    The TPU analogue of Tracker::ExecuteTrackingStep over kinematic structures
    (tracker.cpp:344-364 + optimizer.cpp:144-167): per-link region terms feed the
    batched adjoint-chain KKT solve of ops/kinematics.py; constraints and soft
    constraints from the KinematicModel are applied every update iteration.

    images: (S, H, W, 3) uint8 (one camera per structure).
    model: RegionModelArrays with B == S * NL link-major bodies (pad missing links
    with any model; kin.link_valid masks their contribution).
    scene_geom: optional SceneGeometry with B == S * NL scenes whose body slots
    0..NL-1 are the structure's links (owner == link index) and slots NL.. are
    static occluders posed by extra_occluder_poses (S, NE, 4, 4); enables
    modeled occlusions / region checking between the links themselves.
    depth_intr/depth_scale/depth_images (S, Hd, Wd) u16/depth_model (B == S * NL)
    enable per-link ICG depth fusion when ``pcfg.use_depth`` — the Mb-ICG/RTB
    configuration, each link summing region + depth modality terms into the same
    KKT solve (link.cpp:184-193, rtb_evaluator.cpp config).
    texture_points: optional TexturePoints with leading B == S * NL axis
    (per-link host feature matches, texture_points_from_modalities) adding ICG+
    Tukey GN terms to each link when ``pcfg.use_texture``.
    """
    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr
    s, nl = kin.parent.shape[0], kin.parent.shape[1]
    planar = _planar_u8(images)
    height, width = planar.shape[2], planar.shape[3]
    render_scene = pcfg.needs_scene_render and scene_geom is not None
    use_depth = pcfg.use_depth and depth_images is not None
    if handle_occlusions is None:
        handle_occlusions = jnp.asarray(True)
    handle_occlusions = jnp.broadcast_to(jnp.asarray(handle_occlusions),
                                         (s * nl,))

    jp = state.joint2parent
    n_hist = state.histogram_f.shape[-1]
    hist_f = state.histogram_f.reshape(s * nl, n_hist)
    hist_b = state.histogram_b.reshape(s * nl, n_hist)
    images_flat = jnp.repeat(images, nl, axis=0)

    b2c, pose_flat = _kinematic_flat_poses(kin, jp)
    bin_crop, bin_cropT, corner_u, corner_v = _prepare_crops(
        pcfg, intr, images_flat, pose_flat)
    rtab = region_fast.ratio_table(hist_f, hist_b)
    if use_depth:
        dfu, dfv, dppu, dppv = depth_intr
        depth_images_flat = jnp.repeat(depth_images, nl, axis=0)
        dcropT, dcorner_u, dcorner_v = depth_fast.depth_crops(
            depth_images_flat, pose_flat, dfu, dfv, dppu, dppv, pcfg.crop_size)

    def scene_render(b2c):
        # Per-link focused render of the WHOLE structure (+ extra occluders): the
        # links occlude each other, the dominant occlusion source in articulated
        # scenes (Mb-ICG).  scene_poses: (S*NL, NO, 4, 4).  In the default
        # point-query mode this evaluates triangle coefficients only (no (S, S)
        # raster), so the per-link duplication costs ~T*50 flops per link.
        scene_poses = jnp.broadcast_to(b2c[:, None], (s, nl, nl, 4, 4))
        if extra_occluder_poses is not None:
            ne = extra_occluder_poses.shape[1]
            extra = jnp.broadcast_to(extra_occluder_poses[:, None],
                                     (s, nl, ne, 4, 4))
            scene_poses = jnp.concatenate([scene_poses, extra], axis=2)
        scene_poses = scene_poses.reshape(s * nl, -1, 4, 4)
        return _render_scene_for(pcfg, scene_geom, scene_poses, intr,
                                 width, height)

    for corr_iteration in range(pcfg.n_corr_iterations):
        scale, std = pcfg.iteration_scale(corr_iteration)
        b2c, pose_flat = _kinematic_flat_poses(kin, jp)
        region_check = modeled = None
        rend = None
        if render_scene:
            rend = scene_render(b2c)
            region_check, modeled = _scene_region_inputs(pcfg, rend, scene_geom)
        points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model, pose_flat)
        n_lines = _adaptive_n_lines(pcfg, model, pose_flat)
        lines = _region_terms(pcfg, intr, scale, points, pose_flat, n_lines,
                              bin_crop, bin_cropT, rtab, corner_u, corner_v,
                              width, height, region_check=region_check,
                              modeled_occlusion=modeled,
                              handle_occlusions=handle_occlusions)
        if use_depth:
            cd, depth_std = pcfg.iteration_depth(corr_iteration)
            d_modeled, d_sil = _scene_depth_inputs(pcfg, rend, scene_geom)
            dview = jax.vmap(lambda m, p: _select_depth_view(m, p))(
                depth_model, pose_flat)
            dpre = depth_fast.presample_windows(
                pcfg.depth_cfg, cd, dview.center_f_body, pose_flat, dcropT,
                dcorner_u, dcorner_v, pcfg.crop_size, dfu, dfv, dppu, dppv)
            mo_pre = None
            if pcfg.depth_measure_occlusions:
                mo_pre = depth_fast.presample_occlusion_windows(
                    pcfg.depth_cfg.measured_occlusion_radius,
                    pcfg.depth_cfg.use_depth_scaling, dview.center_f_body,
                    pose_flat, dcropT, dcorner_u, dcorner_v, pcfg.crop_size,
                    dfu, dfv, dppu, dppv, depth_images_flat.shape[2],
                    depth_images_flat.shape[1])
            depth_points = jax.vmap(
                lambda dimg, dpv, p, dmo, dsc, pre, ho, mpre:
                depth_fn.calculate_correspondences(
                    pcfg.depth_cfg, cd, dpv,
                    jnp.int32(pcfg.depth_cfg.n_points_max), p, dimg,
                    dfu, dfv, dppu, dppv, depth_images_flat.shape[2],
                    depth_images_flat.shape[1], depth_scale, ho,
                    measure_occlusions=pcfg.depth_measure_occlusions,
                    modeled_occlusion=dmo, silhouette_check=dsc, presampled=pre,
                    measured_presampled=mpre)
            )(depth_images_flat, dview, pose_flat, d_modeled, d_sil, dpre,
              handle_occlusions, mo_pre)
        if pcfg.use_texture and texture_points is not None:
            tex_std = pcfg.texture_standard_deviations[
                min(corr_iteration, len(pcfg.texture_standard_deviations) - 1)]
        for update_iteration in range(pcfg.n_update_iterations):
            b2c, pose_flat = _kinematic_flat_poses(kin, jp)
            gradient, hessian = jax.vmap(
                lambda ln, p: region_fast.gradient_hessian_cl(
                    cfg, ln, p, fu, fv, ppu, ppv, std,
                    update_iteration < cfg.n_global_iterations)
            )(lines, pose_flat)
            if use_depth:
                dg, dh = jax.vmap(
                    lambda dp, p: depth_fn.calculate_gradient_and_hessian(
                        dp, p, depth_std)
                )(depth_points, pose_flat)
                gradient = gradient + dg
                hessian = hessian + dh
            if pcfg.use_texture and texture_points is not None:
                tg, th = jax.vmap(
                    lambda tp, p: texture_fn.calculate_gradient_and_hessian(
                        tp, p, fu, fv, ppu, ppv, tex_std,
                        pcfg.tukey_norm_constant)
                )(texture_points, pose_flat)
                gradient = gradient + tg
                hessian = hessian + th
            jp = kin_ops.update_structures(
                kin, jp, gradient.reshape(s, nl, 6),
                hessian.reshape(s, nl, 6, 6),
                pcfg.tikhonov_rotation, pcfg.tikhonov_translation)

    _, pose_flat = _kinematic_flat_poses(kin, jp)
    points = jax.vmap(lambda m, p: _select_view_cl(m, p))(model, pose_flat)
    mem_f, mem_b = _histogram_memories(pcfg, intr, points, pose_flat,
                                       _adaptive_n_lines(pcfg, model, pose_flat),
                                       bin_crop, bin_cropT, rtab,
                                       corner_u, corner_v, width, height)
    hist_f = jax.vmap(lambda h, m: hist_ops.calculate_histogram(
        h, m, pcfg.learning_rate_f))(hist_f, mem_f)
    hist_b = jax.vmap(lambda h, m: hist_ops.calculate_histogram(
        h, m, pcfg.learning_rate_b))(hist_b, mem_b)
    return KinematicTrackingState(jp, hist_f.reshape(s, nl, n_hist),
                                  hist_b.reshape(s, nl, n_hist))


def initialize_kinematic_histograms(pcfg: PipelineConfig, intr, images,
                                    model: RegionModelArrays, kin,
                                    joint2parent) -> KinematicTrackingState:
    """StartModality for articulated structures (histograms at the initial DOF)."""
    jp = jnp.asarray(joint2parent)
    s, nl = jp.shape[0], jp.shape[1]
    _, pose_flat = _kinematic_flat_poses(kin, jp)
    images_flat = jnp.repeat(jnp.asarray(images), nl, axis=0)
    st = initialize_histograms(pcfg, intr, images_flat, model, pose_flat)
    n_hist = st.histogram_f.shape[-1]
    return KinematicTrackingState(jp, st.histogram_f.reshape(s, nl, n_hist),
                                  st.histogram_b.reshape(s, nl, n_hist))


def kinematic_body_poses(kin, state: KinematicTrackingState):
    """Per-link body2camera poses (S, NL, 4, 4) from the DOF state."""
    b2c, _ = _kinematic_flat_poses(kin, state.joint2parent)
    return b2c


def texture_points_from_modalities(modalities, k_max: int) -> TexturePoints:
    """Pack host TextureModality correspondences into a fixed-shape TexturePoints.

    Call each modality's CalculateCorrespondences first (feature detection +
    keyframe matching run on host, like the reference's CPU/CUDA OpenCV path);
    this pads/truncates the matched 3D-2D pairs to ``k_max`` for the device GN
    terms of the fused ICG+ cycle.
    """
    b = len(modalities)
    p3 = np.zeros((b, k_max, 3), np.float32)
    p2 = np.zeros((b, k_max, 2), np.float32)
    valid = np.zeros((b, k_max), bool)
    for i, m in enumerate(modalities):
        n = min(len(m.data_points_3d), k_max)
        p3[i, :n] = m.data_points_3d[:n]
        p2[i, :n] = m.data_points_2d[:n]
        valid[i, :n] = True
    return TexturePoints(jnp.asarray(p3), jnp.asarray(p2), jnp.asarray(valid))
