"""Fused batched tracking pipeline — the TPU performance path.

The component classes (tracker.py et al.) mirror the reference's flexible object graph for
feature parity; this module is the TPU-first serving path: ONE jitted function executes a
whole tracking cycle (all correspondence iterations x update iterations, histogram
adaptation included) for a BATCH of independent bodies/sequences, optionally fused over
multiple cameras per body with a gradient/Hessian reduction across the camera mesh axis.

Everything is fixed-shape: view selection is an on-device argmax-gather over the
HBM-resident sparse viewpoint model (region_model.cpp:105-127), line rejection is masking,
and the per-structure Newton solve is a batched 6x6 (or DoF x DoF) linear solve.

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
from m3t_tpu.ops import depth_fn
from m3t_tpu.ops import histogram as hist_ops
from m3t_tpu.ops import region_fn
from m3t_tpu.ops.depth_fn import DepthConfig, DepthViewPoints
from m3t_tpu.ops.region_fn import RegionConfig, ViewPoints


class RegionModelArrays(NamedTuple):
    """Stacked sparse-viewpoint model for a batch of bodies (HBM-resident)."""

    orientations: jnp.ndarray  # (B, V, 3)
    centers: jnp.ndarray  # (B, V, L, 3)
    normals: jnp.ndarray  # (B, V, L, 3)
    foreground_distances: jnp.ndarray  # (B, V, L)
    background_distances: jnp.ndarray  # (B, V, L)
    measured_depth_offsets: jnp.ndarray  # (B, V, L)
    modeled_depth_offsets: jnp.ndarray  # (B, V, L)

    @staticmethod
    def from_models(models, n_lines: int, measured_offset_id: int = 5,
                    modeled_offset_id: int = 5) -> "RegionModelArrays":
        """Stack host RegionModel objects (pads V across bodies)."""
        v_max = max(m.orientations.shape[0] for m in models)

        def pad(a):
            out = np.zeros((v_max,) + a.shape[1:], a.dtype)
            out[: a.shape[0]] = a
            return out

        return RegionModelArrays(
            orientations=jnp.asarray(np.stack([pad(m.orientations) for m in models])),
            centers=jnp.asarray(np.stack([pad(m.centers[:, :n_lines]) for m in models])),
            normals=jnp.asarray(np.stack([pad(m.normals[:, :n_lines]) for m in models])),
            foreground_distances=jnp.asarray(
                np.stack([pad(m.foreground_distances[:, :n_lines]) for m in models])),
            background_distances=jnp.asarray(
                np.stack([pad(m.background_distances[:, :n_lines]) for m in models])),
            measured_depth_offsets=jnp.asarray(np.stack(
                [pad(m.depth_offsets[:, :n_lines, measured_offset_id]) for m in models])),
            modeled_depth_offsets=jnp.asarray(np.stack(
                [pad(m.depth_offsets[:, :n_lines, modeled_offset_id]) for m in models])),
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
    # ICG-style depth fusion (used when depth images + a depth model are provided).
    use_depth: bool = False
    depth_cfg: DepthConfig = DepthConfig()
    considered_distances: tuple = (0.05, 0.02, 0.01)
    depth_standard_deviations: tuple = (0.05, 0.03, 0.02)

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


def _select_view(model: RegionModelArrays, pose) -> ViewPoints:
    """On-device GetClosestView for one body: argmax dot + gather."""
    t = pose[:3, 3]
    norm = jnp.linalg.norm(t)
    orientation = pose[:3, :3].T @ (t / jnp.where(norm > 0, norm, 1.0))
    idx = jnp.argmax(model.orientations @ orientation)
    return ViewPoints(
        center_f_body=model.centers[idx],
        normal_f_body=model.normals[idx],
        foreground_distance=model.foreground_distances[idx],
        background_distance=model.background_distances[idx],
        measured_depth_offset=model.measured_depth_offsets[idx],
        modeled_depth_offset=model.modeled_depth_offsets[idx],
    )


def _select_depth_view(model: DepthModelArrays, pose) -> DepthViewPoints:
    t = pose[:3, 3]
    norm = jnp.linalg.norm(t)
    orientation = pose[:3, :3].T @ (t / jnp.where(norm > 0, norm, 1.0))
    idx = jnp.argmax(model.orientations @ orientation)
    return DepthViewPoints(
        center_f_body=model.centers[idx],
        normal_f_body=model.normals[idx],
        measured_depth_offset=model.measured_depth_offsets[idx],
        modeled_depth_offset=model.modeled_depth_offsets[idx],
    )


def _single_body_cycle(pcfg: PipelineConfig, intr, image, model_b: RegionModelArrays,
                       pose, hist_f, hist_b, depth_image=None, depth_model_b=None,
                       depth_intr=None, depth_scale=None):
    """Full tracking cycle for ONE body (vmapped over the batch)."""
    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr
    width = image.shape[1]
    height = image.shape[0]
    n_lines = jnp.int32(cfg.n_lines_max)
    lookup_f, lookup_b = cfg.function_lookups()
    use_depth = pcfg.use_depth and depth_image is not None

    for corr_iteration in range(pcfg.n_corr_iterations):
        scale, std = pcfg.iteration_scale(corr_iteration)
        points = _select_view(model_b, pose)
        lines = region_fn.calculate_correspondences(
            cfg, scale, points, n_lines, pose, image, hist_f, hist_b,
            fu, fv, ppu, ppv, width, height, jnp.asarray(True),
            function_lookup_f=lookup_f, function_lookup_b=lookup_b,
        )
        if use_depth:
            cd, depth_std = pcfg.iteration_depth(corr_iteration)
            dfu, dfv, dppu, dppv = depth_intr
            depth_points = depth_fn.calculate_correspondences(
                pcfg.depth_cfg, cd, _select_depth_view(depth_model_b, pose),
                jnp.int32(pcfg.depth_cfg.n_points_max), pose, depth_image,
                dfu, dfv, dppu, dppv, depth_image.shape[1], depth_image.shape[0],
                depth_scale, jnp.asarray(True),
            )
        for update_iteration in range(pcfg.n_update_iterations):
            gradient, hessian = region_fn.calculate_gradient_and_hessian(
                cfg, lines, pose, fu, fv, ppu, ppv, std,
                update_iteration < cfg.n_global_iterations,
            )
            if use_depth:
                dg, dh = depth_fn.calculate_gradient_and_hessian(
                    depth_points, pose, depth_std)
                gradient = gradient + dg
                hessian = hessian + dh
            tikhonov = jnp.diag(jnp.asarray(
                [pcfg.tikhonov_rotation] * 3 + [pcfg.tikhonov_translation] * 3,
                jnp.float32))
            a = -hessian + tikhonov
            theta = jnp.linalg.solve(a, gradient)
            theta = jnp.where(jnp.any(jnp.isnan(theta)), jnp.zeros(6), theta)
            # Single root link with identity body2joint: pose' = pose @ variation
            # (link.cpp:236-238 with body2joint == I).
            pose = pose @ pose_variation(theta)

    # CalculateResults: online histogram adaptation (tracker.cpp:503-517).
    points = _select_view(model_b, pose)
    n_bins = cfg.n_histogram_bins
    memory_f = jnp.zeros_like(hist_f)
    memory_b = jnp.zeros_like(hist_b)
    memory_f, memory_b = region_fn.add_line_pixel_colors(
        cfg, points, n_lines, pose, image, memory_f, memory_b,
        fu, fv, ppu, ppv, width, height, jnp.asarray(True),
    )
    hist_f = hist_ops.calculate_histogram(hist_f, memory_f, pcfg.learning_rate_f)
    hist_b = hist_ops.calculate_histogram(hist_b, memory_b, pcfg.learning_rate_b)
    return pose, hist_f, hist_b


@functools.partial(jax.jit, static_argnames=("pcfg",))
def tracking_cycle(pcfg: PipelineConfig, intr, images, model: RegionModelArrays,
                   state: TrackingState) -> TrackingState:
    """One full tracking cycle for a batch of bodies: images (B, H, W, 3)."""
    pose, hist_f, hist_b = jax.vmap(
        lambda img, mdl, p, hf, hb: _single_body_cycle(pcfg, intr, img, mdl, p, hf, hb)
    )(images, model, state.body2camera_pose, state.histogram_f, state.histogram_b)
    return TrackingState(pose, hist_f, hist_b)


@functools.partial(jax.jit, static_argnames=("pcfg",))
def tracking_cycle_rgbd(pcfg: PipelineConfig, intr, depth_intr, depth_scale, images,
                        depth_images, model: RegionModelArrays,
                        depth_model: DepthModelArrays,
                        state: TrackingState) -> TrackingState:
    """ICG-style region+depth fused cycle for a batch of bodies.

    images (B, H, W, 3) uint8; depth_images (B, Hd, Wd) uint16 with shared depth
    camera intrinsics/scale (the reference's ICG configuration, ICG/readme.md:51-73).
    """
    pose, hist_f, hist_b = jax.vmap(
        lambda img, dimg, mdl, dmdl, p, hf, hb: _single_body_cycle(
            pcfg, intr, img, mdl, p, hf, hb,
            depth_image=dimg, depth_model_b=dmdl, depth_intr=depth_intr,
            depth_scale=depth_scale)
    )(images, depth_images, model, depth_model, state.body2camera_pose,
      state.histogram_f, state.histogram_b)
    return TrackingState(pose, hist_f, hist_b)


def initialize_histograms(pcfg: PipelineConfig, intr, images, model: RegionModelArrays,
                          poses):
    """StartModality for the batch: build histograms at the initial poses (lr == 1)."""
    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr
    width = images.shape[2]
    height = images.shape[1]
    n = cfg.n_histogram_bins ** 3

    def one(img, mdl, pose):
        points = _select_view(mdl, pose)
        memory_f = jnp.zeros((n,), jnp.float32)
        memory_b = jnp.zeros((n,), jnp.float32)
        memory_f, memory_b = region_fn.add_line_pixel_colors(
            cfg, points, jnp.int32(cfg.n_lines_max), pose, img, memory_f, memory_b,
            fu, fv, ppu, ppv, width, height, jnp.asarray(False),
        )
        uniform = jnp.full((n,), 1.0 / n, jnp.float32)
        hf = hist_ops.calculate_histogram(uniform, memory_f, 1.0)
        hb = hist_ops.calculate_histogram(uniform, memory_b, 1.0)
        return hf, hb

    hist_f, hist_b = jax.vmap(one)(images, model, poses)
    return TrackingState(jnp.asarray(poses), hist_f, hist_b)


# --------------------------------------------------------------------------------------
# Multi-chip sharded step (SURVEY.md section 2.4: DP over bodies, camera-axis reduction)
# --------------------------------------------------------------------------------------


def make_sharded_cycle(pcfg: PipelineConfig, mesh, intr):
    """Build a pjit-ted multi-camera tracking cycle over a (data, camera) mesh.

    Bodies are sharded across the ``data`` axis; each body is observed by ``camera``-axis
    many cameras whose per-camera gradient/Hessian contributions are reduced with a psum
    over ICI before the shared Newton step — the TPU-native analogue of the reference's
    multi-camera modality fusion (one Link summing several modalities, link.cpp:184-193).

    Inputs of the returned function:
      images: (B, C, H, W, 3) uint8, sharded ("data", "camera")
      cam2ref_poses: (C, 4, 4) camera-to-reference-camera extrinsics, replicated
      model: RegionModelArrays sharded ("data",) on the body axis
      state: TrackingState sharded ("data",), pose in reference-camera frame
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr

    def per_shard(images, cam2ref, model, pose, hist_f, hist_b):
        # shapes: images (b, c, H, W, 3) local shard; cam2ref (c, 4, 4) local.
        width = images.shape[3]
        height = images.shape[2]
        lookup_f, lookup_b = cfg.function_lookups()

        def body_cycle(img_c, mdl, pose_b, hf, hb):
            # img_c: (c, H, W, 3) — this device's camera slice for one body.
            p = pose_b
            for corr_iteration in range(pcfg.n_corr_iterations):
                scale, std = pcfg.iteration_scale(corr_iteration)
                points = _select_view(mdl, p)

                def camera_terms(img, c2r):
                    # body pose in this camera's frame: ref pose premultiplied.
                    ref2cam = jnp.linalg.inv(c2r)
                    pose_cam = ref2cam @ p
                    lines = region_fn.calculate_correspondences(
                        cfg, scale, points, jnp.int32(cfg.n_lines_max), pose_cam,
                        img, hf, hb, fu, fv, ppu, ppv, width, height,
                        jnp.asarray(True), function_lookup_f=lookup_f,
                        function_lookup_b=lookup_b,
                    )
                    g, h = region_fn.calculate_gradient_and_hessian(
                        cfg, lines, pose_cam, fu, fv, ppu, ppv, std, True,
                    )
                    return g, h

                g_c, h_c = jax.vmap(camera_terms)(img_c, cam2ref)
                g = jnp.sum(g_c, axis=0)
                h = jnp.sum(h_c, axis=0)
                # Reduce camera contributions across the camera mesh axis (ICI psum).
                g = jax.lax.psum(g, axis_name="camera")
                h = jax.lax.psum(h, axis_name="camera")
                tikhonov = jnp.diag(jnp.asarray(
                    [pcfg.tikhonov_rotation] * 3 + [pcfg.tikhonov_translation] * 3,
                    jnp.float32))
                theta = jnp.linalg.solve(-h + tikhonov, g)
                theta = jnp.where(jnp.any(jnp.isnan(theta)), jnp.zeros(6), theta)
                p = p @ pose_variation(theta)
            return p, hf, hb

        pose, hist_f, hist_b = jax.vmap(body_cycle)(images, model, pose, hist_f, hist_b)
        return pose, hist_f, hist_b

    spec_bc = P("data", "camera")
    spec_b = P("data")
    spec_c = P("camera")
    model_spec = RegionModelArrays(*([spec_b] * len(RegionModelArrays._fields)))

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec_bc, spec_c, model_spec, spec_b, spec_b, spec_b),
        out_specs=(spec_b, spec_b, spec_b),
    )

    @jax.jit
    def cycle(images, cam2ref_poses, model, state: TrackingState) -> TrackingState:
        pose, hf, hb = sharded(images, cam2ref_poses, model,
                               state.body2camera_pose, state.histogram_f,
                               state.histogram_b)
        return TrackingState(pose, hf, hb)

    return cycle
