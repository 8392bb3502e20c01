"""Fused-backed serve mode for the reference-shaped Tracker.

The object-graph Tracker (tracker.py) mirrors the reference's per-modality serve loop
(tracker.cpp:221-262); the fused pipeline (pipeline.py) owns the fast TPU kernels but —
until this module — was reachable only through bench.py and the dataset evaluators.
:class:`FusedServeBackend` bridges the two: when the tracked object graph is expressible
as a batch of independent rigid bodies on one color (+ optional depth) camera, a single
``tracking_cycle``/``tracking_cycle_rgbd`` call replaces the whole per-modality
``ExecuteTrackingStep`` + ``CalculateResults`` sequence (tracker.cpp:344-364), and the
resulting poses/histograms are written back into the object graph so detectors,
refiners, viewers, and publishers keep operating on live state.

Graphs the backend cannot express (kinematic trees, custom renderers, shared
histograms, modality visualization, texture modalities) fall back to the host path with
a printed notice — behavior, not availability, is the contract.
"""

from __future__ import annotations

import numpy as np


class FusedServeBackend:
    """One fused tracking step per cycle for a set of rigid-body optimizers."""

    def __init__(self, tracker, optimizers, region_modalities, depth_modalities,
                 pcfg, model_arrays, depth_model_arrays, intr, depth_intr,
                 depth_scale, color_camera, depth_camera):
        self.tracker = tracker
        self.optimizers = optimizers
        self.region_modalities = region_modalities
        self.depth_modalities = depth_modalities
        self.pcfg = pcfg
        self.model_arrays = model_arrays
        self.depth_model_arrays = depth_model_arrays
        self.intr = intr
        self.depth_intr = depth_intr
        self.depth_scale = depth_scale
        self.color_camera = color_camera
        self.depth_camera = depth_camera

    # -- expressibility check + construction -------------------------------------------

    @classmethod
    def try_build(cls, tracker):
        """Build a backend for the tracker's CURRENT tracking set, or return a
        (None, reason) pair when the graph is not expressible."""
        from m3t_tpu.depth_modality import DepthModality
        from m3t_tpu.ops.region_fn import RegionConfig  # noqa: F401 (doc anchor)
        from m3t_tpu.region_modality import RegionModality
        from m3t_tpu import pipeline

        optimizers = list(tracker.tracking_optimizer_ptrs)
        if not optimizers:
            return None, "no tracking optimizers"

        region_modalities = []
        depth_modalities = []
        eye = np.eye(4, dtype=np.float32)
        for opt in optimizers:
            if opt.constraint_ptrs or opt.soft_constraint_ptrs:
                return None, f"optimizer {opt.name} has constraints"
            links = opt.ReferencedLinks()
            if len(links) != 1:
                return None, f"optimizer {opt.name} is a kinematic tree"
            link = links[0]
            if not np.allclose(link.body2joint_pose, eye):
                return None, f"link {link.name} has a non-identity body2joint"
            if not all(link.free_directions):
                return None, f"link {link.name} pins directions"
            rms = [m for m in link.modality_ptrs if isinstance(m, RegionModality)]
            dms = [m for m in link.modality_ptrs if isinstance(m, DepthModality)]
            if len(rms) != 1 or len(link.modality_ptrs) != len(rms) + len(dms):
                return None, (f"link {link.name} needs exactly one region "
                              f"modality (+ optional depth modality)")
            if len(dms) > 1:
                return None, f"link {link.name} has several depth modalities"
            for m in rms + dms:
                if m.model_occlusions:
                    return None, f"modality {m.name} models occlusions"
                if any(v for k, v in vars(m).items() if k.startswith("visualize")):
                    return None, f"modality {m.name} visualizes"
            rm = rms[0]
            if rm.use_region_checking:
                return None, f"modality {rm.name} uses region checking"
            if rm.use_shared_color_histograms:
                return None, f"modality {rm.name} shares histograms"
            if dms and dms[0].use_silhouette_checking:
                return None, f"modality {dms[0].name} checks silhouettes"
            region_modalities.append(rm)
            depth_modalities.append(dms[0] if dms else None)

        rm0 = region_modalities[0]
        color_camera = rm0.color_camera_ptr
        for rm in region_modalities:
            if rm.color_camera_ptr is not color_camera:
                return None, "several color cameras"
            if rm._cfg != rm0._cfg or list(rm.scales) != list(rm0.scales) \
                    or list(rm.standard_deviations) != list(rm0.standard_deviations) \
                    or rm.measure_occlusions != rm0.measure_occlusions \
                    or rm.use_adaptive_coverage != rm0.use_adaptive_coverage \
                    or rm.reference_contour_length != rm0.reference_contour_length \
                    or rm.learning_rate_f != rm0.learning_rate_f \
                    or rm.learning_rate_b != rm0.learning_rate_b \
                    or rm.n_unoccluded_iterations != rm0.n_unoccluded_iterations:
                return None, "region modality parameters differ across bodies"

        use_depth = all(m is not None for m in depth_modalities)
        if not use_depth and any(m is not None for m in depth_modalities):
            return None, "depth modality on some bodies only"
        depth_camera = None
        dm0 = None
        if use_depth:
            dm0 = depth_modalities[0]
            depth_camera = dm0.depth_camera_ptr
            for dm in depth_modalities:
                if dm.depth_camera_ptr is not depth_camera:
                    return None, "several depth cameras"
                if dm._cfg != dm0._cfg \
                        or list(dm.considered_distances) != list(dm0.considered_distances) \
                        or list(dm.standard_deviations) != list(dm0.standard_deviations) \
                        or dm.measure_occlusions != dm0.measure_occlusions \
                        or dm.n_unoccluded_iterations != dm0.n_unoccluded_iterations:
                    return None, "depth modality parameters differ across bodies"
        if rm0.measure_occlusions:
            if not use_depth:
                return None, "region measured occlusions need a depth camera"
            if rm0.depth_camera_ptr is not depth_camera:
                return None, "region/depth modalities use different depth cameras"
        if use_depth and dm0.n_unoccluded_iterations != rm0.n_unoccluded_iterations:
            return None, "region/depth n_unoccluded_iterations differ"
        if use_depth and not np.allclose(
                np.asarray(depth_camera.world2camera_pose),
                np.asarray(color_camera.world2camera_pose), atol=1e-7):
            # tracking_cycle_rgbd evaluates depth terms in the color camera's
            # frame; offset depth extrinsics need the host path.
            return None, "depth camera extrinsics differ from color camera"

        opt0 = optimizers[0]
        for opt in optimizers:
            if (opt.tikhonov_parameter_rotation != opt0.tikhonov_parameter_rotation
                    or opt.tikhonov_parameter_translation
                    != opt0.tikhonov_parameter_translation):
                return None, "tikhonov parameters differ across optimizers"

        pcfg = pipeline.PipelineConfig(
            cfg=rm0._cfg, scales=tuple(rm0.scales),
            standard_deviations=tuple(rm0.standard_deviations),
            n_corr_iterations=tracker.n_corr_iterations,
            n_update_iterations=tracker.n_update_iterations,
            tikhonov_rotation=float(opt0.tikhonov_parameter_rotation),
            tikhonov_translation=float(opt0.tikhonov_parameter_translation),
            learning_rate_f=float(rm0.learning_rate_f),
            learning_rate_b=float(rm0.learning_rate_b),
            use_depth=use_depth,
            region_measure_occlusions=bool(rm0.measure_occlusions),
            use_adaptive_coverage=bool(rm0.use_adaptive_coverage),
            reference_contour_length=float(rm0.reference_contour_length))
        if use_depth:
            pcfg = pcfg._replace(
                depth_cfg=dm0._cfg,
                considered_distances=tuple(dm0.considered_distances),
                depth_standard_deviations=tuple(dm0.standard_deviations),
                depth_measure_occlusions=bool(dm0.measure_occlusions))

        from m3t_tpu import pipeline as _p

        model_arrays = _p.RegionModelArrays.from_models(
            [m.region_model_ptr for m in region_modalities],
            rm0._cfg.n_lines_max,
            measured_offset_id=rm0.measured_depth_offset_id,
            modeled_offset_id=rm0.modeled_depth_offset_id)
        depth_model_arrays = None
        depth_intr = None
        depth_scale = None
        if use_depth:
            depth_model_arrays = _p.DepthModelArrays.from_models(
                [m.depth_model_ptr for m in depth_modalities],
                dm0._cfg.n_points_max,
                measured_offset_id=dm0.measured_depth_offset_id,
                modeled_offset_id=dm0.modeled_depth_offset_id)
            di = depth_camera.intrinsics
            depth_intr = (np.float32(di.fu), np.float32(di.fv),
                          np.float32(di.ppu), np.float32(di.ppv))
            depth_scale = float(depth_camera.depth_scale)
        ci = color_camera.intrinsics
        intr = (np.float32(ci.fu), np.float32(ci.fv),
                np.float32(ci.ppu), np.float32(ci.ppv))
        return cls(tracker, optimizers, region_modalities, depth_modalities,
                   pcfg, model_arrays, depth_model_arrays, intr, depth_intr,
                   depth_scale, color_camera, depth_camera), None

    # -- per-cycle execution ------------------------------------------------------------

    def _gather_state(self):
        import jax.numpy as jnp

        from m3t_tpu import pipeline

        w2c = np.asarray(self.color_camera.world2camera_pose, np.float32)
        poses = np.stack([
            w2c @ opt.ReferencedLinks()[0].body_ptr.body2world_pose
            for opt in self.optimizers]).astype(np.float32)
        hist_f = jnp.stack([m.color_histograms_ptr.histogram_f
                            for m in self.region_modalities])
        hist_b = jnp.stack([m.color_histograms_ptr.histogram_b
                            for m in self.region_modalities])
        return pipeline.TrackingState(jnp.asarray(poses), hist_f, hist_b)

    def _scatter_state(self, state):
        c2w = np.asarray(self.color_camera.camera2world_pose, np.float32)
        poses = np.asarray(state.body2camera_pose)
        for i, opt in enumerate(self.optimizers):
            opt.ReferencedLinks()[0].set_link2world_pose(c2w @ poses[i])
        for i, m in enumerate(self.region_modalities):
            m.color_histograms_ptr.histogram_f = state.histogram_f[i]
            m.color_histograms_ptr.histogram_b = state.histogram_b[i]

    def Execute(self, iteration: int) -> bool:  # noqa: N802
        """One fused tracking step == ExecuteTrackingStep + CalculateResults."""
        import jax.numpy as jnp

        from m3t_tpu import pipeline

        b = len(self.optimizers)
        state = self._gather_state()
        image = np.asarray(self.color_camera.image)
        images = jnp.asarray(np.broadcast_to(image, (b,) + image.shape))
        handle_occlusions = jnp.asarray([
            iteration - m.first_iteration >= m.n_unoccluded_iterations
            for m in self.region_modalities])
        if self.pcfg.use_depth:
            depth = np.asarray(self.depth_camera.image)
            depth_images = jnp.asarray(np.broadcast_to(depth, (b,) + depth.shape))
            state = pipeline.tracking_cycle_rgbd(
                self.pcfg, self.intr, self.depth_intr,
                jnp.float32(self.depth_scale), images, depth_images,
                self.model_arrays, self.depth_model_arrays, state,
                handle_occlusions=handle_occlusions)
        else:
            state = pipeline.tracking_cycle(
                self.pcfg, self.intr, images, self.model_arrays, state,
                handle_occlusions=handle_occlusions)
        self._scatter_state(state)
        return True
