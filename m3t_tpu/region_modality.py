"""RegionModality component (redesign of m3t/src/region_modality.cpp, the core tracker).

Wires the fixed-shape kernels in :mod:`m3t_tpu.ops.region_fn` to bodies, cameras, sparse
viewpoint models, histograms, and (optionally) occlusion renderers.  Per-frame state is a
``DataLines`` pytree; gradients/Hessians accumulate on device and are fetched by Link.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from m3t_tpu.modality import Modality
from m3t_tpu.ops import region_fn
from m3t_tpu.ops.region_fn import (
    MeasuredOcclusionInputs,
    ModeledOcclusionInputs,
    RegionCheckInputs,
    RegionConfig,
    ViewPoints,
)
from m3t_tpu.utils import visualization, yaml_io


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "scale", "width", "height", "has_measured", "has_modeled",
                     "has_region_check"),
)
def _correspondences_jit(cfg, scale, width, height, has_measured, has_modeled,
                         has_region_check, points, n_lines, body2camera_pose,
                         color_image, hist_f, hist_b, intrin, handle_occlusions,
                         measured, modeled, region_check, lookup_f, lookup_b):
    fu, fv, ppu, ppv = intrin
    return region_fn.calculate_correspondences(
        cfg, scale, points, n_lines, body2camera_pose, color_image, hist_f, hist_b,
        fu, fv, ppu, ppv, width, height, handle_occlusions,
        measured_occlusion=measured if has_measured else None,
        modeled_occlusion=modeled if has_modeled else None,
        region_check=region_check if has_region_check else None,
        function_lookup_f=lookup_f, function_lookup_b=lookup_b,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "standard_deviation", "global_it"))
def _gradient_hessian_jit(cfg, standard_deviation, global_it, lines, body2camera_pose,
                          intrin):
    fu, fv, ppu, ppv = intrin
    return region_fn.calculate_gradient_and_hessian(
        cfg, lines, body2camera_pose, fu, fv, ppu, ppv, standard_deviation, global_it
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "width", "height", "has_measured", "has_modeled",
                     "has_region_check"),
)
def _add_colors_jit(cfg, width, height, has_measured, has_modeled, has_region_check,
                    points, n_lines, body2camera_pose, color_image, memory_f, memory_b,
                    intrin, handle_occlusions, measured, modeled, region_check):
    fu, fv, ppu, ppv = intrin
    return region_fn.add_line_pixel_colors(
        cfg, points, n_lines, body2camera_pose, color_image, memory_f, memory_b,
        fu, fv, ppu, ppv, width, height, handle_occlusions,
        measured_occlusion=measured if has_measured else None,
        modeled_occlusion=modeled if has_modeled else None,
        region_check=region_check if has_region_check else None,
    )


class RegionModality(Modality):
    def __init__(self, name: str, body_ptr, color_camera_ptr, region_model_ptr,
                 metafile_path: str | None = None):
        super().__init__(name, body_ptr, metafile_path)
        self.color_camera_ptr = color_camera_ptr
        self.region_model_ptr = region_model_ptr

        # Parameters (defaults: region_modality.h:411-443)
        self.n_lines_max = 200
        self.use_adaptive_coverage = False
        self.reference_contour_length = 0.0
        self.min_continuous_distance = 3.0
        self.function_length = 8
        self.distribution_length = 12
        self.function_amplitude = 0.43
        self.function_slope = 0.5
        self.learning_rate = 1.3
        self.n_global_iterations = 1
        self.scales = [6, 4, 2, 1]
        self.standard_deviations = [15.0, 5.0, 3.5, 1.5]

        self.n_histogram_bins = 16
        self.learning_rate_f = 0.2
        self.learning_rate_b = 0.2
        self.unconsidered_line_length = 0.5
        self.max_considered_line_length = 20.0

        self.measured_depth_offset_radius = 0.01
        self.measured_occlusion_radius = 0.01
        self.measured_occlusion_threshold = 0.03
        self.modeled_depth_offset_radius = 0.01
        self.modeled_occlusion_radius = 0.01
        self.modeled_occlusion_threshold = 0.03
        self.n_unoccluded_iterations = 10
        self.min_n_unoccluded_lines = 0

        # Optional references
        self.depth_camera_ptr = None
        self.depth_renderer_ptr = None
        self.silhouette_renderer_ptr = None
        self.color_histograms_ptr = None  # shared histograms if set

        self.measure_occlusions = False
        self.model_occlusions = False
        self.use_region_checking = False
        self.use_shared_color_histograms = False

        # Per-modality visualization flags (region_modality.h:115-139).
        self.visualize_lines_correspondence = False
        self.visualize_points_correspondence = False
        self.visualize_points_histogram_image_correspondence = False
        self.visualize_points_optimization = False
        self.visualize_points_histogram_image_optimization = False
        self.visualize_points_result = False
        self.visualize_points_histogram_image_result = False
        self.visualization_min_depth = 0.0
        self.visualization_max_depth = 1.0

        # Internal state
        self._cfg: RegionConfig | None = None
        self._lookup_f = None
        self._lookup_b = None
        self.data_lines = None
        self.first_iteration = 0
        self._view_index = -1
        self._points: ViewPoints | None = None
        self._n_lines = 0
        self._scale = 1
        self._standard_deviation = 1.5

    # -- configuration -----------------------------------------------------------------

    def MeasureOcclusions(self, depth_camera_ptr) -> None:  # noqa: N802
        self.depth_camera_ptr = depth_camera_ptr
        self.measure_occlusions = True
        self.set_up = False

    def ModelOcclusions(self, depth_renderer_ptr) -> None:  # noqa: N802
        self.depth_renderer_ptr = depth_renderer_ptr
        self.model_occlusions = True
        self.set_up = False

    def UseRegionChecking(self, silhouette_renderer_ptr) -> None:  # noqa: N802
        self.silhouette_renderer_ptr = silhouette_renderer_ptr
        self.use_region_checking = True
        self.set_up = False

    def UseSharedColorHistograms(self, color_histograms_ptr) -> None:  # noqa: N802
        self.color_histograms_ptr = color_histograms_ptr
        self.use_shared_color_histograms = True
        self.set_up = False

    def DoNotUseSharedColorHistograms(self) -> None:  # noqa: N802
        self.color_histograms_ptr = None
        self.use_shared_color_histograms = False
        self.set_up = False

    def _load_metadata(self) -> bool:
        fs = yaml_io.open_yaml_file_storage(self.metafile_path)
        try:
            g = lambda key, cur: yaml_io.read_optional(fs, key, cur)  # noqa: E731
            self.n_lines_max = int(g("n_lines", self.n_lines_max))
            self.use_adaptive_coverage = bool(g("use_adaptive_coverage",
                                                self.use_adaptive_coverage))
            self.reference_contour_length = float(g("reference_contour_length",
                                                    self.reference_contour_length))
            self.min_continuous_distance = float(g("min_continuous_distance",
                                                   self.min_continuous_distance))
            self.function_length = int(g("function_length", self.function_length))
            self.distribution_length = int(g("distribution_length",
                                             self.distribution_length))
            self.function_amplitude = float(g("function_amplitude",
                                              self.function_amplitude))
            self.function_slope = float(g("function_slope", self.function_slope))
            self.learning_rate = float(g("learning_rate", self.learning_rate))
            self.n_global_iterations = int(g("n_global_iterations",
                                             self.n_global_iterations))
            scales = g("scales", None)
            if scales is not None:
                self.scales = [int(s) for s in scales]
            stddevs = g("standard_deviations", None)
            if stddevs is not None:
                self.standard_deviations = [float(s) for s in stddevs]
            self.n_histogram_bins = int(g("n_histogram_bins", self.n_histogram_bins))
            self.learning_rate_f = float(g("learning_rate_f", self.learning_rate_f))
            self.learning_rate_b = float(g("learning_rate_b", self.learning_rate_b))
            self.unconsidered_line_length = float(g("unconsidered_line_length",
                                                    self.unconsidered_line_length))
            self.max_considered_line_length = float(g("max_considered_line_length",
                                                      self.max_considered_line_length))
            self.measured_depth_offset_radius = float(g(
                "measured_depth_offset_radius", self.measured_depth_offset_radius))
            self.measured_occlusion_radius = float(g("measured_occlusion_radius",
                                                     self.measured_occlusion_radius))
            self.measured_occlusion_threshold = float(g(
                "measured_occlusion_threshold", self.measured_occlusion_threshold))
            self.modeled_depth_offset_radius = float(g(
                "modeled_depth_offset_radius", self.modeled_depth_offset_radius))
            self.modeled_occlusion_radius = float(g("modeled_occlusion_radius",
                                                    self.modeled_occlusion_radius))
            self.modeled_occlusion_threshold = float(g(
                "modeled_occlusion_threshold", self.modeled_occlusion_threshold))
            self.n_unoccluded_iterations = int(g("n_unoccluded_iterations",
                                                 self.n_unoccluded_iterations))
            for flag in ("visualize_pose_result", "visualize_gradient_optimization",
                         "visualize_hessian_optimization",
                         "visualize_lines_correspondence",
                         "visualize_points_correspondence",
                         "visualize_points_histogram_image_correspondence",
                         "visualize_points_optimization",
                         "visualize_points_histogram_image_optimization",
                         "visualize_points_result",
                         "visualize_points_histogram_image_result",
                         "display_visualization", "save_visualizations"):
                setattr(self, flag, bool(g(flag, getattr(self, flag))))
            self.visualization_min_depth = float(g(
                "visualization_min_depth", self.visualization_min_depth))
            self.visualization_max_depth = float(g(
                "visualization_max_depth", self.visualization_max_depth))
            self.save_directory = str(g("save_directory", self.save_directory))
            self.min_n_unoccluded_lines = int(g("min_n_unoccluded_lines",
                                                self.min_n_unoccluded_lines))
        finally:
            fs.release()
        return True

    # -- setup -------------------------------------------------------------------------

    def SetUp(self) -> bool:  # noqa: N802
        self.set_up = False
        if self.metafile_path:
            if not self._load_metadata():
                return False
        required = [("body", self.body_ptr), ("color camera", self.color_camera_ptr),
                    ("region model", self.region_model_ptr)]
        if self.measure_occlusions:
            required.append(("depth camera", self.depth_camera_ptr))
        if self.model_occlusions:
            required.append(("depth renderer", self.depth_renderer_ptr))
        if self.use_region_checking:
            required.append(("silhouette renderer", self.silhouette_renderer_ptr))
        if self.use_shared_color_histograms:
            required.append(("color histograms", self.color_histograms_ptr))
        for label, ptr in required:
            if ptr is None or not ptr.set_up:
                print(f"{label} for region modality {self.name} was not set up")
                return False

        if not self.use_shared_color_histograms:
            from m3t_tpu.color_histograms import ColorHistograms

            self.color_histograms_ptr = ColorHistograms(
                f"{self.name}_histograms", self.n_histogram_bins,
                self.learning_rate_f, self.learning_rate_b,
            )
            if not self.color_histograms_ptr.SetUp():
                return False
        else:
            self.n_histogram_bins = self.color_histograms_ptr.n_bins

        # Depth-offset ids (PrecalculateModelVariables, cpp:965-989)
        stride = self.region_model_ptr.stride_depth_offset
        max_radius = self.region_model_ptr.max_radius_depth_offset
        for radius, label in ((self.measured_depth_offset_radius, "measured"),
                              (self.modeled_depth_offset_radius, "modeled")):
            if radius > max_radius:
                print(f"{label} depth offset radius too large: {radius} > {max_radius}")
                return False
        self.measured_depth_offset_id = int(
            self.measured_depth_offset_radius / stride + 0.5)
        self.modeled_depth_offset_id = int(
            self.modeled_depth_offset_radius / stride + 0.5)

        self._cfg = RegionConfig(
            n_lines_max=self.n_lines_max,
            function_length=self.function_length,
            distribution_length=self.distribution_length,
            function_amplitude=self.function_amplitude,
            function_slope=self.function_slope,
            learning_rate=self.learning_rate,
            n_global_iterations=self.n_global_iterations,
            min_continuous_distance=self.min_continuous_distance,
            n_histogram_bins=self.n_histogram_bins,
            unconsidered_line_length=self.unconsidered_line_length,
            max_considered_line_length=self.max_considered_line_length,
            measured_occlusion_radius=self.measured_occlusion_radius,
            measured_occlusion_threshold=self.measured_occlusion_threshold,
            modeled_occlusion_radius=self.modeled_occlusion_radius,
            modeled_occlusion_threshold=self.modeled_occlusion_threshold,
            min_n_unoccluded_lines=self.min_n_unoccluded_lines,
        )
        self._lookup_f, self._lookup_b = self._cfg.function_lookups()

        # Whole-model device arrays for view gathers.
        m = self.region_model_ptr
        self._model_centers = jnp.asarray(m.centers)
        self._model_normals = jnp.asarray(m.normals)
        self._model_fg = jnp.asarray(m.foreground_distances)
        self._model_bg = jnp.asarray(m.background_distances)
        self._model_meas_off = jnp.asarray(
            m.depth_offsets[:, :, self.measured_depth_offset_id])
        self._model_mod_off = jnp.asarray(
            m.depth_offsets[:, :, self.modeled_depth_offset_id])

        self.set_up = True
        return True

    # -- per-frame helpers -------------------------------------------------------------

    def _body2camera_pose(self) -> np.ndarray:
        return self.color_camera_ptr.world2camera_pose @ self.body_ptr.body2world_pose

    def _intrin(self):
        i = self.color_camera_ptr.intrinsics
        return (np.float32(i.fu), np.float32(i.fv), np.float32(i.ppu), np.float32(i.ppv))

    def _fetch_view(self):
        """GetClosestView + adaptive line count (cpp:411-430)."""
        pose = self._body2camera_pose()
        m = self.region_model_ptr
        idx = m.GetClosestViewIndex(pose)
        if self.use_adaptive_coverage:
            contour_length = float(m.contour_lengths[idx])
            if self.reference_contour_length > 0.0:
                ratio = min(1.0, contour_length / self.reference_contour_length)
            else:
                ratio = (contour_length / m.max_contour_length
                         if m.max_contour_length > 0 else 1.0)
            n_lines = int(self.n_lines_max * ratio)
        else:
            n_lines = self.n_lines_max
        n_points_available = m.centers.shape[1]
        if n_lines > n_points_available:
            print(f"Number of model points too small: {n_points_available} < {n_lines}")
            n_lines = n_points_available
        take = min(self.n_lines_max, n_points_available)
        pad = self.n_lines_max - take
        self._view_index = idx

        def grab(arr):
            a = arr[idx, :take]
            if pad:
                a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            return a

        self._points = ViewPoints(
            center_f_body=grab(self._model_centers),
            normal_f_body=grab(self._model_normals),
            foreground_distance=grab(self._model_fg),
            background_distance=grab(self._model_bg),
            measured_depth_offset=grab(self._model_meas_off),
            modeled_depth_offset=grab(self._model_mod_off),
        )
        self._n_lines = n_lines
        return pose

    def _occlusion_inputs(self):
        measured = modeled = region_check = None
        if self.measure_occlusions:
            dc = self.depth_camera_ptr
            di = dc.intrinsics
            measured = MeasuredOcclusionInputs(
                depth_image=jnp.asarray(dc.image),
                body2depth_camera_pose=jnp.asarray(
                    dc.world2camera_pose @ self.body_ptr.body2world_pose),
                fu=jnp.float32(di.fu), fv=jnp.float32(di.fv),
                ppu=jnp.float32(di.ppu), ppv=jnp.float32(di.ppv),
                depth_scale=jnp.float32(dc.depth_scale),
            )
        if self.model_occlusions:
            r = self.depth_renderer_ptr
            visible = r.IsBodyVisible(self.body_ptr.name)
            modeled = ModeledOcclusionInputs(
                focused_depth=r.focused_depth_image(),
                corner_u=jnp.float32(r.corner_u), corner_v=jnp.float32(r.corner_v),
                scale=jnp.float32(r.scale), body_visible=jnp.asarray(visible),
            )
        if self.use_region_checking:
            r = self.silhouette_renderer_ptr
            visible = r.IsBodyVisible(self.body_ptr.name)
            region_check = RegionCheckInputs(
                silhouette=r.focused_silhouette_image(),
                corner_u=jnp.float32(r.corner_u), corner_v=jnp.float32(r.corner_v),
                scale=jnp.float32(r.scale),
                region_id=jnp.int32(self.body_ptr.region_id),
                body_visible=jnp.asarray(visible),
            )
        return measured, modeled, region_check

    def _dummy_inputs(self):
        """Placeholder pytrees for disabled branches (never read: has_* flags gate them)."""
        measured = MeasuredOcclusionInputs(
            depth_image=jnp.zeros((1, 1), jnp.uint16),
            body2depth_camera_pose=jnp.eye(4, dtype=jnp.float32),
            fu=jnp.float32(1), fv=jnp.float32(1), ppu=jnp.float32(0),
            ppv=jnp.float32(0), depth_scale=jnp.float32(1),
        )
        modeled = ModeledOcclusionInputs(
            focused_depth=jnp.zeros((1, 1), jnp.float32), corner_u=jnp.float32(0),
            corner_v=jnp.float32(0), scale=jnp.float32(1),
            body_visible=jnp.asarray(False),
        )
        region_check = RegionCheckInputs(
            silhouette=jnp.zeros((1, 1), jnp.int32), corner_u=jnp.float32(0),
            corner_v=jnp.float32(0), scale=jnp.float32(1), region_id=jnp.int32(0),
            body_visible=jnp.asarray(False),
        )
        return measured, modeled, region_check

    def _iteration_scale(self, corr_iteration: int):
        """LastValidValue over scales/standard_deviations (cpp:1011-1023)."""
        scale = self.scales[min(corr_iteration, len(self.scales) - 1)]
        std = self.standard_deviations[
            min(corr_iteration, len(self.standard_deviations) - 1)]
        return int(scale), float(std)

    # -- protocol ----------------------------------------------------------------------

    def StartModality(self, iteration: int, corr_iteration: int) -> bool:  # noqa: N802
        if not self.set_up:
            print(f"Set up region modality {self.name} first")
            return False
        self.first_iteration = iteration
        handle_occlusions = self.n_unoccluded_iterations == 0
        if not self.use_shared_color_histograms:
            self.color_histograms_ptr.ClearMemory()
        self._add_line_pixel_colors(handle_occlusions)
        if not self.use_shared_color_histograms:
            self.color_histograms_ptr.InitializeHistograms()
        return True

    def _add_line_pixel_colors(self, handle_occlusions: bool) -> None:
        pose = self._fetch_view()
        cam = self.color_camera_ptr
        intr = cam.intrinsics
        measured, modeled, region_check = self._occlusion_inputs()
        dm, dmo, drc = self._dummy_inputs()
        hist = self.color_histograms_ptr
        hist.memory_f, hist.memory_b = _add_colors_jit(
            self._cfg, intr.width, intr.height,
            self.measure_occlusions, self.model_occlusions, self.use_region_checking,
            self._points, jnp.int32(self._n_lines), jnp.asarray(pose),
            jnp.asarray(cam.image), hist.memory_f, hist.memory_b, self._intrin(),
            jnp.asarray(handle_occlusions),
            measured or dm, modeled or dmo, region_check or drc,
        )

    def CalculateCorrespondences(self, iteration: int, corr_iteration: int) -> bool:  # noqa: N802
        if not self.set_up:
            print(f"Set up region modality {self.name} first")
            return False
        self._scale, self._standard_deviation = self._iteration_scale(corr_iteration)
        pose = self._fetch_view()
        cam = self.color_camera_ptr
        intr = cam.intrinsics
        measured, modeled, region_check = self._occlusion_inputs()
        dm, dmo, drc = self._dummy_inputs()
        handle_occlusions = (iteration - self.first_iteration
                             ) >= self.n_unoccluded_iterations
        hist = self.color_histograms_ptr
        self.data_lines = _correspondences_jit(
            self._cfg, self._scale, intr.width, intr.height,
            self.measure_occlusions, self.model_occlusions, self.use_region_checking,
            self._points, jnp.int32(self._n_lines), jnp.asarray(pose),
            jnp.asarray(cam.image), hist.histogram_f, hist.histogram_b, self._intrin(),
            jnp.asarray(handle_occlusions),
            measured or dm, modeled or dmo, region_check or drc,
            self._lookup_f, self._lookup_b,
        )
        return True

    def CalculateGradientAndHessian(self, iteration: int, corr_iteration: int,
                                    opt_iteration: int) -> bool:  # noqa: N802
        if not self.set_up:
            print(f"Set up region modality {self.name} first")
            return False
        pose = self._body2camera_pose()
        global_it = opt_iteration < self.n_global_iterations
        self.gradient, self.hessian = _gradient_hessian_jit(
            self._cfg, self._standard_deviation, global_it, self.data_lines,
            jnp.asarray(pose), self._intrin(),
        )
        return True

    def CalculateResults(self, iteration: int) -> bool:  # noqa: N802
        if not self.set_up:
            print(f"Set up region modality {self.name} first")
            return False
        if not self.use_shared_color_histograms:
            self.color_histograms_ptr.ClearMemory()
        handle_occlusions = (iteration - self.first_iteration
                             ) >= self.n_unoccluded_iterations
        self._add_line_pixel_colors(handle_occlusions)
        if not self.use_shared_color_histograms:
            self.color_histograms_ptr.UpdateHistograms()
        return True

    # -- visualization (region_modality.cpp:467-481, 560-571, 585-596) -----------------

    def _valid_centers_f_camera(self) -> np.ndarray:
        pose = self._body2camera_pose()
        centers = np.asarray(self.data_lines.center_f_body)
        valid = np.asarray(self.data_lines.valid)
        return centers[valid] @ pose[:3, :3].T + pose[:3, 3]

    def _show(self, title: str, save_idx: int, image) -> None:
        visualization.show_and_save_image(
            f"{self.name}_{title}", save_idx, image, self.display_visualization,
            self.save_visualizations, self.save_directory, self.save_image_type)

    def _probability_image(self) -> np.ndarray:
        hist = self.color_histograms_ptr
        return visualization.probability_image(
            np.asarray(self.color_camera_ptr.image), hist.histogram_f,
            hist.histogram_b, self.n_histogram_bins)

    def _points_image(self, base: np.ndarray) -> np.ndarray:
        intr = self.color_camera_ptr.intrinsics
        image = base.copy()
        visualization.draw_points(image, self._valid_centers_f_camera(),
                                  intr.fu, intr.fv, intr.ppu, intr.ppv)
        return image

    def VisualizeCorrespondences(self, save_idx: int) -> bool:  # noqa: N802
        if not self.set_up:
            return False
        if not (self.display_visualization or self.save_visualizations):
            return True
        if self.data_lines is None:
            return True
        if self.visualize_lines_correspondence:
            image = self._probability_image()
            dl = self.data_lines
            valid = np.asarray(dl.valid)
            visualization.draw_correspondence_lines(
                image, np.asarray(dl.center_u), np.asarray(dl.center_v),
                np.asarray(dl.normal_u), np.asarray(dl.normal_v),
                np.asarray(dl.distribution), valid, self._scale,
                self.distribution_length)
            self._show("lines_correspondence", save_idx, image)
        if self.visualize_points_correspondence:
            self._show("color_image_correspondence", save_idx,
                       self._points_image(np.asarray(self.color_camera_ptr.image)))
        if self.visualize_points_histogram_image_correspondence:
            self._show("histogram_image_correspondence", save_idx,
                       self._points_image(self._probability_image()))
        return True

    def VisualizeOptimization(self, save_idx: int) -> bool:  # noqa: N802
        if not self.set_up:
            return False
        if self.visualize_gradient_optimization:
            print(f"gradient {self.name}:\n{np.asarray(self.gradient)}")
        if self.visualize_hessian_optimization:
            print(f"hessian {self.name}:\n{np.asarray(self.hessian)}")
        if not (self.display_visualization or self.save_visualizations):
            return True
        if self.data_lines is None:
            return True
        if self.visualize_points_optimization:
            self._show("color_image_optimization", save_idx,
                       self._points_image(np.asarray(self.color_camera_ptr.image)))
        if self.visualize_points_histogram_image_optimization:
            self._show("histogram_image_optimization", save_idx,
                       self._points_image(self._probability_image()))
        return True

    def VisualizeResults(self, save_idx: int) -> bool:  # noqa: N802
        if not self.set_up:
            return False
        if self.visualize_pose_result:
            print(f"body2world_pose {self.name}:\n{self.body_ptr.body2world_pose}")
        if not (self.display_visualization or self.save_visualizations):
            return True
        if self.data_lines is None:
            return True
        if self.visualize_points_result:
            self._show("color_image_result", save_idx,
                       self._points_image(np.asarray(self.color_camera_ptr.image)))
        if self.visualize_points_histogram_image_result:
            self._show("histogram_image_result", save_idx,
                       self._points_image(self._probability_image()))
        return True

    # -- referenced objects (region_modality.cpp:618-646) ------------------------------

    def camera_ptrs(self) -> list:
        out = [self.color_camera_ptr]
        if self.measure_occlusions and self.depth_camera_ptr:
            out.append(self.depth_camera_ptr)
        return out

    def model_ptr(self):
        return self.region_model_ptr

    def _renderers(self) -> list:
        out = []
        if self.model_occlusions and self.depth_renderer_ptr:
            out.append(self.depth_renderer_ptr)
        if self.use_region_checking and self.silhouette_renderer_ptr:
            out.append(self.silhouette_renderer_ptr)
        return out

    def start_modality_renderer_ptrs(self) -> list:
        return self._renderers()

    def correspondence_renderer_ptrs(self) -> list:
        return self._renderers()

    def results_renderer_ptrs(self) -> list:
        return self._renderers()

    def color_histograms_ptr_shared(self):
        if self.use_shared_color_histograms and self.color_histograms_ptr:
            return self.color_histograms_ptr
        return None
