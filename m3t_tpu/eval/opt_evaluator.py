"""OPT dataset evaluator (redesign of M3T/examples/opt_evaluator.{h,cpp}).

RGB-D tracking on the OPT benchmark; the metric is the AUC of the tracking-success vs
error-threshold curve, with thresholds scaled by the body diameter
(opt_evaluator.cpp:462-484; AUC definition opt_evaluator.h:80,150).

Expected layout:
  <dataset>/3D/<sequence>/color/<index:04d>.png, depth/<index:04d>.png
  <dataset>/Model3D/<body>/<body>.obj
  <dataset>/3D/<sequence>/<body>.txt   per-frame rows "r11 ... r33 tx ty tz"
"""

from __future__ import annotations

import os
import time

import numpy as np

from m3t_tpu.body import Body
from m3t_tpu.camera import LoaderColorCamera, LoaderDepthCamera
from m3t_tpu.common import Intrinsics
from m3t_tpu.depth_modality import DepthModality
from m3t_tpu.depth_model import DepthModel
from m3t_tpu.detector import StaticDetector
from m3t_tpu.eval import metrics
from m3t_tpu.link import Link
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.renderer_geometry import RendererGeometry
from m3t_tpu.tracker import Tracker

OPT_INTRINSICS = Intrinsics(1060.197, 1060.273, 964.809, 560.952, 1920, 1080)
N_CURVE_VALUES = 100
THRESHOLD_MAX = 0.2


def read_matrix_poses(path: str) -> np.ndarray:
    """Rows of 9 rotation + 3 translation values."""
    rows = np.loadtxt(path, dtype=np.float64).reshape(-1, 12)
    poses = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
    poses[:, :3, :3] = rows[:, :9].reshape(-1, 3, 3).astype(np.float32)
    poses[:, :3, 3] = rows[:, 9:12].astype(np.float32)
    return poses


class OPTEvaluator:
    def __init__(self, name: str, dataset_directory: str, external_directory: str,
                 body_names: list[str], sequence_names: list[str]):
        self.name = name
        self.dataset_directory = str(dataset_directory)
        self.external_directory = str(external_directory)
        self.body_names = list(body_names)
        self.sequence_names = list(sequence_names)
        self.use_region_modality = True
        self.use_depth_modality = True
        self.intrinsics = OPT_INTRINSICS
        self.tracker_setter = lambda t: None
        self.region_modality_setter = lambda m: None
        self.region_model_setter = lambda m: None
        self.depth_modality_setter = lambda m: None
        self.depth_model_setter = lambda m: None
        self.results: dict = {}

    def _make_body(self, body_name: str) -> Body:
        body = Body(
            body_name,
            geometry_path=os.path.join(self.dataset_directory, "Model3D", body_name,
                                       f"{body_name}.obj"),
            geometry_unit_in_meter=1.0, geometry_counterclockwise=True,
            geometry_enable_culling=True)
        if not body.SetUp():
            raise RuntimeError(f"Could not set up body {body_name}")
        return body

    def Evaluate(self) -> dict:  # noqa: N802
        all_results = {}
        for body_name in self.body_names:
            body = self._make_body(body_name)
            diameter = body.maximum_body_diameter
            vertices = metrics.reduce_vertices(body.triangle_vertices_f_body()
                                               .reshape(-1, 3))
            region_model = RegionModel(
                f"{body_name}_region_model", body,
                os.path.join(self.external_directory, f"{body_name}_region_model.npz"))
            self.region_model_setter(region_model)
            region_model.SetUp()
            depth_model = None
            if self.use_depth_modality:
                depth_model = DepthModel(
                    f"{body_name}_depth_model", body,
                    os.path.join(self.external_directory,
                                 f"{body_name}_depth_model.npz"))
                self.depth_model_setter(depth_model)
                depth_model.SetUp()

            for sequence_name in self.sequence_names:
                result = self._evaluate_sequence(
                    sequence_name, body, vertices, diameter, region_model, depth_model)
                all_results[(sequence_name, body_name)] = result
                print(f"{sequence_name} {body_name}: AUC = {result['auc']:.4f}")
        auc = float(np.mean([r["auc"] for r in all_results.values()])) \
            if all_results else 0.0
        self.results = {"per_run": all_results, "auc": auc}
        print(f"OPT average AUC: {auc:.4f}")
        return self.results

    def _evaluate_sequence(self, sequence_name, body, vertices, diameter,
                           region_model, depth_model) -> dict:
        sequence_dir = os.path.join(self.dataset_directory, "3D", sequence_name)
        color_camera = LoaderColorCamera(
            "color_camera", load_directory=os.path.join(sequence_dir, "color"),
            intrinsics=self.intrinsics, load_index=1, n_leading_zeros=4)
        color_camera.SetUp()
        depth_camera = None
        if self.use_depth_modality:
            depth_camera = LoaderDepthCamera(
                "depth_camera", load_directory=os.path.join(sequence_dir, "depth"),
                intrinsics=self.intrinsics, depth_scale=0.001,
                load_index=1, n_leading_zeros=4)
            depth_camera.SetUp()

        gt_poses = read_matrix_poses(
            os.path.join(sequence_dir, f"{body.name}.txt"))

        rg = RendererGeometry("rg")
        rg.AddBody(body)
        link = Link(f"{body.name}_link", body)
        if self.use_region_modality:
            modality = RegionModality(f"{body.name}_region_modality", body,
                                      color_camera, region_model)
            self.region_modality_setter(modality)
            link.AddModality(modality)
        if self.use_depth_modality and depth_camera is not None:
            modality = DepthModality(f"{body.name}_depth_modality", body,
                                     depth_camera, depth_model)
            self.depth_modality_setter(modality)
            link.AddModality(modality)
        optimizer = Optimizer(f"{body.name}_optimizer", link)
        detector = StaticDetector(f"{body.name}_detector", optimizer,
                                  link2world_pose=gt_poses[0])
        tracker = Tracker("tracker", synchronize_cameras=False)
        self.tracker_setter(tracker)
        tracker.AddOptimizer(optimizer)
        tracker.AddDetector(detector)
        if not tracker.SetUp():
            raise RuntimeError("tracker failed")

        curve = np.zeros(N_CURVE_VALUES)
        n_frames = 0
        cycle_times = []
        tracker.names_detecting = set(tracker.names_all)
        tracker.names_starting = set(tracker.names_all)
        tracker._validate_names()
        tracker._assemble_internally_used_object_ptrs()
        for i in range(len(gt_poses) - 1):
            if not tracker.UpdateCameras(i):
                break
            tracker.CalculateConsistentPoses()
            tracker.ExecuteDetectingStep(i)
            tracker.ExecuteStartingStep(i)
            begin = time.perf_counter()
            tracker.ExecuteTrackingStep(i)
            cycle_times.append(time.perf_counter() - begin)
            error = metrics.add_error(vertices, body.body2world_pose, gt_poses[i + 1])
            curve += metrics.opt_curve(error, diameter, N_CURVE_VALUES, THRESHOLD_MAX)
            n_frames += 1
        curve = curve / max(n_frames, 1)
        return {
            "auc": float(np.mean(curve)),
            "curve": curve.tolist(),
            "mean_cycle_time_s": float(np.mean(cycle_times)) if cycle_times else 0.0,
            "n_frames": n_frames,
        }
