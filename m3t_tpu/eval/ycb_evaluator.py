"""YCB-Video dataset evaluator (redesign of M3T/examples/ycb_evaluator.{h,cpp}).

RGB-D region+depth(+texture) tracking over YCB-Video sequences 48-59 with ADD / ADD-S
AUC metrics (threshold curve 0-0.1 m, ADD-S via KD-tree nearest vertex,
ycb_evaluator.h:46,65-68) evaluated on keyframes; initial poses come from an external
detector (cosypose/posecnn folders, evaluate_ycb_dataset.cpp:118).

Expected layout:
  <dataset>/data/<seq:04d>/<frame:06d>-color.png, -depth.png
  <dataset>/image_sets/keyframe.txt              lines "<seq:04d>/<frame:06d>"
  <dataset>/models/<body>/textured.obj
  <external>/poses/<detector>/<seq>_<body>.txt   lines "qw qx qy qz tx ty tz" per keyframe
  <external>/poses/gt/<seq>_<body>.txt           same format, ground truth
"""

from __future__ import annotations

import os
import time

import numpy as np
from scipy.spatial import cKDTree

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
from m3t_tpu.renderer import FocusedSilhouetteRenderer, IDType
from m3t_tpu.renderer_geometry import RendererGeometry
from m3t_tpu.texture_modality import TextureModality
from m3t_tpu.tracker import Tracker

YCB_INTRINSICS = Intrinsics(1066.778, 1067.487, 312.9869, 241.3109, 640, 480)
N_CURVE_VALUES = 100
THRESHOLD_MAX = 0.1


def read_quaternion_poses(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Lines of "qw qx qy qz tx ty tz"; returns (poses (N,4,4), valid (N,))."""
    from scipy.spatial.transform import Rotation

    poses = []
    valid = []
    with open(path, "r") as f:
        for line in f:
            values = [float(v) for v in line.split()]
            if len(values) < 7 or not np.isfinite(values).all():
                poses.append(np.eye(4, dtype=np.float32))
                valid.append(False)
                continue
            qw, qx, qy, qz, tx, ty, tz = values[:7]
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = Rotation.from_quat([qx, qy, qz, qw]).as_matrix()
            pose[:3, 3] = [tx, ty, tz]
            poses.append(pose)
            valid.append(True)
    return np.asarray(poses, np.float32), np.asarray(valid, bool)


class YCBEvaluator:
    def __init__(self, name: str, dataset_directory: str, external_directory: str,
                 sequence_ids: list[int], sequence2body_names: dict[int, list[str]],
                 detector_folder: str = "cosypose"):
        self.name = name
        self.dataset_directory = str(dataset_directory)
        self.external_directory = str(external_directory)
        self.sequence_ids = list(sequence_ids)
        self.sequence2body_names = dict(sequence2body_names)
        self.detector_folder = detector_folder
        self.use_region_modality = True
        self.use_depth_modality = True
        self.use_texture_modality = False
        self.use_matlab_gt_poses = False
        self.run_sequentially = True
        self.depth_scale = 0.0001  # YCB-Video factor_depth = 10000
        self.intrinsics = YCB_INTRINSICS
        # Setter hooks (evaluate_ycb_dataset.cpp:46-117)
        self.tracker_setter = lambda t: None
        self.region_modality_setter = lambda m: None
        self.region_model_setter = lambda m: None
        self.depth_modality_setter = lambda m: None
        self.depth_model_setter = lambda m: None
        self.texture_modality_setter = lambda m: None
        self.results: dict = {}
        self.set_up = False

    def SetUp(self) -> bool:  # noqa: N802
        self.keyframes: dict[int, list[int]] = {s: [] for s in self.sequence_ids}
        keyframe_path = os.path.join(self.dataset_directory, "image_sets",
                                     "keyframe.txt")
        if os.path.exists(keyframe_path):
            with open(keyframe_path, "r") as f:
                for line in f:
                    seq_s, frame_s = line.strip().split("/")
                    seq = int(seq_s)
                    if seq in self.keyframes:
                        self.keyframes[seq].append(int(frame_s))
        self.set_up = True
        return True

    # -- object construction -----------------------------------------------------------

    def _make_body(self, body_name: str) -> Body:
        body = Body(
            body_name,
            geometry_path=os.path.join(self.dataset_directory, "models", body_name,
                                       "textured.obj"),
            geometry_unit_in_meter=1.0, geometry_counterclockwise=True,
            geometry_enable_culling=True)
        if not body.SetUp():
            raise RuntimeError(f"Could not set up body {body_name}")
        return body

    def _make_models(self, body: Body):
        region_model = RegionModel(
            f"{body.name}_region_model", body,
            os.path.join(self.external_directory, "models",
                         f"{body.name}_region_model.npz"))
        self.region_model_setter(region_model)
        if not region_model.SetUp():
            raise RuntimeError(f"region model for {body.name} failed")
        depth_model = None
        if self.use_depth_modality:
            depth_model = DepthModel(
                f"{body.name}_depth_model", body,
                os.path.join(self.external_directory, "models",
                             f"{body.name}_depth_model.npz"))
            self.depth_model_setter(depth_model)
            if not depth_model.SetUp():
                raise RuntimeError(f"depth model for {body.name} failed")
        return region_model, depth_model

    def _setup_tracker(self, sequence_id: int, bodies: dict, models: dict):
        sequence_dir = os.path.join(self.dataset_directory, "data",
                                    f"{sequence_id:04d}")
        color_camera = LoaderColorCamera(
            "color_camera", load_directory=sequence_dir, intrinsics=self.intrinsics,
            image_name_pre="", load_index=1, n_leading_zeros=6,
            image_name_post="-color", load_image_type="png")
        if not color_camera.SetUp():
            raise RuntimeError("color camera failed")
        depth_camera = None
        if self.use_depth_modality:
            depth_camera = LoaderDepthCamera(
                "depth_camera", load_directory=sequence_dir,
                intrinsics=self.intrinsics, depth_scale=self.depth_scale,
                image_name_pre="", load_index=1, n_leading_zeros=6,
                image_name_post="-depth", load_image_type="png")
            if not depth_camera.SetUp():
                raise RuntimeError("depth camera failed")

        rg = RendererGeometry("renderer_geometry")
        for body in bodies.values():
            rg.AddBody(body)

        tracker = Tracker("tracker", synchronize_cameras=False)
        optimizers = {}
        for body_name, body in bodies.items():
            region_model, depth_model = models[body_name]
            link = Link(f"{body_name}_link", body)
            silhouette_renderer = None
            if self.use_texture_modality:
                silhouette_renderer = FocusedSilhouetteRenderer(
                    f"{body_name}_silhouette_renderer", rg, color_camera,
                    id_type=IDType.BODY)
                silhouette_renderer.AddReferencedBody(body)
            if self.use_region_modality:
                modality = RegionModality(f"{body_name}_region_modality", body,
                                          color_camera, region_model)
                self.region_modality_setter(modality)
                if depth_camera is not None:
                    modality.MeasureOcclusions(depth_camera)
                link.AddModality(modality)
            if self.use_depth_modality and depth_camera is not None:
                modality = DepthModality(f"{body_name}_depth_modality", body,
                                         depth_camera, depth_model)
                self.depth_modality_setter(modality)
                modality.MeasureOcclusions()
                link.AddModality(modality)
            if self.use_texture_modality:
                modality = TextureModality(f"{body_name}_texture_modality", body,
                                           color_camera, silhouette_renderer)
                self.texture_modality_setter(modality)
                link.AddModality(modality)
            optimizer = Optimizer(f"{body_name}_optimizer", link)
            detector = StaticDetector(f"{body_name}_detector", optimizer)
            tracker.AddOptimizer(optimizer)
            tracker.AddDetector(detector)
            optimizers[body_name] = (optimizer, detector)
        self.tracker_setter(tracker)
        if not tracker.SetUp():
            raise RuntimeError("tracker failed")
        return tracker, optimizers, color_camera, depth_camera

    # -- evaluation --------------------------------------------------------------------

    def Evaluate(self) -> dict:  # noqa: N802
        if not self.set_up:
            self.SetUp()
        all_results = {}
        for sequence_id in self.sequence_ids:
            body_names = self.sequence2body_names[sequence_id]
            bodies = {n: self._make_body(n) for n in body_names}
            models = {n: self._make_models(b) for n, b in bodies.items()}
            seq_results = self._evaluate_sequence(sequence_id, bodies, models)
            all_results[sequence_id] = seq_results
            for body_name, r in seq_results.items():
                print(f"seq {sequence_id} {body_name}: "
                      f"ADD AUC = {r['add_auc']:.4f}, ADD-S AUC = {r['adds_auc']:.4f}")
        flat = [r for seq in all_results.values() for r in seq.values()]
        self.results = {
            "per_sequence": all_results,
            "add_auc": float(np.mean([r["add_auc"] for r in flat])) if flat else 0.0,
            "adds_auc": float(np.mean([r["adds_auc"] for r in flat])) if flat else 0.0,
        }
        print(f"YCB average: ADD AUC = {self.results['add_auc']:.4f}, "
              f"ADD-S AUC = {self.results['adds_auc']:.4f}")
        return self.results

    def _load_poses(self, folder: str, sequence_id: int, body_name: str):
        path = os.path.join(self.external_directory, "poses", folder,
                            f"{sequence_id:04d}_{body_name}.txt")
        return read_quaternion_poses(path)

    def _evaluate_sequence(self, sequence_id: int, bodies: dict, models: dict) -> dict:
        tracker, optimizers, color_camera, depth_camera = self._setup_tracker(
            sequence_id, bodies, models)
        keyframes = self.keyframes.get(sequence_id) or []
        gt_poses = {}
        detector_poses = {}
        for body_name in bodies:
            gt_poses[body_name] = self._load_poses("gt", sequence_id, body_name)
            detector_poses[body_name] = self._load_poses(
                self.detector_folder, sequence_id, body_name)

        # Initialize from detector poses at the first keyframe.
        for body_name, (optimizer, detector) in optimizers.items():
            poses, valid = detector_poses[body_name]
            if len(poses) and valid[0]:
                detector.link2world_pose = poses[0]
                detector.DetectPoses({optimizer.name}, set())
        tracker.names_tracking = set(tracker.names_all)
        tracker._assemble_internally_used_object_ptrs()

        vertices = {}
        kdtrees = {}
        for body_name, body in bodies.items():
            v = metrics.reduce_vertices(
                body.vertices @ body.geometry2body_pose[:3, :3].T
                + body.geometry2body_pose[:3, 3])
            vertices[body_name] = v
            kdtrees[body_name] = cKDTree(v)

        results = {n: {"add_aucs": [], "adds_aucs": [],
                       "add_curve": np.zeros(N_CURVE_VALUES),
                       "adds_curve": np.zeros(N_CURVE_VALUES),
                       "cycle_times": []} for n in bodies}
        started = False
        frame = 0
        keyframe_idx = 0
        while keyframe_idx < len(keyframes):
            if not tracker.UpdateCameras(frame):
                break
            if not started:
                tracker.StartModalities(frame)
                started = True
            begin = time.perf_counter()
            tracker.ExecuteTrackingStep(frame)
            elapsed = time.perf_counter() - begin

            current_frame_number = color_camera.load_index - 1
            if (keyframe_idx < len(keyframes)
                    and current_frame_number == keyframes[keyframe_idx]):
                for body_name, body in bodies.items():
                    poses_gt, valid = gt_poses[body_name]
                    if keyframe_idx >= len(poses_gt) or not valid[keyframe_idx]:
                        continue
                    pose_gt = poses_gt[keyframe_idx]
                    add = metrics.add_error(vertices[body_name],
                                            body.body2world_pose, pose_gt)
                    adds = metrics.adds_error(vertices[body_name],
                                              body.body2world_pose, pose_gt,
                                              kdtrees[body_name])
                    r = results[body_name]
                    r["add_aucs"].append(metrics.auc_from_error(add, THRESHOLD_MAX))
                    r["adds_aucs"].append(metrics.auc_from_error(adds, THRESHOLD_MAX))
                    r["add_curve"] += metrics.error_curve(add, THRESHOLD_MAX,
                                                          N_CURVE_VALUES)
                    r["adds_curve"] += metrics.error_curve(adds, THRESHOLD_MAX,
                                                           N_CURVE_VALUES)
                    r["cycle_times"].append(elapsed)
                keyframe_idx += 1
            frame += 1

        out = {}
        for body_name, r in results.items():
            n = max(len(r["add_aucs"]), 1)
            out[body_name] = {
                "add_auc": float(np.mean(r["add_aucs"])) if r["add_aucs"] else 0.0,
                "adds_auc": float(np.mean(r["adds_aucs"])) if r["adds_aucs"] else 0.0,
                "add_curve": (r["add_curve"] / n).tolist(),
                "adds_curve": (r["adds_curve"] / n).tolist(),
                "mean_cycle_time_s": float(np.mean(r["cycle_times"]))
                if r["cycle_times"] else 0.0,
                "n_keyframes": len(r["add_aucs"]),
            }
        return out
