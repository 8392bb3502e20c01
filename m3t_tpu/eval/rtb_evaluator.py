"""RTB dataset evaluator (redesign of M3T/examples/rtb_evaluator.{h,cpp}).

Multi-body kinematic structures (6 robots x 3 difficulty levels x 4 depth qualities x
10 sequences x 150 frames, Mb-ICG/readme.md:60-66) tracked with region+depth modalities;
metric = per-body ADD / ADD-S AUC like YCB (rtb_evaluator.h:67-75).  Kinematic structures
come from generator YAML configs in the dataset; the four evaluation modes mirror the
reference (independent bodies / projected kinematics / constrained / combined).

Expected layout (rtb_evaluator.cpp:713-736):
  <dataset>/<object>/model/tracker_config/<mode>.yaml   generator config
  <dataset>/<object>/<difficulty>/<seq:03d>/rgb/        color frames
  <dataset>/<object>/<difficulty>/<seq:03d>/<depth>/    depth frames
  <dataset>/<object>/<difficulty>/<seq:03d>/poses_gt/<body>.txt  rows 9 rot + 3 trans
"""

from __future__ import annotations

import enum
import os
import time

import numpy as np
from scipy.spatial import cKDTree

from m3t_tpu.eval import metrics

RTB_INTRINSICS = dict(fu=1000.0, fv=1000.0, ppu=640.0, ppv=480.0,
                      width=1280, height=960)
N_CURVE_VALUES = 100
THRESHOLD_MAX = 0.1
OBJECT2SIZE_MULTIPLIER = {
    "gripper": 1.0, "medical_pliers": 1.0, "medical_robot": 3.0,
    "picker_robot": 1.0, "robot_fingers": 1.0, "robot_wrist": 1.0,
}


class EvaluationMode(enum.Enum):
    INDEPENDENT = 0
    PROJECTED = 1
    CONSTRAINED = 2
    COMBINED = 3


class RTBEvaluator:
    def __init__(self, name: str, dataset_directory: str, external_directory: str,
                 object_names: list[str], difficulty_levels: list[str],
                 depth_names: list[str], sequence_numbers: list[int]):
        self.name = name
        self.dataset_directory = str(dataset_directory)
        self.external_directory = str(external_directory)
        self.object_names = list(object_names)
        self.difficulty_levels = list(difficulty_levels)
        self.depth_names = list(depth_names)
        self.sequence_numbers = list(sequence_numbers)
        self.evaluation_mode = EvaluationMode.COMBINED
        self.use_region_modality = True
        self.use_depth_modality = True
        self.tracker_setter = lambda t: None
        self.results: dict = {}

    def Evaluate(self) -> dict:  # noqa: N802
        from m3t_tpu.generator import GenerateConfiguredTracker

        all_results = {}
        for object_name in self.object_names:
            config_path = os.path.join(
                self.dataset_directory, object_name, "model", "tracker_config",
                f"{self.evaluation_mode.name.lower()}.yaml")
            for difficulty in self.difficulty_levels:
                for depth_name in self.depth_names:
                    for seq in self.sequence_numbers:
                        key = (object_name, difficulty, depth_name, seq)
                        result = self._evaluate_sequence(
                            GenerateConfiguredTracker(config_path),
                            object_name, difficulty, depth_name, seq)
                        all_results[key] = result
                        print(f"{object_name}/{difficulty}/{depth_name}/{seq:03d}: "
                              f"ADD AUC = {result['add_auc']:.4f}")
        flat = list(all_results.values())
        self.results = {
            "per_run": all_results,
            "add_auc": float(np.mean([r["add_auc"] for r in flat])) if flat else 0.0,
            "adds_auc": float(np.mean([r["adds_auc"] for r in flat])) if flat else 0.0,
        }
        return self.results

    def _evaluate_sequence(self, tracker, object_name, difficulty, depth_name,
                           seq) -> dict:
        sequence_base = os.path.join(self.dataset_directory, object_name,
                                     difficulty, f"{seq:03d}")
        color_dir = os.path.join(sequence_base, "rgb")
        depth_dir = os.path.join(sequence_base, depth_name)
        gt_dir = os.path.join(sequence_base, "poses_gt")
        # SetRunConfiguration (rtb_evaluator.cpp:713-740): consume each loader
        # camera's metafile once, then redirect it into the run's directories
        # (SetUp would otherwise re-read load_directory from the metafile).
        from m3t_tpu.camera import LoaderDepthCamera

        tracker._assemble_derived_object_ptrs()  # populate camera_ptrs pre-SetUp
        self.tracker_setter(tracker)
        for camera in tracker.camera_ptrs:
            if not hasattr(camera, "load_directory"):
                continue
            if camera.metafile_path:
                camera._load_loader_metadata(
                    require_depth_scale=isinstance(camera, LoaderDepthCamera))
                camera.metafile_path = None
            camera.load_directory = (depth_dir
                                     if isinstance(camera, LoaderDepthCamera)
                                     else color_dir)
            camera.load_index = 0
        if not tracker.SetUp():
            raise RuntimeError("tracker failed to set up")

        bodies = {b.name: b for b in tracker.body_ptrs}
        gt_poses = {}
        vertices = {}
        kdtrees = {}
        multiplier = OBJECT2SIZE_MULTIPLIER.get(object_name, 1.0)
        for body_name, body in bodies.items():
            path = os.path.join(gt_dir, f"{body_name}.txt")
            if not os.path.exists(path):
                continue
            rows = np.loadtxt(path, dtype=np.float64).reshape(-1, 12)
            poses = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
            poses[:, :3, :3] = rows[:, :9].reshape(-1, 3, 3)
            poses[:, :3, 3] = rows[:, 9:12]
            gt_poses[body_name] = poses
            v = metrics.reduce_vertices(body.triangle_vertices_f_body().reshape(-1, 3))
            vertices[body_name] = v
            kdtrees[body_name] = cKDTree(v)

        # Initialize structures from GT at frame 0 through the configured detectors.
        for detector in tracker.detector_ptrs:
            root_body = detector.optimizer_ptr.root_link_ptr.body_ptr
            if root_body is not None and root_body.name in gt_poses:
                detector.link2world_pose = gt_poses[root_body.name][0]

        tracker.names_detecting = set(tracker.names_all)
        tracker.names_starting = set(tracker.names_all)
        tracker._validate_names()
        tracker._assemble_internally_used_object_ptrs()

        add_aucs = []
        adds_aucs = []
        cycle_times = []
        n_frames = min(len(p) for p in gt_poses.values()) if gt_poses else 0
        for i in range(max(n_frames - 1, 0)):
            if not tracker.UpdateCameras(i):
                break
            tracker.CalculateConsistentPoses()
            tracker.ExecuteDetectingStep(i)
            tracker.ExecuteStartingStep(i)
            begin = time.perf_counter()
            tracker.ExecuteTrackingStep(i)
            cycle_times.append(time.perf_counter() - begin)
            frame_add = []
            frame_adds = []
            threshold = THRESHOLD_MAX * multiplier
            for body_name, poses in gt_poses.items():
                body = bodies[body_name]
                add = metrics.add_error(vertices[body_name], body.body2world_pose,
                                        poses[i + 1])
                adds = metrics.adds_error(vertices[body_name], body.body2world_pose,
                                          poses[i + 1], kdtrees[body_name])
                frame_add.append(metrics.auc_from_error(add, threshold))
                frame_adds.append(metrics.auc_from_error(adds, threshold))
            if frame_add:
                add_aucs.append(float(np.mean(frame_add)))
                adds_aucs.append(float(np.mean(frame_adds)))

        return {
            "add_auc": float(np.mean(add_aucs)) if add_aucs else 0.0,
            "adds_auc": float(np.mean(adds_aucs)) if adds_aucs else 0.0,
            "mean_cycle_time_s": float(np.mean(cycle_times)) if cycle_times else 0.0,
            "n_frames": len(add_aucs),
        }
