"""Generator test: YAML config path builds an equivalent tracker that tracks.

Mirrors TrackerTest::OptimizePoseMatrixGeneratorSetUp (test/tracker_test.cpp:181-195):
the config path must be equivalent to the code path.
"""

import os

import cv2
import numpy as np
import pytest

from m3t_tpu.generator import GenerateConfiguredTracker
from m3t_tpu.utils.obj_loader import save_obj
from tests import fixtures


def _write_yaml(path, text):
    with open(path, "w") as f:
        f.write(text)


@pytest.mark.slow
def test_generated_tracker_tracks(tmp_path):
    # --- data on disk: mesh, image sequence, metafiles, config -----------------------
    body = fixtures.sphere_body("gen_sphere", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(160, 120)
    poses = []
    for i in range(4):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.002 * i
        pose[2, 3] = 0.6
        poses.append(pose)
    rng = np.random.default_rng(9)
    for i, pose in enumerate(poses):
        image = fixtures.render_synthetic_color_frame(body, intr, pose, noise_rng=rng)
        cv2.imwrite(str(tmp_path / f"color_camera_image_{i}.png"), image)

    save_obj(str(tmp_path / "gen_sphere.obj"), body.vertices, body.triangles)

    _write_yaml(tmp_path / "gen_sphere.yaml", """%YAML:1.2
geometry_path: "INFER_FROM_NAME"
geometry_unit_in_meter: 1.0
geometry_counterclockwise: 1
geometry_enable_culling: 1
geometry2body_pose: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1, 0, 0, 0,  0, 1, 0, 0,  0, 0, 1, 0,  0, 0, 0, 1]
""")
    _write_yaml(tmp_path / "color_camera.yaml", f"""%YAML:1.2
load_directory: "."
intrinsics:
  f_u: {intr.fu}
  f_v: {intr.fv}
  pp_x: {intr.ppu}
  pp_y: {intr.ppv}
  width: {intr.width}
  height: {intr.height}
image_name_pre: "color_camera_image_"
load_index: 0
n_leading_zeros: 0
image_name_post: ""
load_image_type: "png"
""")
    _write_yaml(tmp_path / "region_model.yaml", """%YAML:1.2
model_path: "INFER_FROM_NAME"
n_divides: 1
n_points: 100
image_size: 200
""")
    _write_yaml(tmp_path / "region_modality.yaml", """%YAML:1.2
n_lines: 100
scales: [2, 1]
standard_deviations: [5.0, 1.5]
""")
    _write_yaml(tmp_path / "static_detector.yaml", """%YAML:1.2
link2world_pose: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1, 0, 0, 0,  0, 1, 0, 0,  0, 0, 1, 0.6,  0, 0, 0, 1]
""")
    _write_yaml(tmp_path / "config.yaml", """%YAML:1.2
Body:
  - name: "gen_sphere"
    metafile_path: "gen_sphere.yaml"
LoaderColorCamera:
  - name: "color_camera"
    metafile_path: "color_camera.yaml"
RegionModel:
  - name: "region_model"
    metafile_path: "region_model.yaml"
    body: "gen_sphere"
RegionModality:
  - name: "region_modality"
    metafile_path: "region_modality.yaml"
    body: "gen_sphere"
    color_camera: "color_camera"
    region_model: "region_model"
Link:
  - name: "gen_sphere_link"
    body: "gen_sphere"
    modalities: ["region_modality"]
Optimizer:
  - name: "gen_sphere_optimizer"
    root_link: "gen_sphere_link"
StaticDetector:
  - name: "detector"
    metafile_path: "static_detector.yaml"
    optimizer: "gen_sphere_optimizer"
Tracker:
  - name: "tracker"
    optimizers: ["gen_sphere_optimizer"]
    detectors: ["detector"]
""")

    # --- generate + track -------------------------------------------------------------
    tracker = GenerateConfiguredTracker(str(tmp_path / "config.yaml"))
    assert tracker.name == "tracker"
    assert tracker.SetUp(), "generated tracker must set up"
    assert len(tracker.body_ptrs) == 1
    assert len(tracker.camera_ptrs) == 1
    assert len(tracker.modality_ptrs) == 1

    assert tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                     max_iterations=len(poses))
    tracked_body = tracker.body_ptrs[0]
    err = np.linalg.norm(tracked_body.body2world_pose[:3, 3] - poses[-1][:3, 3])
    assert err < 0.005, f"generated tracker error {err}"


def test_generator_rejects_missing_reference(tmp_path):
    _write_yaml(tmp_path / "bad.yaml", """%YAML:1.2
Body:
  - name: "b"
    metafile_path: "missing_body.yaml"
Tracker:
  - name: "t"
    optimizers: ["nonexistent"]
""")
    from m3t_tpu.generator import GeneratorError

    with pytest.raises((GeneratorError, Exception)):
        GenerateConfiguredTracker(str(tmp_path / "bad.yaml"))
