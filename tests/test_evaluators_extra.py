"""OPT / Choi / RTB evaluators end-to-end on synthetic mini-datasets.

Each test builds a tiny dataset in the published layout the evaluator expects
and runs the real evaluator class (previously untested components)."""

import os

import cv2
import numpy as np
import pytest

from m3t_tpu.common import np_pose
from m3t_tpu.link import np_pose_variation
from m3t_tpu.utils.obj_loader import save_obj
from tests import fixtures


def _pose_rows(poses):
    return "\n".join(
        " ".join(f"{v:.9f}" for v in list(p[:3, :3].reshape(-1)) + list(p[:3, 3]))
        for p in poses)


def _small_model(m):
    m.n_divides = 1
    m.n_points = 100
    m.image_size = 400


def _small_region_modality(m):
    m.n_lines_max = 100
    m.scales = [2, 1]
    m.standard_deviations = [5.0, 1.5]


def _small_depth_modality(m):
    m.n_points_max = 100
    m.considered_distances = [0.03, 0.02]
    m.standard_deviations = [0.05, 0.03]


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_opt_evaluator_on_synthetic_mini_dataset(tmp_path, fused):
    from m3t_tpu.eval.opt_evaluator import OPTEvaluator

    body = fixtures.sphere_body("opt_ball", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(160, 120)
    n_frames = 4

    model_dir = tmp_path / "Model3D" / "ball"
    seq_dir = tmp_path / "3D" / "seq1"
    os.makedirs(model_dir)
    os.makedirs(seq_dir / "color")
    os.makedirs(seq_dir / "depth")
    save_obj(str(model_dir / "ball.obj"), body.vertices, body.triangles)

    rng = np.random.default_rng(3)
    poses = []
    for i in range(n_frames + 1):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.002 * i
        pose[2, 3] = 0.6
        poses.append(pose)
    for i in range(n_frames):
        image = fixtures.render_synthetic_color_frame(body, intr, poses[i],
                                                      noise_rng=rng)
        cv2.imwrite(str(seq_dir / "color" / f"{i + 1:04d}.png"), image)
        depth = fixtures.render_synthetic_depth_frame(body, intr, poses[i],
                                                      depth_scale=0.001)
        cv2.imwrite(str(seq_dir / "depth" / f"{i + 1:04d}.png"), depth)
    (seq_dir / "ball.txt").write_text(_pose_rows(poses) + "\n")

    evaluator = OPTEvaluator("opt_eval", str(tmp_path), str(tmp_path),
                             body_names=["ball"], sequence_names=["seq1"])
    evaluator.intrinsics = intr
    evaluator.use_fused_pipeline = fused
    evaluator.region_model_setter = _small_model
    evaluator.depth_model_setter = _small_model
    evaluator.region_modality_setter = _small_region_modality
    evaluator.depth_modality_setter = _small_depth_modality

    results = evaluator.Evaluate()
    run = results["per_run"][("seq1", "ball")]
    assert run["n_frames"] == n_frames
    # AUC over thresholds scaled by the body diameter; near-perfect tracking on
    # the noise-free-ish synthetic sequence.
    assert results["auc"] > 0.8, results
    # Fused serve times the whole step as one jit (per-phase times are zero);
    # the host path must still break phases out.
    if fused:
        assert run["execution_times"]["calculate_correspondences"] == 0.0
    else:
        assert run["execution_times"]["calculate_correspondences"] > 0.0


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_choi_evaluator_on_synthetic_mini_dataset(tmp_path, fused):
    from m3t_tpu.eval.choi_evaluator import ChoiEvaluator

    body = fixtures.sphere_body("choi_ball", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(160, 120)
    n_frames = 4

    os.makedirs(tmp_path / "models")
    seq_dir = tmp_path / "seq_synth_ball_kitchen"
    os.makedirs(seq_dir)
    save_obj(str(tmp_path / "models" / "ball.obj"), body.vertices, body.triangles)

    rng = np.random.default_rng(5)
    poses = []
    for i in range(n_frames + 1):
        pose = np.eye(4, dtype=np.float32)
        pose[1, 3] = -0.0015 * i
        pose[2, 3] = 0.55
        poses.append(pose)
    for i in range(n_frames):
        image = fixtures.render_synthetic_color_frame(body, intr, poses[i],
                                                      noise_rng=rng)
        cv2.imwrite(str(seq_dir / f"color{i:04d}.png"), image)
        depth = fixtures.render_synthetic_depth_frame(body, intr, poses[i],
                                                      depth_scale=0.0001)
        cv2.imwrite(str(seq_dir / f"depth{i:04d}.png"), depth)
    (seq_dir / "poses_gt.txt").write_text(_pose_rows(poses) + "\n")

    evaluator = ChoiEvaluator("choi_eval", str(tmp_path), str(tmp_path),
                              body_names=["ball"])
    evaluator.intrinsics = intr
    evaluator.use_fused_pipeline = fused
    evaluator.region_model_setter = _small_model
    evaluator.depth_model_setter = _small_model
    evaluator.region_modality_setter = _small_region_modality
    evaluator.depth_modality_setter = _small_depth_modality

    results = evaluator.Evaluate()
    run = results["per_body"]["ball"]
    assert run["n_frames"] == n_frames
    # RMSE in mm / deg; synthetic tracking should stay within a few mm.
    assert run["rmse_x"] < 5.0 and run["rmse_y"] < 5.0 and run["rmse_z"] < 8.0, run
    assert run["rmse_alpha"] < 5.0, run
    if fused:
        assert run["execution_times"]["calculate_correspondences"] == 0.0
    else:
        assert run["execution_times"]["calculate_correspondences"] > 0.0


def _build_mini_rtb(tmp_path):
    """Two-body revolute structure in RTB layout with a generator YAML config."""
    parent = fixtures.sphere_body("rtb_parent", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("rtb_child", radius=0.04, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)
    n_frames = 4
    arm = 0.13
    body2joint_child = np_pose(translation=[arm, 0.0, 0.0])
    root_gt = np_pose(translation=[-0.05, 0.0, 0.7])

    def child_pose(angle):
        joint_rot = np_pose_variation(
            np.array([0, 0, angle, 0, 0, 0], np.float32))
        return root_gt @ joint_rot @ body2joint_child

    config_dir = tmp_path / "miniobj" / "model" / "tracker_config"
    seq_dir = tmp_path / "miniobj" / "easy" / "000" / "rgb"
    gt_dir = tmp_path / "miniobj" / "easy" / "000" / "poses_gt"
    os.makedirs(config_dir)
    os.makedirs(seq_dir)
    os.makedirs(gt_dir)

    save_obj(str(config_dir / "parent.obj"), parent.vertices, parent.triangles)
    save_obj(str(config_dir / "child.obj"), child.vertices, child.triangles)

    rng = np.random.default_rng(8)
    parent_poses, child_poses = [], []
    from m3t_tpu.ops.raster import rasterize_np

    for i in range(n_frames + 1):
        angle = 0.04 * i
        parent_poses.append(root_gt)
        child_poses.append(child_pose(angle))
    for i in range(n_frames):
        verts, ids = [], []
        for j, (b, p) in enumerate([(parent, parent_poses[i]),
                                    (child, child_poses[i])]):
            tri = b.triangle_vertices_f_body()
            verts.append(tri @ p[:3, :3].T + p[:3, 3])
            ids.append(np.full(len(tri), j + 1))
        _, id_img = rasterize_np(
            np.concatenate(verts), np.concatenate(ids), intr.fu, intr.fv,
            intr.ppu, intr.ppv, intr.width, intr.height, cull_backfaces=True)
        image = np.empty((intr.height, intr.width, 3), np.uint8)
        image[:] = [40, 120, 190]
        image[id_img == 1] = [170, 60, 40]
        image[id_img == 2] = [60, 170, 60]
        image = np.clip(image.astype(np.int16)
                        + rng.integers(-5, 6, image.shape), 0, 255).astype(np.uint8)
        cv2.imwrite(str(seq_dir / f"color_{i}.png"), image)
    (gt_dir / "parent.txt").write_text(_pose_rows(parent_poses) + "\n")
    (gt_dir / "child.txt").write_text(_pose_rows(child_poses) + "\n")

    def w(name, text):
        (config_dir / name).write_text(text)

    for body_name in ["parent", "child"]:
        w(f"{body_name}.yaml", """%YAML:1.2
geometry_path: "INFER_FROM_NAME"
geometry_unit_in_meter: 1.0
geometry_counterclockwise: 1
geometry_enable_culling: 1
""")
        w(f"{body_name}_region_model.yaml", """%YAML:1.2
model_path: "INFER_FROM_NAME"
n_divides: 1
n_points: 100
image_size: 200
""")
        w(f"{body_name}_region_modality.yaml", """%YAML:1.2
n_lines: 100
scales: [2, 1]
standard_deviations: [5.0, 1.5]
""")
    w("color_camera.yaml", f"""%YAML:1.2
load_directory: "."
intrinsics:
  f_u: {intr.fu}
  f_v: {intr.fv}
  pp_x: {intr.ppu}
  pp_y: {intr.ppv}
  width: {intr.width}
  height: {intr.height}
image_name_pre: "color_"
load_index: 0
n_leading_zeros: 0
load_image_type: "png"
""")
    w("child_link.yaml", """%YAML:1.2
body2joint_pose: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1, 0, 0, 0.13,  0, 1, 0, 0,  0, 0, 1, 0,  0, 0, 0, 1]
free_directions: [0, 0, 1, 0, 0, 0]
""")
    w("detector.yaml", """%YAML:1.2
link2world_pose: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1, 0, 0, -0.05,  0, 1, 0, 0,  0, 0, 1, 0.7,  0, 0, 0, 1]
""")
    w("combined.yaml", """%YAML:1.2
Body:
  - name: "parent"
    metafile_path: "parent.yaml"
  - name: "child"
    metafile_path: "child.yaml"
LoaderColorCamera:
  - name: "color_camera"
    metafile_path: "color_camera.yaml"
RegionModel:
  - name: "parent_region_model"
    metafile_path: "parent_region_model.yaml"
    body: "parent"
  - name: "child_region_model"
    metafile_path: "child_region_model.yaml"
    body: "child"
RegionModality:
  - name: "parent_region_modality"
    metafile_path: "parent_region_modality.yaml"
    body: "parent"
    color_camera: "color_camera"
    region_model: "parent_region_model"
  - name: "child_region_modality"
    metafile_path: "child_region_modality.yaml"
    body: "child"
    color_camera: "color_camera"
    region_model: "child_region_model"
Link:
  - name: "child_link"
    metafile_path: "child_link.yaml"
    body: "child"
    modalities: ["child_region_modality"]
  - name: "parent_link"
    body: "parent"
    modalities: ["parent_region_modality"]
    child_links: ["child_link"]
Optimizer:
  - name: "structure_optimizer"
    root_link: "parent_link"
StaticDetector:
  - name: "detector"
    metafile_path: "detector.yaml"
    optimizer: "structure_optimizer"
Tracker:
  - name: "tracker"
    optimizers: ["structure_optimizer"]
    detectors: ["detector"]
""")
    return intr, n_frames


def test_rtb_evaluator_on_synthetic_mini_dataset(tmp_path):
    """Two-body revolute structure in RTB layout, configured through the YAML
    generator (the reference's tracker_config/<mode>.yaml path) — object-graph
    path."""
    from m3t_tpu.eval.rtb_evaluator import RTBEvaluator

    intr, n_frames = _build_mini_rtb(tmp_path)
    evaluator = RTBEvaluator("rtb_eval", str(tmp_path), str(tmp_path),
                             object_names=["miniobj"],
                             difficulty_levels=["easy"],
                             depth_names=["gt_depth"], sequence_numbers=[0])
    evaluator.use_fused_pipeline = False
    results = evaluator.Evaluate()
    run = results["per_run"][("miniobj", "easy", "gt_depth", 0)]
    assert run["n_frames"] == n_frames
    assert results["add_auc"] > 0.85, results
    assert results["adds_auc"] >= results["add_auc"] - 1e-6


def test_rtb_evaluator_fused_kinematic_path(tmp_path):
    """Fused default path: the same RTB mini-dataset batched through
    tracking_cycle_kinematic (VERDICT round-4 item 3) matches the object-graph
    result."""
    from m3t_tpu.eval.rtb_evaluator import RTBEvaluator

    intr, n_frames = _build_mini_rtb(tmp_path)
    runs = {}
    for fused in (False, True):
        evaluator = RTBEvaluator(f"rtb_eval_{fused}", str(tmp_path),
                                 str(tmp_path), object_names=["miniobj"],
                                 difficulty_levels=["easy"],
                                 depth_names=["gt_depth"],
                                 sequence_numbers=[0])
        evaluator.use_fused_pipeline = fused
        results = evaluator.Evaluate()
        runs[fused] = results["per_run"][("miniobj", "easy", "gt_depth", 0)]
    for fused, run in runs.items():
        assert run["n_frames"] == n_frames, (fused, run)
        assert run["add_auc"] > 0.85, (fused, run)
        assert run["mean_cycle_time_s"] > 0.0
    assert abs(runs[False]["add_auc"] - runs[True]["add_auc"]) < 0.05


def test_rtb_external_pose_flow(tmp_path):
    """MATLAB-comparison round trip (rtb_evaluator.cpp:452-483): track with
    save_poses_folder, then re-score the saved poses via evaluate_external with
    the same metric — the AUCs must agree; SaveResults writes the CSV."""
    from m3t_tpu.eval.rtb_evaluator import RTBEvaluator

    intr, n_frames = _build_mini_rtb(tmp_path)
    kwargs = dict(object_names=["miniobj"], difficulty_levels=["easy"],
                  depth_names=["gt_depth"], sequence_numbers=[0])
    tracker_ev = RTBEvaluator("rtb_track", str(tmp_path), str(tmp_path),
                              **kwargs)
    tracker_ev.save_poses_folder = "m3t_tpu"
    tracked = tracker_ev.Evaluate()["per_run"][("miniobj", "easy",
                                                "gt_depth", 0)]
    saved = (tmp_path / "poses" / "m3t_tpu" / "miniobj" / "easy" / "gt_depth"
             / "000" / "parent.txt")
    assert saved.exists()
    assert len(saved.read_text().strip().splitlines()) == tracked["n_frames"]

    external_ev = RTBEvaluator("rtb_ext", str(tmp_path), str(tmp_path),
                               **kwargs)
    external_ev.evaluate_external = True
    external_ev.external_results_folder = "m3t_tpu"
    external = external_ev.Evaluate()["per_run"][("miniobj", "easy",
                                                  "gt_depth", 0)]
    assert external["n_frames"] == tracked["n_frames"]
    assert abs(external["add_auc"] - tracked["add_auc"]) < 1e-3
    assert abs(external["adds_auc"] - tracked["adds_auc"]) < 1e-3

    csv_path = tmp_path / "results.csv"
    external_ev.SaveResults(str(csv_path))
    lines = csv_path.read_text().strip().splitlines()
    assert lines[-1].startswith("all,")
    assert lines[0].startswith("miniobj_easy_gt_depth_0,")


def test_opt_gt_pose_format_and_run_configurations(tmp_path):
    """OPT layout: column-major GT rows x inverse geometry2body; reference
    sequence naming "<body[:2]>_<pattern>_<orientation>" (opt_evaluator.cpp:504,
    616-627)."""
    from m3t_tpu.eval.opt_evaluator import OPTEvaluator, read_opt_gt_poses

    rot = np.array([[0.0, -1.0, 0.0],
                    [1.0, 0.0, 0.0],
                    [0.0, 0.0, 1.0]], np.float64)
    trans = np.array([0.1, -0.2, 0.6])
    # 12 column-major values: columns of [R | t] are (R[:,0], R[:,1], R[:,2], t).
    row = np.concatenate([rot[:, 0], rot[:, 1], rot[:, 2], trans])
    path = tmp_path / "so_tr_1_b.txt"
    np.savetxt(path, row[None])

    g2b = np.eye(4, dtype=np.float32)
    g2b[:3, 3] = (0.0006, -0.0004, -0.0549)
    poses = read_opt_gt_poses(str(path), g2b)
    expected = np.eye(4)
    expected[:3, :3] = rot
    expected[:3, 3] = trans
    expected = expected @ np.linalg.inv(g2b.astype(np.float64))
    np.testing.assert_allclose(poses[0], expected.astype(np.float32), atol=1e-6)

    ev = OPTEvaluator("e", str(tmp_path), str(tmp_path), body_names=["soda"],
                      body_orientations=["b", "f"], motion_patterns=["tr_1"])
    runs = ev._run_configurations("soda")
    assert [r["sequence"] for r in runs] == ["so_tr_1_b", "so_tr_1_f"]
    assert all(r["opt_layout"] for r in runs)
