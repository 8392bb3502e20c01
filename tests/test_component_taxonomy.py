"""Reference-shaped per-class test taxonomy (M3T/test/modality_test.cpp:66-174):

1. SetUpFromData == SetUpFromMetaFile — configuring an object through setters and
   through an OpenCV-FileStorage YAML metafile must produce identical parameters;
2. TestWithoutSetUp — every main method fails loudly (returns False) before SetUp;
3. Refiner behavior — post-detection refinement recovers a perturbed pose
   (refiner.cpp:76-117), previously the only component with zero coverage.
"""

import numpy as np
import pytest

from m3t_tpu.camera import ImageColorCamera
from m3t_tpu.color_histograms import ColorHistograms
from m3t_tpu.constraint import Constraint
from m3t_tpu.depth_modality import DepthModality
from m3t_tpu.detector import StaticDetector
from m3t_tpu.link import Link
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.refiner import Refiner
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.soft_constraint import SoftConstraint
from m3t_tpu.texture_modality import TextureModality
from m3t_tpu.tracker import Tracker
from tests import fixtures


def _write_yaml(path, entries: dict) -> str:
    lines = ["%YAML:1.0", "---"]
    for key, value in entries.items():
        if isinstance(value, (list, tuple)):
            lines.append(f"{key}: [{', '.join(str(v) for v in value)}]")
        else:
            lines.append(f"{key}: {value}")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


# ---------------------------------------------------------------------------------------
# 1. SetUpFromData == SetUpFromMetaFile
# ---------------------------------------------------------------------------------------


def test_region_modality_metafile_parity(tmp_path):
    body = fixtures.sphere_body("tax_body", radius=0.05, n_subdiv=1)
    camera = ImageColorCamera(
        "tax_cam", fixtures.test_intrinsics(),
        [np.zeros((120, 160, 3), np.uint8)])
    assert camera.SetUp()
    model = RegionModel("tax_model", body, str(tmp_path / "m.npz"), n_divides=0,
                        n_points=32, image_size=200)
    assert model.SetUp()

    entries = dict(n_lines=77, function_amplitude=0.36, function_slope=0.25,
                   learning_rate=1.1, n_global_iterations=2,
                   scales=[4, 2], standard_deviations=[9.0, 3.0],
                   n_histogram_bins=32, learning_rate_f=0.25, learning_rate_b=0.3,
                   min_continuous_distance=4.5, n_unoccluded_iterations=3)
    meta = _write_yaml(tmp_path / "region_modality.yaml", entries)

    from_data = RegionModality("tax_rm_data", body, camera, model)
    from_data.n_lines_max = 77
    from_data.function_amplitude = 0.36
    from_data.function_slope = 0.25
    from_data.learning_rate = 1.1
    from_data.n_global_iterations = 2
    from_data.scales = [4, 2]
    from_data.standard_deviations = [9.0, 3.0]
    from_data.n_histogram_bins = 32
    from_data.learning_rate_f = 0.25
    from_data.learning_rate_b = 0.3
    from_data.min_continuous_distance = 4.5
    from_data.n_unoccluded_iterations = 3
    assert from_data.SetUp()

    from_meta = RegionModality("tax_rm_meta", body, camera, model,
                               metafile_path=meta)
    assert from_meta.SetUp()

    for attr in ["n_lines_max", "function_amplitude", "function_slope",
                 "learning_rate", "n_global_iterations", "scales",
                 "standard_deviations", "n_histogram_bins", "learning_rate_f",
                 "learning_rate_b", "min_continuous_distance",
                 "n_unoccluded_iterations"]:
        assert getattr(from_meta, attr) == getattr(from_data, attr), attr


def test_depth_modality_metafile_parity(tmp_path):
    from m3t_tpu.camera import ImageDepthCamera
    from m3t_tpu.depth_model import DepthModel

    body = fixtures.sphere_body("tax_dbody", radius=0.05, n_subdiv=1)
    camera = ImageDepthCamera("tax_dcam", fixtures.test_intrinsics(),
                              [np.zeros((120, 160), np.uint16)], 0.001)
    assert camera.SetUp()
    model = DepthModel("tax_dmodel", body, str(tmp_path / "dm.npz"), n_divides=0,
                       n_points=32, image_size=200)
    assert model.SetUp()

    entries = dict(n_points=55, stride_length=0.004,
                   considered_distances=[0.04, 0.02],
                   standard_deviations=[0.04, 0.02])
    meta = _write_yaml(tmp_path / "depth_modality.yaml", entries)

    from_data = DepthModality("tax_dm_data", body, camera, model)
    from_data.n_points_max = 55
    from_data.stride_length = 0.004
    from_data.considered_distances = [0.04, 0.02]
    from_data.standard_deviations = [0.04, 0.02]
    assert from_data.SetUp()
    from_meta = DepthModality("tax_dm_meta", body, camera, model,
                              metafile_path=meta)
    assert from_meta.SetUp()
    for attr in ["n_points_max", "stride_length", "considered_distances",
                 "standard_deviations"]:
        assert getattr(from_meta, attr) == getattr(from_data, attr), attr


def test_texture_modality_metafile_parity(tmp_path):
    from m3t_tpu.renderer import FocusedSilhouetteRenderer, IDType
    from m3t_tpu.renderer_geometry import RendererGeometry

    body = fixtures.sphere_body("tax_tbody", radius=0.05, n_subdiv=1)
    camera = ImageColorCamera("tax_tcam", fixtures.test_intrinsics(),
                              [np.zeros((120, 160, 3), np.uint8)])
    assert camera.SetUp()
    rg = RendererGeometry("tax_trg")
    rg.AddBody(body)
    assert rg.SetUp()
    sil = FocusedSilhouetteRenderer("tax_tsil", rg, camera, id_type=IDType.BODY)
    sil.AddReferencedBody(body)
    assert sil.SetUp()

    entries = dict(descriptor_type="FREAK", focused_image_size=180,
                   descriptor_distance_threshold=0.65, tukey_norm_constant=18.0,
                   n_keyframes=2, orb_n_features=444, daisy_radius=9.0,
                   freak_pattern_scale=20.0)
    meta = _write_yaml(tmp_path / "texture_modality.yaml", entries)

    from_data = TextureModality("tax_tm_data", body, camera, sil)
    from_data.descriptor_type = "FREAK"
    from_data.focused_image_size = 180
    from_data.descriptor_distance_threshold = 0.65
    from_data.tukey_norm_constant = 18.0
    from_data.n_keyframes = 2
    from_data.orb_n_features = 444
    from_data.daisy_radius = 9.0
    from_data.freak_pattern_scale = 20.0
    assert from_data.SetUp()
    from_meta = TextureModality("tax_tm_meta", body, camera, sil,
                                metafile_path=meta)
    assert from_meta.SetUp()
    for attr in ["descriptor_type", "focused_image_size",
                 "descriptor_distance_threshold", "tukey_norm_constant",
                 "n_keyframes", "orb_n_features", "daisy_radius",
                 "freak_pattern_scale"]:
        assert getattr(from_meta, attr) == getattr(from_data, attr), attr


def test_link_constraint_optimizer_metafile_parity(tmp_path):
    link_meta = _write_yaml(tmp_path / "link.yaml",
                            {"free_directions": [0, 0, 1, 0, 0, 0],
                             "fixed_body2joint_pose": 1})
    from_meta = Link("tax_link_meta", metafile_path=link_meta)
    assert from_meta.SetUp()
    assert from_meta.free_directions == [False, False, True, False, False, False]
    assert from_meta.fixed_body2joint_pose is True

    c_meta = _write_yaml(tmp_path / "constraint.yaml",
                         {"constraint_directions": [1, 1, 1, 0, 0, 0]})
    l1, l2 = Link("tax_cl1"), Link("tax_cl2")
    assert l1.SetUp() and l2.SetUp()
    constraint = Constraint("tax_c_meta", l1, l2, metafile_path=c_meta)
    assert constraint.SetUp()
    assert constraint.constraint_directions == [True, True, True, False, False,
                                                False]
    assert constraint.NumberOfConstraints() == 3

    sc_meta = _write_yaml(tmp_path / "soft_constraint.yaml",
                          {"max_distance_rotation": 0.1,
                           "max_distance_translation": 0.02,
                           "standard_deviation_rotation": 0.05,
                           "standard_deviation_translation": 0.002})
    soft = SoftConstraint("tax_sc_meta", l1, l2, metafile_path=sc_meta)
    assert soft.SetUp()
    assert soft.max_distance_rotation == pytest.approx(0.1)
    assert soft.max_distance_translation == pytest.approx(0.02)
    assert soft.standard_deviation_rotation == pytest.approx(0.05)
    assert soft.standard_deviation_translation == pytest.approx(0.002)

    o_meta = _write_yaml(tmp_path / "optimizer.yaml",
                         {"tikhonov_parameter_rotation": 500.0,
                          "tikhonov_parameter_translation": 20000.0})
    optimizer = Optimizer("tax_o_meta", l1, metafile_path=o_meta)
    assert optimizer.SetUp()
    assert optimizer.tikhonov_parameter_rotation == pytest.approx(500.0)
    assert optimizer.tikhonov_parameter_translation == pytest.approx(20000.0)


def test_refiner_tracker_metafile_parity(tmp_path):
    r_meta = _write_yaml(tmp_path / "refiner.yaml",
                         {"n_corr_iterations": 7, "n_update_iterations": 4})
    refiner = Refiner("tax_r_meta", metafile_path=r_meta)
    assert refiner.SetUp()
    assert refiner.n_corr_iterations == 7
    assert refiner.n_update_iterations == 4

    t_meta = _write_yaml(tmp_path / "tracker.yaml",
                         {"n_corr_iterations": 6, "n_update_iterations": 3,
                          "cycle_duration": 0.05})
    tracker = Tracker("tax_t_meta", metafile_path=t_meta)
    link = Link("tax_t_link")
    assert link.SetUp()
    optimizer = Optimizer("tax_t_opt", link)
    tracker.AddOptimizer(optimizer)
    assert tracker.SetUp()
    assert tracker.n_corr_iterations == 6
    assert tracker.n_update_iterations == 3


# ---------------------------------------------------------------------------------------
# 2. Fails loudly before SetUp
# ---------------------------------------------------------------------------------------


def test_methods_fail_before_setup(tmp_path):
    body = fixtures.sphere_body("tax_fbody", radius=0.05, n_subdiv=1)
    camera = ImageColorCamera("tax_fcam", fixtures.test_intrinsics(),
                              [np.zeros((120, 160, 3), np.uint8)])
    assert camera.SetUp()
    model = RegionModel("tax_fmodel", body, str(tmp_path / "m.npz"), n_divides=0,
                        n_points=32, image_size=200)
    assert model.SetUp()

    modality = RegionModality("tax_f_rm", body, camera, model)
    assert not modality.StartModality(0, 0)
    assert not modality.CalculateCorrespondences(0, 0)
    assert not modality.CalculateGradientAndHessian(0, 0, 0)
    assert not modality.CalculateResults(0)

    link = Link("tax_f_link")
    assert not link.CalculateJacobian(None)
    assert not link.CalculateGradientAndHessian()
    assert not link.UpdatePoses(None, np.zeros(6, np.float32))

    optimizer = Optimizer("tax_f_opt", link)
    assert not optimizer.CalculateConsistentPoses()
    assert not optimizer.CalculateOptimization(0, 0, 0)

    l1, l2 = Link("tax_f_c1"), Link("tax_f_c2")
    constraint = Constraint("tax_f_c", l1, l2)
    assert not constraint.CalculateResidualAndConstraintJacobian()
    soft = SoftConstraint("tax_f_sc", l1, l2)
    assert not soft.AddGradientsAndHessiansToLinks()

    refiner = Refiner("tax_f_refiner")
    assert not refiner.RefinePoses({"anything"})

    histograms = ColorHistograms("tax_f_hist")
    assert not histograms.ClearMemory()
    assert not histograms.InitializeHistograms()
    assert not histograms.UpdateHistograms()


def test_container_management_api():
    """Delete*/Clear* parity (tracker.cpp:52-115, link.h, optimizer.h, refiner.h)."""
    tracker = Tracker("tax_mgmt_tracker")
    link = Link("tax_mgmt_link")
    optimizer = Optimizer("tax_mgmt_opt", link)
    refiner = Refiner("tax_mgmt_refiner")
    assert tracker.AddOptimizer(optimizer)
    assert not tracker.AddOptimizer(optimizer)  # duplicate name rejected
    assert tracker.DeleteOptimizer("tax_mgmt_opt")
    assert not tracker.DeleteOptimizer("tax_mgmt_opt")  # already gone
    assert tracker.AddOptimizer(optimizer)
    tracker.ClearOptimizers()
    assert tracker.optimizer_ptrs == []
    assert tracker.AddRefiner(refiner) and tracker.DeleteRefiner("tax_mgmt_refiner")
    tracker.ClearRefiners()

    child = Link("tax_mgmt_child")
    assert link.AddChildLink(child) and link.DeleteChildLink("tax_mgmt_child")
    link.ClearChildLinks()
    assert link.child_link_ptrs == []

    l1, l2 = Link("tax_mgmt_c1"), Link("tax_mgmt_c2")
    constraint = Constraint("tax_mgmt_c", l1, l2)
    assert optimizer.AddConstraint(constraint)
    assert optimizer.DeleteConstraint("tax_mgmt_c")
    optimizer.ClearConstraints()
    soft = SoftConstraint("tax_mgmt_sc", l1, l2)
    assert optimizer.AddSoftConstraint(soft)
    optimizer.ClearSoftConstraints()
    assert optimizer.soft_constraint_ptrs == []

    assert refiner.AddOptimizer(optimizer) and refiner.DeleteOptimizer("tax_mgmt_opt")
    refiner.ClearOptimizers()
    # Vacuously true for an empty tracker (tracker.cpp:901-922 iterates empty lists).
    assert tracker.AreAllObjectsSetUp()


# ---------------------------------------------------------------------------------------
# 3. Refiner behavior (refiner.cpp:76-117)
# ---------------------------------------------------------------------------------------


@pytest.mark.slow
def test_refiner_recovers_perturbed_detection(tmp_path):
    body = fixtures.sphere_body("tax_ref_body", radius=0.06, n_subdiv=2)
    intr = fixtures.test_intrinsics(200, 150)
    gt = np.eye(4, dtype=np.float32)
    gt[2, 3] = 0.6
    rng = np.random.default_rng(7)
    frame = fixtures.render_synthetic_color_frame(body, intr, gt, noise_rng=rng)
    camera = ImageColorCamera("tax_ref_cam", intr, [frame] * 2)
    assert camera.SetUp()
    camera.UpdateImage()

    model = RegionModel("tax_ref_model", body, str(tmp_path / "m.npz"),
                        n_divides=1, n_points=100, image_size=200)
    assert model.SetUp()
    modality = RegionModality("tax_ref_rm", body, camera, model)
    modality.n_lines_max = 100
    modality.scales = [2, 1]
    modality.standard_deviations = [5.0, 1.5]
    link = Link("tax_ref_link", body)
    link.AddModality(modality)
    # Light damping: the tiny synthetic scene has ~100 lines at short focal
    # length, so default Tikhonov would need many more iterations.
    optimizer = Optimizer("tax_ref_opt", link, tikhonov_parameter_rotation=100.0,
                          tikhonov_parameter_translation=3000.0)

    # Coarse "detection": 8 mm off.
    coarse = gt.copy()
    coarse[0, 3] += 0.006
    coarse[1, 3] -= 0.005
    link.set_link2world_pose(coarse)
    assert modality.SetUp() and link.SetUp() and optimizer.SetUp()

    refiner = Refiner("tax_ref", n_corr_iterations=5, n_update_iterations=2)
    refiner.AddOptimizer(optimizer)
    assert refiner.SetUp()
    assert refiner.RefinePoses({optimizer.name})

    # Monocular region tracking of a sphere observes x/y strongly but depth only
    # weakly (contour size), so assert recovery on the observable axes and bound
    # the depth drift.
    err_xy = np.linalg.norm(body.body2world_pose[:2, 3] - gt[:2, 3])
    init_err_xy = np.linalg.norm(coarse[:2, 3] - gt[:2, 3])
    assert err_xy < 0.15 * init_err_xy, (err_xy, init_err_xy)
    assert abs(body.body2world_pose[2, 3] - gt[2, 3]) < 0.012
