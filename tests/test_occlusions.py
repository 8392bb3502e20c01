"""Occlusion-handling integration tests: modeled occlusions + region checking.

Mirrors the reference's occlusion test variants (test/modality_test.cpp:175-279):
lines behind an occluder must be rejected once occlusion handling is active, and
tracking must survive partial occlusion.
"""

import jax
import numpy as np
import pytest

from m3t_tpu.camera import ImageColorCamera, ImageDepthCamera
from m3t_tpu.link import Link
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.renderer import (
    FocusedBasicDepthRenderer,
    FocusedSilhouetteRenderer,
    IDType,
)
from m3t_tpu.renderer_geometry import RendererGeometry
from tests import fixtures


@pytest.fixture(scope="module")
def occlusion_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("occl")
    tracked = fixtures.sphere_body("tracked", radius=0.06, n_subdiv=2)
    occluder = fixtures.cube_body("occluder", half=0.05)
    intr = fixtures.test_intrinsics(200, 150)

    pose_tracked = np.eye(4, dtype=np.float32)
    pose_tracked[2, 3] = 0.7
    # Occluder in front, covering the left half of the sphere.
    pose_occluder = np.eye(4, dtype=np.float32)
    pose_occluder[0, 3] = -0.05
    pose_occluder[2, 3] = 0.5

    # Render scene: sphere + cube in front.
    from m3t_tpu.ops.raster import rasterize_np

    verts = []
    ids = []
    for i, (body, pose) in enumerate([(tracked, pose_tracked),
                                      (occluder, pose_occluder)]):
        tri = body.triangle_vertices_f_body()
        verts.append(tri @ pose[:3, :3].T + pose[:3, 3])
        ids.append(np.full(len(tri), i + 1))
    depth, id_img = rasterize_np(
        np.concatenate(verts), np.concatenate(ids), intr.fu, intr.fv, intr.ppu,
        intr.ppv, intr.width, intr.height, cull_backfaces=True)
    image = np.empty((intr.height, intr.width, 3), np.uint8)
    image[:] = [40, 120, 190]
    image[id_img == 1] = [160, 60, 50]
    image[id_img == 2] = [60, 170, 60]
    depth_u16 = np.round(
        np.where(np.isfinite(depth), depth, 2.0) / 0.001).astype(np.uint16)

    color_camera = ImageColorCamera("color_cam", intr, [image] * 4)
    color_camera.SetUp()
    color_camera.UpdateImage()
    depth_camera = ImageDepthCamera("depth_cam", intr, [depth_u16] * 4, 0.001)
    depth_camera.SetUp()
    depth_camera.UpdateImage()

    tracked.set_body2world_pose(pose_tracked)
    occluder.set_body2world_pose(pose_occluder)

    rg = RendererGeometry("rg")
    rg.AddBody(tracked)
    rg.AddBody(occluder)
    assert rg.SetUp()

    model = RegionModel("model", tracked, str(tmp / "m.npz"), n_divides=1,
                        n_points=150, image_size=200)

    depth_renderer = FocusedBasicDepthRenderer("depth_renderer", rg, color_camera)
    depth_renderer.AddReferencedBody(tracked)
    depth_renderer.AddReferencedBody(occluder)
    assert depth_renderer.SetUp()
    silhouette_renderer = FocusedSilhouetteRenderer(
        "sil_renderer", rg, color_camera, id_type=IDType.REGION)
    silhouette_renderer.AddReferencedBody(tracked)
    silhouette_renderer.AddReferencedBody(occluder)
    assert silhouette_renderer.SetUp()

    return dict(tmp=tmp, tracked=tracked, occluder=occluder, intr=intr,
                color_camera=color_camera, depth_camera=depth_camera, rg=rg,
                model=model, depth_renderer=depth_renderer,
                silhouette_renderer=silhouette_renderer)


def _make_modality(setup, **flags):
    modality = RegionModality(
        f"mod_{len(flags)}_{'_'.join(flags)}", setup["tracked"],
        setup["color_camera"], setup["model"])
    modality.n_lines_max = 150
    modality.scales = [2, 1]
    modality.standard_deviations = [5.0, 1.5]
    modality.n_unoccluded_iterations = 0
    if flags.get("model_occlusions"):
        modality.ModelOcclusions(setup["depth_renderer"])
    if flags.get("measure_occlusions"):
        modality.MeasureOcclusions(setup["depth_camera"])
    if flags.get("region_checking"):
        modality.UseRegionChecking(setup["silhouette_renderer"])
    assert setup["model"].SetUp() or setup["model"].set_up
    assert modality.SetUp()
    modality.StartModality(0, 0)
    return modality


def _valid_count(modality):
    modality.CalculateCorrespondences(0, 0)
    return int(np.asarray(modality.data_lines.valid).sum())


def test_modeled_occlusion_rejects_hidden_lines(occlusion_setup):
    setup = occlusion_setup
    baseline = _make_modality(setup)
    n_baseline = _valid_count(baseline)

    setup["depth_renderer"].SetUp()
    setup["depth_renderer"].StartRendering()
    occluded = _make_modality(setup, model_occlusions=True)
    n_occluded = _valid_count(occluded)

    assert n_baseline > 50
    # The cube hides a significant part of the sphere -> fewer valid lines.
    assert n_occluded < n_baseline * 0.85, (n_baseline, n_occluded)
    assert n_occluded > 10


def test_measured_occlusion_rejects_hidden_lines(occlusion_setup):
    setup = occlusion_setup
    baseline = _make_modality(setup)
    n_baseline = _valid_count(baseline)
    occluded = _make_modality(setup, measure_occlusions=True)
    n_occluded = _valid_count(occluded)
    assert n_occluded < n_baseline * 0.85, (n_baseline, n_occluded)


def test_region_checking_rejects_foreign_region_lines(occlusion_setup):
    setup = occlusion_setup
    baseline = _make_modality(setup)
    n_baseline = _valid_count(baseline)

    setup["silhouette_renderer"].SetUp()
    setup["silhouette_renderer"].StartRendering()
    checked = _make_modality(setup, region_checking=True)
    n_checked = _valid_count(checked)
    # Lines whose fg/bg neighborhoods disagree with the rendered region map drop out.
    assert n_checked < n_baseline, (n_baseline, n_checked)
    assert n_checked > 10


def test_unoccluded_fallback_restores_lines(occlusion_setup):
    """With min_n_unoccluded_lines above the surviving count, the two-pass fallback
    must disable occlusion handling (region_modality.cpp:435-463)."""
    setup = occlusion_setup
    setup["depth_renderer"].SetUp()
    setup["depth_renderer"].StartRendering()
    baseline = _make_modality(setup)
    n_baseline = _valid_count(baseline)
    modality = _make_modality(setup, model_occlusions=True)
    n_with = _valid_count(modality)
    modality.min_n_unoccluded_lines = n_with + 20
    modality._cfg = modality._cfg._replace(min_n_unoccluded_lines=n_with + 20)
    n_fallback = _valid_count(modality)
    assert n_fallback > n_with
    assert n_fallback == n_baseline
