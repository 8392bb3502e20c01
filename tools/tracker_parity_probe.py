"""Probe: one full tracking step on the shipped 2-frame sequence vs the reference's
golden pose (M3T/data/tracker_test/triangle_pose.txt, tracker_test.cpp:164-179)."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity_probe import REF, closest_view_index, load_golden, triangle_body
from m3t_tpu.camera import LoaderColorCamera, LoaderDepthCamera
from m3t_tpu.depth_modality import DepthModality
from m3t_tpu.depth_model import DepthModel
from m3t_tpu.link import Link
from m3t_tpu.optimizer import Optimizer
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.region_model import RegionModel
from m3t_tpu.tracker import Tracker


def main():
    tmp_ctx = tempfile.TemporaryDirectory()
    tmp = tmp_ctx.name
    body = triangle_body()
    color_cam = LoaderColorCamera(
        "color_camera", metafile_path=os.path.join(REF, "_sequence/color_camera.yaml"))
    assert color_cam.SetUp()
    depth_cam = LoaderDepthCamera(
        "depth_camera", metafile_path=os.path.join(REF, "_sequence/depth_camera.yaml"))
    assert depth_cam.SetUp()

    rmodel = RegionModel("triangle_region_model", body,
                         os.path.join(tmp, "triangle_region_model.npz"),
                         view_subset=[closest_view_index(body, color_cam)])
    rmod = RegionModality("triangle_region_modality", body, color_cam, rmodel)
    rmod.MeasureOcclusions(depth_cam)
    dmodel = DepthModel("triangle_depth_model", body,
                        os.path.join(tmp, "triangle_depth_model.npz"),
                        view_subset=[closest_view_index(body, depth_cam)])
    dmod = DepthModality("triangle_depth_modality", body, depth_cam, dmodel)
    dmod.MeasureOcclusions()

    link = Link("link", body)
    link.AddModality(rmod)
    link.AddModality(dmod)
    optimizer = Optimizer("triangle_optimizer", link)

    tracker = Tracker("tracker", n_corr_iterations=5, n_update_iterations=2)
    assert tracker.AddOptimizer(optimizer)
    assert tracker.SetUp()
    assert tracker.StartModalities(0)
    assert tracker.ExecuteTrackingStep(0)

    golden = load_golden(os.path.join(REF, "tracker_test/triangle_pose.txt"))
    ours = np.asarray(body.body2world_pose, np.float64)
    print("golden:\n", golden)
    print("ours:\n", ours)
    dt = np.linalg.norm(golden[:3, 3] - ours[:3, 3])
    dr = golden[:3, :3].T @ ours[:3, :3]
    angle = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
    init = np.linalg.inv(np.array([
        [0.607676, 0.408914, -0.680823, 0.472944],
        [0.786584, -0.428213, 0.444880, -0.213009],
        [-0.109620, -0.805867, -0.581860, 0.346384],
        [0, 0, 0, 1]]))
    dt0 = np.linalg.norm(golden[:3, 3] - init[:3, 3])
    dr0 = golden[:3, :3].T @ init[:3, :3]
    angle0 = np.degrees(np.arccos(np.clip((np.trace(dr0) - 1) / 2, -1, 1)))
    print(f"translation err vs golden: {dt * 1000:.3f} mm (initial was {dt0 * 1000:.3f} mm)")
    print(f"rotation err vs golden: {angle:.4f} deg (initial was {angle0:.4f} deg)")


if __name__ == "__main__":
    main()
