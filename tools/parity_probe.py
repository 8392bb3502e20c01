"""Probe: measure deviation of our RegionModality/DepthModality gradient/Hessian vs the
reference's shipped goldens (M3T/data/modality_test/*.txt), reproducing the setup of
M3T/test/modality_test.cpp + common_test.cpp.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3t_tpu.body import Body
from m3t_tpu.camera import LoaderColorCamera, LoaderDepthCamera
from m3t_tpu.region_model import RegionModel
from m3t_tpu.depth_model import DepthModel
from m3t_tpu.region_modality import RegionModality
from m3t_tpu.depth_modality import DepthModality

REF = "/root/reference/M3T/data"

WORLD2BODY = np.array([
    [0.607676, 0.408914, -0.680823, 0.472944],
    [0.786584, -0.428213, 0.444880, -0.213009],
    [-0.109620, -0.805867, -0.581860, 0.346384],
    [0.0, 0.0, 0.0, 1.0]], np.float32)


def load_golden(path):
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    # line 0: name; line 1: rows, cols; rest: values
    rows, cols = [int(tok) for tok in lines[1].replace(",", " ").split()]
    vals = []
    for ln in lines[2:]:
        vals.extend(float(tok) for tok in ln.replace(",", " ").split())
    return np.array(vals, np.float32).reshape(rows, cols)


def triangle_body():
    body = Body("triangle", metafile_path=os.path.join(REF, "_body/triangle.yaml"))
    assert body.SetUp()
    body.set_world2body_pose(WORLD2BODY)
    return body


def report(name, ours, golden):
    ours = np.asarray(ours, np.float32).reshape(golden.shape)
    rel = np.abs(golden - ours) / np.maximum(np.abs(golden), 1e-12)
    rel_norm = np.linalg.norm(golden - ours) / np.linalg.norm(golden)
    cos = float((golden.ravel() @ ours.ravel())
                / (np.linalg.norm(golden) * np.linalg.norm(ours)))
    print(f"--- {name}")
    print("golden:", np.array2string(golden.ravel(), precision=4, max_line_width=200))
    print("ours:  ", np.array2string(ours.ravel(), precision=4, max_line_width=200))
    print(f"max elementwise rel: {rel.max():.4f}  rel 2-norm: {rel_norm:.4f}  cos: {cos:.6f}")


def closest_view_index(body, camera, n_divides=4, sphere_radius=0.8):
    from m3t_tpu import model_base
    poses = model_base.generate_geodesic_poses(n_divides, sphere_radius)
    orientations = poses[:, :3, 2]
    body2camera = camera.world2camera_pose @ body.body2world_pose
    t = body2camera[:3, 3]
    orientation = body2camera[:3, :3].T @ (t / np.linalg.norm(t))
    return int(np.argmax(orientations @ orientation))


def main():
    tmp_ctx = tempfile.TemporaryDirectory()
    tmp = tmp_ctx.name
    body = triangle_body()
    color_cam = LoaderColorCamera("color_camera",
                                  metafile_path=os.path.join(REF, "_sequence/color_camera.yaml"))
    assert color_cam.SetUp()
    depth_cam = LoaderDepthCamera("depth_camera",
                                  metafile_path=os.path.join(REF, "_sequence/depth_camera.yaml"))
    assert depth_cam.SetUp()

    rmodel = RegionModel("triangle_region_model", body,
                         os.path.join(tmp, "triangle_region_model.npz"),
                         view_subset=[closest_view_index(body, color_cam)])
    assert rmodel.SetUp()
    rmod = RegionModality("region_modality", body, color_cam, rmodel)
    assert rmod.SetUp()
    assert rmod.StartModality(0, 0)
    assert rmod.CalculateCorrespondences(0, 0)
    assert rmod.CalculateGradientAndHessian(0, 0, 0)
    report("region global gradient", rmod.gradient,
           load_golden(os.path.join(REF, "modality_test/region_modality_global_gradient.txt")))
    report("region global hessian", rmod.hessian,
           load_golden(os.path.join(REF, "modality_test/region_modality_global_hessian.txt")))
    assert rmod.CalculateGradientAndHessian(0, 0, 1)
    report("region local gradient", rmod.gradient,
           load_golden(os.path.join(REF, "modality_test/region_modality_local_gradient.txt")))
    report("region local hessian", rmod.hessian,
           load_golden(os.path.join(REF, "modality_test/region_modality_local_hessian.txt")))

    dmodel = DepthModel("triangle_depth_model", body,
                        os.path.join(tmp, "triangle_depth_model.npz"),
                        view_subset=[closest_view_index(body, depth_cam)])
    assert dmodel.SetUp()
    dmod = DepthModality("depth_modality", body, depth_cam, dmodel)
    assert dmod.SetUp()
    assert dmod.CalculateCorrespondences(0, 0)
    assert dmod.CalculateGradientAndHessian(0, 0, 0)
    report("depth gradient", dmod.gradient,
           load_golden(os.path.join(REF, "modality_test/depth_modality_gradient.txt")))
    report("depth hessian", dmod.hessian,
           load_golden(os.path.join(REF, "modality_test/depth_modality_hessian.txt")))


if __name__ == "__main__":
    main()
