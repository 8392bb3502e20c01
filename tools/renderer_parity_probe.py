"""Probe: compare our rasterizer's renders to the reference's shipped golden PNGs
(M3T/data/renderer_test/), reproducing renderer_test.cpp's fixture setup."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3t_tpu.body import Body
from m3t_tpu.camera import Intrinsics
from m3t_tpu.renderer import (FocusedBasicDepthRenderer, FocusedNormalRenderer,
                              FocusedSilhouetteRenderer, FullBasicDepthRenderer,
                              FullNormalRenderer, FullSilhouetteRenderer, IDType)
from m3t_tpu.renderer_geometry import RendererGeometry

REF = "/root/reference/M3T/data"

TRIANGLE_W2B = np.array([
    [0.607676, 0.408914, -0.680823, 0.472944],
    [0.786584, -0.428213, 0.444880, -0.213009],
    [-0.109620, -0.805867, -0.581860, 0.346384],
    [0.0, 0.0, 0.0, 1.0]], np.float32)
SCHAUMA_W2B = np.array([
    [0.607676, 0.408914, -0.680823, 0.297794],
    [0.786584, -0.428213, 0.444880, -0.189009],
    [-0.109620, -0.805867, -0.581860, 0.255284],
    [0.0, 0.0, 0.0, 1.0]], np.float32)
WORLD2CAMERA = np.eye(4, dtype=np.float32)
WORLD2CAMERA[0, 3] = 0.01
INTR = Intrinsics(698.128, 698.617, 478.459, 274.426, 640, 480)
Z_MIN, Z_MAX = 0.1, 2.0


def bodies():
    tri = Body("triangle", metafile_path=os.path.join(REF, "_body/triangle.yaml"))
    assert tri.SetUp()
    tri.set_world2body_pose(TRIANGLE_W2B)
    sch = Body("schauma", metafile_path=os.path.join(REF, "_body/schauma.yaml"))
    assert sch.SetUp()
    sch.set_world2body_pose(SCHAUMA_W2B)
    return tri, sch


def geometry(tri, sch):
    rg = RendererGeometry("renderer_geometry")
    rg.AddBody(tri)
    rg.AddBody(sch)
    assert rg.SetUp()
    return rg


def gl_depth_u16(depth_m, z_min=Z_MIN, z_max=Z_MAX):
    """Linear meters -> the golden's GL z-buffer ushort encoding."""
    d = np.asarray(depth_m, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        d01 = z_max * (d - z_min) / ((z_max - z_min) * d)
    d01 = np.where(np.isfinite(d), d01, 1.0)
    return np.round(np.clip(d01, 0.0, 1.0) * 65535.0).astype(np.uint16)


def load(name):
    from PIL import Image
    return np.array(Image.open(os.path.join(REF, "renderer_test", name)))


def report(name, golden, ours, budget_note=""):
    golden = np.asarray(golden)
    ours = np.asarray(ours)
    if golden.shape != ours.shape:
        print(f"--- {name}: SHAPE MISMATCH golden {golden.shape} ours {ours.shape}")
        return
    diff = np.abs(golden.astype(np.int64) - ours.astype(np.int64))
    wrong = int((diff > 0).sum())
    print(f"--- {name}: n_wrong={wrong}/{golden.size} max_diff={diff.max()}"
          f" wrong>1={int((diff > 1).sum())} wrong>2={int((diff > 2).sum())}"
          f" wrong>5={int((diff > 5).sum())} {budget_note}")


def main():
    tri, sch = bodies()
    rg = geometry(tri, sch)

    sil = FullSilhouetteRenderer("renderer", rg, z_min=Z_MIN, z_max=Z_MAX,
                                 id_type=IDType.BODY)
    sil.intrinsics = INTR
    sil.world2camera_pose = WORLD2CAMERA
    assert sil.SetUp()
    assert sil.StartRendering()
    report("full silhouette", load("silhouette_image.png"),
           np.asarray(sil.silhouette_image).astype(np.uint8))
    report("full depth", load("depth_image.png"), gl_depth_u16(sil.depth_image))

    nrm = FullNormalRenderer("renderer", rg, z_min=Z_MIN, z_max=Z_MAX)
    nrm.intrinsics = INTR
    nrm.world2camera_pose = WORLD2CAMERA
    assert nrm.SetUp()
    assert nrm.StartRendering()
    golden = load("normal_image.png")  # RGBA: R=0.5-0.5nz, G=..ny, B=..nx, A=255(fg)
    n = np.asarray(nrm.normal_image)
    valid = np.isfinite(np.asarray(nrm.depth_image))
    enc = np.clip(np.round((0.5 - 0.5 * n) * 255.0), 0, 255).astype(np.uint8)
    ours_rgba = np.zeros(golden.shape, np.uint8)
    for variant, order in (("zyx", [2, 1, 0]), ("xyz", [0, 1, 2])):
        for c, src in enumerate(order):
            ours_rgba[..., c] = np.where(valid, enc[..., src], 0)
        ours_rgba[..., 3] = np.where(valid, 255, 0)
        report(f"full normal ({variant})", golden, ours_rgba)

    fsil = FocusedSilhouetteRenderer("renderer", rg, image_size=200, z_min=Z_MIN,
                                     z_max=Z_MAX, id_type=IDType.BODY)
    fsil.intrinsics = INTR
    fsil.world2camera_pose = WORLD2CAMERA
    assert fsil.AddReferencedBody(tri)
    assert fsil.SetUp()
    assert fsil.StartRendering()
    report("focused silhouette", load("focused_silhouette_image.png"),
           np.asarray(fsil.silhouette_image).astype(np.uint8))
    report("focused depth", load("focused_depth_image.png"),
           gl_depth_u16(fsil.depth_image))
    print("focused corner/scale:", fsil.corner_u, fsil.corner_v, fsil.scale)

    fnrm = FocusedNormalRenderer("renderer", rg, image_size=200, z_min=Z_MIN,
                                 z_max=Z_MAX)
    fnrm.intrinsics = INTR
    fnrm.world2camera_pose = WORLD2CAMERA
    assert fnrm.AddReferencedBody(tri)
    assert fnrm.SetUp()
    assert fnrm.StartRendering()
    golden = load("focused_normal_image.png")
    n = np.asarray(fnrm.normal_image)
    valid = np.isfinite(np.asarray(fnrm.depth_image))
    enc = np.clip(np.round((0.5 - 0.5 * n) * 255.0), 0, 255).astype(np.uint8)
    ours_rgba = np.zeros(golden.shape, np.uint8)
    for variant, order in (("zyx", [2, 1, 0]), ("xyz", [0, 1, 2])):
        for c, src in enumerate(order):
            ours_rgba[..., c] = np.where(valid, enc[..., src], 0)
        ours_rgba[..., 3] = np.where(valid, 255, 0)
        report(f"focused normal ({variant})", golden, ours_rgba)


if __name__ == "__main__":
    main()
