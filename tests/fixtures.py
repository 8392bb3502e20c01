"""Procedural test fixtures: tiny meshes + synthetic camera frames.

Mirrors the reference test strategy (M3T/test/common_test.h:25-71): tiny bodies plus a
replayable camera, so no hardware or dataset is needed.  The mesh/render helpers live in
m3t_tpu.utils.procedural (shared with bench.py); this module adds camera factories.
"""

from __future__ import annotations

import numpy as np

from m3t_tpu.body import Body
from m3t_tpu.camera import ImageColorCamera, ImageDepthCamera
from m3t_tpu.common import Intrinsics, np_pose
from m3t_tpu.utils.procedural import (  # noqa: F401  (re-exported for tests)
    cube,
    cube_body,
    icosphere,
    render_synthetic_color_frame,
    render_synthetic_depth_frame,
    sphere_body,
)


def test_intrinsics(width: int = 160, height: int = 120) -> Intrinsics:
    return Intrinsics(fu=150.0, fv=150.0, ppu=width / 2 - 0.5, ppv=height / 2 - 0.5,
                      width=width, height=height)


def make_color_camera(body: Body, poses, intrinsics=None, name="color_camera",
                      noise_rng=None) -> ImageColorCamera:
    intr = intrinsics or test_intrinsics()
    frames = [
        render_synthetic_color_frame(body, intr, pose, noise_rng=noise_rng)
        for pose in poses
    ]
    cam = ImageColorCamera(name, intr, frames)
    assert cam.SetUp()
    return cam


def make_depth_camera(body: Body, poses, intrinsics=None, name="depth_camera",
                      depth_scale=0.001) -> ImageDepthCamera:
    intr = intrinsics or test_intrinsics()
    frames = [
        render_synthetic_depth_frame(body, intr, pose, depth_scale) for pose in poses
    ]
    cam = ImageDepthCamera(name, intr, frames, depth_scale)
    assert cam.SetUp()
    return cam


def look_at_pose(distance: float = 0.6) -> np.ndarray:
    """Body directly in front of the camera at given distance."""
    return np_pose(translation=[0.0, 0.0, distance])
