"""Pallas depth-window presampling == the in-place XLA gather (ops/depth_fast.py).

The fused RGB-D pipeline fetches the strided correspondence-search windows
(FindCorrespondence, depth_modality.cpp:826-884) from body-centered crops via the
region staircase kernel; results must match depth_fn's direct image gather exactly
(same values, same argmin tie-breaking).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from m3t_tpu.ops import depth_fast, depth_fn


@pytest.mark.parametrize("use_depth_scaling", [False, True])
def test_presampled_windows_match_direct_gather(use_depth_scaling):
    rng = np.random.default_rng(3)
    B, P = 4, 64
    H, W = 120, 160
    cfg = depth_fn.DepthConfig(n_points_max=P, use_depth_scaling=use_depth_scaling)
    cd = 0.03
    depth_images = jnp.asarray(rng.integers(300, 900, size=(B, H, W)), jnp.uint16)
    centers = rng.normal(scale=0.04, size=(B, P, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    poses[:, 0, 3] = rng.uniform(-0.02, 0.02, B)
    poses[:, 1, 3] = rng.uniform(-0.02, 0.02, B)
    poses[:, 2, 3] = 0.5
    fu = fv = 150.0
    ppu, ppv = W / 2 - 0.5, H / 2 - 0.5
    crop_size = 128

    cropT, cu0, cv0 = depth_fast.depth_crops(
        depth_images, jnp.asarray(poses), fu, fv, ppu, ppv, crop_size)
    d, in_crop = depth_fast.presample_windows(
        cfg, cd, jnp.asarray(centers), jnp.asarray(poses), cropT, cu0, cv0,
        crop_size, fu, fv, ppu, ppv)

    for b in range(B):
        pts = depth_fn.DepthViewPoints(
            jnp.asarray(centers[b]), jnp.asarray(centers[b]),
            jnp.zeros(P), jnp.zeros(P))
        args = (cfg, cd, pts, jnp.int32(P), jnp.asarray(poses[b]), depth_images[b],
                fu, fv, ppu, ppv, W, H, jnp.float32(0.001), jnp.asarray(True))
        ref = depth_fn.calculate_correspondences(*args)
        fast = depth_fn.calculate_correspondences(
            *args, presampled=(d[b], in_crop[b]))
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(fast.valid))
        np.testing.assert_array_equal(
            np.asarray(ref.correspondence_center_f_camera),
            np.asarray(fast.correspondence_center_f_camera))


@pytest.mark.parametrize("use_depth_scaling", [False, True])
def test_presampled_occlusion_windows_match_direct_gather(use_depth_scaling):
    """presample_occlusion_windows == the in-place measured-occlusion gather
    (IsPointUnoccludedMeasured, depth_modality.cpp:736-776) on windows inside
    the crop."""
    rng = np.random.default_rng(5)
    B, P = 4, 64
    H, W = 120, 160
    cfg = depth_fn.DepthConfig(n_points_max=P, use_depth_scaling=use_depth_scaling,
                               measured_occlusion_radius=0.01)
    depth_images = jnp.asarray(rng.integers(300, 900, size=(B, H, W)), jnp.uint16)
    centers = rng.normal(scale=0.04, size=(B, P, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    poses[:, 0, 3] = rng.uniform(-0.02, 0.02, B)
    poses[:, 1, 3] = rng.uniform(-0.02, 0.02, B)
    poses[:, 2, 3] = 0.5
    fu = fv = 150.0
    ppu, ppv = W / 2 - 0.5, H / 2 - 0.5
    crop_size = 128

    cropT, cu0, cv0 = depth_fast.depth_crops(
        depth_images, jnp.asarray(poses), fu, fv, ppu, ppv, crop_size)
    mo = depth_fast.presample_occlusion_windows(
        cfg.measured_occlusion_radius, use_depth_scaling, jnp.asarray(centers),
        jnp.asarray(poses), cropT, cu0, cv0, crop_size, fu, fv, ppu, ppv, W, H)

    for b in range(B):
        pts = depth_fn.DepthViewPoints(
            jnp.asarray(centers[b]), jnp.asarray(centers[b]),
            jnp.zeros(P), jnp.zeros(P))
        args = (cfg, 0.03, pts, jnp.int32(P), jnp.asarray(poses[b]),
                depth_images[b], fu, fv, ppu, ppv, W, H, jnp.float32(0.001),
                jnp.asarray(True))
        ref = depth_fn.calculate_correspondences(*args, measure_occlusions=True)
        fast = depth_fn.calculate_correspondences(
            *args, measure_occlusions=True,
            measured_presampled=(mo[0][b], mo[1][b]))
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(fast.valid))
