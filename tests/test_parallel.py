"""Tests for multi-device sharding utilities + RGB-D fused pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu import parallel, pipeline
from m3t_tpu.ops.region_fn import RegionConfig
from tests import fixtures
from tests.test_pipeline import _build_batch, _pcfg


@pytest.fixture(scope="module")
def batch(tmp_path_factory):
    return _build_batch(tmp_path_factory.mktemp("par"), n_bodies=2, n_frames=4)


def test_track_sequences_scan_sharded(batch):
    intr_t, bodies, models, gt_poses, frames = batch
    pcfg = _pcfg()
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    model = pipeline.RegionModelArrays.from_models(models, 64)

    # Pad the 2 sequences to 8 (one per device on the virtual mesh).
    B = 8
    reps = [i % 2 for i in range(B)]
    model_b = jax.tree_util.tree_map(lambda a: jnp.stack([a[r] for r in reps]), model)
    frames_tb = jnp.asarray(np.stack(
        [np.stack([frames[t][r] for r in reps]) for t in range(1, len(frames))]))
    init_images = jnp.asarray(np.stack([frames[0][r] for r in reps]))
    init_poses = jnp.asarray(np.stack([gt_poses[0][r] for r in reps]))

    state = pipeline.initialize_histograms(pcfg, intr, init_images, model_b, init_poses)

    mesh = parallel.make_mesh(n_data=8, n_camera=1)
    final_state, poses = parallel.track_sequences_scan(
        pcfg, intr, frames_tb, model_b, state, mesh)

    poses = np.asarray(poses)
    assert poses.shape == (len(frames) - 1, B, 4, 4)
    gt_last = np.stack([gt_poses[-1][r] for r in reps])
    err = np.linalg.norm(
        np.asarray(final_state.body2camera_pose)[:, :3, 3] - gt_last[:, :3, 3], axis=1)
    assert np.all(err < 0.005), err
    # Replicated sequences must produce identical trajectories (determinism across
    # devices of the sharded scan).
    np.testing.assert_allclose(poses[:, 0], poses[:, 2], atol=1e-6)
    np.testing.assert_allclose(poses[:, 1], poses[:, 3], atol=1e-6)


def test_rgbd_fused_cycle(batch, tmp_path):
    from m3t_tpu.depth_model import DepthModel

    intr_t, bodies, models, gt_poses, frames = batch
    pcfg = _pcfg()._replace(use_depth=True,
                            considered_distances=(0.03, 0.02),
                            depth_standard_deviations=(0.05, 0.03))
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    model = pipeline.RegionModelArrays.from_models(models, 64)

    depth_models = []
    for i, body in enumerate(bodies):
        m = DepthModel(f"dm{i}", body, str(tmp_path / f"dm{i}.npz"), n_divides=1,
                       n_points=64, image_size=200)
        assert m.SetUp()
        depth_models.append(m)
    depth_model = pipeline.DepthModelArrays.from_models(depth_models, 64)
    pcfg = pcfg._replace(depth_cfg=pcfg.depth_cfg._replace(n_points_max=64))

    depth_frames = []
    for t in range(len(frames)):
        per_body = []
        for i, body in enumerate(bodies):
            per_body.append(fixtures.render_synthetic_depth_frame(
                body, intr_t, gt_poses[t][i]))
        depth_frames.append(np.stack(per_body))

    state = pipeline.initialize_histograms(
        pcfg, intr, jnp.asarray(frames[0]), model, jnp.asarray(gt_poses[0]))
    for t in range(1, len(frames)):
        state = pipeline.tracking_cycle_rgbd(
            pcfg, intr, intr, jnp.float32(0.001), jnp.asarray(frames[t]),
            jnp.asarray(depth_frames[t]), model, depth_model, state)

    est = np.asarray(state.body2camera_pose)
    err = np.linalg.norm(est[:, :3, 3] - gt_poses[-1][:, :3, 3], axis=1)
    assert np.all(err < 0.004), f"rgbd errors {err}"
