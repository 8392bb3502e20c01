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


def test_sharded_cycle_full_feature_equivalence(batch, tmp_path):
    """FULL-semantics sharded cycle (depth fusion + occlusion rendering + region
    checking + measured occlusions): (4,2) mesh == (1,1) mesh, and C=1 equals
    tracking_cycle_rgbd exactly (VERDICT round-1 item 5)."""
    from jax.sharding import Mesh

    from m3t_tpu.depth_model import DepthModel
    from m3t_tpu.ops import occlusion as occlusion_ops

    intr_t, bodies, models, gt_poses, frames = batch
    B, C = 4, 2
    pcfg = _pcfg()._replace(
        use_depth=True, considered_distances=(0.03, 0.02),
        depth_standard_deviations=(0.05, 0.03),
        region_model_occlusions=True, region_checking=True,
        region_measure_occlusions=True, depth_model_occlusions=True,
        depth_silhouette_check=True, depth_measure_occlusions=True,
        focused_image_size=128)
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    model = pipeline.RegionModelArrays.from_models(models, 64)
    reps = [i % len(models) for i in range(B)]
    model_b = jax.tree_util.tree_map(lambda a: jnp.stack([a[r] for r in reps]), model)

    depth_models = []
    for i, body in enumerate(bodies):
        m = DepthModel(f"ffdm{i}", body, str(tmp_path / f"ffdm{i}.npz"), n_divides=1,
                       n_points=64, image_size=200)
        assert m.SetUp()
        depth_models.append(m)
    pcfg = pcfg._replace(depth_cfg=pcfg.depth_cfg._replace(n_points_max=64))
    dmodel = pipeline.DepthModelArrays.from_models(depth_models, 64)
    dmodel_b = jax.tree_util.tree_map(lambda a: jnp.stack([a[r] for r in reps]),
                                      dmodel)

    # Occlusion scene per body: the body itself + a small cube partially in front.
    occluder = fixtures.cube_body("ff_occluder", half=0.02)
    scene_geom = occlusion_ops.build_scene_geometry(
        [[bodies[r], occluder] for r in reps])
    occ_pose = np.eye(4, dtype=np.float32)
    occ_pose[0, 3] = -0.03
    occ_pose[2, 3] = 0.4
    occluder_poses = jnp.asarray(np.stack([occ_pose[None]] * B))

    def depth_frame(t, r):
        return fixtures.render_synthetic_depth_frame(
            bodies[r % len(models)], intr_t, gt_poses[t][r % len(models)])

    images0 = jnp.asarray(np.stack(
        [np.stack([frames[0][r % len(models)]] * C) for r in reps]))
    images1 = jnp.asarray(np.stack(
        [np.stack([frames[1][r % len(models)]] * C) for r in reps]))
    depth1 = jnp.asarray(np.stack(
        [np.stack([depth_frame(1, r)] * C) for r in reps]))
    cam2ref = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * C))
    poses0 = jnp.asarray(np.stack([gt_poses[0][r % len(models)] for r in reps]))
    state = pipeline.initialize_multicamera_histograms(
        pcfg, intr, images0, cam2ref, model_b, poses0)
    depth_scale = jnp.float32(0.001)

    mesh_a = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "camera"))
    mesh_b = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "camera"))
    extra = (depth1, depth_scale, dmodel_b, scene_geom, occluder_poses)
    out_a = pipeline.make_sharded_cycle(
        pcfg, mesh_a, intr, depth_intr=intr, with_depth=True, with_scene=True)(
        images1, cam2ref, model_b, state, *extra)
    out_b = pipeline.make_sharded_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True)(
        images1, cam2ref, model_b, state, *extra)
    np.testing.assert_allclose(np.asarray(out_a.body2reference_pose),
                               np.asarray(out_b.body2reference_pose),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a.histogram_f),
                               np.asarray(out_b.histogram_f), rtol=0, atol=1e-6)

    # C == 1: sharded cycle must equal the single-chip RGB-D cycle with the same
    # occlusion configuration.
    images1_c1 = images1[:, :1]
    depth1_c1 = depth1[:, :1]
    state_c1 = pipeline.MultiCameraState(
        state.body2reference_pose, state.histogram_f[:, :1],
        state.histogram_b[:, :1])
    out_c = pipeline.make_sharded_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True)(
        images1_c1, cam2ref[:1], model_b, state_c1, depth1_c1, depth_scale,
        dmodel_b, scene_geom, occluder_poses)
    flat_state = pipeline.TrackingState(
        state.body2reference_pose, state.histogram_f[:, 0], state.histogram_b[:, 0])
    out_d = pipeline.tracking_cycle_rgbd(
        pcfg, intr, intr, depth_scale, images1[:, 0], depth1[:, 0], model_b,
        dmodel_b, flat_state, scene_geom=scene_geom,
        occluder_poses=occluder_poses)
    np.testing.assert_allclose(np.asarray(out_c.body2reference_pose),
                               np.asarray(out_d.body2camera_pose),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c.histogram_f[:, 0]),
                               np.asarray(out_d.histogram_f), rtol=0, atol=1e-6)
