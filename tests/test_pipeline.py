"""Tests for the fused batched tracking pipeline, incl. the sharded multi-chip cycle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu import pipeline
from m3t_tpu.ops.region_fn import RegionConfig
from tests import fixtures


def _build_batch(tmp_path, n_bodies=2, n_frames=4):
    from m3t_tpu.region_model import RegionModel

    intr = fixtures.test_intrinsics(160, 120)
    bodies = [fixtures.sphere_body(f"b{i}", radius=0.05 + 0.01 * i, n_subdiv=2)
              for i in range(n_bodies)]
    models = []
    for i, body in enumerate(bodies):
        m = RegionModel(f"m{i}", body, str(tmp_path / f"m{i}.npz"), n_divides=1,
                        n_points=64, image_size=200)
        assert m.SetUp()
        models.append(m)

    gt_poses = []
    frames = []
    rng = np.random.default_rng(0)
    for t in range(n_frames):
        poses_t = []
        frames_t = []
        for i, body in enumerate(bodies):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = 0.02 * (i - 0.5) + 0.0015 * t
            pose[1, 3] = -0.001 * t
            pose[2, 3] = 0.55 + 0.05 * i
            poses_t.append(pose)
            frames_t.append(fixtures.render_synthetic_color_frame(
                body, intr, pose, noise_rng=rng))
        gt_poses.append(np.stack(poses_t))
        frames.append(np.stack(frames_t))
    return intr, bodies, models, np.stack(gt_poses), np.stack(frames)


@pytest.fixture(scope="module")
def batch(tmp_path_factory):
    return _build_batch(tmp_path_factory.mktemp("pipe"))


def _pcfg():
    return pipeline.PipelineConfig(
        cfg=RegionConfig(n_lines_max=64),
        scales=(2, 1), standard_deviations=(5.0, 1.5),
        n_corr_iterations=3, n_update_iterations=2,
    )


def test_batched_cycle_tracks(batch):
    intr_t, bodies, models, gt_poses, frames = batch
    pcfg = _pcfg()
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    model = pipeline.RegionModelArrays.from_models(models, 64)

    state = pipeline.initialize_histograms(
        pcfg, intr, jnp.asarray(frames[0]), model, jnp.asarray(gt_poses[0]))
    for t in range(1, len(frames)):
        state = pipeline.tracking_cycle(pcfg, intr, jnp.asarray(frames[t]), model, state)

    est = np.asarray(state.body2camera_pose)
    err = np.linalg.norm(est[:, :3, 3] - gt_poses[-1][:, :3, 3], axis=1)
    assert np.all(err < 0.005), f"translation errors {err}"


def _multicam_inputs(batch, B=4, C=2):
    intr_t, bodies, models, gt_poses, frames = batch
    pcfg = _pcfg()
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    model = pipeline.RegionModelArrays.from_models(models, 64)
    reps = [i % len(models) for i in range(B)]
    model_b = jax.tree_util.tree_map(lambda a: jnp.stack([a[r] for r in reps]), model)
    images0 = jnp.asarray(np.stack([
        np.stack([frames[0][r % len(models)]] * C) for r in reps]))
    images1 = jnp.asarray(np.stack([
        np.stack([frames[1][r % len(models)]] * C) for r in reps]))
    cam2ref = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * C))
    poses0 = jnp.asarray(np.stack([gt_poses[0][r % len(models)] for r in reps]))
    state = pipeline.initialize_multicamera_histograms(
        pcfg, intr, images0, cam2ref, model_b, poses0)
    gt1 = np.stack([gt_poses[1][r % len(models)] for r in reps])
    return pcfg, intr, model_b, images1, cam2ref, state, gt1


def test_sharded_cycle_matches_mesh(batch):
    """Multi-camera sharded cycle on the virtual 8-device CPU mesh."""
    from jax.sharding import Mesh

    pcfg, intr, model_b, images, cam2ref, state, gt = _multicam_inputs(batch)
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "camera"))
    cycle = pipeline.make_sharded_cycle(pcfg, mesh, intr)
    with mesh:
        out = cycle(images, cam2ref, model_b, state)
    est = np.asarray(out.body2reference_pose)
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert np.all(err < 0.006), f"sharded translation errors {err}"
    assert out.histogram_f.shape == state.histogram_f.shape
    # Histograms adapted (not returned untouched).
    assert not np.allclose(np.asarray(out.histogram_f),
                           np.asarray(state.histogram_f))


def test_sharded_cycle_equals_unsharded(batch):
    """Full-feature equivalence: (4,2) mesh == (1,1) mesh, and C=1 == tracking_cycle."""
    from jax.sharding import Mesh

    pcfg, intr, model_b, images, cam2ref, state, gt = _multicam_inputs(batch)

    mesh_a = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "camera"))
    mesh_b = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "camera"))
    out_a = pipeline.make_sharded_cycle(pcfg, mesh_a, intr)(
        images, cam2ref, model_b, state)
    out_b = pipeline.make_sharded_cycle(pcfg, mesh_b, intr)(
        images, cam2ref, model_b, state)
    np.testing.assert_allclose(np.asarray(out_a.body2reference_pose),
                               np.asarray(out_b.body2reference_pose),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a.histogram_f),
                               np.asarray(out_b.histogram_f), rtol=0, atol=1e-6)

    # Single camera with identity extrinsics must reproduce the single-chip cycle.
    pcfg1, intr1, model1, images1, cam2ref1, state1, _ = _multicam_inputs(batch, C=1)
    out_c = pipeline.make_sharded_cycle(pcfg1, mesh_b, intr1)(
        images1, cam2ref1, model1, state1)
    flat_state = pipeline.TrackingState(
        state1.body2reference_pose, state1.histogram_f[:, 0], state1.histogram_b[:, 0])
    out_d = pipeline.tracking_cycle(pcfg1, intr1, images1[:, 0], model1, flat_state)
    np.testing.assert_allclose(np.asarray(out_c.body2reference_pose),
                               np.asarray(out_d.body2camera_pose),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c.histogram_f[:, 0]),
                               np.asarray(out_d.histogram_f), rtol=0, atol=1e-6)


def test_adaptive_n_lines_fused_matches_host(tmp_path):
    """Adaptive coverage (region_modality.cpp:417-429) on the fused path: the
    per-body traced line count equals the host RegionModality's for a body whose
    views have strongly varying contour length, in both the max-contour-length
    and reference-contour-length normalizations."""
    from m3t_tpu.body import Body
    from m3t_tpu.common import np_pose
    from m3t_tpu.region_modality import RegionModality
    from m3t_tpu.region_model import RegionModel

    verts, tris = fixtures.icosphere(2, 0.04)
    verts = (verts * np.array([3.0, 1.0, 1.0])).astype(np.float32)
    body = Body("adaptive_ellipsoid", vertices=verts, triangles=tris)
    assert body.SetUp()
    model = RegionModel("adaptive_rm", body, str(tmp_path / "arm.npz"),
                        n_divides=1, n_points=64, image_size=200)
    assert model.SetUp()
    cls = np.asarray(model.contour_lengths)
    assert cls.max() / cls.min() > 1.3, "fixture should vary contour length"

    poses = []
    rng_l = np.random.default_rng(3)
    for k in range(12):
        pose = np_pose(translation=[0.0, 0.0, 0.6])
        axis = rng_l.normal(size=3)
        axis /= np.linalg.norm(axis)
        angle = 0.5 * k
        from scipy.spatial.transform import Rotation
        pose[:3, :3] = Rotation.from_rotvec(angle * axis).as_matrix()
        poses.append(pose.astype(np.float32))
    poses_b = jnp.asarray(np.stack(poses))
    arrays = pipeline.RegionModelArrays.from_models([model] * len(poses), 64)

    camera = fixtures.make_color_camera(body, [np.eye(4, dtype=np.float32)])
    modality = RegionModality("adaptive_mod", body, camera, model)
    modality.n_lines_max = 64
    modality.use_adaptive_coverage = True
    assert modality.SetUp()

    for ref_len in (0.0, float(np.median(cls))):
        pcfg = _pcfg()._replace(use_adaptive_coverage=True,
                                reference_contour_length=ref_len)
        fused = np.asarray(pipeline._adaptive_n_lines(pcfg, arrays, poses_b))
        modality.reference_contour_length = ref_len
        host = []
        for pose in poses:
            body.set_body2world_pose(pose)
            modality._fetch_view()
            host.append(modality._n_lines)
        host = np.asarray(host)
        # f32-vs-f64 ratio rounding at an int boundary may differ by one line.
        assert np.max(np.abs(fused - host)) <= 1, (ref_len, fused, host)
        assert host.min() < host.max(), "line count should vary across views"


def test_adaptive_coverage_cycle_tracks(batch):
    """Full fused cycle with adaptive coverage on: still converges, and the
    traced line count actually changes the result vs. non-adaptive."""
    intr_t, bodies, models, gt_poses, frames = batch
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    model = pipeline.RegionModelArrays.from_models(models, 64)
    # Sphere views all share (nearly) the same contour length, so force variation
    # through reference_contour_length > contour -> ratio < 1.
    ref_len = float(np.asarray(model.max_contour_length).max()) * 1.5
    pcfg = _pcfg()._replace(use_adaptive_coverage=True,
                            reference_contour_length=ref_len)

    state = pipeline.initialize_histograms(
        pcfg, intr, jnp.asarray(frames[0]), model, jnp.asarray(gt_poses[0]))
    state_na = pipeline.initialize_histograms(
        _pcfg(), intr, jnp.asarray(frames[0]), model, jnp.asarray(gt_poses[0]))
    for t in range(1, len(frames)):
        state = pipeline.tracking_cycle(pcfg, intr, jnp.asarray(frames[t]),
                                        model, state)
        state_na = pipeline.tracking_cycle(_pcfg(), intr, jnp.asarray(frames[t]),
                                           model, state_na)
    est = np.asarray(state.body2camera_pose)
    err = np.linalg.norm(est[:, :3, 3] - gt_poses[-1][:, :3, 3], axis=1)
    assert np.all(err < 0.005), f"adaptive translation errors {err}"
    assert not np.allclose(est, np.asarray(state_na.body2camera_pose),
                           atol=1e-7), "adaptive coverage should be live"


def test_ldlt_solve_6x6_matches_linalg_solve(rng):
    """pipeline._ldlt_solve_6x6 == jnp.linalg.solve on SPD Tikhonov systems."""
    import jax.numpy as jnp

    h = rng.normal(size=(64, 6, 6)).astype(np.float32)
    a = jnp.asarray(np.einsum("bij,bkj->bik", h, h)
                    + np.eye(6, dtype=np.float32) * 1000.0)
    b = jnp.asarray(rng.normal(size=(64, 6)).astype(np.float32))
    x_ldlt = pipeline._ldlt_solve_6x6(a, b)
    x_lu = jnp.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x_ldlt), np.asarray(x_lu),
                               rtol=2e-4, atol=1e-6)
