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
        focused_image_size=128, use_texture=True)
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

    # Host-side texture feature matches per (body, camera) (ICG+ terms).
    from m3t_tpu.ops.texture_fn import TexturePoints
    trng = np.random.default_rng(5)
    k_tex = 16
    tex = TexturePoints(
        jnp.asarray(trng.normal(scale=0.03, size=(B, C, k_tex, 3)), jnp.float32),
        jnp.asarray(trng.uniform(20, 100, size=(B, C, k_tex, 2)), jnp.float32),
        jnp.asarray(trng.random((B, C, k_tex)) > 0.4))

    mesh_a = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "camera"))
    mesh_b = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "camera"))
    extra = (depth1, depth_scale, dmodel_b, scene_geom, occluder_poses, tex)
    out_a = pipeline.make_sharded_cycle(
        pcfg, mesh_a, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(images1, cam2ref, model_b, state, *extra)
    out_b = pipeline.make_sharded_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(images1, cam2ref, model_b, state, *extra)
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
    tex_c1 = jax.tree_util.tree_map(lambda a: a[:, :1], tex)
    out_c = pipeline.make_sharded_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(
        images1_c1, cam2ref[:1], model_b, state_c1, depth1_c1, depth_scale,
        dmodel_b, scene_geom, occluder_poses, tex_c1)
    flat_state = pipeline.TrackingState(
        state.body2reference_pose, state.histogram_f[:, 0], state.histogram_b[:, 0])
    out_d = pipeline.tracking_cycle_rgbd(
        pcfg, intr, intr, depth_scale, images1[:, 0], depth1[:, 0], model_b,
        dmodel_b, flat_state, scene_geom=scene_geom,
        occluder_poses=occluder_poses,
        texture_points=jax.tree_util.tree_map(lambda a: a[:, 0], tex))
    np.testing.assert_allclose(np.asarray(out_c.body2reference_pose),
                               np.asarray(out_d.body2camera_pose),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c.histogram_f[:, 0]),
                               np.asarray(out_d.histogram_f), rtol=0, atol=1e-6)

    # Starting protocol: per-body handle_occlusions=False (the first
    # n_unoccluded_iterations cycles after StartModality, region_modality.h:442)
    # must flow through the sharded cycle and match the single-chip path.
    ho = jnp.asarray([False, True, False, True])
    out_e = pipeline.make_sharded_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(
        images1_c1, cam2ref[:1], model_b, state_c1, depth1_c1, depth_scale,
        dmodel_b, scene_geom, occluder_poses, tex_c1, handle_occlusions=ho)
    out_f = pipeline.tracking_cycle_rgbd(
        pcfg, intr, intr, depth_scale, images1[:, 0], depth1[:, 0], model_b,
        dmodel_b, flat_state, scene_geom=scene_geom,
        occluder_poses=occluder_poses, handle_occlusions=ho,
        texture_points=jax.tree_util.tree_map(lambda a: a[:, 0], tex))
    np.testing.assert_allclose(np.asarray(out_e.body2reference_pose),
                               np.asarray(out_f.body2camera_pose),
                               rtol=0, atol=1e-5)
    # Disabling occlusion handling must actually change the result for the
    # occluded bodies (otherwise the flag is not reaching the kernels).
    assert not np.allclose(np.asarray(out_e.body2reference_pose),
                           np.asarray(out_c.body2reference_pose), atol=1e-7)


def test_sharded_kinematic_cycle_equivalence(tmp_path):
    """Sharded multi-camera kinematic RGB-D cycle: (2,2) mesh == (1,1) mesh, and
    C == 1 equals tracking_cycle_kinematic exactly (structures over "data",
    cameras over "camera" with psum before update_structures)."""
    from jax.sharding import Mesh

    from m3t_tpu.common import np_pose
    from m3t_tpu.depth_model import DepthModel
    from m3t_tpu.link import Link, np_pose_variation
    from m3t_tpu.ops import kinematics as kin_ops
    from m3t_tpu.ops.raster import rasterize_np
    from m3t_tpu.optimizer import Optimizer
    from m3t_tpu.region_model import RegionModel

    parent = fixtures.sphere_body("sk_parent", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("sk_child", radius=0.04, n_subdiv=2)
    intr_t = fixtures.test_intrinsics(200, 150)
    depth_scale = 0.001
    arm = 0.13
    body2joint_child = np_pose(translation=[arm, 0.0, 0.0])

    def child_pose(root_pose, angle):
        return root_pose @ np_pose_variation(
            np.array([0, 0, angle, 0, 0, 0], np.float32)) @ body2joint_child

    def render(poses, rng):
        verts, ids = [], []
        for i, (body, pose) in enumerate(zip([parent, child], poses)):
            tri = body.triangle_vertices_f_body()
            verts.append(tri @ pose[:3, :3].T + pose[:3, 3])
            ids.append(np.full(len(tri), i + 1))
        depth, id_img = rasterize_np(
            np.concatenate(verts), np.concatenate(ids), intr_t.fu, intr_t.fv,
            intr_t.ppu, intr_t.ppv, intr_t.width, intr_t.height,
            cull_backfaces=True)
        colors = [np.array([40, 120, 190]), np.array([170, 60, 40]),
                  np.array([60, 170, 60])]
        image = np.empty((intr_t.height, intr_t.width, 3), np.uint8)
        image[:] = colors[0]
        for i in range(2):
            image[id_img == i + 1] = colors[i + 1]
        image = np.clip(image.astype(np.int16)
                        + rng.integers(-6, 7, image.shape), 0, 255).astype(np.uint8)
        d = np.where(np.isfinite(depth), depth / depth_scale, 0.0)
        return image, np.clip(d, 0, 65535).astype(np.uint16)

    S, C, NL = 2, 2, 2
    roots = [np_pose(translation=[-0.05, 0.0, 0.7]),
             np_pose(translation=[-0.03, 0.01, 0.75])]
    rng = np.random.default_rng(23)
    imgs0, imgs1, depths1 = [], [], []
    for s_idx in range(S):
        i0, _ = render([roots[s_idx], child_pose(roots[s_idx], 0.0)], rng)
        i1, d1 = render([roots[s_idx], child_pose(roots[s_idx], 0.05)], rng)
        imgs0.append(np.stack([i0] * C))
        imgs1.append(np.stack([i1] * C))
        depths1.append(np.stack([d1] * C))
    images0 = jnp.asarray(np.stack(imgs0))      # (S, C, H, W, 3)
    images1 = jnp.asarray(np.stack(imgs1))
    depth1 = jnp.asarray(np.stack(depths1))     # (S, C, Hd, Wd)
    cam2ref = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * C))

    model_p = RegionModel("sk_rm_p", parent, str(tmp_path / "rp.npz"),
                          n_divides=1, n_points=64, image_size=200)
    model_c = RegionModel("sk_rm_c", child, str(tmp_path / "rc.npz"),
                          n_divides=1, n_points=64, image_size=200)
    dmodel_p = DepthModel("sk_dm_p", parent, str(tmp_path / "dp.npz"),
                          n_divides=1, n_points=64, image_size=200)
    dmodel_c = DepthModel("sk_dm_c", child, str(tmp_path / "dc.npz"),
                          n_divides=1, n_points=64, image_size=200)
    assert all(m.SetUp() for m in (model_p, model_c, dmodel_p, dmodel_c))

    optimizers = []
    for s_idx in range(S):
        lp = Link(f"sk_lp{s_idx}", parent)
        lc = Link(f"sk_lc{s_idx}", child, body2joint_pose=body2joint_child,
                  free_directions=[False, False, True, False, False, False])
        lp.AddChildLink(lc)
        assert lc.SetUp() and lp.SetUp()
        lp.set_link2world_pose(roots[s_idx])
        opt = Optimizer(f"sk_o{s_idx}", lp)
        assert opt.SetUp()
        optimizers.append(opt)
    kin = kin_ops.build_kinematic_model(optimizers)
    jp0 = kin_ops.initial_joint2parent(optimizers)

    pcfg = pipeline.PipelineConfig(
        cfg=RegionConfig(n_lines_max=64), scales=(2, 1),
        standard_deviations=(5.0, 1.5), n_corr_iterations=3,
        n_update_iterations=2, use_depth=True,
        considered_distances=(0.03, 0.02),
        depth_standard_deviations=(0.05, 0.03),
        depth_measure_occlusions=True)
    pcfg = pcfg._replace(depth_cfg=pcfg.depth_cfg._replace(n_points_max=64))
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    arrays = pipeline.RegionModelArrays.from_models(
        [model_p, model_c] * S, 64)
    darrays = pipeline.DepthModelArrays.from_models(
        [dmodel_p, dmodel_c] * S, 64)

    kstate0 = pipeline.initialize_kinematic_histograms(
        pcfg, intr, images0[:, 0], arrays, kin, jp0)
    n_hist = kstate0.histogram_f.shape[-1]
    mc_state = pipeline.KinematicMultiCameraState(
        kstate0.joint2parent,
        jnp.broadcast_to(kstate0.histogram_f[:, :, None], (S, NL, C, n_hist)),
        jnp.broadcast_to(kstate0.histogram_b[:, :, None], (S, NL, C, n_hist)))

    depth_sc = jnp.float32(depth_scale)
    mesh_a = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "camera"))
    mesh_b = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "camera"))
    out_a = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_a, intr, depth_intr=intr, with_depth=True)(
        images1, cam2ref, arrays, kin, mc_state, depth1, depth_sc, darrays)
    out_b = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True)(
        images1, cam2ref, arrays, kin, mc_state, depth1, depth_sc, darrays)
    np.testing.assert_allclose(np.asarray(out_a.joint2parent),
                               np.asarray(out_b.joint2parent), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a.histogram_f),
                               np.asarray(out_b.histogram_f), rtol=0, atol=1e-6)

    # C == 1 equals the single-chip kinematic RGB-D cycle.
    mc_state_c1 = pipeline.KinematicMultiCameraState(
        mc_state.joint2parent, mc_state.histogram_f[:, :, :1],
        mc_state.histogram_b[:, :, :1])
    out_c = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True)(
        images1[:, :1], cam2ref[:1], arrays, kin, mc_state_c1,
        depth1[:, :1], depth_sc, darrays)
    out_d = pipeline.tracking_cycle_kinematic(
        pcfg, intr, images1[:, 0], arrays, kin, kstate0,
        depth_intr=intr, depth_scale=depth_sc, depth_images=depth1[:, 0],
        depth_model=darrays)
    np.testing.assert_allclose(np.asarray(out_c.joint2parent),
                               np.asarray(out_d.joint2parent), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c.histogram_f[:, :, 0]),
                               np.asarray(out_d.histogram_f), rtol=0, atol=1e-6)

    # Starting protocol through the sharded kinematic cycle: per-(structure,
    # link) handle_occlusions=False must match single-chip
    # (region_modality.h:442; measured depth occlusions are enabled above so the
    # flag is live).
    ho = jnp.asarray([[False, True], [True, False]])
    out_e = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True)(
        images1[:, :1], cam2ref[:1], arrays, kin, mc_state_c1,
        depth1[:, :1], depth_sc, darrays, handle_occlusions=ho)
    out_f = pipeline.tracking_cycle_kinematic(
        pcfg, intr, images1[:, 0], arrays, kin, kstate0,
        handle_occlusions=ho.reshape(-1), depth_intr=intr,
        depth_scale=depth_sc, depth_images=depth1[:, 0], depth_model=darrays)
    np.testing.assert_allclose(np.asarray(out_e.joint2parent),
                               np.asarray(out_f.joint2parent), rtol=0, atol=1e-5)


def test_sharded_kinematic_scene_texture_equivalence(tmp_path):
    """Full M3T flagship on the sharded kinematic cycle: link-on-link occlusion
    evaluation (with_scene) + per-link texture terms (with_texture) + depth
    fusion, (2,2) mesh == (1,1) mesh == single-chip tracking_cycle_kinematic."""
    from jax.sharding import Mesh

    from m3t_tpu.common import np_pose
    from m3t_tpu.depth_model import DepthModel
    from m3t_tpu.link import Link, np_pose_variation
    from m3t_tpu.ops import kinematics as kin_ops
    from m3t_tpu.ops import occlusion as occlusion_ops
    from m3t_tpu.ops.raster import rasterize_np
    from m3t_tpu.ops.texture_fn import TexturePoints
    from m3t_tpu.optimizer import Optimizer
    from m3t_tpu.region_model import RegionModel

    parent = fixtures.sphere_body("st_parent", radius=0.05, n_subdiv=2)
    child = fixtures.sphere_body("st_child", radius=0.04, n_subdiv=2)
    intr_t = fixtures.test_intrinsics(200, 150)
    depth_scale = 0.001
    # Child sits in front of and beside the parent so the links partially
    # occlude each other in projection (the Mb-ICG occlusion scenario).
    body2joint_child = np_pose(translation=[0.05, 0.0, -0.045])

    def child_pose(root_pose, angle):
        return root_pose @ np_pose_variation(
            np.array([0, 0, angle, 0, 0, 0], np.float32)) @ body2joint_child

    def render(poses, rng):
        verts, ids = [], []
        for i, (body, pose) in enumerate(zip([parent, child], poses)):
            tri = body.triangle_vertices_f_body()
            verts.append(tri @ pose[:3, :3].T + pose[:3, 3])
            ids.append(np.full(len(tri), i + 1))
        depth, id_img = rasterize_np(
            np.concatenate(verts), np.concatenate(ids), intr_t.fu, intr_t.fv,
            intr_t.ppu, intr_t.ppv, intr_t.width, intr_t.height,
            cull_backfaces=True)
        colors = [np.array([40, 120, 190]), np.array([170, 60, 40]),
                  np.array([60, 170, 60])]
        image = np.empty((intr_t.height, intr_t.width, 3), np.uint8)
        image[:] = colors[0]
        for i in range(2):
            image[id_img == i + 1] = colors[i + 1]
        image = np.clip(image.astype(np.int16)
                        + rng.integers(-6, 7, image.shape), 0, 255).astype(np.uint8)
        d = np.where(np.isfinite(depth), depth / depth_scale, 0.0)
        return image, np.clip(d, 0, 65535).astype(np.uint16)

    S, C, NL = 2, 2, 2
    roots = [np_pose(translation=[-0.04, 0.0, 0.7]),
             np_pose(translation=[-0.02, 0.01, 0.75])]
    rng = np.random.default_rng(31)
    imgs0, imgs1, depths1 = [], [], []
    for s_idx in range(S):
        i0, _ = render([roots[s_idx], child_pose(roots[s_idx], 0.0)], rng)
        i1, d1 = render([roots[s_idx], child_pose(roots[s_idx], 0.05)], rng)
        imgs0.append(np.stack([i0] * C))
        imgs1.append(np.stack([i1] * C))
        depths1.append(np.stack([d1] * C))
    images0 = jnp.asarray(np.stack(imgs0))
    images1 = jnp.asarray(np.stack(imgs1))
    depth1 = jnp.asarray(np.stack(depths1))
    cam2ref = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * C))

    model_p = RegionModel("st_rm_p", parent, str(tmp_path / "rp.npz"),
                          n_divides=1, n_points=64, image_size=200)
    model_c = RegionModel("st_rm_c", child, str(tmp_path / "rc.npz"),
                          n_divides=1, n_points=64, image_size=200)
    dmodel_p = DepthModel("st_dm_p", parent, str(tmp_path / "dp.npz"),
                          n_divides=1, n_points=64, image_size=200)
    dmodel_c = DepthModel("st_dm_c", child, str(tmp_path / "dc.npz"),
                          n_divides=1, n_points=64, image_size=200)
    assert all(m.SetUp() for m in (model_p, model_c, dmodel_p, dmodel_c))

    optimizers = []
    for s_idx in range(S):
        lp = Link(f"st_lp{s_idx}", parent)
        lc = Link(f"st_lc{s_idx}", child, body2joint_pose=body2joint_child,
                  free_directions=[False, False, True, False, False, False])
        lp.AddChildLink(lc)
        assert lc.SetUp() and lp.SetUp()
        lp.set_link2world_pose(roots[s_idx])
        opt = Optimizer(f"st_o{s_idx}", lp)
        assert opt.SetUp()
        optimizers.append(opt)
    kin = kin_ops.build_kinematic_model(optimizers)
    jp0 = kin_ops.initial_joint2parent(optimizers)

    # Per-link scenes: each link's occlusion scene contains BOTH links.
    scene_geom = occlusion_ops.build_kinematic_scene_geometry(
        [[parent, child]] * S)
    extra_occ = jnp.zeros((S, 0, 4, 4), jnp.float32)

    pcfg = pipeline.PipelineConfig(
        cfg=RegionConfig(n_lines_max=64), scales=(2, 1),
        standard_deviations=(5.0, 1.5), n_corr_iterations=3,
        n_update_iterations=2, use_depth=True,
        considered_distances=(0.03, 0.02),
        depth_standard_deviations=(0.05, 0.03),
        region_model_occlusions=True, region_checking=True,
        depth_model_occlusions=True, depth_silhouette_check=True,
        focused_image_size=128, use_texture=True)
    pcfg = pcfg._replace(depth_cfg=pcfg.depth_cfg._replace(n_points_max=64))
    intr = (np.float32(intr_t.fu), np.float32(intr_t.fv),
            np.float32(intr_t.ppu), np.float32(intr_t.ppv))
    arrays = pipeline.RegionModelArrays.from_models([model_p, model_c] * S, 64)
    darrays = pipeline.DepthModelArrays.from_models([dmodel_p, dmodel_c] * S, 64)

    kstate0 = pipeline.initialize_kinematic_histograms(
        pcfg, intr, images0[:, 0], arrays, kin, jp0)
    n_hist = kstate0.histogram_f.shape[-1]
    mc_state = pipeline.KinematicMultiCameraState(
        kstate0.joint2parent,
        jnp.broadcast_to(kstate0.histogram_f[:, :, None], (S, NL, C, n_hist)),
        jnp.broadcast_to(kstate0.histogram_b[:, :, None], (S, NL, C, n_hist)))

    trng = np.random.default_rng(7)
    k_tex = 16
    tex = TexturePoints(
        jnp.asarray(trng.normal(scale=0.02, size=(S, NL, C, k_tex, 3)),
                    jnp.float32),
        jnp.asarray(trng.uniform(30, 140, size=(S, NL, C, k_tex, 2)),
                    jnp.float32),
        jnp.asarray(trng.random((S, NL, C, k_tex)) > 0.4))

    depth_sc = jnp.float32(depth_scale)
    mesh_a = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "camera"))
    mesh_b = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "camera"))
    extra = (depth1, depth_sc, darrays, scene_geom, extra_occ, tex)
    out_a = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_a, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(images1, cam2ref, arrays, kin, mc_state, *extra)
    out_b = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(images1, cam2ref, arrays, kin, mc_state, *extra)
    np.testing.assert_allclose(np.asarray(out_a.joint2parent),
                               np.asarray(out_b.joint2parent), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a.histogram_f),
                               np.asarray(out_b.histogram_f), rtol=0, atol=1e-6)

    # C == 1 equals the single-chip kinematic cycle with the same scene+texture.
    mc_state_c1 = pipeline.KinematicMultiCameraState(
        mc_state.joint2parent, mc_state.histogram_f[:, :, :1],
        mc_state.histogram_b[:, :, :1])
    tex_c1 = jax.tree_util.tree_map(lambda a: a[:, :, :1], tex)
    out_c = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(
        images1[:, :1], cam2ref[:1], arrays, kin, mc_state_c1,
        depth1[:, :1], depth_sc, darrays, scene_geom, extra_occ, tex_c1)
    out_d = pipeline.tracking_cycle_kinematic(
        pcfg, intr, images1[:, 0], arrays, kin, kstate0,
        scene_geom=scene_geom, depth_intr=intr, depth_scale=depth_sc,
        depth_images=depth1[:, 0], depth_model=darrays,
        texture_points=jax.tree_util.tree_map(
            lambda a: a[:, :, 0].reshape((S * NL,) + a.shape[3:]), tex))
    np.testing.assert_allclose(np.asarray(out_c.joint2parent),
                               np.asarray(out_d.joint2parent), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c.histogram_f[:, :, 0]),
                               np.asarray(out_d.histogram_f), rtol=0, atol=1e-6)

    # The scene evaluation must be live (occlusion handling changes the result).
    out_e = pipeline.make_sharded_kinematic_cycle(
        pcfg, mesh_b, intr, depth_intr=intr, with_depth=True, with_scene=True,
        with_texture=True)(
        images1[:, :1], cam2ref[:1], arrays, kin, mc_state_c1,
        depth1[:, :1], depth_sc, darrays, scene_geom, extra_occ, tex_c1,
        handle_occlusions=jnp.zeros((S, NL), bool))
    assert not np.allclose(np.asarray(out_e.joint2parent),
                           np.asarray(out_c.joint2parent), atol=1e-7)
