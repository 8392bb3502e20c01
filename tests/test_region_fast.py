"""Equivalence tests: Pallas fast path (ops/region_fast) vs the host path (ops/region_fn).

The fast path must reproduce the object-graph path's numerics — same staircase pixels,
same probabilities, same distributions/moments, same gradient/Hessian — up to float
reassociation.  Lines are placed across the whole crop (both 128-column stripes, both
dominant axes, both directions) to exercise every gather branch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu import pipeline
from m3t_tpu.ops import histogram as hist_ops
from m3t_tpu.ops import region_fast, region_fn
from m3t_tpu.ops.region_fn import RegionConfig, ViewPoints
from m3t_tpu.region_model import RegionModel
from tests import fixtures


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rf")
    intr = fixtures.test_intrinsics(320, 240)
    body = fixtures.sphere_body("s", radius=0.07, n_subdiv=2)
    model = RegionModel("m", body, str(tmp / "m.npz"), n_divides=1, n_points=128,
                        image_size=400)
    assert model.SetUp()
    rng = np.random.default_rng(3)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.01, -0.008, 0.45]
    frame = fixtures.render_synthetic_color_frame(body, intr, pose, noise_rng=rng)
    # Histograms from a StartModality-like pass so probabilities are non-trivial.
    arrays = pipeline.RegionModelArrays.from_models([model], 128)
    intr_t = (np.float32(intr.fu), np.float32(intr.fv),
              np.float32(intr.ppu), np.float32(intr.ppv))
    pcfg = pipeline.PipelineConfig(cfg=RegionConfig(n_lines_max=128))
    state = pipeline.initialize_histograms(
        pcfg, intr_t, jnp.asarray(frame)[None], arrays, jnp.asarray(pose)[None])
    return intr, model, pose, frame, arrays, state, pcfg, intr_t


def _host_view(model, pose):
    """ViewPoints for region_fn from the host model (row-major layout)."""
    t = pose[:3, 3]
    orientation = pose[:3, :3].T @ (t / np.linalg.norm(t))
    idx = int(np.argmax(model.orientations @ orientation))
    L = model.centers.shape[1]
    return ViewPoints(
        center_f_body=jnp.asarray(model.centers[idx]),
        normal_f_body=jnp.asarray(model.normals[idx]),
        foreground_distance=jnp.asarray(model.foreground_distances[idx]),
        background_distance=jnp.asarray(model.background_distances[idx]),
        measured_depth_offset=jnp.zeros((L,), jnp.float32),
        modeled_depth_offset=jnp.zeros((L,), jnp.float32),
    )


@pytest.mark.parametrize("scale", [6, 2, 1])
def test_correspondences_match_host_path(scene, scale):
    intr, model, pose, frame, arrays, state, pcfg, intr_t = scene
    cfg = pcfg.cfg
    L = cfg.n_lines_max
    hf = state.histogram_f[0]
    hb = state.histogram_b[0]

    # Host path.
    host = region_fn.calculate_correspondences(
        cfg, scale, _host_view(model, pose), jnp.int32(L), jnp.asarray(pose),
        jnp.asarray(frame), hf, hb, np.float32(intr.fu), np.float32(intr.fv),
        np.float32(intr.ppu), np.float32(intr.ppv), intr.width, intr.height,
        jnp.asarray(True))

    # Fast path (batch of 1).
    images = jnp.asarray(frame)[None]
    poses = jnp.asarray(pose)[None]
    bin_crop, bin_cropT, cu, cv = pipeline._prepare_crops(pcfg, intr_t, images, poses)
    rtab = region_fast.ratio_table(hf[None], hb[None])
    points = jax.vmap(lambda m, p: pipeline._select_view_cl(m, p))(arrays, poses)
    lines = pipeline._region_terms(pcfg, intr_t, scale, points, poses, jnp.int32(L),
                                   bin_crop, bin_cropT, rtab, cu, cv,
                                   intr.width, intr.height)

    valid_h = np.asarray(host.valid)
    valid_f = np.asarray(lines.valid[0])[:L]
    n_valid = valid_h.sum()
    assert n_valid > 30, "scene produced too few valid lines to be meaningful"
    # Crop covers the whole body here, so validity must agree exactly.
    np.testing.assert_array_equal(valid_f, valid_h)

    m = valid_h
    np.testing.assert_allclose(np.asarray(lines.mean[0])[:L][m],
                               np.asarray(host.mean)[m], rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lines.measured_variance[0])[:L][m],
                               np.asarray(host.measured_variance)[m],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lines.distribution[0]).T[:L][m],
                               np.asarray(host.distribution)[m],
                               rtol=0, atol=2e-4)


@pytest.mark.parametrize("global_iteration", [True, False])
def test_gradient_hessian_match_host_path(scene, global_iteration):
    intr, model, pose, frame, arrays, state, pcfg, intr_t = scene
    cfg = pcfg.cfg
    L = cfg.n_lines_max
    scale, std = 2, 5.0
    hf = state.histogram_f[0]
    hb = state.histogram_b[0]

    host_lines = region_fn.calculate_correspondences(
        cfg, scale, _host_view(model, pose), jnp.int32(L), jnp.asarray(pose),
        jnp.asarray(frame), hf, hb, np.float32(intr.fu), np.float32(intr.fv),
        np.float32(intr.ppu), np.float32(intr.ppv), intr.width, intr.height,
        jnp.asarray(True))
    g_h, h_h = region_fn.calculate_gradient_and_hessian(
        cfg, host_lines, jnp.asarray(pose), np.float32(intr.fu), np.float32(intr.fv),
        np.float32(intr.ppu), np.float32(intr.ppv), std, global_iteration)

    images = jnp.asarray(frame)[None]
    poses = jnp.asarray(pose)[None]
    bin_crop, bin_cropT, cu, cv = pipeline._prepare_crops(pcfg, intr_t, images, poses)
    rtab = region_fast.ratio_table(hf[None], hb[None])
    points = jax.vmap(lambda m, p: pipeline._select_view_cl(m, p))(arrays, poses)
    lines = pipeline._region_terms(pcfg, intr_t, scale, points, poses, jnp.int32(L),
                                   bin_crop, bin_cropT, rtab, cu, cv,
                                   intr.width, intr.height)
    g_f, h_f = jax.vmap(
        lambda ln, p: region_fast.gradient_hessian_cl(
            cfg, ln, p, np.float32(intr.fu), np.float32(intr.fv),
            np.float32(intr.ppu), np.float32(intr.ppv), std, global_iteration)
    )(lines, poses)

    scale_g = max(np.abs(np.asarray(g_h)).max(), 1e-6)
    scale_h = max(np.abs(np.asarray(h_h)).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(g_f[0]) / scale_g,
                               np.asarray(g_h) / scale_g, rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_f[0]) / scale_h,
                               np.asarray(h_h) / scale_h, rtol=0, atol=2e-4)


def test_histogram_memories_match_host_path(scene):
    intr, model, pose, frame, arrays, state, pcfg, intr_t = scene
    cfg = pcfg.cfg
    L = cfg.n_lines_max

    mem_f_h = jnp.zeros((cfg.n_histogram_bins ** 3,), jnp.float32)
    mem_b_h = jnp.zeros_like(mem_f_h)
    mem_f_h, mem_b_h = region_fn.add_line_pixel_colors(
        cfg, _host_view(model, pose), jnp.int32(L), jnp.asarray(pose),
        jnp.asarray(frame), mem_f_h, mem_b_h,
        np.float32(intr.fu), np.float32(intr.fv), np.float32(intr.ppu),
        np.float32(intr.ppv), intr.width, intr.height, jnp.asarray(False))

    images = jnp.asarray(frame)[None]
    poses = jnp.asarray(pose)[None]
    bin_crop, bin_cropT, cu, cv = pipeline._prepare_crops(pcfg, intr_t, images, poses)
    rtab = jnp.zeros((1, 32, 128), jnp.float32)
    points = jax.vmap(lambda m, p: pipeline._select_view_cl(m, p))(arrays, poses)
    mem_f_f, mem_b_f = pipeline._histogram_memories(
        pcfg, intr_t, points, poses, jnp.int32(L), bin_crop, bin_cropT, rtab,
        cu, cv, intr.width, intr.height)

    assert np.asarray(mem_f_h).sum() > 100  # meaningful number of collected pixels
    np.testing.assert_allclose(np.asarray(mem_f_f[0]), np.asarray(mem_f_h),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mem_b_f[0]), np.asarray(mem_b_h),
                               rtol=0, atol=1e-3)


def test_stripe_coverage(scene):
    """Lines must land in both 128-wide crop stripes (guards the stripe-select path)."""
    intr, model, pose, frame, arrays, state, pcfg, intr_t = scene
    images = jnp.asarray(frame)[None]
    poses = jnp.asarray(pose)[None]
    bin_crop, bin_cropT, cu, cv = pipeline._prepare_crops(pcfg, intr_t, images, poses)
    cfg = pcfg.cfg
    fu, fv, ppu, ppv = intr_t
    points = jax.vmap(lambda m, p: pipeline._select_view_cl(m, p))(arrays, poses)
    geo = jax.vmap(lambda p, po, u, v: region_fast.line_geometry(
        cfg, 2, p, jnp.int32(cfg.n_lines_max), po, fu, fv, ppu, ppv,
        intr.width, intr.height, u, v, pcfg.crop_size, pcfg.lp)
    )(points, poses, cu, cv)
    s0 = np.asarray(geo.params[0, region_fast._ROW_S0])
    valid = np.asarray(geo.valid[0])
    assert (s0[valid] < 128).any() and (s0[valid] >= 128).any(), \
        "test scene does not exercise both crop stripes"


def test_bin_counts_matches_numpy(rng):
    """Pallas VMEM-blocked one-hot binning == numpy bincount, incl. masking and
    non-multiple-of-128 sample counts."""
    import jax.numpy as jnp

    from m3t_tpu.ops import region_fast

    for n_total, n in ((4096, 6144), (4096, 300), (512, 1000)):
        bins = rng.integers(0, n_total, size=(5, n)).astype(np.int32)
        mask = rng.random((5, n)) > 0.3
        got = np.asarray(region_fast.bin_counts(jnp.asarray(bins),
                                                jnp.asarray(mask), n_total))
        want = np.stack([
            np.bincount(bins[i][mask[i]], minlength=n_total).astype(np.float32)
            for i in range(5)])
        np.testing.assert_array_equal(got, want)
