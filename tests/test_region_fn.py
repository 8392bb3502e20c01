"""Unit tests for the region-modality kernels against controlled synthetic edges.

A vertical color edge at known subpixel position lets us check that the estimated
distribution mean recovers the true contour displacement without bias, mirroring the
semantics of region_modality.cpp:1433-1658.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from m3t_tpu.ops import region_fn
from m3t_tpu.ops.region_fn import RegionConfig, ViewPoints

FG = np.array([160, 60, 50], np.uint8)
BG = np.array([40, 120, 190], np.uint8)


def _edge_image(width=200, height=120, edge_x=100.3):
    """FG for pixel centers with u <= edge_x, BG otherwise (horizontal gradient edge)."""
    image = np.empty((height, width, 3), np.uint8)
    u = np.arange(width)
    fg_mask = u[None, :] <= edge_x
    image[:] = BG
    image[np.repeat(fg_mask, height, 0)] = FG
    return image


def _perfect_histograms(n_bins=16):
    hist_f = np.zeros(n_bins ** 3, np.float32)
    hist_b = np.zeros(n_bins ** 3, np.float32)

    def idx(c):
        s = 8 - (n_bins.bit_length() - 1)
        return (int(c[0]) >> s) * n_bins * n_bins + (int(c[1]) >> s) * n_bins + (int(c[2]) >> s)

    hist_f[idx(FG)] = 1.0
    hist_b[idx(BG)] = 1.0
    return jnp.asarray(hist_f), jnp.asarray(hist_b)


def _points_at(x_positions, y_positions, z=1.0, normal=(1.0, 0.0, 0.0)):
    n = len(x_positions)
    centers = np.stack([
        np.asarray(x_positions, np.float32) * z,
        np.asarray(y_positions, np.float32) * z,
        np.full(n, z, np.float32),
    ], axis=1)
    normals = np.tile(np.asarray(normal, np.float32), (n, 1))
    return ViewPoints(
        center_f_body=jnp.asarray(centers),
        normal_f_body=jnp.asarray(normals),
        foreground_distance=jnp.full((n,), 10.0, jnp.float32),
        background_distance=jnp.full((n,), 10.0, jnp.float32),
        measured_depth_offset=jnp.zeros((n,), jnp.float32),
        modeled_depth_offset=jnp.zeros((n,), jnp.float32),
    )


def test_disk_radial_unbiased():
    """Radial lines on a rendered disk: the physical contour offset must be unbiased at
    every scale (curvature + diagonal normals + segment quantization all averaged)."""
    W = H = 200
    R, CX, CY = 40.0, 99.7, 100.2
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    inside = (u - CX) ** 2 + (v - CY) ** 2 <= R * R
    image = np.where(inside[..., None], FG, BG).astype(np.uint8)
    hist_f, hist_b = _perfect_histograms()

    L = 64
    ang = np.linspace(0, 2 * np.pi, L, endpoint=False) + 0.013
    nx, ny = np.cos(ang), np.sin(ang)
    centers = np.stack([CX + R * nx, CY + R * ny, np.ones(L)], 1).astype(np.float32)
    normals = np.stack([nx, ny, np.zeros(L)], 1).astype(np.float32)
    points = ViewPoints(jnp.asarray(centers), jnp.asarray(normals),
                        jnp.full((L,), 10.0), jnp.full((L,), 10.0),
                        jnp.zeros((L,)), jnp.zeros((L,)))
    cfg = RegionConfig(n_lines_max=L, min_continuous_distance=0.0)
    for scale in [1, 2, 4]:
        lines = region_fn.calculate_correspondences(
            cfg, scale, points, jnp.int32(L), jnp.eye(4), jnp.asarray(image),
            hist_f, hist_b, 1.0, 1.0, 0.0, 0.0, W, H, jnp.asarray(False))
        valid = np.asarray(lines.valid)
        assert valid.all()
        contour_off = (np.asarray(lines.mean)
                       / np.asarray(lines.normal_component_to_scale)
                       + np.asarray(lines.delta_r))
        bias = contour_off[valid].mean()
        spread = contour_off[valid].std()
        assert abs(bias) < 0.1, f"radial bias {bias} at scale {scale}"
        assert spread < 0.6, f"radial spread {spread} at scale {scale}"


@pytest.mark.parametrize("scale", [1, 2])
def test_mean_recovers_edge_displacement(scale):
    """The distribution mean must track the true edge offset, unbiased, at every scale."""
    cfg = RegionConfig(n_lines_max=16, min_continuous_distance=0.0)
    hist_f, hist_b = _perfect_histograms()
    height, width = 120, 200
    fu = fv = 1.0  # camera with unit focal: pixel coords == camera coords at z=1
    ppu = ppv = 0.0

    # Identity pose; model points projected exactly at given pixel positions.
    pose = jnp.eye(4)

    errors = []
    for edge_x in [99.80, 100.05, 100.30, 100.55]:
        image = _edge_image(width, height, edge_x)
        # Lines whose centers sit at various subpixel offsets near the edge.
        x_positions = np.linspace(edge_x + 0.5 - 0.9, edge_x + 0.5 + 0.9, 16)
        y_positions = np.linspace(30.0, 90.0, 16)
        points = _points_at(x_positions, y_positions)
        lines = region_fn.calculate_correspondences(
            cfg, scale, points, jnp.int32(16), pose, jnp.asarray(image),
            hist_f, hist_b, fu, fv, ppu, ppv, width, height,
            jnp.asarray(False),
        )
        valid = np.asarray(lines.valid)
        assert valid.all(), f"lines invalid at scale {scale}"
        # Estimated contour position along the line (in pixels):
        # delta_cs(at current pose) = (n_u*(proj_u - center_u) - delta_r) * nts = -delta_r*nts
        # estimated displacement to contour = mean (in scaled units) -> contour estimate:
        mean = np.asarray(lines.mean)
        delta_r = np.asarray(lines.delta_r)
        # delta_cs that *should* be measured: the edge transition is at edge_x + 0.5
        # (between last FG pixel center and first BG center when edge_x is fractional).
        true_edge = np.floor(edge_x) + 1.0  # first BG pixel center
        # Position of measured contour = center_u + (mean/nts + delta_r)*n_u
        nts = np.asarray(lines.normal_component_to_scale)
        est_edge = x_positions + (mean / nts + delta_r)
        errors.append(est_edge - (true_edge - 0.5))
    err = np.concatenate(errors)
    # The transition midpoint between FG pixel floor(edge) and BG pixel floor(edge)+1
    # is floor(edge)+0.5; estimator must find it within a fraction of a pixel, no bias.
    assert abs(err.mean()) < 0.2, f"bias {err.mean()} at scale {scale}"
    assert np.abs(err).max() < 0.8, f"max err {np.abs(err).max()} at scale {scale}"


def test_gradient_matches_autodiff():
    """ddelta_cs/dtheta chain rule (cpp:531-542) must match autodiff of delta_cs."""
    import jax

    cfg = RegionConfig(n_lines_max=4, min_continuous_distance=0.0)
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 3)).astype(np.float32) * 0.05
    centers[:, 2] += 0.0
    pose0 = np.eye(4, dtype=np.float32)
    pose0[2, 3] = 0.6
    fu, fv, ppu, ppv = 500.0, 510.0, 320.0, 240.0

    normal_u = np.array([0.8, -0.6, 0.0, 1.0], np.float32)
    normal_v = np.array([0.6, 0.8, 1.0, 0.0], np.float32)
    delta_r = rng.normal(size=4).astype(np.float32) * 0.3
    nts = np.array([0.4, 0.3, 0.5, 0.25], np.float32)
    center_u = rng.uniform(100, 500, 4).astype(np.float32)
    center_v = rng.uniform(100, 380, 4).astype(np.float32)

    def delta_cs_fn(theta):
        from m3t_tpu.common import pose_variation

        pose = jnp.asarray(pose0) @ pose_variation(theta)
        c = jnp.asarray(centers) @ pose[:3, :3].T + pose[:3, 3]
        x, y, z = c[:, 0], c[:, 1], c[:, 2]
        return (jnp.asarray(normal_u) * (x * fu / z + ppu - jnp.asarray(center_u))
                + jnp.asarray(normal_v) * (y * fv / z + ppv - jnp.asarray(center_v))
                - jnp.asarray(delta_r)) * jnp.asarray(nts)

    jac_auto = np.asarray(jax.jacobian(delta_cs_fn)(jnp.zeros(6)))

    # Analytic jacobian used in calculate_gradient_and_hessian:
    pose = pose0
    c = centers @ pose[:3, :3].T + pose[:3, 3]
    x, y, z = c[:, 0], c[:, 1], c[:, 2]
    fu_z, fv_z = fu / z, fv / z
    xfu_z, yfv_z = x * fu_z, y * fv_z
    dcenter = np.stack([
        nts * normal_u * fu_z,
        nts * normal_v * fv_z,
        nts * (-normal_u * xfu_z - normal_v * yfv_z) / z,
    ], axis=1)
    dtrans = dcenter @ pose[:3, :3]
    jac_analytic = np.concatenate([np.cross(centers, dtrans), dtrans], axis=1)

    np.testing.assert_allclose(jac_analytic, jac_auto, rtol=1e-3, atol=1e-5)


def test_histogram_collection_masks_oob():
    """add_line_pixel_colors must not read outside the image and must fill fg/bg."""
    cfg = RegionConfig(n_lines_max=8, min_continuous_distance=0.0)
    width, height = 64, 48
    image = np.empty((height, width, 3), np.uint8)
    image[:, :32] = FG
    image[:, 32:] = BG
    points = _points_at(np.full(8, 31.5), np.linspace(5, 43, 8))
    memory_f = jnp.zeros(16 ** 3, jnp.float32)
    memory_b = jnp.zeros(16 ** 3, jnp.float32)
    memory_f, memory_b = region_fn.add_line_pixel_colors(
        cfg, points, jnp.int32(8), jnp.eye(4), jnp.asarray(image),
        memory_f, memory_b, 1.0, 1.0, 0.0, 0.0, width, height, jnp.asarray(False),
    )
    mf = np.asarray(memory_f)
    mb = np.asarray(memory_b)
    assert mf.sum() > 0 and mb.sum() > 0
    # All fg mass on the FG color bin, all bg mass on the BG color bin.
    assert mf.max() == mf.sum()
    assert mb.max() == mb.sum()
