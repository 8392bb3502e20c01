"""Tests for the on-device rasterizer against the host scanline implementation."""

import jax.numpy as jnp
import numpy as np

from m3t_tpu.common import Intrinsics
from m3t_tpu.ops import raster
from tests import fixtures


def _camera_setup():
    intr = Intrinsics(fu=120.0, fv=120.0, ppu=63.5, ppv=47.5, width=128, height=96)
    return intr


def test_single_triangle_depth_and_id():
    intr = _camera_setup()
    tri = np.array([[[-0.1, -0.1, 1.0], [0.1, -0.1, 1.0], [0.0, 0.15, 1.0]]], np.float32)
    soup = raster.triangle_coefficients(
        jnp.asarray(tri), jnp.array([5]), intr.fu, intr.fv, intr.ppu, intr.ppv
    )
    depth, id_img = raster.rasterize(soup, intr.width, intr.height, chunk=8)
    depth = np.asarray(depth)
    id_img = np.asarray(id_img)
    # Center pixel is inside the triangle at depth 1.
    assert id_img[48, 64] == 5
    np.testing.assert_allclose(depth[48, 64], 1.0, rtol=1e-5)
    # Far corner is background.
    assert id_img[0, 0] == 0
    assert np.isinf(depth[0, 0])


def test_zbuffer_orders_triangles():
    intr = _camera_setup()
    tri = np.array(
        [
            [[-0.2, -0.2, 2.0], [0.2, -0.2, 2.0], [0.0, 0.3, 2.0]],   # far
            [[-0.05, -0.05, 1.0], [0.05, -0.05, 1.0], [0.0, 0.08, 1.0]],  # near
        ],
        np.float32,
    )
    soup = raster.triangle_coefficients(
        jnp.asarray(tri), jnp.array([1, 2]), intr.fu, intr.fv, intr.ppu, intr.ppv
    )
    depth, id_img = raster.rasterize(soup, intr.width, intr.height, chunk=8)
    assert np.asarray(id_img)[48, 64] == 2
    np.testing.assert_allclose(np.asarray(depth)[48, 64], 1.0, rtol=1e-5)


def test_jax_matches_numpy_rasterizer(rng):
    intr = _camera_setup()
    verts, tris = fixtures.icosphere(1, 0.08)
    pose = fixtures.look_at_pose(0.7)
    tri_cam = verts[tris] @ pose[:3, :3].T + pose[:3, 3]
    ids = np.full(len(tris), 3)

    depth_np, id_np = raster.rasterize_np(
        tri_cam, ids, intr.fu, intr.fv, intr.ppu, intr.ppv, intr.width, intr.height,
        cull_backfaces=True,
    )
    soup = raster.triangle_coefficients(
        jnp.asarray(tri_cam), jnp.asarray(ids), intr.fu, intr.fv, intr.ppu, intr.ppv,
        cull_backfaces=True,
    )
    depth_j, id_j = raster.rasterize(soup, intr.width, intr.height, chunk=16)
    depth_j = np.asarray(depth_j)
    id_j = np.asarray(id_j)

    # Identical coverage except possibly exact-boundary pixels.
    mismatch = (id_np != id_j).sum()
    assert mismatch <= 0.002 * id_np.size, f"{mismatch} mismatching pixels"
    both = (id_np == 3) & (id_j == 3)
    np.testing.assert_allclose(depth_j[both], depth_np[both], rtol=1e-4)


def test_backface_culling_halves_triangles():
    intr = _camera_setup()
    verts, tris = fixtures.cube(0.05)
    pose = fixtures.look_at_pose(0.5)
    tri_cam = verts[tris] @ pose[:3, :3].T + pose[:3, 3]
    soup = raster.triangle_coefficients(
        jnp.asarray(tri_cam), jnp.ones(len(tris), jnp.int32),
        intr.fu, intr.fv, intr.ppu, intr.ppv, cull_backfaces=True,
    )
    # Cube viewed straight-on: only the 2 near-face triangles are front-facing; side
    # faces are edge-on (degenerate projection) and the far face looks away.
    valid = np.asarray(soup.valid)
    assert valid.sum() == 2
    depth, id_img = raster.rasterize(soup, intr.width, intr.height, chunk=8)
    # Depth at center equals distance to the near cube face.
    np.testing.assert_allclose(np.asarray(depth)[48, 64], 0.45, rtol=1e-4)


def test_sphere_depth_profile():
    intr = _camera_setup()
    verts, tris = fixtures.icosphere(3, 0.1)
    pose = fixtures.look_at_pose(1.0)
    tri_cam = verts[tris] @ pose[:3, :3].T + pose[:3, 3]
    soup = raster.triangle_coefficients(
        jnp.asarray(tri_cam), jnp.ones(len(tris), jnp.int32),
        intr.fu, intr.fv, intr.ppu, intr.ppv, cull_backfaces=True,
    )
    depth, id_img = raster.rasterize(soup, intr.width, intr.height, chunk=64)
    d = float(np.asarray(depth)[48, 64])
    # Nearest sphere point is at 0.9; faceted mesh is slightly farther.
    assert 0.9 <= d < 0.905


def test_decimate_mesh_reduces_triangles():
    verts, tris = fixtures.icosphere(3, 0.1)
    dec_v, dec_t = raster.decimate_mesh(verts, tris, 256)
    assert len(dec_t) <= 256
    assert len(dec_t) > 16
    # Decimated mesh stays close to the original surface.
    radii = np.linalg.norm(dec_v, axis=1)
    assert np.all(radii < 0.11)
    assert np.all(radii > 0.05)
