"""Native C++ rasterizer must agree with the numpy reference twin."""

import numpy as np
import pytest

from m3t_tpu.native import rasterizer_library
from m3t_tpu.ops import raster
from tests import fixtures


@pytest.mark.skipif(rasterizer_library() is None, reason="no C++ toolchain")
def test_native_matches_numpy():
    verts, tris = fixtures.icosphere(2, 0.08)
    pose = fixtures.look_at_pose(0.6)
    tri_cam = (verts[tris] @ pose[:3, :3].T + pose[:3, 3]).astype(np.float32)
    ids = np.arange(1, len(tris) + 1)
    kwargs = dict(fu=300.0, fv=310.0, ppu=159.5, ppv=119.5, width=320, height=240,
                  cull_backfaces=True, with_normals=True)
    d_np, i_np, n_np = raster.rasterize_np(tri_cam, ids, use_native=False, **kwargs)
    d_cc, i_cc, n_cc = raster.rasterize_np(tri_cam, ids, use_native=True, **kwargs)

    assert (i_np != i_cc).mean() < 0.001
    both = (i_np > 0) & (i_cc > 0) & (i_np == i_cc)
    np.testing.assert_allclose(d_cc[both], d_np[both], rtol=1e-5)
    np.testing.assert_allclose(n_cc[both], n_np[both], atol=1e-4)


@pytest.mark.skipif(rasterizer_library() is None, reason="no C++ toolchain")
def test_native_is_faster_for_large_meshes():
    import time

    verts, tris = fixtures.icosphere(4, 0.08)  # 5120 triangles
    pose = fixtures.look_at_pose(0.5)
    tri_cam = (verts[tris] @ pose[:3, :3].T + pose[:3, 3]).astype(np.float32)
    ids = np.ones(len(tris), np.int32)
    kwargs = dict(fu=2000.0, fv=2000.0, ppu=999.5, ppv=999.5, width=2000, height=2000,
                  cull_backfaces=True)

    # Warm up: the first native call may pay the one-time g++ build of the .so.
    raster.rasterize_np(tri_cam, ids, use_native=True, **kwargs)

    begin = time.perf_counter()
    raster.rasterize_np(tri_cam, ids, use_native=True, **kwargs)
    native_t = time.perf_counter() - begin
    begin = time.perf_counter()
    raster.rasterize_np(tri_cam, ids, use_native=False, **kwargs)
    numpy_t = time.perf_counter() - begin
    assert native_t < numpy_t, (native_t, numpy_t)
