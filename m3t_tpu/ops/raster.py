"""On-device triangle rasterization (replaces the reference's OpenGL renderers).

The reference renders depth/silhouette/normal images through GLFW/GLEW + GLSL shaders
(m3t/src/renderer_geometry.cpp, m3t/src/silhouette_renderer.cpp:11-27).  On TPU we instead
express rasterization as dense linear algebra: every triangle's three edge functions and
its interpolated inverse depth are *linear* in pixel coordinates (u, v), so evaluating all
triangles over all pixels is a matmul ``[HW, 3] @ [3, 4T]`` that maps straight onto the MXU,
followed by masked min-reductions for the z-buffer.  Triangles are processed in chunks with
``lax.scan`` so intermediates stay small enough for fusion/VMEM.

Conventions (matching the reference's sampling):
  * pixel (iu, iv) samples the projected point (u, v) = (iu, iv); the reference rounds
    ``int(u + 0.5)``, i.e. pixel centers sit at integer coordinates.
  * camera frame: x right, y down, z forward; u = x*fu/z + ppu (m3t/src/region_modality.cpp:1069).
  * silhouette ids are uint8 body/region ids, 0 = background (m3t/src/silhouette_renderer.cpp:73-84).
  * background depth = +inf (meters); callers convert if a "0 = far" encoding is needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TriangleSoup(NamedTuple):
    """Static-shape triangle batch for one render setup.

    coeffs: (T, 12) float32 — 3 edge functions (a, b, c each) premultiplied by sign(area),
            then inverse-depth plane (az, bz, cz); all evaluated as a*u + b*v + c.
    valid:  (T,) bool
    ids:    (T,) int32 — body or region id per triangle
    normals:(T, 3) float32 — camera-frame unit normals (for normal rendering)
    bbox:   (T, 4) float32 — projected [u_min, u_max, v_min, v_max] per triangle
            (pixel coords; garbage for invalid triangles), for point-query culling
    """

    coeffs: jax.Array
    valid: jax.Array
    ids: jax.Array
    normals: jax.Array
    bbox: jax.Array


def triangle_coefficients(
    tri_verts_cam: jax.Array,
    ids: jax.Array,
    fu,
    fv,
    ppu,
    ppv,
    cull_backfaces: jax.Array | bool = False,
    z_min: float = 1e-3,
) -> TriangleSoup:
    """Build per-triangle linear coefficients from camera-frame triangle vertices.

    tri_verts_cam: (T, 3, 3); ids: (T,); cull_backfaces: scalar or (T,) bool.
    """
    v = jnp.asarray(tri_verts_cam, jnp.float32)
    z = v[..., 2]
    in_front = jnp.all(z > z_min, axis=-1)
    z_safe = jnp.where(z > z_min, z, 1.0)
    u = v[..., 0] * fu / z_safe + ppu
    vv = v[..., 1] * fv / z_safe + ppv
    inv_z = 1.0 / z_safe

    def edge(pu, pv, qu, qv):
        a = -(qv - pv)
        b = qu - pu
        c = (qv - pv) * pu - (qu - pu) * pv
        return a, b, c

    # edge k runs from vertex k to vertex k+1; edge opposite vertex 0 is edge 1, etc.
    a0, b0, c0 = edge(u[..., 0], vv[..., 0], u[..., 1], vv[..., 1])
    a1, b1, c1 = edge(u[..., 1], vv[..., 1], u[..., 2], vv[..., 2])
    a2, b2, c2 = edge(u[..., 2], vv[..., 2], u[..., 0], vv[..., 0])

    # Signed area = e_edge01 evaluated at vertex 2.
    area = a0 * u[..., 2] + b0 * vv[..., 2] + c0
    front_facing = area < 0.0  # y-down image coords: CCW-outward meshes project clockwise
    cull = jnp.broadcast_to(jnp.asarray(cull_backfaces, bool), area.shape)
    valid = in_front & (jnp.abs(area) > 1e-12) & (front_facing | ~cull)

    sign = jnp.where(area >= 0.0, 1.0, -1.0)
    abs_area = jnp.abs(area)
    safe_area = jnp.where(abs_area > 1e-12, area, 1.0)

    # Inverse depth plane: iz(u,v) = (e1*iz0 + e2*iz1 + e0*iz2) / area.
    az = (a1 * inv_z[..., 0] + a2 * inv_z[..., 1] + a0 * inv_z[..., 2]) / safe_area
    bz = (b1 * inv_z[..., 0] + b2 * inv_z[..., 1] + b0 * inv_z[..., 2]) / safe_area
    cz = (c1 * inv_z[..., 0] + c2 * inv_z[..., 1] + c0 * inv_z[..., 2]) / safe_area

    coeffs = jnp.stack(
        [
            a0 * sign, b0 * sign, c0 * sign,
            a1 * sign, b1 * sign, c1 * sign,
            a2 * sign, b2 * sign, c2 * sign,
            az, bz, cz,
        ],
        axis=-1,
    )

    e01 = v[..., 1, :] - v[..., 0, :]
    e02 = v[..., 2, :] - v[..., 0, :]
    n = jnp.cross(e01, e02)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    bbox = jnp.stack(
        [jnp.min(u, axis=-1), jnp.max(u, axis=-1),
         jnp.min(vv, axis=-1), jnp.max(vv, axis=-1)], axis=-1)

    return TriangleSoup(coeffs, valid, jnp.asarray(ids, jnp.int32), n, bbox)


@functools.partial(jax.jit, static_argnames=("width", "height", "chunk", "with_normals"))
def rasterize(
    soup: TriangleSoup,
    width: int,
    height: int,
    chunk: int = 64,
    with_normals: bool = False,
):
    """Z-buffer rasterization. Returns (depth (H, W) f32 meters with +inf background,
    id_image (H, W) int32 with 0 background[, normal_image (H, W, 3) f32])."""
    n_tri = soup.coeffs.shape[0]
    n_chunks = max(1, -(-n_tri // chunk))
    pad = n_chunks * chunk - n_tri

    coeffs = jnp.pad(soup.coeffs, ((0, pad), (0, 0)))
    valid = jnp.pad(soup.valid, (0, pad))
    ids = jnp.pad(soup.ids, (0, pad))
    normals = jnp.pad(soup.normals, ((0, pad), (0, 0)))

    coeffs = coeffs.reshape(n_chunks, chunk, 12)
    valid = valid.reshape(n_chunks, chunk)
    ids = ids.reshape(n_chunks, chunk)
    normals = normals.reshape(n_chunks, chunk, 3)

    uu = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1).reshape(-1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0).reshape(-1)
    ones = jnp.ones_like(uu)
    pix = jnp.stack([uu, vv, ones], axis=0)  # (3, HW)

    init = (
        jnp.full((height * width,), jnp.inf, jnp.float32),
        jnp.zeros((height * width,), jnp.int32),
        jnp.zeros((height * width, 3), jnp.float32) if with_normals else None,
    )

    def body(state, chunk_data):
        depth, id_img, normal_img = state
        c, val, cid, cnorm = chunk_data
        # (chunk, 4, 3) @ (3, HW) -> (chunk, 4, HW): rows = e0, e1, e2, inv_z.
        planes = jnp.einsum(
            "tkc,cp->tkp", c.reshape(chunk, 4, 3), pix,
            preferred_element_type=jnp.float32,
        )
        inside = (
            (planes[:, 0] >= 0.0) & (planes[:, 1] >= 0.0) & (planes[:, 2] >= 0.0)
            & val[:, None]
        )
        inv_z = planes[:, 3]
        z = jnp.where(inside & (inv_z > 1e-12), 1.0 / jnp.maximum(inv_z, 1e-12), jnp.inf)
        best = jnp.argmin(z, axis=0)  # (HW,)
        best_z = jnp.take_along_axis(z, best[None], axis=0)[0]
        closer = best_z < depth
        new_depth = jnp.where(closer, best_z, depth)
        new_id = jnp.where(closer, cid[best], id_img)
        if normal_img is not None:
            new_norm = jnp.where(closer[:, None], cnorm[best], normal_img)
        else:
            new_norm = None
        return (new_depth, new_id, new_norm), None

    if with_normals:
        (depth, id_img, normal_img), _ = jax.lax.scan(
            body, init, (coeffs, valid, ids, normals)
        )
        return (
            depth.reshape(height, width),
            id_img.reshape(height, width),
            normal_img.reshape(height, width, 3),
        )
    (depth, id_img, _), _ = jax.lax.scan(body, init, (coeffs, valid, ids, normals))
    return depth.reshape(height, width), id_img.reshape(height, width)


# --------------------------------------------------------------------------------------
# Host-side numpy rasterizer (offline model generation & golden tests)
# --------------------------------------------------------------------------------------


def rasterize_np(
    tri_verts_cam: np.ndarray,
    ids: np.ndarray,
    fu: float,
    fv: float,
    ppu: float,
    ppv: float,
    width: int,
    height: int,
    cull_backfaces=False,
    z_min: float = 1e-3,
    with_normals: bool = False,
    use_native: bool = True,
):
    """Scanline/bbox z-buffer rasterizer on host; exact same math as :func:`rasterize`.

    Used for sparse-viewpoint-model generation (reference renders these views with OpenGL,
    m3t/src/region_model.cpp:187-257).  Iterates triangles, touching only bbox pixels, so it
    handles large meshes at image_size=2000 without the dense pixel-triangle product.
    Dispatches to the native C++ implementation (m3t_tpu/native/rasterizer.cpp) when
    available; the numpy path is the exact reference twin used in tests.
    """
    if use_native:
        result = _rasterize_native(tri_verts_cam, ids, fu, fv, ppu, ppv, width,
                                   height, cull_backfaces, z_min, with_normals)
        if result is not None:
            return result
    v = np.asarray(tri_verts_cam, np.float64)
    ids = np.asarray(ids)
    n_tri = v.shape[0]
    cull = np.broadcast_to(np.asarray(cull_backfaces, bool), (n_tri,))

    depth = np.full((height, width), np.inf, np.float32)
    id_img = np.zeros((height, width), np.int32)
    normal_img = np.zeros((height, width, 3), np.float32) if with_normals else None

    z = v[:, :, 2]
    ok = np.all(z > z_min, axis=1)
    u = np.where(ok[:, None], v[:, :, 0] * fu / np.where(z > z_min, z, 1.0) + ppu, 0.0)
    vv = np.where(ok[:, None], v[:, :, 1] * fv / np.where(z > z_min, z, 1.0) + ppv, 0.0)
    inv_z = 1.0 / np.where(z > z_min, z, 1.0)

    if with_normals:
        e01 = v[:, 1] - v[:, 0]
        e02 = v[:, 2] - v[:, 0]
        nrm = np.cross(e01, e02)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)

    for t in range(n_tri):
        if not ok[t]:
            continue
        u0, u1, u2 = u[t]
        v0, v1, v2 = vv[t]
        area = (u1 - u0) * (v2 - v0) - (v1 - v0) * (u2 - u0)
        if abs(area) < 1e-12:
            continue
        if cull[t] and area >= 0.0:  # front faces project clockwise (area < 0)
            continue
        umin = max(int(np.ceil(min(u0, u1, u2))), 0)
        umax = min(int(np.floor(max(u0, u1, u2))), width - 1)
        vmin = max(int(np.ceil(min(v0, v1, v2))), 0)
        vmax = min(int(np.floor(max(v0, v1, v2))), height - 1)
        if umin > umax or vmin > vmax:
            continue
        gu, gv = np.meshgrid(
            np.arange(umin, umax + 1, dtype=np.float64),
            np.arange(vmin, vmax + 1, dtype=np.float64),
        )
        w0 = (u2 - u1) * (gv - v1) - (v2 - v1) * (gu - u1)
        w1 = (u0 - u2) * (gv - v2) - (v0 - v2) * (gu - u2)
        w2 = (u1 - u0) * (gv - v0) - (v1 - v0) * (gu - u0)
        if area > 0:
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        else:
            inside = (w0 <= 0) & (w1 <= 0) & (w2 <= 0)
        if not inside.any():
            continue
        iz = (w0 * inv_z[t, 0] + w1 * inv_z[t, 1] + w2 * inv_z[t, 2]) / area
        zt = np.where(inside & (iz > 1e-12), 1.0 / np.maximum(iz, 1e-12), np.inf)
        sub = depth[vmin : vmax + 1, umin : umax + 1]
        closer = zt < sub
        sub[closer] = zt[closer].astype(np.float32)
        id_img[vmin : vmax + 1, umin : umax + 1][closer] = ids[t]
        if with_normals:
            normal_img[vmin : vmax + 1, umin : umax + 1][closer] = nrm[t]

    if with_normals:
        return depth, id_img, normal_img
    return depth, id_img


def _rasterize_native(tri_verts_cam, ids, fu, fv, ppu, ppv, width, height,
                      cull_backfaces, z_min, with_normals):
    """Dispatch to the ctypes rasterizer; returns None if the library is unavailable."""
    import ctypes

    from m3t_tpu.native import rasterizer_library

    lib = rasterizer_library()
    if lib is None:
        return None
    tri = np.ascontiguousarray(tri_verts_cam, np.float32).reshape(-1, 9)
    n_tri = len(tri)
    ids_arr = np.ascontiguousarray(np.asarray(ids, np.int32))
    culls = np.ascontiguousarray(
        np.broadcast_to(np.asarray(cull_backfaces, bool), (n_tri,)).astype(np.uint8))
    depth = np.full((height, width), np.inf, np.float32)
    id_img = np.zeros((height, width), np.int32)
    normal_img = (np.zeros((height, width, 3), np.float32) if with_normals else None)
    lib.rasterize_soup(
        tri.ctypes.data_as(ctypes.c_void_p), ids_arr.ctypes.data_as(ctypes.c_void_p),
        culls.ctypes.data_as(ctypes.c_void_p), n_tri,
        np.float32(fu), np.float32(fv), np.float32(ppu), np.float32(ppv),
        width, height, np.float32(z_min),
        depth.ctypes.data_as(ctypes.c_void_p), id_img.ctypes.data_as(ctypes.c_void_p),
        normal_img.ctypes.data_as(ctypes.c_void_p) if with_normals else None,
    )
    if with_normals:
        return depth, id_img, normal_img
    return depth, id_img


def decimate_mesh(
    vertices: np.ndarray, triangles: np.ndarray, target_triangles: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vertex-clustering decimation for per-frame occlusion meshes.

    Modeled-occlusion checks only need coarse geometry (thresholds are centimetres,
    m3t/src/region_modality.cpp:1391-1431), so big dataset meshes are clustered onto a
    uniform grid until the triangle count fits the on-device rasterizer budget.
    """
    vertices = np.asarray(vertices, np.float32)
    triangles = np.asarray(triangles, np.int64)
    if len(triangles) <= target_triangles:
        return vertices, triangles.astype(np.int32)

    lo = vertices.min(axis=0)
    hi = vertices.max(axis=0)
    extent = float(np.max(hi - lo)) + 1e-9
    n_cells = 8
    while True:
        cell = extent / n_cells
        keys = np.floor((vertices - lo) / cell).astype(np.int64)
        flat = keys[:, 0] * 73856093 ^ keys[:, 1] * 19349663 ^ keys[:, 2] * 83492791
        uniq, remap = np.unique(flat, return_inverse=True)
        new_tri = remap[triangles]
        good = (
            (new_tri[:, 0] != new_tri[:, 1])
            & (new_tri[:, 1] != new_tri[:, 2])
            & (new_tri[:, 0] != new_tri[:, 2])
        )
        new_tri = new_tri[good]
        if len(new_tri) > target_triangles and n_cells > 2:
            n_cells //= 2
            continue
        # average vertex position per cluster
        new_verts = np.zeros((len(uniq), 3), np.float64)
        counts = np.zeros(len(uniq), np.int64)
        np.add.at(new_verts, remap, vertices)
        np.add.at(counts, remap, 1)
        new_verts /= counts[:, None]
        return new_verts.astype(np.float32), new_tri.astype(np.int32)
