"""Procedural meshes + synthetic frame rendering (shared by tests and bench.py).

Mirrors the reference test strategy (M3T/test/common_test.h:25-71): tiny bodies plus
replayable synthetic camera frames, so no hardware or dataset is needed.
"""

from __future__ import annotations

import numpy as np

from m3t_tpu.body import Body
from m3t_tpu.common import Intrinsics


def icosphere(n_subdiv: int = 2, radius: float = 0.05):
    """Geodesic sphere mesh (vertices CCW when viewed from outside)."""
    x = 0.525731112119133606
    z = 0.850650808352039932
    verts = np.array(
        [
            [-x, 0, z], [x, 0, z], [-x, 0, -z], [x, 0, -z],
            [0, z, x], [0, z, -x], [0, -z, x], [0, -z, -x],
            [z, x, 0], [-z, x, 0], [z, -x, 0], [-z, -x, 0],
        ],
        np.float64,
    )
    faces = np.array(
        [
            [0, 4, 1], [0, 9, 4], [9, 5, 4], [4, 5, 8], [4, 8, 1],
            [8, 10, 1], [8, 3, 10], [5, 3, 8], [5, 2, 3], [2, 7, 3],
            [7, 10, 3], [7, 6, 10], [7, 11, 6], [11, 0, 6], [0, 1, 6],
            [6, 1, 10], [9, 0, 11], [9, 11, 2], [9, 2, 5], [7, 2, 11],
        ],
        np.int64,
    )
    # The icosahedron face table (same 12-vertex layout the reference uses for geodesic
    # view sampling, m3t/src/model.cpp:412-435) winds inward; flip for outward normals.
    faces = faces[:, ::-1]
    for _ in range(n_subdiv):
        new_faces = []
        verts = list(verts)
        cache: dict[tuple[int, int], int] = {}

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces, np.int64)
        verts = np.asarray(verts, np.float64)
    return (verts * radius).astype(np.float32), faces.astype(np.int32)


def cube(half: float = 0.05):
    """Axis-aligned cube, outward CCW winding."""
    v = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
        np.float32,
    ) * half
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # z = -1 face (outward -z)
            [4, 5, 6], [4, 6, 7],  # z = +1
            [0, 1, 5], [0, 5, 4],  # y = -1
            [2, 3, 7], [2, 7, 6],  # y = +1
            [0, 4, 7], [0, 7, 3],  # x = -1
            [1, 2, 6], [1, 6, 5],  # x = +1
        ],
        np.int32,
    )
    return v, f


def sphere_body(name: str = "sphere", radius: float = 0.05, n_subdiv: int = 2) -> Body:
    verts, tris = icosphere(n_subdiv, radius)
    body = Body(name, vertices=verts, triangles=tris)
    assert body.SetUp()
    return body


def cube_body(name: str = "cube", half: float = 0.05) -> Body:
    verts, tris = cube(half)
    body = Body(name, vertices=verts, triangles=tris)
    assert body.SetUp()
    return body


def render_synthetic_color_frame(
    body: Body, intrinsics: Intrinsics, body2camera_pose: np.ndarray,
    fg_color=(160, 60, 50), bg_color=(40, 120, 190), noise_rng=None,
    shaded: bool = True,
) -> np.ndarray:
    """Rasterize the body with simple Lambertian shading over a bg color (BGR uint8).

    Shading spreads foreground colors over many histogram bins, matching the broad
    histograms of real footage (a flat color produces pathological delta histograms).
    """
    from m3t_tpu.ops.raster import rasterize_np

    tri = body.triangle_vertices_f_body()
    tri_cam = tri @ body2camera_pose[:3, :3].T + body2camera_pose[:3, 3]
    _, id_img, normal = rasterize_np(
        tri_cam, np.full(len(tri), 1), intrinsics.fu, intrinsics.fv,
        intrinsics.ppu, intrinsics.ppv, intrinsics.width, intrinsics.height,
        cull_backfaces=True, with_normals=True,
    )
    image = np.empty((intrinsics.height, intrinsics.width, 3), np.uint8)
    image[:] = np.asarray(bg_color, np.uint8)
    fg = id_img == 1
    if shaded:
        light = np.asarray([0.4, -0.5, -0.77])
        lambert = np.clip(-(normal @ light), 0.0, 1.0)
        shade = (0.55 + 0.45 * lambert)[..., None]
        image[fg] = np.clip(np.asarray(fg_color, np.float64) * shade[fg], 0, 255
                            ).astype(np.uint8)
    else:
        image[fg] = np.asarray(fg_color, np.uint8)
    if noise_rng is not None:
        noise = noise_rng.integers(-8, 9, size=image.shape)
        image = np.clip(image.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return image


def render_synthetic_depth_frame(
    body: Body, intrinsics: Intrinsics, body2camera_pose: np.ndarray,
    depth_scale: float = 0.001, background_depth: float = 2.0,
) -> np.ndarray:
    from m3t_tpu.ops.raster import rasterize_np

    tri = body.triangle_vertices_f_body()
    tri_cam = tri @ body2camera_pose[:3, :3].T + body2camera_pose[:3, 3]
    depth, id_img = rasterize_np(
        tri_cam, np.full(len(tri), 1), intrinsics.fu, intrinsics.fv,
        intrinsics.ppu, intrinsics.ppv, intrinsics.width, intrinsics.height,
        cull_backfaces=True,
    )
    metric = np.where(np.isfinite(depth), depth, background_depth)
    return np.round(metric / depth_scale).astype(np.uint16)
