"""Per-iteration focused scene rendering for the fused TPU pipeline.

The reference hot path re-renders the scene around every tracked body each
correspondence iteration to feed modeled-occlusion and region/silhouette checks
(m3t/src/tracker.cpp:448-451 ``StartRendering`` + ``region_modality.cpp:397-409``).
On the object-graph path this role is played by the Focused*Renderer classes
(m3t_tpu/renderer.py); this module is the batched on-device equivalent: one call
renders a (B, S, S) focused depth + silhouette-id crop for B independent scenes with
the MXU rasterizer (ops/raster.py), entirely inside jit, so ``tracking_cycle`` can
enable occlusion handling without host round-trips.

Body and region silhouette ids are packed into one id image
(``combined = body_id << 8 | region_id``) so a single raster pass serves both the
region modality's region checking (region ids, silhouette_renderer.cpp:73-84) and the
depth modality's body-id silhouette check (depth_modality.cpp:728-734).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3t_tpu.ops import raster

KIMAGE_SIZE_SAFETY_MARGIN = 1.05  # renderer.cpp:352


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class SceneGeometry(NamedTuple):
    """Static per-scene occlusion geometry for a batch of B independent scenes.

    Triangle vertices are stored in each owning body's BODY frame; ``owner`` indexes
    the per-scene pose array handed to :func:`focused_render`, so moving bodies
    (including the tracked body itself) are re-posed every render.  Padding triangles
    carry ``valid == False``.
    """

    triangles: jnp.ndarray     # (B, T, 3, 3) f32 body-frame vertices
    owner: jnp.ndarray         # (B, T) int32 index into scene poses
    sil_id: jnp.ndarray        # (B, T) int32 combined id: body_id << 8 | region_id
    tri_valid: jnp.ndarray     # (B, T) bool
    cull: jnp.ndarray          # (B, T) bool backface culling per triangle
    ref_owner: jnp.ndarray     # (B, NR) int32 referenced bodies (crop computation)
    ref_radius: jnp.ndarray    # (B, NR) f32 bounding-sphere radii
    ref_valid: jnp.ndarray     # (B, NR) bool
    body_id: jnp.ndarray       # (B,) int32 tracked body's body id
    region_id: jnp.ndarray     # (B,) int32 tracked body's region id


class FocusedRender(NamedTuple):
    """Focused depth + silhouette crops for every scene in the batch."""

    depth: jnp.ndarray         # (B, S, S) f32 meters, +inf background
    body_sil: jnp.ndarray      # (B, S, S) int32 body ids
    region_sil: jnp.ndarray    # (B, S, S) int32 region ids
    corner_u: jnp.ndarray      # (B,)
    corner_v: jnp.ndarray      # (B,)
    scale: jnp.ndarray         # (B,)
    body_visible: jnp.ndarray  # (B,) bool (any referenced body visible)


def build_scene_geometry(scenes, referenced=None, max_triangles: int | None = None,
                         decimate_to: int | None = None,
                         tracked=None) -> SceneGeometry:
    """Stack host scenes into a :class:`SceneGeometry`.

    scenes: list (length B) of lists of Body objects; the tracked body (whose
    pose slot is filled from TrackingState each cycle and whose body/region ids
    feed the silhouette checks) is index 0 by default, or ``tracked[i]`` when
    given.  ``referenced`` optionally lists, per scene, the body indices used
    for the crop computation (default: all bodies, matching the reference tests
    which reference occluders too).  ``decimate_to`` clusters each mesh to at
    most that many triangles before upload (renderer_geometry.py keeps decimated
    occlusion meshes for the same reason).
    """
    b = len(scenes)
    tri_list, owner_list, id_list, cull_list = [], [], [], []
    for scene in scenes:
        tris, owners, ids, culls = [], [], [], []
        for o, body in enumerate(scene):
            g2b = body.geometry2body_pose
            v = body.vertices @ g2b[:3, :3].T + g2b[:3, 3]
            t = body.triangles
            if decimate_to is not None:
                v, t = raster.decimate_mesh(v, t, decimate_to)
            tv = v[t]  # (t, 3, 3)
            tris.append(np.asarray(tv, np.float32))
            owners.append(np.full(len(tv), o, np.int32))
            ids.append(np.full(len(tv),
                               (int(body.body_id) << 8) | int(body.region_id),
                               np.int32))
            culls.append(np.full(len(tv), bool(body.geometry_enable_culling), bool))
        tri_list.append(np.concatenate(tris))
        owner_list.append(np.concatenate(owners))
        id_list.append(np.concatenate(ids))
        cull_list.append(np.concatenate(culls))

    t_max = max(len(t) for t in tri_list)
    if max_triangles is not None:
        t_max = max(t_max, max_triangles)

    def pad(a, fill=0):
        out = np.full((t_max,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    triangles = np.stack([pad(t) for t in tri_list])
    owner = np.stack([pad(o) for o in owner_list])
    sil_id = np.stack([pad(i) for i in id_list])
    cull = np.stack([pad(c) for c in cull_list])
    tri_valid = np.stack([
        np.arange(t_max) < len(t) for t in tri_list])

    nr_max = max(len(referenced[i]) if referenced is not None else len(scenes[i])
                 for i in range(b))
    ref_owner = np.zeros((b, nr_max), np.int32)
    ref_radius = np.zeros((b, nr_max), np.float32)
    ref_valid = np.zeros((b, nr_max), bool)
    for i, scene in enumerate(scenes):
        refs = referenced[i] if referenced is not None else list(range(len(scene)))
        for j, o in enumerate(refs):
            ref_owner[i, j] = o
            ref_radius[i, j] = 0.5 * float(scene[o].maximum_body_diameter)
            ref_valid[i, j] = True

    if tracked is None:
        tracked = [0] * b
    body_id = np.asarray([int(s[tracked[i]].body_id)
                          for i, s in enumerate(scenes)], np.int32)
    region_id = np.asarray([int(s[tracked[i]].region_id)
                            for i, s in enumerate(scenes)], np.int32)
    return SceneGeometry(
        triangles=jnp.asarray(triangles), owner=jnp.asarray(owner),
        sil_id=jnp.asarray(sil_id), tri_valid=jnp.asarray(tri_valid),
        cull=jnp.asarray(cull),
        ref_owner=jnp.asarray(ref_owner), ref_radius=jnp.asarray(ref_radius),
        ref_valid=jnp.asarray(ref_valid), body_id=jnp.asarray(body_id),
        region_id=jnp.asarray(region_id))


def build_kinematic_scene_geometry(structures, extras=None, referenced=None,
                                   max_triangles: int | None = None,
                                   decimate_to: int | None = None) -> SceneGeometry:
    """Per-link scenes for the fused kinematic cycles.

    structures: list (length S) of lists of NL link bodies (link-major order
    matching pipeline.KinematicTrackingState).  Builds S*NL scenes — scene
    s*NL + l tracks link l — whose pose slots 0..NL-1 are the structure's links
    (so the links occlude EACH OTHER, the dominant occlusion source in
    articulated scenes, tracker.cpp:448-451 + Mb-ICG) and slots NL.. are shared
    extra occluder bodies posed via ``extra_occluder_poses``.
    """
    extras = list(extras or [])
    scenes, tracked = [], []
    for links in structures:
        for l in range(len(links)):
            scenes.append(list(links) + extras)
            tracked.append(l)
    return build_scene_geometry(scenes, referenced=referenced,
                                max_triangles=max_triangles,
                                decimate_to=decimate_to, tracked=tracked)


def _crop_params(ref_centers, ref_radius, ref_valid, fu, fv, ppu, ppv,
                 width: int, height: int, image_size: int,
                 z_min: float, z_max: float):
    """Vectorized FocusedRenderer::CalculateProjection (renderer.cpp:348-406)."""
    x, y, z = ref_centers[:, 0], ref_centers[:, 1], ref_centers[:, 2]
    r = ref_radius
    z_safe = jnp.where(z > 0, z, 1.0)
    cond = (z >= r * 1.5) & (z - r >= z_min) & (z + r <= z_max) & ref_valid
    z2_r2 = jnp.maximum(z_safe * z_safe - r * r, 1e-12)
    z3_zr2 = z2_r2 * z_safe
    r_u = fu * (jnp.abs(x) * r * r + r * z_safe * jnp.sqrt(z2_r2 + x * x)) / z3_zr2
    r_v = fv * (jnp.abs(y) * r * r + r * z_safe * jnp.sqrt(z2_r2 + y * y)) / z3_zr2
    cu = x * fu / z_safe + ppu
    cv = y * fv / z_safe + ppv
    on_image = ~((cu - r_u > width) | (cu + r_u < 0)
                 | (cv - r_v > height) | (cv + r_v < 0))
    vis = cond & on_image
    big = jnp.float32(1e30)
    u_min = jnp.min(jnp.where(vis, cu - r_u, big))
    u_max = jnp.max(jnp.where(vis, cu + r_u, -big))
    v_min = jnp.min(jnp.where(vis, cv - r_v, big))
    v_max = jnp.max(jnp.where(vis, cv + r_v, -big))
    visible = jnp.any(vis)
    d = jnp.maximum(u_max - u_min, v_max - v_min) * KIMAGE_SIZE_SAFETY_MARGIN
    d = jnp.where(visible & (d > 0), d, jnp.float32(image_size))
    corner_u = jnp.where(visible, 0.5 * (u_min + u_max - d), 0.0)
    corner_v = jnp.where(visible, 0.5 * (v_min + v_max - d), 0.0)
    scale = jnp.where(visible, jnp.float32(image_size) / d, 1.0)
    return corner_u, corner_v, scale, visible


class SceneCoeffs(NamedTuple):
    """Per-scene focused triangle coefficients for POINT-QUERY occlusion checks.

    The validity checks consume only ~50 pixels per correspondence line (a 6x6
    depth neighbourhood, region_modality.cpp:1391-1431, and 2x6 silhouette strides,
    cpp:1293-1341), so materializing full (S, S) focused images is wasted work on
    TPU — the batched z-buffer rasterization of :func:`focused_render` costs ~1000x
    more than the samples it feeds.  Instead this carries the same per-triangle
    linear coefficients the rasterizer uses (ops/raster.py triangle_coefficients in
    focused-crop pixel space) and :func:`query_depth` / :func:`query_depth_id`
    evaluate depth/silhouette at exactly the queried pixels: identical math,
    identical results, no (S, S) images.
    """

    coeffs: jnp.ndarray        # (B, T, 12) f32 edge + inverse-depth planes
    tri_valid: jnp.ndarray     # (B, T) bool
    sil_id: jnp.ndarray        # (B, T) int32 combined id: body_id << 8 | region_id
    bbox: jnp.ndarray          # (B, T, 4) f32 focused-space [u0, u1, v0, v1]
    corner_u: jnp.ndarray      # (B,)
    corner_v: jnp.ndarray      # (B,)
    scale: jnp.ndarray         # (B,)
    body_visible: jnp.ndarray  # (B,) bool


def focused_scene_coeffs(geom: SceneGeometry, scene_poses, intr, width: int,
                         height: int, image_size: int = 200, z_min: float = 0.02,
                         z_max: float = 10.0) -> SceneCoeffs:
    """Crop parameters + focused-space triangle coefficients, no rasterization.

    Same crop math as :func:`focused_render` (renderer.cpp:348-406); the returned
    coefficients evaluate in focused-crop pixel coordinates.  Triangles are
    front-compacted by validity (backface-culled / degenerate / behind-camera
    triangles move to the tail) so the point-query kernel's dynamic loop bound
    skips them — the pose-dependent equivalent of the reference only rasterizing
    front faces (glEnable(GL_CULL_FACE), renderer_geometry.cpp).
    """
    fu, fv, ppu, ppv = intr

    def one(tri, owner, sil, tri_valid, cull, ref_owner, ref_radius, ref_valid,
            poses):
        pose_t = poses[owner]                       # (T, 4, 4)
        v_cam = jnp.einsum("tij,tkj->tki", pose_t[:, :3, :3], tri) \
            + pose_t[:, None, :3, 3]
        ref_centers = poses[ref_owner][:, :3, 3]
        corner_u, corner_v, scale, visible = _crop_params(
            ref_centers, ref_radius, ref_valid, fu, fv, ppu, ppv,
            width, height, image_size, z_min, z_max)
        soup = raster.triangle_coefficients(
            v_cam, sil, fu * scale, fv * scale,
            (ppu - corner_u) * scale, (ppv - corner_v) * scale,
            cull_backfaces=cull, z_min=z_min)
        valid = soup.valid & tri_valid
        order = jnp.argsort(~valid, stable=True)    # valid triangles first
        return (soup.coeffs[order], valid[order], sil[order], soup.bbox[order],
                corner_u, corner_v, scale, visible)

    coeffs, valid, sil_id, bbox, corner_u, corner_v, scale, visible = jax.vmap(one)(
        geom.triangles, geom.owner, geom.sil_id, geom.tri_valid, geom.cull,
        geom.ref_owner, geom.ref_radius, geom.ref_valid, scene_poses)
    return SceneCoeffs(coeffs=coeffs, tri_valid=valid, sil_id=sil_id, bbox=bbox,
                       corner_u=corner_u, corner_v=corner_v, scale=scale,
                       body_visible=visible)


def _pq_kernel(nvalid_ref, coeffs_ref, sil_ref, u_ref, v_ref, inv_ref, id_ref,
               *, n_tri: int):
    """Pallas point-query kernel: per query pixel, max inverse depth + its id.

    coeffs_ref (Tp, 12) f32 in SMEM (invalid triangles pre-zeroed), sil_ref
    (Tp, 1) i32 in SMEM, nvalid_ref (1, 1) i32 in SMEM (dynamic loop bound),
    u/v/inv (QS, 128) f32, id (QS, 128) i32.  The triangle loop runs with the
    coefficients as scalars against full query tiles, so the only live tensors
    are the (QS, 128) accumulators — the (queries x triangles) product never
    exists, unlike the XLA broadcast formulation which materializes it in HBM
    at large batch sizes.  The loop processes 4 triangles per step on two
    independent accumulator chains (merged at the end) so the scalar loads and
    the select chains pipeline.  The loop bound is the caller-provided count of
    leading valid triangles (:func:`focused_scene_coeffs` front-compacts, so
    backface/degenerate triangles cost nothing); triangles past the bound and
    the zero-padded tail of the last step contribute nothing anyway, making
    any over-estimate safe.
    """
    u = u_ref[...]
    v = v_ref[...]

    def eval_one(t, best, bid):
        e0 = coeffs_ref[t, 0] * u + coeffs_ref[t, 1] * v + coeffs_ref[t, 2]
        e1 = coeffs_ref[t, 3] * u + coeffs_ref[t, 4] * v + coeffs_ref[t, 5]
        e2 = coeffs_ref[t, 6] * u + coeffs_ref[t, 7] * v + coeffs_ref[t, 8]
        inv = coeffs_ref[t, 9] * u + coeffs_ref[t, 10] * v + coeffs_ref[t, 11]
        m = jnp.minimum(jnp.minimum(e0, e1), e2)
        s = jnp.where((m >= 0.0) & (inv > 1e-12), inv, 0.0)
        sel = s > best
        return jnp.where(sel, s, best), jnp.where(sel, sil_ref[t, 0], bid)

    def step(i, carry):
        b0, i0, b1, i1 = carry
        t = i * 4
        b0, i0 = eval_one(t, b0, i0)
        b1, i1 = eval_one(t + 1, b1, i1)
        b0, i0 = eval_one(t + 2, b0, i0)
        b1, i1 = eval_one(t + 3, b1, i1)
        return b0, i0, b1, i1

    n = jnp.minimum(nvalid_ref[0, 0], n_tri)
    zf = jnp.zeros(u.shape, jnp.float32)
    zi = jnp.zeros(u.shape, jnp.int32)
    b0, i0, b1, i1 = jax.lax.fori_loop(0, (n + 3) // 4, step, (zf, zi, zf, zi))
    sel = b1 > b0
    inv_ref[...] = jnp.where(sel, b1, b0)
    id_ref[...] = jnp.where(sel, i1, i0)


@functools.partial(jax.jit, static_argnames=())
def _query_eval(coeffs, tri_valid, sil_id, u, v):
    """Evaluate (max inverse depth, closest id) at query pixels via Pallas.

    coeffs (T, 12), tri_valid (T,), sil_id (T,); u/v any common shape.
    Returns (inv_best, id) with u's shape; inv_best == 0 / id == 0 where no
    triangle covers the pixel.
    """
    shape = u.shape
    q = int(np.prod(shape)) if shape else 1
    qs = _round_up(max(q, 1), 8 * 128) // 128
    uf = jnp.full((qs * 128,), -1e9, jnp.float32).at[:q].set(
        jnp.asarray(u, jnp.float32).reshape(-1)).reshape(qs, 128)
    vf = jnp.full((qs * 128,), -1e9, jnp.float32).at[:q].set(
        jnp.asarray(v, jnp.float32).reshape(-1)).reshape(qs, 128)
    n_tri = coeffs.shape[0]
    tp = _round_up(n_tri, 4)
    cz = jnp.where(tri_valid[:, None], coeffs, 0.0)
    cz = jnp.pad(cz, ((0, tp - n_tri), (0, 0)))
    sil = jnp.pad(jnp.asarray(sil_id, jnp.int32), (0, tp - n_tri))[:, None]
    # Dynamic loop bound: (last valid index + 1).  Equals the valid count for
    # front-compacted inputs (focused_scene_coeffs); a safe over-estimate for
    # arbitrary masks since invalid coefficients are zeroed.
    last = n_tri - 1 - jnp.argmax(tri_valid[::-1].astype(jnp.int32))
    nvalid = jnp.where(jnp.any(tri_valid), last + 1, 0).astype(jnp.int32)

    inv_best, idq = pl.pallas_call(
        functools.partial(_pq_kernel, n_tri=n_tri),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((qs, 128), jnp.float32),
                   jax.ShapeDtypeStruct((qs, 128), jnp.int32)],
        interpret=_use_interpret(),
    )(nvalid.reshape(1, 1), cz, sil, uf, vf)
    return (inv_best.reshape(-1)[:q].reshape(shape),
            idq.reshape(-1)[:q].reshape(shape))


def _query_planes(coeffs, tri_valid, u, v):
    """Evaluate all triangles' edge/inv-depth planes at focused pixels (u, v).

    coeffs (T, 12), u/v (...,) float32.  Returns (inside (..., T), inv_z (..., T)).
    """
    c = coeffs.reshape(-1, 4, 3)                       # (T, 4, 3)
    a, b, cc = c[..., 0], c[..., 1], c[..., 2]         # (T, 4)
    uu = u[..., None, None]
    vv = v[..., None, None]
    vals = a * uu + b * vv + cc                        # (..., T, 4)
    inside = (vals[..., 0] >= 0.0) & (vals[..., 1] >= 0.0) \
        & (vals[..., 2] >= 0.0) & tri_valid
    return inside, vals[..., 3]


def query_inv_depth(coeffs, tri_valid, u, v):
    """Max inverse depth over covering triangles at focused pixels; 0 = no hit.

    The hot-path form: ``min z == 1 / max inv_z`` for positive depths, so callers
    that only need a depth *comparison* or a min over several samples reduce in
    inverse-depth space and divide once per line after the reduction.  Runs as
    the Pallas kernel (:func:`_query_eval`); :func:`query_inv_depth_xla` is the
    plain-XLA twin used for cross-checking.
    """
    inv_best, _ = _query_eval(coeffs, tri_valid,
                              jnp.zeros(coeffs.shape[0], jnp.int32), u, v)
    return inv_best


def query_inv_depth_xla(coeffs, tri_valid, u, v):
    """Reference XLA formulation of :func:`query_inv_depth` (test cross-check)."""
    inside, inv_z = _query_planes(coeffs, tri_valid, jnp.asarray(u, jnp.float32),
                                  jnp.asarray(v, jnp.float32))
    return jnp.max(jnp.where(inside & (inv_z > 1e-12), inv_z, 0.0), axis=-1)


def inv_to_depth(inv_best):
    """Convert a reduced max-inverse-depth to meters (+inf where no hit)."""
    return jnp.where(inv_best > 0.0, 1.0 / jnp.maximum(inv_best, 1e-12), jnp.inf)


def query_depth(coeffs, tri_valid, u, v):
    """Depth at focused pixels (u, v): min over covering triangles, +inf if none.

    Exact point-query twin of ``rasterize(...).depth[v, u]`` (same planes, same
    inside test, same interpolated depth) — used by the modeled-occlusion checks.
    """
    return inv_to_depth(query_inv_depth(coeffs, tri_valid, u, v))


def query_id(coeffs, tri_valid, sil_id, u, v):
    """Combined silhouette id of the closest covering triangle; 0 = background.

    Division-free: the closest triangle is the argmax of inverse depth, so the
    silhouette checks never build a depth tensor at all (Pallas kernel).
    """
    _, idq = _query_eval(coeffs, tri_valid, sil_id, u, v)
    return idq


def query_depth_id(coeffs, tri_valid, sil_id, u, v):
    """(depth, combined silhouette id) at focused pixels; id 0 = background."""
    return (query_depth(coeffs, tri_valid, u, v),
            query_id(coeffs, tri_valid, sil_id, u, v))


def focused_render(geom: SceneGeometry, scene_poses, intr, width: int, height: int,
                   image_size: int = 200, z_min: float = 0.02, z_max: float = 10.0,
                   chunk: int = 64) -> FocusedRender:
    """Render focused depth + silhouette crops for every scene in the batch.

    scene_poses: (B, NO, 4, 4) body-to-camera poses per scene body (slot 0 = the
    tracked body).  Fully jittable; vmapped over the batch.
    """
    fu, fv, ppu, ppv = intr

    def one(tri, owner, sil, tri_valid, cull, ref_owner, ref_radius, ref_valid,
            poses):
        pose_t = poses[owner]                       # (T, 4, 4)
        v_cam = jnp.einsum("tij,tkj->tki", pose_t[:, :3, :3], tri) \
            + pose_t[:, None, :3, 3]
        ref_centers = poses[ref_owner][:, :3, 3]
        corner_u, corner_v, scale, visible = _crop_params(
            ref_centers, ref_radius, ref_valid, fu, fv, ppu, ppv,
            width, height, image_size, z_min, z_max)
        soup = raster.triangle_coefficients(
            v_cam, sil, fu * scale, fv * scale,
            (ppu - corner_u) * scale, (ppv - corner_v) * scale,
            cull_backfaces=cull, z_min=z_min)
        soup = soup._replace(valid=soup.valid & tri_valid)
        depth, id_img = raster.rasterize(soup, image_size, image_size, chunk=chunk)
        depth = jnp.where(visible, depth, jnp.inf)
        id_img = jnp.where(visible, id_img, 0)
        return depth, id_img, corner_u, corner_v, scale, visible

    depth, id_img, corner_u, corner_v, scale, visible = jax.vmap(one)(
        geom.triangles, geom.owner, geom.sil_id, geom.tri_valid, geom.cull,
        geom.ref_owner, geom.ref_radius, geom.ref_valid, scene_poses)
    return FocusedRender(
        depth=depth, body_sil=id_img >> 8, region_sil=id_img & 255,
        corner_u=corner_u, corner_v=corner_v, scale=scale, body_visible=visible)
