"""Multi-device / multi-host scale-out utilities (SURVEY.md section 2.4).

The reference's only parallelism is OpenMP threads in one process; the TPU-native scaling
dimensions are instead: independent bodies/sequences data-parallel over the device mesh
("data" axis, ICI within a host, DCN across hosts) and per-body multi-camera fusion with
psum over a "camera" axis (m3t_tpu.pipeline.make_sharded_cycle).  This module provides
mesh construction, sharded placement helpers, and a fully on-device multi-frame scan for
dataset-scale evaluation throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host meshes (DCN).  No-op when single-host
    arguments are absent."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)


def make_mesh(n_data: int | None = None, n_camera: int = 1,
              devices=None) -> Mesh:
    """(data, camera) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_camera
    devices = devices[: n_data * n_camera]
    return Mesh(np.array(devices).reshape(n_data, n_camera), ("data", "camera"))


def shard_over(tree, mesh: Mesh, axis: str = "data"):
    """device_put every leaf sharded along its leading dimension on ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


@functools.partial(jax.jit, static_argnames=("pcfg",), donate_argnums=(4,))
def _scan_frames(pcfg, intr, frames, model, state):
    from m3t_tpu import pipeline

    def step(state, images_t):
        new_state = pipeline.tracking_cycle(pcfg, intr, images_t, model, state)
        return new_state, new_state.body2camera_pose

    final_state, poses = jax.lax.scan(step, state, frames)
    return final_state, poses


def track_sequences_scan(pcfg, intr, frames, model, state, mesh: Mesh | None = None):
    """Track B independent sequences over T frames entirely on device.

    frames: (T, B, H, W, 3) uint8 — the throughput path for dataset-scale evaluation:
    one lax.scan over frames, the batched cycle vmapped over sequences, sequences
    sharded across the mesh "data" axis when a mesh is given.

    Returns (final TrackingState, per-frame poses (T, B, 4, 4)).
    """
    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(None, "data"))
        frames = jax.device_put(frames, batch_sharding)
        model = shard_over(model, mesh, "data")
        state = shard_over(state, mesh, "data")
        with mesh:
            return _scan_frames(pcfg, intr, frames, model, state)
    return _scan_frames(pcfg, intr, frames, model, state)


@functools.partial(jax.jit, static_argnames=("pcfg",), donate_argnums=(8,))
def _scan_frames_rgbd(pcfg, intr, depth_intr, depth_scale, frames, depth_frames,
                      model, depth_model, state):
    from m3t_tpu import pipeline

    def step(state, xs):
        images_t, depth_t = xs
        new_state = pipeline.tracking_cycle_rgbd(
            pcfg, intr, depth_intr, depth_scale, images_t, depth_t, model,
            depth_model, state)
        return new_state, new_state.body2camera_pose

    final_state, poses = jax.lax.scan(step, state, (frames, depth_frames))
    return final_state, poses


def track_sequences_scan_rgbd(pcfg, intr, depth_intr, depth_scale, frames,
                              depth_frames, model, depth_model, state,
                              mesh: Mesh | None = None):
    """RGB-D variant of :func:`track_sequences_scan` (the YCB-Video / ICG class).

    frames: (T, B, H, W, 3) uint8 color, depth_frames: (T, B, Hd, Wd) uint16 —
    one lax.scan over frames through :func:`pipeline.tracking_cycle_rgbd`
    (region + depth fusion with the Pallas window presampling), sequences sharded
    across the mesh "data" axis when a mesh is given.  The on-device analogue of
    the reference's ``#pragma omp parallel for`` over YCB sequences
    (ycb_evaluator.cpp:210).

    Returns (final TrackingState, per-frame poses (T, B, 4, 4)).
    """
    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(None, "data"))
        frames = jax.device_put(frames, batch_sharding)
        depth_frames = jax.device_put(depth_frames, batch_sharding)
        model = shard_over(model, mesh, "data")
        depth_model = shard_over(depth_model, mesh, "data")
        state = shard_over(state, mesh, "data")
        with mesh:
            return _scan_frames_rgbd(pcfg, intr, depth_intr, depth_scale, frames,
                                     depth_frames, model, depth_model, state)
    return _scan_frames_rgbd(pcfg, intr, depth_intr, depth_scale, frames,
                             depth_frames, model, depth_model, state)
