"""Multi-host (DCN) dry run: N jax.distributed processes tracking sharded sequences.

The reference has no distributed backend (one process, OpenMP threads); the TPU-native
scale-out story is dataset-level data parallelism over hosts (SURVEY.md section 2.4).
This script is the multi-host analogue of __graft_entry__.dryrun_multichip: every
process initializes jax.distributed (DCN-style coordinator), the processes form one
global (data,) mesh over all their devices, and ``parallel.track_sequences_scan`` runs
the fused tracking cycle over sequences sharded across hosts.  Process 0 writes the
resulting trajectories to ``--out`` so a driver (tests/test_multihost.py) can check
they match a single-host run bit-for-bit-ish.

Usage (per process):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=K \
    python tools/multihost_dryrun.py --coordinator 127.0.0.1:PORT \
      --num-processes N --process-id I --out OUT.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_inputs(n_bodies: int, n_frames: int = 2):
    """Deterministic tiny tracking problem shared by every process."""
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__

    pcfg, intr, images, model, state = __graft_entry__._tiny_problem(
        n_bodies=n_bodies)
    rng = np.random.default_rng(42)
    h, w = images.shape[1], images.shape[2]
    frames = jnp.asarray(
        rng.integers(0, 255, size=(n_frames, n_bodies, h, w, 3)), jnp.uint8)
    return pcfg, intr, frames, model, state


def run(coordinator: str | None, num_processes: int, process_id: int,
        n_bodies: int, out: str | None) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from m3t_tpu.parallel import sharding as parallel

    parallel.initialize_distributed(coordinator, num_processes, process_id)

    import jax.numpy as jnp  # noqa: F401
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    pcfg, intr, frames, model, state = tiny_inputs(n_bodies)
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

    def make_global(a, spec):
        sharding = NamedSharding(mesh, spec)
        a_np = np.asarray(a)
        return jax.make_array_from_callback(a_np.shape, sharding,
                                            lambda idx: a_np[idx])

    frames = make_global(frames, P(None, "data"))
    model = jax.tree_util.tree_map(lambda a: make_global(a, P("data")), model)
    state = jax.tree_util.tree_map(lambda a: make_global(a, P("data")), state)

    with mesh:
        final_state, poses = parallel._scan_frames(pcfg, intr, frames, model, state)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        poses_np = np.asarray(multihost_utils.process_allgather(poses, tiled=True))
    else:
        poses_np = np.asarray(poses)
    poses_np = poses_np.reshape(-1, n_bodies, 4, 4)

    print(f"process {process_id}/{num_processes}: {jax.process_count()} processes, "
          f"{jax.device_count()} global devices, tracked {n_bodies} sequences, "
          f"poses {poses_np.shape}", flush=True)
    if out and process_id == 0:
        np.savez(out, poses=poses_np)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--n-bodies", type=int, default=8)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    run(args.coordinator, args.num_processes, args.process_id, args.n_bodies,
        args.out)


if __name__ == "__main__":
    main()
