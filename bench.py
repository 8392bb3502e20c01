"""Benchmark: fused batched region-tracking cycle throughput on one chip.

Measures full tracking cycles (5 correspondence iterations x 2 update iterations,
n_lines=200, scales {6,4,2,1}, histogram adaptation included — the reference's default
RBOT-class configuration, tracker.h:79-84 + region_modality.h:411-422) for a batch of
independent bodies on synthetic 640x512 frames.

Prints ONE JSON line: body-frames/s per chip vs the reference's single-core C++ rate
(1.3 ms/frame/object => ~770 fps/object, ICG/readme.md:10).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    sys.path.insert(0, ".")
    from m3t_tpu import pipeline
    from m3t_tpu.ops.region_fn import RegionConfig

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "rgbd" if "--rgbd" in sys.argv else "region"
    n_bodies = int(args[0]) if args else 512
    width, height = 640, 512
    n_lines = 200

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    pcfg = pipeline.PipelineConfig(
        cfg=RegionConfig(n_lines_max=n_lines),
        scales=(6, 4, 2, 1), standard_deviations=(15.0, 5.0, 3.5, 1.5),
        n_corr_iterations=5, n_update_iterations=2,
        use_depth=(mode == "rgbd"),
    )
    intr = (np.float32(520.0), np.float32(520.0),
            np.float32(width / 2 - 0.5), np.float32(height / 2 - 0.5))

    V, L = 42, n_lines
    ang = rng.uniform(0, 2 * np.pi, size=(n_bodies, V, L))
    r = 0.06
    centers = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros_like(ang)], -1)
    normals = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], -1)
    view_dirs = rng.normal(size=(n_bodies, V, 3))
    view_dirs /= np.linalg.norm(view_dirs, axis=-1, keepdims=True)
    model = pipeline.RegionModelArrays(
        orientations=jnp.asarray(view_dirs, jnp.float32),
        centers=jnp.asarray(centers, jnp.float32),
        normals=jnp.asarray(normals, jnp.float32),
        foreground_distances=jnp.full((n_bodies, V, L), 1.0, jnp.float32),
        background_distances=jnp.full((n_bodies, V, L), 1.0, jnp.float32),
        measured_depth_offsets=jnp.zeros((n_bodies, V, L), jnp.float32),
        modeled_depth_offsets=jnp.zeros((n_bodies, V, L), jnp.float32),
    )
    images = jnp.asarray(
        rng.integers(0, 255, size=(n_bodies, height, width, 3)), jnp.uint8)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_bodies, 1, 1))
    poses[:, 2, 3] = 0.6
    nbins = pcfg.cfg.n_histogram_bins ** 3
    state = pipeline.TrackingState(
        body2camera_pose=jnp.asarray(poses),
        histogram_f=jnp.full((n_bodies, nbins), 1.0 / nbins, jnp.float32),
        histogram_b=jnp.full((n_bodies, nbins), 1.0 / nbins, jnp.float32),
    )

    if mode == "rgbd":
        # ICG configuration: 200 depth points, coarse-to-fine considered distances.
        pcfg = pcfg._replace(depth_cfg=pcfg.depth_cfg._replace(n_points_max=200))
        depth_images = jnp.asarray(
            rng.integers(100, 60000, size=(n_bodies, height, width)), jnp.uint16)
        ang_d = rng.uniform(0, 2 * np.pi, size=(n_bodies, V, L))
        centers_d = np.stack(
            [r * np.cos(ang_d), r * np.sin(ang_d), np.zeros_like(ang_d)], -1)
        depth_model = pipeline.DepthModelArrays(
            orientations=model.orientations,
            centers=jnp.asarray(centers_d, jnp.float32),
            normals=jnp.asarray(
                centers_d / np.maximum(np.linalg.norm(centers_d, axis=-1,
                                                      keepdims=True), 1e-6),
                jnp.float32),
            measured_depth_offsets=jnp.zeros((n_bodies, V, L), jnp.float32),
            modeled_depth_offsets=jnp.zeros((n_bodies, V, L), jnp.float32),
        )

        def run_cycle(state):
            return pipeline.tracking_cycle_rgbd(
                pcfg, intr, intr, jnp.float32(0.001), images, depth_images,
                model, depth_model, state)

        label = (f"body-frames/s per chip, region+depth (ICG) cycle "
                 f"(B={n_bodies}, 640x512, 200 lines + 200 points, 5x2 iters)")
    else:
        def run_cycle(state):
            return pipeline.tracking_cycle(pcfg, intr, images, model, state)

        label = (f"body-frames/s per chip, region tracking cycle "
                 f"(B={n_bodies}, 640x512, 200 lines, 5x2 iters)")

    # Warmup / compile.  Force a device->host transfer to synchronize: on the tunneled
    # axon platform block_until_ready alone has been observed to return before the
    # computation finishes, producing dispatch-rate numbers ~1000x too optimistic.
    state = run_cycle(state)
    np.asarray(state.body2camera_pose)
    state = run_cycle(state)
    np.asarray(state.body2camera_pose)

    n_iters = 5
    begin = time.perf_counter()
    for _ in range(n_iters):
        state = run_cycle(state)
    jax.block_until_ready(state)
    np.asarray(state.body2camera_pose)
    elapsed = time.perf_counter() - begin

    cycles_per_s = n_iters / elapsed
    body_frames_per_s = cycles_per_s * n_bodies
    baseline = 770.0  # fps/object, single CPU core (ICG readme abstract)
    print(json.dumps({
        "metric": label,
        "value": round(body_frames_per_s, 1),
        "unit": "body-frames/s",
        "vs_baseline": round(body_frames_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
