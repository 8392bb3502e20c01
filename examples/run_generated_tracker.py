"""Run a YAML-configured tracker (redesign of M3T/examples/run_generated_tracker.cpp).

Usage: python examples/run_generated_tracker.py <config.yaml> [--detect] [--track]
       [--max-iterations N]
"""

import argparse
import sys

sys.path.insert(0, ".")

from m3t_tpu.generator import GenerateConfiguredTracker  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--detect", action="store_true", default=True)
    parser.add_argument("--track", action="store_true", default=True)
    parser.add_argument("--max-iterations", type=int, default=None)
    args = parser.parse_args()

    tracker = GenerateConfiguredTracker(args.config)
    if not tracker.SetUp():
        print("Tracker setup failed")
        return 1
    ok = tracker.RunTrackerProcess(
        execute_detection=args.detect, start_tracking=args.track,
        max_iterations=args.max_iterations)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
