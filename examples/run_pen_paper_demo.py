"""AR drawing demo with a custom Publisher
(redesign of M3T/examples/run_pen_paper_demo.cpp:11-62, the only Publisher example).

Tracks a "pen" body and draws its projected tip trajectory onto the camera image —
demonstrating the Publisher extension point called at the end of every cycle.

Usage: python examples/run_pen_paper_demo.py <config.yaml> [--tip 0 0 0.1]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from m3t_tpu.publisher import Publisher  # noqa: E402


class DrawingPublisher(Publisher):
    """Projects a body-frame tip point each cycle and accumulates the trajectory."""

    def __init__(self, name: str, body, camera, tip_f_body):
        super().__init__(name)
        self.body = body
        self.camera = camera
        self.tip_f_body = np.asarray(tip_f_body, np.float32)
        self.trajectory: list[tuple[int, int]] = []

    def UpdatePublisher(self, iteration: int) -> bool:  # noqa: N802
        pose = self.camera.world2camera_pose @ self.body.body2world_pose
        tip = pose[:3, :3] @ self.tip_f_body + pose[:3, 3]
        if tip[2] <= 0:
            return True
        intr = self.camera.intrinsics
        u = int(tip[0] * intr.fu / tip[2] + intr.ppu + 0.5)
        v = int(tip[1] * intr.fv / tip[2] + intr.ppv + 0.5)
        if 0 <= u < intr.width and 0 <= v < intr.height:
            self.trajectory.append((u, v))
        self._draw()
        return True

    def _draw(self) -> None:
        try:
            import cv2

            canvas = np.asarray(self.camera.image).copy()
            for i in range(1, len(self.trajectory)):
                cv2.line(canvas, self.trajectory[i - 1], self.trajectory[i],
                         (0, 0, 255), 2)
            cv2.imshow("pen & paper", canvas)
            cv2.waitKey(1)
        except Exception:
            pass  # headless


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--tip", nargs=3, type=float, default=[0.0, 0.0, 0.1])
    parser.add_argument("--max-iterations", type=int, default=None)
    args = parser.parse_args()

    from m3t_tpu.generator import GenerateConfiguredTracker

    tracker = GenerateConfiguredTracker(args.config)
    if not tracker.SetUp():
        return 1
    body = tracker.body_ptrs[0]
    camera = tracker.camera_ptrs[0]
    publisher = DrawingPublisher("drawing_publisher", body, camera, args.tip)
    tracker.AddPublisher(publisher)
    ok = tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                   max_iterations=args.max_iterations)
    print(f"trajectory points: {len(publisher.trajectory)}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
