"""Live tracking from a camera (redesign of M3T/examples/run_on_camera_sequence.cpp).

Uses an attached Azure Kinect / RealSense / generic webcam. Keyboard control in the
viewer window mirrors the reference (d = detect, x = detect+track, t = track, s = stop,
q = quit — tracker.cpp:378-389).

Usage: python examples/run_on_camera_sequence.py <body.obj> <detector.yaml>
       <external_dir> [--backend opencv|kinect|realsense]
"""

import argparse
import sys

sys.path.insert(0, ".")

from m3t_tpu.body import Body  # noqa: E402
from m3t_tpu.detector import ManualDetector  # noqa: E402
from m3t_tpu.link import Link  # noqa: E402
from m3t_tpu.optimizer import Optimizer  # noqa: E402
from m3t_tpu.region_modality import RegionModality  # noqa: E402
from m3t_tpu.region_model import RegionModel  # noqa: E402
from m3t_tpu.renderer_geometry import RendererGeometry  # noqa: E402
from m3t_tpu.tracker import Tracker  # noqa: E402
from m3t_tpu.viewer import NormalColorViewer  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("geometry_path")
    parser.add_argument("detector_metafile")
    parser.add_argument("external_dir")
    parser.add_argument("--backend", default="opencv",
                        choices=["opencv", "kinect", "realsense"])
    parser.add_argument("--unit", type=float, default=1.0)
    args = parser.parse_args()

    if args.backend == "kinect":
        from m3t_tpu.hardware_camera import AzureKinectColorCamera

        camera = AzureKinectColorCamera("camera")
    elif args.backend == "realsense":
        from m3t_tpu.hardware_camera import RealSenseColorCamera

        camera = RealSenseColorCamera("camera")
    else:
        from m3t_tpu.hardware_camera import OpenCVColorCamera

        camera = OpenCVColorCamera("camera")

    body = Body("body", geometry_path=args.geometry_path,
                geometry_unit_in_meter=args.unit)
    model = RegionModel("body_region_model", body,
                        f"{args.external_dir}/body_region_model.npz")
    modality = RegionModality("body_region_modality", body, camera, model)
    link = Link("body_link", body)
    link.AddModality(modality)
    optimizer = Optimizer("body_optimizer", link)
    detector = ManualDetector("body_detector", optimizer, camera,
                              metafile_path=args.detector_metafile)
    rg = RendererGeometry("renderer_geometry")
    rg.AddBody(body)
    viewer = NormalColorViewer("viewer", camera, rg)

    # Serve through the fused TPU cycle when the graph is expressible
    # (m3t_tpu/fused_serve.py); the 33 ms budget check stays in the tracker.
    tracker = Tracker("tracker", use_fused_cycle=True)
    tracker.AddOptimizer(optimizer)
    tracker.AddDetector(detector)
    tracker.AddViewer(viewer)
    if not tracker.SetUp():
        return 1
    return 0 if tracker.RunTrackerProcess(execute_detection=True,
                                          start_tracking=True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
