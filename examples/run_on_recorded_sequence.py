"""Track a body over a recorded color sequence
(redesign of M3T/examples/run_on_recorded_sequence.cpp).

Usage: python examples/run_on_recorded_sequence.py <sequence_dir> <body.obj>
       <body2world_pose.yaml> <external_dir> [--n-frames N]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from m3t_tpu.body import Body  # noqa: E402
from m3t_tpu.camera import LoaderColorCamera  # noqa: E402
from m3t_tpu.common import Intrinsics  # noqa: E402
from m3t_tpu.detector import StaticDetector  # noqa: E402
from m3t_tpu.link import Link  # noqa: E402
from m3t_tpu.optimizer import Optimizer  # noqa: E402
from m3t_tpu.region_modality import RegionModality  # noqa: E402
from m3t_tpu.region_model import RegionModel  # noqa: E402
from m3t_tpu.renderer_geometry import RendererGeometry  # noqa: E402
from m3t_tpu.tracker import Tracker  # noqa: E402
from m3t_tpu.utils import yaml_io  # noqa: E402
from m3t_tpu.viewer import NormalColorViewer  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("sequence_dir")
    parser.add_argument("geometry_path")
    parser.add_argument("detector_metafile")
    parser.add_argument("external_dir")
    parser.add_argument("--camera-metafile", default=None)
    parser.add_argument("--n-frames", type=int, default=None)
    parser.add_argument("--viewer", action="store_true")
    parser.add_argument("--host-path", action="store_true",
                        help="force the per-modality object-graph loop")
    parser.add_argument("--n-divides", type=int, default=4,
                        help="sparse viewpoint model subdivisions (model.h:161)")
    parser.add_argument("--n-points", type=int, default=200)
    parser.add_argument("--model-image-size", type=int, default=2000)
    args = parser.parse_args()

    if args.camera_metafile:
        camera = LoaderColorCamera("camera", metafile_path=args.camera_metafile)
    else:
        camera = LoaderColorCamera(
            "camera", load_directory=args.sequence_dir,
            intrinsics=Intrinsics(615.0, 615.0, 320.0, 240.0, 640, 480),
            image_name_pre="color_camera_image_")
    body = Body("body", geometry_path=args.geometry_path,
                geometry_unit_in_meter=1.0)

    model = RegionModel("body_region_model", body,
                        f"{args.external_dir}/body_region_model.npz",
                        n_divides=args.n_divides, n_points=args.n_points,
                        image_size=args.model_image_size)
    modality = RegionModality("body_region_modality", body, camera, model)
    link = Link("body_link", body)
    link.AddModality(modality)
    optimizer = Optimizer("body_optimizer", link)
    detector = StaticDetector("body_detector", optimizer,
                              metafile_path=args.detector_metafile)

    # Serve through the fused TPU cycle by default (m3t_tpu/fused_serve.py);
    # --host-path forces the per-modality object-graph loop.
    tracker = Tracker("tracker", use_fused_cycle=not args.host_path)
    tracker.AddOptimizer(optimizer)
    tracker.AddDetector(detector)
    if args.viewer:
        rg = RendererGeometry("rg")
        rg.AddBody(body)
        tracker.AddViewer(NormalColorViewer("viewer", camera, rg))
    if not tracker.SetUp():
        return 1
    ok = tracker.RunTrackerProcess(execute_detection=True, start_tracking=True,
                                   max_iterations=args.n_frames)
    print("final body2world_pose:\n", np.asarray(body.body2world_pose))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
