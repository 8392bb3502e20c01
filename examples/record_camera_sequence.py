"""Record a camera sequence to disk (redesign of M3T/examples/record_camera_sequence.cpp).

Usage: python examples/record_camera_sequence.py <output_dir> [--device N] [--n-frames N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

from m3t_tpu.hardware_camera import OpenCVColorCamera  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("output_dir")
    parser.add_argument("--device", type=int, default=0)
    parser.add_argument("--n-frames", type=int, default=300)
    parser.add_argument("--fps", type=float, default=30.0)
    args = parser.parse_args()

    os.makedirs(args.output_dir, exist_ok=True)
    camera = OpenCVColorCamera("color_camera", args.device)
    if not camera.SetUp():
        return 1
    camera.StartSavingImages(args.output_dir)

    # Write a loader metafile so the recording replays directly.
    intr = camera.intrinsics
    with open(os.path.join(args.output_dir, "color_camera.yaml"), "w") as f:
        f.write(f"""%YAML:1.2
load_directory: "."
intrinsics:
  f_u: {intr.fu}
  f_v: {intr.fv}
  pp_x: {intr.ppu}
  pp_y: {intr.ppv}
  width: {intr.width}
  height: {intr.height}
image_name_pre: "color_camera_image_"
load_index: 0
n_leading_zeros: 0
image_name_post: ""
load_image_type: "png"
""")

    period = 1.0 / args.fps
    for i in range(args.n_frames):
        begin = time.monotonic()
        if not camera.UpdateImage(True):
            break
        elapsed = time.monotonic() - begin
        if elapsed < period:
            time.sleep(period - elapsed)
    print(f"Recorded {camera.save_index} frames to {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
