"""Dataset ground-truth converters
(redesign of M3T/examples/dataset_converter/*.m, in Python instead of MATLAB).

Converts YCB-Video and Choi ground-truth formats into the quaternion pose-file layout the
evaluators consume (`<seq>_<body>.txt` lines of "qw qx qy qz tx ty tz").

Usage:
  python examples/dataset_converter.py ycb <ycb_dataset_dir> <output_dir> --seq 48 59
  python examples/dataset_converter.py choi <choi_dir> <output_dir>
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def convert_ycb(dataset_dir: str, output_dir: str, first_seq: int, last_seq: int) -> int:
    """Reads <seq>/<frame>-meta.mat files (scipy.io) and writes per-(seq, body) gt files
    for keyframes listed in image_sets/keyframe.txt."""
    import scipy.io
    from scipy.spatial.transform import Rotation

    keyframes: dict[int, list[int]] = {}
    with open(os.path.join(dataset_dir, "image_sets", "keyframe.txt")) as f:
        for line in f:
            seq_s, frame_s = line.strip().split("/")
            keyframes.setdefault(int(seq_s), []).append(int(frame_s))

    with open(os.path.join(dataset_dir, "image_sets", "classes.txt")) as f:
        class_names = [line.strip() for line in f if line.strip()]

    os.makedirs(output_dir, exist_ok=True)
    for seq in range(first_seq, last_seq + 1):
        frames = keyframes.get(seq, [])
        per_body: dict[str, list[str]] = {}
        for frame in frames:
            meta_path = os.path.join(dataset_dir, "data", f"{seq:04d}",
                                     f"{frame:06d}-meta.mat")
            meta = scipy.io.loadmat(meta_path)
            indexes = meta["cls_indexes"].reshape(-1)
            poses = meta["poses"]  # (3, 4, n)
            for i, cls in enumerate(indexes):
                body = class_names[int(cls) - 1]
                rot = poses[:, :3, i]
                t = poses[:, 3, i]
                q = Rotation.from_matrix(rot).as_quat()  # x y z w
                per_body.setdefault(body, []).append(
                    f"{q[3]} {q[0]} {q[1]} {q[2]} {t[0]} {t[1]} {t[2]}")
        for body, lines in per_body.items():
            path = os.path.join(output_dir, f"{seq:04d}_{body}.txt")
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")
            print(f"wrote {path} ({len(lines)} keyframes)")
    return 0


def convert_choi(dataset_dir: str, output_dir: str) -> int:
    """Converts Choi ground-truth trajectory files (per-frame 4x4 matrices or 12-value
    rows) into the matrix-row format the ChoiEvaluator reads."""
    os.makedirs(output_dir, exist_ok=True)
    for gt_path in sorted(glob.glob(os.path.join(dataset_dir, "*_gt.txt"))):
        values = np.loadtxt(gt_path, dtype=np.float64)
        if values.ndim == 2 and values.shape[1] == 16:
            poses = values.reshape(-1, 4, 4)
        elif values.ndim == 2 and values.shape[1] == 12:
            poses = np.tile(np.eye(4), (len(values), 1, 1))
            poses[:, :3, :] = values.reshape(-1, 3, 4)
        else:
            poses = values.reshape(-1, 4, 4)
        rows = np.concatenate(
            [poses[:, :3, :3].reshape(-1, 9), poses[:, :3, 3]], axis=1)
        out = os.path.join(output_dir,
                           os.path.basename(gt_path).replace("_gt", "_poses_gt"))
        np.savetxt(out, rows, fmt="%.9f")
        print(f"wrote {out} ({len(rows)} poses)")
    return 0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", choices=["ycb", "choi"])
    parser.add_argument("dataset_dir")
    parser.add_argument("output_dir")
    parser.add_argument("--seq", nargs=2, type=int, default=[48, 59])
    args = parser.parse_args()
    if args.dataset == "ycb":
        return convert_ycb(args.dataset_dir, args.output_dir, *args.seq)
    return convert_choi(args.dataset_dir, args.output_dir)


if __name__ == "__main__":
    raise SystemExit(main())
