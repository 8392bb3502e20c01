"""URDF -> link metafile pose converter
(redesign of M3T/examples/urdf_pose_converter/converter.py).

Parses a URDF, extracts the kinematic tree (joint origins, axes, types), and writes
per-link YAML metafiles (joint2parent_pose / body2joint_pose / free_directions) plus a
generator-YAML skeleton wiring the links.

Usage: python examples/urdf_pose_converter.py robot.urdf output_dir/
"""

import argparse
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, ".")


def rpy_to_matrix(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])


def origin_to_pose(origin) -> np.ndarray:
    xyz = [float(v) for v in (origin.get("xyz", "0 0 0")).split()]
    rpy = [float(v) for v in (origin.get("rpy", "0 0 0")).split()]
    pose = np.eye(4)
    pose[:3, :3] = rpy_to_matrix(rpy)
    pose[:3, 3] = xyz
    return pose


def axis_to_free_directions(joint_type: str, axis) -> list[int]:
    if joint_type == "fixed":
        return [0] * 6
    xyz = [float(v) for v in (axis.get("xyz", "1 0 0") if axis is not None
                              else "1 0 0").split()]
    dominant = int(np.argmax(np.abs(xyz)))
    free = [0] * 6
    if joint_type in ("revolute", "continuous"):
        free[dominant] = 1
    elif joint_type == "prismatic":
        free[3 + dominant] = 1
    elif joint_type == "floating":
        free = [1] * 6
    return free


def write_pose_yaml(f, name: str, pose: np.ndarray) -> None:
    values = ", ".join(f"{v:.9f}" for v in pose.reshape(-1))
    f.write(f"{name}: !!opencv-matrix\n  rows: 4\n  cols: 4\n  dt: f\n"
            f"  data: [{values}]\n")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("urdf_path")
    parser.add_argument("output_dir")
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    tree = ET.parse(args.urdf_path)
    robot = tree.getroot()

    links = [link.get("name") for link in robot.findall("link")]
    joints = []
    for joint in robot.findall("joint"):
        joints.append({
            "name": joint.get("name"),
            "type": joint.get("type", "fixed"),
            "parent": joint.find("parent").get("link"),
            "child": joint.find("child").get("link"),
            "origin": joint.find("origin"),
            "axis": joint.find("axis"),
        })

    children = {}
    has_parent = set()
    for j in joints:
        children.setdefault(j["parent"], []).append(j)
        has_parent.add(j["child"])
    roots = [name for name in links if name not in has_parent]

    for j in joints:
        pose = (origin_to_pose(j["origin"]) if j["origin"] is not None
                else np.eye(4))
        free = axis_to_free_directions(j["type"], j["axis"])
        path = os.path.join(args.output_dir, f"{j['child']}_link.yaml")
        with open(path, "w") as f:
            f.write("%YAML:1.2\n")
            write_pose_yaml(f, "joint2parent_pose", pose)
            f.write(f"free_directions: [{', '.join(str(v) for v in free)}]\n")
            f.write("fixed_body2joint_pose: 1\n")
        print(f"wrote {path} ({j['type']} joint, free={free})")

    # Generator skeleton
    skeleton = os.path.join(args.output_dir, "links_config.yaml")
    with open(skeleton, "w") as f:
        f.write("%YAML:1.2\nLink:\n")
        for name in links:
            f.write(f'  - name: "{name}_link"\n')
            if name in has_parent:
                f.write(f'    metafile_path: "{name}_link.yaml"\n')
            child_names = [j["child"] for j in children.get(name, [])]
            if child_names:
                f.write("    child_links: ["
                        + ", ".join(f'"{c}_link"' for c in child_names) + "]\n")
    print(f"wrote {skeleton} (roots: {roots})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
