"""Metafile IO compatible with the reference's OpenCV-FileStorage YAML metafiles.

The reference parses per-object parameters with ``cv::FileStorage`` (m3t/src/common.cpp:
170-262, ReadOptionalValueFromYaml / ReadRequiredValueFromYaml).  We use cv2.FileStorage so
that unmodified reference metafiles (including ``%YAML:1.x`` directives and
``!!opencv-matrix`` nodes) parse identically.
"""

from __future__ import annotations

import os
from typing import Any

import cv2
import numpy as np


class MetafileError(RuntimeError):
    pass


def open_yaml_file_storage(path: str) -> cv2.FileStorage:
    path = str(path)
    if not os.path.exists(path) or os.path.splitext(path)[1] != ".yaml":
        raise MetafileError(f"Could not find yaml file {path}")
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise MetafileError(f"Could not open yaml file {path}")
    return fs


def _node_to_python(node: cv2.FileNode) -> Any:
    if node is None or node.empty():
        return None
    if node.isInt():
        return int(node.real())
    if node.isReal():
        return float(node.real())
    if node.isString():
        return node.string()
    if node.isSeq():
        return [_node_to_python(node.at(i)) for i in range(node.size())]
    if node.isMap():
        # Matrix nodes (!!opencv-matrix) and generic maps.
        keys = node.keys()
        if {"rows", "cols", "dt", "data"} <= set(keys):
            return node.mat()
        return {k: _node_to_python(node.getNode(k)) for k in keys}
    if node.isNone():
        return None
    mat = node.mat()
    if mat is not None:
        return mat
    raise MetafileError("Unsupported yaml node type")


def read_optional(fs: cv2.FileStorage, name: str, default: Any = None) -> Any:
    node = fs.getNode(name)
    value = _node_to_python(node)
    return default if value is None else value


def read_required(fs: cv2.FileStorage, name: str) -> Any:
    node = fs.getNode(name)
    value = _node_to_python(node)
    if value is None:
        raise MetafileError(f"Required parameter {name} missing in metafile")
    return value


def read_pose(fs: cv2.FileStorage, name: str, default: np.ndarray | None = None) -> np.ndarray:
    """Read a 4x4 pose matrix (reference: ReadValueFromYaml(Transform3fA), common.cpp:216)."""
    node = fs.getNode(name)
    if node is None or node.empty():
        if default is None:
            return np.eye(4, dtype=np.float32)
        return np.asarray(default, np.float32)
    mat = node.mat()
    if mat is None:
        value = _node_to_python(node)
        mat = np.asarray(value, np.float32)
    mat = np.asarray(mat, np.float32)
    if mat.size != 16:
        raise MetafileError(f"Pose {name} must be a 4x4 matrix")
    return mat.reshape(4, 4)


def read_intrinsics(fs: cv2.FileStorage, name: str = "intrinsics"):
    """Read an intrinsics map node (reference: ReadValueFromYaml(Intrinsics), common.cpp:201)."""
    from m3t_tpu.common import Intrinsics

    node = fs.getNode(name)
    if node is None or node.empty():
        return None
    return Intrinsics(
        fu=float(node.getNode("f_u").real()),
        fv=float(node.getNode("f_v").real()),
        ppu=float(node.getNode("pp_x").real()),
        ppv=float(node.getNode("pp_y").real()),
        width=int(node.getNode("width").real()),
        height=int(node.getNode("height").real()),
    )


def resolve_path(value: str, metafile_path: str, name: str | None = None, ext: str = "") -> str:
    """Apply the INFER_FROM_NAME convention and relative-path resolution.

    Reference: m3t/src/body.cpp:176-180 and equivalents in every LoadMetaData.
    """
    directory = os.path.dirname(os.path.abspath(str(metafile_path)))
    if value == "INFER_FROM_NAME":
        return os.path.join(directory, f"{name}{ext}")
    if not os.path.isabs(value):
        return os.path.join(directory, value)
    return value
