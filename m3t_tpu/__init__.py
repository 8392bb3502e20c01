"""m3t_tpu — a TPU-native (JAX/XLA/Pallas) 6DoF object- and kinematic-structure
tracking framework with the capabilities of DLR-RM/3DObjectTracking (M3T).

The canonical reference is the M3T library (see /root/reference/M3T); this package is a
from-scratch, TPU-first redesign: pure functions over pytree state, batched/vmapped kernels
over (bodies x correspondence lines x scale levels), an on-device rasterizer replacing
OpenGL, and jax.sharding meshes for multi-chip scale-out.

Layer map (mirrors SURVEY.md section 1):
  L0 common/body/camera/viewer/detector   -> common.py, body.py, camera.py, viewer.py, detector.py
  L1 renderers (depth/silhouette/normal)  -> rasterizer.py, renderer.py
  L2 models & appearance                  -> model_base.py, region_model.py, depth_model.py,
                                             color_histograms.py
  L3 modalities                           -> modality.py, region_modality.py, depth_modality.py,
                                             texture_modality.py
  L4 optimization/kinematics              -> link.py, constraint.py, soft_constraint.py,
                                             optimizer.py
  L5 orchestration                        -> tracker.py, refiner.py
  L6 config/generator                     -> generator.py
  L7 applications/evaluation              -> eval/
"""

from m3t_tpu.common import (
    Intrinsics,
    adjoint,
    pose_inverse,
    pose_variation,
    project,
    skew,
    so3_exp,
    so3_log,
    transform_points,
    xcotx,
)
from m3t_tpu.body import Body
from m3t_tpu.camera import (
    Camera,
    ColorCamera,
    DepthCamera,
    ImageColorCamera,
    ImageDepthCamera,
    LoaderColorCamera,
    LoaderDepthCamera,
)
from m3t_tpu.hardware_camera import (
    AzureKinectColorCamera,
    AzureKinectDepthCamera,
    OpenCVColorCamera,
    RealSenseColorCamera,
    RealSenseDepthCamera,
)
from m3t_tpu.renderer_geometry import RendererGeometry
from m3t_tpu.renderer import (
    FocusedBasicDepthRenderer,
    FocusedDepthRenderer,
    FocusedNormalRenderer,
    FocusedSilhouetteRenderer,
    FullBasicDepthRenderer,
    FullDepthRenderer,
    FullNormalRenderer,
    FullSilhouetteRenderer,
    IDType,
)
__version__ = "0.1.0"

# Higher layers (modalities, optimization, orchestration) are imported lazily so partial
# builds and tooling can import the core without pulling the full stack.
_LAZY = {
    "ColorHistograms": "m3t_tpu.color_histograms",
    "RegionModel": "m3t_tpu.region_model",
    "DepthModel": "m3t_tpu.depth_model",
    "RegionModality": "m3t_tpu.region_modality",
    "DepthModality": "m3t_tpu.depth_modality",
    "TextureModality": "m3t_tpu.texture_modality",
    "Link": "m3t_tpu.link",
    "Constraint": "m3t_tpu.constraint",
    "SoftConstraint": "m3t_tpu.soft_constraint",
    "Optimizer": "m3t_tpu.optimizer",
    "Detector": "m3t_tpu.detector",
    "StaticDetector": "m3t_tpu.detector",
    "ManualDetector": "m3t_tpu.detector",
    "Refiner": "m3t_tpu.refiner",
    "Publisher": "m3t_tpu.publisher",
    "Subscriber": "m3t_tpu.subscriber",
    "Viewer": "m3t_tpu.viewer",
    "ImageColorViewer": "m3t_tpu.viewer",
    "ImageDepthViewer": "m3t_tpu.viewer",
    "NormalColorViewer": "m3t_tpu.viewer",
    "NormalDepthViewer": "m3t_tpu.viewer",
    "Tracker": "m3t_tpu.tracker",
    "GenerateConfiguredTracker": "m3t_tpu.generator",
    "FusedServeBackend": "m3t_tpu.fused_serve",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module 'm3t_tpu' has no attribute {name!r}")
