"""Live camera backends (redesign of m3t/src/{azure_kinect,realsense}_camera.cpp).

The reference wraps Azure Kinect and RealSense SDKs behind singleton device classes with
ID-registered lifecycles (azure_kinect_camera.h:31-47).  Here each backend is a thin host
IO adapter that feeds frames into the same Camera interface; SDKs are optional imports so
the framework works without them.  A generic OpenCV VideoCapture camera covers webcams
and V4L2 devices.
"""

from __future__ import annotations

import threading

import numpy as np

from m3t_tpu.camera import ColorCamera, DepthCamera
from m3t_tpu.common import Intrinsics


class OpenCVColorCamera(ColorCamera):
    """Generic live color camera via cv2.VideoCapture."""

    def __init__(self, name: str, device_index: int = 0,
                 intrinsics: Intrinsics | None = None):
        super().__init__(name)
        self.device_index = int(device_index)
        self.intrinsics = intrinsics
        self._capture = None

    def SetUp(self) -> bool:  # noqa: N802
        import cv2

        self._capture = cv2.VideoCapture(self.device_index)
        if not self._capture.isOpened():
            print(f"Could not open video device {self.device_index}")
            return False
        ok, frame = self._capture.read()
        if not ok:
            print(f"Could not read from video device {self.device_index}")
            return False
        h, w = frame.shape[:2]
        if self.intrinsics is None:
            # Fallback pinhole guess: 60 deg horizontal FOV.
            f = w / (2.0 * np.tan(np.deg2rad(30.0)))
            self.intrinsics = Intrinsics(f, f, w / 2 - 0.5, h / 2 - 0.5, w, h)
        self.set_up = True
        return True

    def UpdateImage(self, synchronized: bool = True) -> bool:  # noqa: N802
        ok, frame = self._capture.read()
        if not ok:
            return False
        self.image = frame
        self.SaveImageIfDesired()
        return True


class _AzureKinect:
    """Singleton device shared by color+depth wrappers (azure_kinect_camera.h:31-47)."""

    _instance = None
    _lock = threading.Lock()

    def __init__(self):
        import pyk4a  # optional dependency

        self.k4a = pyk4a.PyK4A()
        self.k4a.start()
        self.capture = None
        self.capture_lock = threading.Lock()
        self.users: set[str] = set()

    @classmethod
    def instance(cls) -> "_AzureKinect":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def update_capture(self, user_id: str) -> bool:
        with self.capture_lock:
            self.capture = self.k4a.get_capture()
            return self.capture is not None


class AzureKinectColorCamera(ColorCamera):
    def __init__(self, name: str, intrinsics: Intrinsics | None = None):
        super().__init__(name)
        self.intrinsics = intrinsics
        self._device = None

    def SetUp(self) -> bool:  # noqa: N802
        try:
            self._device = _AzureKinect.instance()
        except ImportError:
            print(f"Azure Kinect SDK (pyk4a) not available for camera {self.name}")
            return False
        except Exception as error:  # device errors
            print(f"Azure Kinect device error for camera {self.name}: {error}")
            return False
        self._device.users.add(self.name)
        if not self.UpdateImage(True):
            return False
        if self.intrinsics is None:
            calib = self._device.k4a.calibration
            m = calib.get_camera_matrix(1)  # color camera
            h, w = self.image.shape[:2]
            self.intrinsics = Intrinsics(m[0][0], m[1][1], m[0][2], m[1][2], w, h)
        self.set_up = True
        return True

    def UpdateImage(self, synchronized: bool = True) -> bool:  # noqa: N802
        if not self._device.update_capture(self.name):
            return False
        color = self._device.capture.color
        if color is None:
            return False
        self.image = np.asarray(color)[:, :, :3]
        self.SaveImageIfDesired()
        return True


class AzureKinectDepthCamera(DepthCamera):
    def __init__(self, name: str, intrinsics: Intrinsics | None = None):
        super().__init__(name)
        self.intrinsics = intrinsics
        self.depth_scale = 0.001
        self._device = None

    def SetUp(self) -> bool:  # noqa: N802
        try:
            self._device = _AzureKinect.instance()
        except ImportError:
            print(f"Azure Kinect SDK (pyk4a) not available for camera {self.name}")
            return False
        except Exception as error:
            print(f"Azure Kinect device error for camera {self.name}: {error}")
            return False
        self._device.users.add(self.name)
        if not self.UpdateImage(True):
            return False
        if self.intrinsics is None:
            calib = self._device.k4a.calibration
            m = calib.get_camera_matrix(0)  # depth camera
            h, w = self.image.shape[:2]
            self.intrinsics = Intrinsics(m[0][0], m[1][1], m[0][2], m[1][2], w, h)
        self.set_up = True
        return True

    def UpdateImage(self, synchronized: bool = True) -> bool:  # noqa: N802
        if not self._device.update_capture(self.name):
            return False
        depth = self._device.capture.depth
        if depth is None:
            return False
        self.image = np.asarray(depth, np.uint16)
        self.SaveImageIfDesired()
        return True


class RealSenseColorCamera(ColorCamera):
    """RealSense D4xx color stream (pyrealsense2, optional)."""

    def __init__(self, name: str, intrinsics: Intrinsics | None = None):
        super().__init__(name)
        self.intrinsics = intrinsics
        self._pipeline = None

    def SetUp(self) -> bool:  # noqa: N802
        try:
            import pyrealsense2 as rs
        except ImportError:
            print(f"RealSense SDK (pyrealsense2) not available for camera {self.name}")
            return False
        self._pipeline = rs.pipeline()
        profile = self._pipeline.start()
        stream = profile.get_stream(rs.stream.color).as_video_stream_profile()
        i = stream.get_intrinsics()
        if self.intrinsics is None:
            self.intrinsics = Intrinsics(i.fx, i.fy, i.ppx, i.ppy, i.width, i.height)
        self.set_up = self.UpdateImage(True)
        return self.set_up

    def UpdateImage(self, synchronized: bool = True) -> bool:  # noqa: N802
        frames = self._pipeline.wait_for_frames()
        color = frames.get_color_frame()
        if not color:
            return False
        self.image = np.asanyarray(color.get_data())[:, :, ::-1]  # RGB -> BGR
        self.SaveImageIfDesired()
        return True


class RealSenseDepthCamera(DepthCamera):
    def __init__(self, name: str, intrinsics: Intrinsics | None = None):
        super().__init__(name)
        self.intrinsics = intrinsics
        self._pipeline = None

    def SetUp(self) -> bool:  # noqa: N802
        try:
            import pyrealsense2 as rs
        except ImportError:
            print(f"RealSense SDK (pyrealsense2) not available for camera {self.name}")
            return False
        self._pipeline = rs.pipeline()
        profile = self._pipeline.start()
        sensor = profile.get_device().first_depth_sensor()
        self.depth_scale = float(sensor.get_depth_scale())
        stream = profile.get_stream(rs.stream.depth).as_video_stream_profile()
        i = stream.get_intrinsics()
        if self.intrinsics is None:
            self.intrinsics = Intrinsics(i.fx, i.fy, i.ppx, i.ppy, i.width, i.height)
        self.set_up = self.UpdateImage(True)
        return self.set_up

    def UpdateImage(self, synchronized: bool = True) -> bool:  # noqa: N802
        frames = self._pipeline.wait_for_frames()
        depth = frames.get_depth_frame()
        if not depth:
            return False
        self.image = np.asanyarray(depth.get_data()).astype(np.uint16)
        self.SaveImageIfDesired()
        return True
