"""Hardware camera adapters exercised against fake SDKs.

The reference can only test live cameras with physical devices attached; here the
pyk4a / pyrealsense2 / cv2.VideoCapture contracts are faked so the adapter logic —
ID-registered synchronized capture sharing (azure_kinect_camera.cpp:88-101), calibration
intrinsics/extrinsics, image scaling, depth scale, device lifecycle — runs for real.
"""

import sys
import types

import numpy as np
import pytest

from m3t_tpu.common import Intrinsics
from m3t_tpu.hardware_camera import (
    AzureKinect,
    AzureKinectColorCamera,
    AzureKinectDepthCamera,
    OpenCVColorCamera,
    RealSense,
    RealSenseColorCamera,
    RealSenseDepthCamera,
)

# ----------------------------------------------------------------------------------
# Fake pyk4a
# ----------------------------------------------------------------------------------

K4A_COLOR_MATRIX = [[600.0, 0.0, 320.0], [0.0, 610.0, 240.0], [0.0, 0.0, 1.0]]
K4A_DEPTH_MATRIX = [[500.0, 0.0, 160.0], [0.0, 505.0, 120.0], [0.0, 0.0, 1.0]]
K4A_TRANSLATION_MM = [32.0, 2.0, 4.0]


class _FakeK4ACalibration:
    def get_camera_matrix(self, which):
        return K4A_COLOR_MATRIX if which == 1 else K4A_DEPTH_MATRIX

    def get_extrinsic_matrix(self, src, dst):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = K4A_TRANSLATION_MM
        return m


class _FakeK4ACapture:
    def __init__(self, stamp: int):
        # Stamp the frame index into the images so capture identity is observable.
        self.color = np.full((48, 64, 4), stamp % 256, np.uint8)
        self.depth = np.full((24, 32), stamp, np.uint16)


class _FakePyK4A:
    def __init__(self):
        self.n_grabs = 0
        self.started = False
        self.stopped = False
        self.calibration = _FakeK4ACalibration()

    def start(self):
        self.started = True

    def stop(self):
        self.stopped = True

    def get_capture(self):
        self.n_grabs += 1
        return _FakeK4ACapture(self.n_grabs)


def _fake_pyk4a_module():
    mod = types.ModuleType("pyk4a")
    mod.PyK4A = _FakePyK4A
    mod.CalibrationType = types.SimpleNamespace(COLOR=1, DEPTH=0)
    return mod


@pytest.fixture
def fake_pyk4a(monkeypatch):
    AzureKinect.reset_instance()
    mod = _fake_pyk4a_module()
    monkeypatch.setitem(sys.modules, "pyk4a", mod)
    yield mod
    AzureKinect.reset_instance()


# ----------------------------------------------------------------------------------
# Fake pyrealsense2
# ----------------------------------------------------------------------------------

RS_DEPTH_SCALE = 0.00025
# Rz(90deg) in column-major order plus a translation in meters.
RS_ROTATION_COLMAJOR = [0.0, 1.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0, 1.0]
RS_TRANSLATION_M = [0.015, -0.001, 0.002]


class _FakeRSIntrinsics:
    def __init__(self, color: bool):
        if color:
            self.fx, self.fy, self.ppx, self.ppy = 620.0, 622.0, 480.0, 270.0
            self.width, self.height = 960, 540
        else:
            self.fx, self.fy, self.ppx, self.ppy = 430.0, 431.0, 424.0, 240.0
            self.width, self.height = 848, 480


class _FakeRSStreamProfile:
    def __init__(self, color: bool):
        self._color = color

    def as_video_stream_profile(self):
        return self

    def get_intrinsics(self):
        return _FakeRSIntrinsics(self._color)

    def get_extrinsics_to(self, other):
        return types.SimpleNamespace(rotation=RS_ROTATION_COLMAJOR,
                                     translation=RS_TRANSLATION_M)


class _FakeRSFrame:
    def __init__(self, stamp: int, color: bool):
        self._stamp = stamp
        self._color = color

    def __bool__(self):
        return True

    def get_data(self):
        if self._color:
            return np.full((540, 960, 3), self._stamp % 256, np.uint8)
        return np.full((480, 848), self._stamp, np.uint16)


class _FakeRSFrameset:
    def __init__(self, stamp: int):
        self.stamp = stamp

    def get_color_frame(self):
        return _FakeRSFrame(self.stamp, color=True)

    def get_depth_frame(self):
        return _FakeRSFrame(self.stamp, color=False)


class _FakeRSPipeline:
    def __init__(self):
        self.n_waits = 0
        self.stopped = False
        self._profile = _FakeRSProfile()

    def start(self, config):
        self._profile.enabled = list(config.enabled)
        return self._profile

    def wait_for_frames(self):
        self.n_waits += 1
        return _FakeRSFrameset(self.n_waits)

    def poll_for_frames(self):
        self.n_waits += 1
        return _FakeRSFrameset(self.n_waits)

    def stop(self):
        self.stopped = True


class _FakeRSProfile:
    def __init__(self):
        self.enabled = []

    def get_stream(self, stream):
        return _FakeRSStreamProfile(color=(stream == "color"))

    def get_device(self):
        sensor = types.SimpleNamespace(get_depth_scale=lambda: RS_DEPTH_SCALE)
        return types.SimpleNamespace(first_depth_sensor=lambda: sensor)


class _FakeRSConfig:
    def __init__(self):
        self.enabled = []

    def enable_stream(self, stream, w, h, fmt, fps):
        self.enabled.append((stream, w, h, fmt, fps))


def _fake_rs_module():
    mod = types.ModuleType("pyrealsense2")
    mod.pipeline = _FakeRSPipeline
    mod.config = _FakeRSConfig
    mod.stream = types.SimpleNamespace(color="color", depth="depth")
    mod.format = types.SimpleNamespace(bgr8="bgr8", z16="z16")
    return mod


@pytest.fixture
def fake_rs(monkeypatch):
    RealSense.reset_instance()
    mod = _fake_rs_module()
    monkeypatch.setitem(sys.modules, "pyrealsense2", mod)
    yield mod
    RealSense.reset_instance()


# ----------------------------------------------------------------------------------
# Azure Kinect tests
# ----------------------------------------------------------------------------------


def test_azure_kinect_synchronized_capture_sharing(fake_pyk4a):
    color = AzureKinectColorCamera("ak_color", image_scale=1.0)
    depth = AzureKinectDepthCamera("ak_depth")
    assert color.SetUp()
    assert depth.SetUp()
    device = color._device
    assert device is depth._device, "color+depth must share one singleton device"

    # _start drops N_IMAGES_DROPPED frames; the first SetUp's UpdateImage grabs one
    # more, the second SetUp reuses it (azure_kinect_camera.cpp:92-100).
    grabs_after_setup = device.k4a.n_grabs
    assert grabs_after_setup == AzureKinect.N_IMAGES_DROPPED + 1

    # One tracking cycle: both UpdateImage calls consume exactly ONE new capture,
    # and both images carry the same capture stamp.
    assert color.UpdateImage(True)
    assert depth.UpdateImage(True)
    assert device.k4a.n_grabs == grabs_after_setup + 1
    assert int(color.image[0, 0, 0]) == int(depth.image[0, 0]) % 256

    # Next cycle advances again.
    assert color.UpdateImage(True)
    assert depth.UpdateImage(True)
    assert device.k4a.n_grabs == grabs_after_setup + 2


def test_azure_kinect_intrinsics_and_image_scale(fake_pyk4a):
    camera = AzureKinectColorCamera("ak_color")  # default image_scale = 1.05
    assert camera.SetUp()
    intr = camera.intrinsics
    assert intr.fu == pytest.approx(600.0 * 1.05)
    assert intr.fv == pytest.approx(610.0 * 1.05)
    assert (intr.ppu, intr.ppv) == (320.0, 240.0)
    assert (intr.width, intr.height) == (64, 48)  # fake capture shape
    assert camera.image.shape == (48, 64, 3)  # BGRA -> BGR, same size after zoom


def test_azure_kinect_depth_as_world_frame(fake_pyk4a):
    camera = AzureKinectColorCamera("ak_color", use_depth_as_world_frame=True)
    assert camera.SetUp()
    # k4a extrinsic translation is in millimeters (azure_kinect_camera.cpp:63-66).
    np.testing.assert_allclose(camera.camera2world_pose[:3, 3],
                               np.asarray(K4A_TRANSLATION_MM) * 0.001, rtol=1e-6)
    depth = AzureKinectDepthCamera("ak_depth", use_color_as_world_frame=True)
    assert depth.SetUp()
    # depth2color is the inverse pose.
    np.testing.assert_allclose(depth.camera2world_pose[:3, 3],
                               -np.asarray(K4A_TRANSLATION_MM) * 0.001, atol=1e-7)
    assert depth.depth_scale == pytest.approx(0.001)


def test_azure_kinect_close_stops_device_on_last_user(fake_pyk4a):
    color = AzureKinectColorCamera("ak_color", image_scale=1.0)
    depth = AzureKinectDepthCamera("ak_depth")
    assert color.SetUp() and depth.SetUp()
    device = color._device
    color.Close()
    assert not device.k4a.stopped, "device must stay up while a user remains"
    depth.Close()
    assert device.k4a.stopped
    # A new camera after shutdown gets a fresh singleton.
    fresh = AzureKinectColorCamera("ak_color2", image_scale=1.0)
    assert fresh._device is not device
    assert fresh.SetUp()


def test_azure_kinect_missing_sdk_fails_loudly(monkeypatch):
    AzureKinect.reset_instance()
    monkeypatch.setitem(sys.modules, "pyk4a", None)  # import pyk4a -> ImportError
    camera = AzureKinectColorCamera("ak_color")
    assert camera.SetUp() is False
    assert not camera.set_up
    AzureKinect.reset_instance()


# ----------------------------------------------------------------------------------
# RealSense tests
# ----------------------------------------------------------------------------------


def test_realsense_synchronized_capture_sharing_and_depth_scale(fake_rs):
    color = RealSenseColorCamera("rs_color")
    depth = RealSenseDepthCamera("rs_depth")
    assert color.SetUp()
    assert depth.SetUp()
    device = color._device
    assert device is depth._device
    # Reference enables both streams before start (realsense_camera.cpp:38-41).
    assert {s[0] for s in device.profile.enabled} == {"color", "depth"}

    waits_after_setup = device.pipe.n_waits
    assert waits_after_setup == RealSense.N_IMAGES_DROPPED + 1
    assert color.UpdateImage(True)
    assert depth.UpdateImage(True)
    assert device.pipe.n_waits == waits_after_setup + 1
    assert int(color.image[0, 0, 0]) == int(depth.image[0, 0]) % 256

    assert depth.depth_scale == pytest.approx(RS_DEPTH_SCALE)
    intr = color.intrinsics
    assert (intr.fu, intr.fv, intr.width) == (620.0, 622.0, 960)
    dintr = depth.intrinsics
    assert (dintr.fu, dintr.width, dintr.height) == (430.0, 848, 480)


def test_realsense_extrinsic_pose_column_major(fake_rs):
    color = RealSenseColorCamera("rs_color", use_depth_as_world_frame=True)
    depth = RealSenseDepthCamera("rs_depth")  # registers depth use before start
    assert color.SetUp()
    pose = color.camera2world_pose
    expected_rot = np.asarray(RS_ROTATION_COLMAJOR, np.float32).reshape(3, 3, order="F")
    np.testing.assert_allclose(pose[:3, :3], expected_rot, atol=1e-7)
    np.testing.assert_allclose(pose[:3, 3], RS_TRANSLATION_M, rtol=1e-6)
    depth.Close()
    color.Close()


# ----------------------------------------------------------------------------------
# OpenCV camera test
# ----------------------------------------------------------------------------------


class _FakeVideoCapture:
    def __init__(self, index):
        self.index = index
        self.n_reads = 0

    def isOpened(self):  # noqa: N802
        return True

    def read(self):
        self.n_reads += 1
        return True, np.full((480, 640, 3), self.n_reads % 256, np.uint8)


def test_opencv_color_camera(monkeypatch):
    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", _FakeVideoCapture)
    camera = OpenCVColorCamera("webcam", device_index=2)
    assert camera.SetUp()
    # Fallback intrinsics: 60 deg horizontal FOV pinhole guess.
    assert camera.intrinsics.width == 640 and camera.intrinsics.height == 480
    assert camera.intrinsics.fu == pytest.approx(640 / (2 * np.tan(np.deg2rad(30.0))))
    assert camera.UpdateImage()
    assert camera.image.shape == (480, 640, 3)


# ----------------------------------------------------------------------------------
# Metafile + generator wiring
# ----------------------------------------------------------------------------------


def test_azure_kinect_metafile(fake_pyk4a, tmp_path):
    metafile = tmp_path / "ak_color.yaml"
    metafile.write_text(
        "%YAML:1.2\n---\n"
        "image_scale: 1.0\n"
        "use_depth_as_world_frame: 1\n")
    camera = AzureKinectColorCamera("ak_color", metafile_path=str(metafile))
    assert camera.SetUp()
    assert camera.image_scale == pytest.approx(1.0)
    np.testing.assert_allclose(camera.camera2world_pose[:3, 3],
                               np.asarray(K4A_TRANSLATION_MM) * 0.001, rtol=1e-6)


def test_generator_recognizes_hardware_camera_nodes(fake_pyk4a, monkeypatch, tmp_path):
    # The generator's camera section must construct live-camera nodes with an
    # OPTIONAL metafile (reference generator.h:972-996).  Record the constructed
    # cameras by intercepting the class the generator resolves by name.
    from m3t_tpu import generator as generator_mod
    from m3t_tpu import hardware_camera

    created = []

    class RecordingCamera(AzureKinectColorCamera):
        def __init__(self, name, metafile_path=None):
            created.append((name, metafile_path))
            super().__init__(name, metafile_path=metafile_path)

    monkeypatch.setattr(hardware_camera, "AzureKinectColorCamera", RecordingCamera)
    config = tmp_path / "config.yaml"
    config.write_text(
        "%YAML:1.2\n---\n"
        "AzureKinectColorCamera:\n"
        "  - name: live_color\n"
        "Tracker:\n"
        "  - name: tracker\n"
        "    optimizers: []\n")
    generator_mod.GenerateConfiguredTracker(str(config))
    assert created == [("live_color", None)]
