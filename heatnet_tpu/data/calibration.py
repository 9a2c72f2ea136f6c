"""Camera calibration loading + fisheye stereo rectification.

Rebuilds the offline calibration tooling of the reference's capture stack:

- kalibr-style camera yaml loading (``bag_parser.py:40-90`` CameraInfoReader)
- fisheye stereo rectification maps (``data/rectify.py:15-55`` Undistorter:
  ``cv2.fisheye.stereoRectify`` + ``initUndistortRectifyMap`` + remap)
- RGB↔thermal extrinsics/intrinsics JSON (``data/calibrations/t_calib.json``:
  {"translation", "rotation", "intrinsic"(fx, fy, cx, cy)})

The ROS bag ingestion itself (rosbag/tf) is hardware-era tooling out of scope
for the TPU framework; the burst synchronizer that replaces the online
sampler lives in ``heatnet_tpu.native``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np


@dataclass
class CameraCalib:
    """Pinhole/fisheye camera model (kalibr 'intrinsics' convention)."""

    K: np.ndarray  # 3x3
    D: np.ndarray  # distortion (4,) for fisheye/equidistant
    resolution: Tuple[int, int]  # (width, height)
    distortion_model: str = "equidistant"
    T_cn_cnm1: Optional[np.ndarray] = None  # 4x4 extrinsic to previous cam


def load_kalibr_yaml(path: str):
    """Parse a kalibr camchain yaml → {cam_name: CameraCalib}."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    out = {}
    for name, cam in data.items():
        if not isinstance(cam, dict) or "intrinsics" not in cam:
            continue
        fx, fy, cx, cy = cam["intrinsics"]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        D = np.asarray(cam.get("distortion_coeffs", [0, 0, 0, 0]), np.float64)
        T = (np.asarray(cam["T_cn_cnm1"], np.float64)
             if "T_cn_cnm1" in cam else None)
        out[name] = CameraCalib(
            K=K, D=D,
            resolution=tuple(cam.get("resolution", (0, 0))),
            distortion_model=cam.get("distortion_model", "equidistant"),
            T_cn_cnm1=T,
        )
    return out


def load_thermal_calib(path: str):
    """RGB↔thermal calibration JSON (t_calib.json schema).

    Returns (T_4x4 extrinsic, K_3x3 thermal intrinsics)."""
    with open(path) as f:
        data = json.load(f)
    t = np.asarray(data["translation"], np.float64).reshape(3)
    r = np.asarray(data["rotation"], np.float64)
    if r.size == 9:
        R = r.reshape(3, 3)
    else:  # quaternion (x, y, z, w)
        x, y, z, w = r
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    fx, fy, cx, cy = data["intrinsic"][:4]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    return T, K


class StereoRectifier:
    """Fisheye stereo rectification (rectify.py Undistorter semantics)."""

    def __init__(self, left: CameraCalib, right: CameraCalib,
                 R: np.ndarray, tvec: np.ndarray):
        import cv2

        size = left.resolution
        R1, R2, P1, P2, Q = cv2.fisheye.stereoRectify(
            left.K, left.D, right.K, right.D, size, R, tvec,
            cv2.CALIB_ZERO_DISPARITY, fov_scale=1.0, balance=0.0)
        self.maps_left = cv2.fisheye.initUndistortRectifyMap(
            left.K, left.D, R1, P1, size, cv2.CV_16SC2)
        self.maps_right = cv2.fisheye.initUndistortRectifyMap(
            right.K, right.D, R2, P2, size, cv2.CV_16SC2)
        self.Q = Q

    def rectify(self, img_left: np.ndarray, img_right: np.ndarray):
        import cv2

        left = cv2.remap(img_left, *self.maps_left,
                         interpolation=cv2.INTER_LINEAR)
        right = cv2.remap(img_right, *self.maps_right,
                          interpolation=cv2.INTER_LINEAR)
        return left, right


def project_thermal_to_rgb(depth: np.ndarray, K_rgb: np.ndarray,
                           K_ir: np.ndarray, T_rgb_to_ir: np.ndarray):
    """Per-pixel warp field RGB→thermal from depth + calibration.

    The geometric core of the reference's fl_ir_aligned generation: for
    each RGB pixel with depth d, back-project with K_rgb, transform by the
    extrinsic, project with K_ir. Returns float32 (H, W, 2) sample coords.
    """
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    z = depth.astype(np.float64)
    x = (xs - K_rgb[0, 2]) / K_rgb[0, 0] * z
    y = (ys - K_rgb[1, 2]) / K_rgb[1, 1] * z
    pts = np.stack([x, y, z, np.ones_like(z)], axis=-1)  # (H, W, 4)
    cam_ir = pts @ T_rgb_to_ir.T
    with np.errstate(divide="ignore", invalid="ignore"):
        u = K_ir[0, 0] * cam_ir[..., 0] / cam_ir[..., 2] + K_ir[0, 2]
        v = K_ir[1, 1] * cam_ir[..., 1] / cam_ir[..., 2] + K_ir[1, 2]
    return np.stack([u, v], axis=-1).astype(np.float32)
