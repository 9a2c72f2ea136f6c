"""ctypes bindings for the native C++ components (auto-built on first use).

pybind11 is not in the image; a plain C ABI + ctypes keeps the build to one
``g++`` invocation with zero Python build-time deps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libheatnet_native.so")
_SOURCES = ["relabeller.cpp", "burst_sampler.cpp", "thermal_preproc.cpp",
            "pubsub.cpp"]
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> str:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        newest_src = max(os.path.getmtime(os.path.join(_DIR, s))
                         for s in _SOURCES)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
            _build()
        lib = ctypes.CDLL(_SO)

        lib.relabel_vistas_image.restype = ctypes.c_int
        lib.relabel_vistas_image.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int]
        lib.relabel_image.restype = None
        lib.relabel_image.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_void_p]
        lib.sync_create.restype = ctypes.c_void_p
        lib.sync_create.argtypes = [ctypes.c_int, ctypes.c_int64, ctypes.c_int]
        lib.sync_destroy.argtypes = [ctypes.c_void_p]
        lib.sync_push.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_int64, ctypes.c_int64]
        lib.sync_poll.restype = ctypes.c_int
        lib.sync_poll.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_void_p]
        lib.burst_create.restype = ctypes.c_void_p
        lib.burst_create.argtypes = [ctypes.c_int, ctypes.c_int64,
                                     ctypes.c_int, ctypes.c_double,
                                     ctypes.c_int]
        lib.burst_destroy.argtypes = [ctypes.c_void_p]
        lib.burst_push.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int64, ctypes.c_int64]
        lib.burst_poll.restype = ctypes.c_int
        lib.burst_poll.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p]
        lib.thermal_to_8bit.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_float, ctypes.c_int]
        lib.gray_binarize.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_int]
        lib.bus_create.restype = ctypes.c_void_p
        lib.bus_destroy.argtypes = [ctypes.c_void_p]
        lib.bus_subscribe.restype = ctypes.c_int
        lib.bus_subscribe.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int]
        lib.bus_publish.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int64, ctypes.c_void_p,
                                    ctypes.c_int]
        lib.bus_poll.restype = ctypes.c_int
        lib.bus_poll.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int]
        lib.bus_pending.restype = ctypes.c_int
        lib.bus_pending.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _LIB = lib
        return lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def relabel_vistas_image_native(img: np.ndarray, mapping: dict,
                                background: int = 12) -> np.ndarray:
    """Native panoptic relabel (Cython relabeller.pyx:4-36 semantics)."""
    lib = get_lib()
    img = np.ascontiguousarray(img, dtype=np.uint16)
    out = np.empty_like(img)
    map_arr = np.full(256, -1, dtype=np.int32)
    for k, v in mapping.items():
        if 0 <= k < 256:
            map_arr[k] = v
    lib.relabel_vistas_image(_ptr(img), _ptr(out), img.shape[0], img.shape[1],
                             _ptr(map_arr), background)
    return out


def relabel_image_native(seg: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Native class-map → RGB (relabeller.pyx:38-58)."""
    lib = get_lib()
    seg = np.ascontiguousarray(seg, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    assert palette.shape == (256, 3)
    out = np.empty((*seg.shape, 3), dtype=np.uint8)
    lib.relabel_image(_ptr(seg), _ptr(out), seg.shape[0], seg.shape[1],
                      _ptr(palette))
    return out


class Synchronizer:
    """ApproximateTime-style N-stream synchronizer (image_sampler core)."""

    def __init__(self, num_streams: int, slop_s: float = 0.1,
                 max_queue: int = 100):
        self._lib = get_lib()
        self.num_streams = num_streams
        self._h = self._lib.sync_create(num_streams, int(slop_s * 1e9),
                                        max_queue)

    def push(self, stream: int, stamp_s: float, frame_id: int) -> None:
        self._lib.sync_push(self._h, stream, int(stamp_s * 1e9), frame_id)

    def poll(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        stamps = np.empty(self.num_streams, np.int64)
        ids = np.empty(self.num_streams, np.int64)
        if self._lib.sync_poll(self._h, _ptr(stamps), _ptr(ids)):
            return stamps / 1e9, ids
        return None

    def __del__(self):
        try:
            self._lib.sync_destroy(self._h)
        except Exception:
            pass


class BurstSampler:
    """Synchronizer + burst gate: `burst_img_count` tuples per
    `burst_period` seconds (image_sampler.cpp:32-94)."""

    def __init__(self, num_streams: int, slop_s: float = 0.1,
                 max_queue: int = 100, burst_period: float = 1.0,
                 burst_img_count: int = 5):
        self._lib = get_lib()
        self.num_streams = num_streams
        self._h = self._lib.burst_create(num_streams, int(slop_s * 1e9),
                                         max_queue, burst_period,
                                         burst_img_count)

    def push(self, stream: int, stamp_s: float, frame_id: int) -> None:
        self._lib.burst_push(self._h, stream, int(stamp_s * 1e9), frame_id)

    def poll(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        stamps = np.empty(self.num_streams, np.int64)
        ids = np.empty(self.num_streams, np.int64)
        if self._lib.burst_poll(self._h, _ptr(stamps), _ptr(ids)):
            return stamps / 1e9, ids
        return None

    def __del__(self):
        try:
            self._lib.burst_destroy(self._h)
        except Exception:
            pass


def thermal_to_8bit(ir: np.ndarray, trunc_value: float = 30000.0,
                    bin_thresh: int = 100) -> Tuple[np.ndarray, np.ndarray]:
    """IR16 → (inverted 8-bit, binary mask) (combinedNode.cpp:37-166)."""
    lib = get_lib()
    ir = np.ascontiguousarray(ir, dtype=np.uint16)
    out = np.empty(ir.shape, np.uint8)
    mask = np.empty(ir.shape, np.uint8)
    lib.thermal_to_8bit(_ptr(ir), _ptr(out), _ptr(mask), ir.size,
                        trunc_value, bin_thresh)
    return out, mask


def gray_binarize(gray: np.ndarray, thresh: int = 140) -> np.ndarray:
    lib = get_lib()
    gray = np.ascontiguousarray(gray, dtype=np.uint8)
    out = np.empty(gray.shape, np.uint8)
    lib.gray_binarize(_ptr(gray), _ptr(out), gray.size, thresh)
    return out


class MessageBus:
    """In-process pub/sub bus (native pubsub.cpp) — the msg_filter
    scaffolding equivalent (firstNode/secondNode, ros_src/learn_msg_filter).

    Topics are strings; messages are (stamp_s, bytes) with per-subscriber
    bounded drop-oldest queues like ros::Publisher queue_size semantics.
    """

    def __init__(self):
        self._lib = get_lib()
        self._h = self._lib.bus_create()

    def subscribe(self, topic: str, queue_size: int = 5) -> int:
        return self._lib.bus_subscribe(self._h, topic.encode(), queue_size)

    def publish(self, topic: str, stamp_s: float, payload: bytes) -> None:
        buf = np.frombuffer(payload, dtype=np.uint8)
        self._lib.bus_publish(self._h, topic.encode(), int(stamp_s * 1e9),
                              _ptr(np.ascontiguousarray(buf)), len(payload))

    def poll(self, sub_id: int, max_len: int = 1 << 20):
        """Dequeue one message; None if the queue is empty.

        Raises ``BufferError`` when the head message exceeds ``max_len``
        (C layer returns -2 and leaves it queued) — silently returning
        None there would make every drain loop spin forever on the
        oversized message."""
        stamp = np.empty(1, np.int64)
        buf = np.empty(max_len, np.uint8)
        n = self._lib.bus_poll(self._h, sub_id, _ptr(stamp), _ptr(buf),
                               max_len)
        if n == -2:
            raise BufferError(
                f"queued message exceeds max_len={max_len}; retry poll() "
                "with a larger buffer")
        if n < 0:
            return None
        return float(stamp[0]) / 1e9, bytes(buf[:n].tobytes())

    def pending(self, sub_id: int) -> int:
        return self._lib.bus_pending(self._h, sub_id)

    def __del__(self):
        try:
            self._lib.bus_destroy(self._h)
        except Exception:
            pass
