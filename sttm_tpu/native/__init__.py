"""Native (C++) runtime components, loaded via ctypes.

``videodec``: libavformat/avcodec/swscale-backed video decoding — the role
decord plays for the reference (llava/utils.py:26). Built on demand with g++;
``available()`` gates callers so pure-feature eval works without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsttm_videodec.so")
_SRC = os.path.join(_DIR, "videodec.cpp")

_lib = None
_build_error: str | None = None


class VDInfo(ctypes.Structure):
    _fields_ = [
        ("duration", ctypes.c_double),
        ("fps", ctypes.c_double),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
        ("nb_frames", ctypes.c_int64),
    ]


def _build() -> str | None:
    # Compile to a per-pid temp path and rename into place: os.rename is
    # atomic, so concurrent builders (e.g. pytest-xdist workers racing on a
    # stale .so) each load a COMPLETE library instead of another process's
    # half-written output.
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC,
        "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except Exception as e:  # g++ missing etc.
        return str(e)
    if proc.returncode != 0:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return proc.stderr[-2000:]
    os.rename(tmp, _SO)
    return None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build_error = _build()
        if _build_error is not None:
            return
    lib = ctypes.CDLL(_SO)
    lib.vd_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(VDInfo)]
    lib.vd_probe.restype = ctypes.c_int
    lib.vd_decode_uniform.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
    ]
    lib.vd_decode_uniform.restype = ctypes.c_int
    lib.vd_decode_at.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
    ]
    lib.vd_decode_at.restype = ctypes.c_int
    lib.vd_encode_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int
    ]
    lib.vd_encode_test_video.restype = ctypes.c_int
    _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> str | None:
    _load()
    return _build_error


def probe(path: str) -> dict:
    _load()
    info = VDInfo()
    rc = _lib.vd_probe(path.encode(), ctypes.byref(info))
    if rc != 0:
        raise RuntimeError(f"vd_probe({path}) failed: {rc}")
    return {
        "duration": info.duration, "fps": info.fps,
        "width": info.width, "height": info.height, "nb_frames": info.nb_frames,
    }


def decode_uniform(path: str, num_frames: int, out_w: int, out_h: int):
    """-> (frames uint8 [n, out_h, out_w, 3], timestamps float64 [n])."""
    _load()
    out = np.empty((num_frames, out_h, out_w, 3), np.uint8)
    ts = np.empty((num_frames,), np.float64)
    rc = _lib.vd_decode_uniform(
        path.encode(), num_frames, out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"vd_decode_uniform({path}) failed: {rc}")
    return out, ts


def decode_at(path: str, timestamps, out_w: int, out_h: int):
    _load()
    t = np.ascontiguousarray(timestamps, np.float64)
    n = len(t)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ts = np.empty((n,), np.float64)
    rc = _lib.vd_decode_at(
        path.encode(), t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"vd_decode_at({path}) failed: {rc}")
    return out, ts


def encode_test_video(path: str, n: int, w: int, h: int, fps: int = 10):
    _load()
    rc = _lib.vd_encode_test_video(path.encode(), n, w, h, fps)
    if rc != 0:
        raise RuntimeError(f"vd_encode_test_video failed: {rc}")
