"""Sequence log persistence.

Replaces rosbag storage: a session is (scans, odometry[, ground_truth])
arrays. Two formats:

  * ``.npz`` — numpy archive (portable, python-only path).
  * ``.dsl`` — the native binary log format implemented by the C++ host
    runtime (native/log_io.cc) for mmap-speed loading; this module uses
    the native library through ctypes when available and transparently
    falls back to a pure-python reader/writer of the same format.

The .dsl layout (little-endian):
  magic  u32 = 0x44504C31 ("DPL1")
  T      u32   timesteps
  B      u32   beams per scan
  flags  u32   bit0: has ground truth
  scans      f32[T, B]
  odometry   f32[T, 3]
  ground_truth f32[T, 3]   (iff flag)
"""

from __future__ import annotations

import ctypes
import pathlib
import struct

import numpy as np

from dpg_slam_tpu.io.dataset import Sequence

__all__ = ["save_sequence", "load_sequence", "native_lib"]

_MAGIC = 0x44504C31


def _find_native() -> ctypes.CDLL | None:
    root = pathlib.Path(__file__).resolve().parents[2]
    so = root / "native" / "build" / "libdpgslam_host.so"
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.dsl_read_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.dsl_read_header.restype = ctypes.c_int
    lib.dsl_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dsl_read.restype = ctypes.c_int
    lib.dsl_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dsl_write.restype = ctypes.c_int
    return lib


_native = None
_native_checked = False


def native_lib() -> ctypes.CDLL | None:
    """The C++ host-runtime library, or None if not built."""
    global _native, _native_checked
    if not _native_checked:
        _native = _find_native()
        _native_checked = True
    return _native


def save_sequence(path: str | pathlib.Path, seq: Sequence) -> None:
    path = pathlib.Path(path)
    if path.suffix == ".npz":
        np.savez_compressed(
            path,
            scans=seq.scans,
            odometry=seq.odometry,
            ground_truth=seq.ground_truth,
        )
        return
    if path.suffix != ".dsl":
        raise ValueError(f"unknown log format {path.suffix}")
    T, B = seq.scans.shape
    has_gt = seq.ground_truth is not None
    lib = native_lib()
    scans = np.ascontiguousarray(seq.scans, np.float32)
    odom = np.ascontiguousarray(seq.odometry, np.float32)
    gt = np.ascontiguousarray(
        seq.ground_truth if has_gt else np.zeros((0, 3)), np.float32
    )
    if lib is not None:
        ret = lib.dsl_write(
            str(path).encode(),
            T,
            B,
            1 if has_gt else 0,
            scans.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            odom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if ret != 0:
            raise IOError(f"native dsl_write failed with code {ret}")
        return
    with open(path, "wb") as f:
        f.write(struct.pack("<IIII", _MAGIC, T, B, 1 if has_gt else 0))
        f.write(scans.tobytes())
        f.write(odom.tobytes())
        if has_gt:
            f.write(gt.tobytes())


def load_sequence(path: str | pathlib.Path) -> Sequence:
    path = pathlib.Path(path)
    if path.suffix == ".npz":
        data = np.load(path)
        return Sequence(
            scans=data["scans"],
            odometry=data["odometry"],
            ground_truth=data.get("ground_truth"),
        )
    if path.suffix != ".dsl":
        raise ValueError(f"unknown log format {path.suffix}")
    lib = native_lib()
    if lib is not None:
        T = ctypes.c_uint32()
        B = ctypes.c_uint32()
        flags = ctypes.c_uint32()
        ret = lib.dsl_read_header(
            str(path).encode(), ctypes.byref(T), ctypes.byref(B), ctypes.byref(flags)
        )
        if ret != 0:
            raise IOError(f"native dsl_read_header failed with code {ret}")
        T, B, flags = T.value, B.value, flags.value
        scans = np.empty((T, B), np.float32)
        odom = np.empty((T, 3), np.float32)
        gt = np.empty((T, 3), np.float32) if flags & 1 else np.empty((0, 3), np.float32)
        ret = lib.dsl_read(
            str(path).encode(),
            scans.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            odom.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if ret != 0:
            raise IOError(f"native dsl_read failed with code {ret}")
        return Sequence(scans=scans, odometry=odom, ground_truth=gt if flags & 1 else None)
    with open(path, "rb") as f:
        magic, T, B, flags = struct.unpack("<IIII", f.read(16))
        if magic != _MAGIC:
            raise IOError(f"{path}: bad magic {magic:#x}")
        scans = np.frombuffer(f.read(T * B * 4), np.float32).reshape(T, B)
        odom = np.frombuffer(f.read(T * 3 * 4), np.float32).reshape(T, 3)
        gt = None
        if flags & 1:
            gt = np.frombuffer(f.read(T * 3 * 4), np.float32).reshape(T, 3)
    return Sequence(scans=scans.copy(), odometry=odom.copy(),
                    ground_truth=None if gt is None else gt.copy())
