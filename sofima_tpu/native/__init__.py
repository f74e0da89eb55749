"""Native (C++) host kernels with lazy compilation and ctypes bindings.

Builds `native.cc` with g++ on first use (cached as a .so next to the
source); all entry points degrade gracefully to pure-Python/JAX
implementations when the toolchain is unavailable. See native.cc for the
kernel inventory (exact EDT, relabeling, CPU remap).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), 'native.cc')
_SO = os.path.join(os.path.dirname(__file__), '_sofima_native.so')


def _build() -> str | None:
  if os.path.exists(_SO) and (os.path.getmtime(_SO)
                              >= os.path.getmtime(_SRC)):
    return _SO
  cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
         '-pthread', _SRC, '-o', _SO]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return _SO
  except Exception:
    return None


def load() -> ctypes.CDLL | None:
  """Returns the native library, building it on first use (or None)."""
  global _LIB, _TRIED
  with _LOCK:
    if _LIB is not None or _TRIED:
      return _LIB
    _TRIED = True
    so = _build()
    if so is None:
      return None
    try:
      lib = ctypes.CDLL(so)
    except OSError:
      return None

    lib.sofima_edt2d.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sofima_relabel.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int]
    lib.sofima_remap_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_int]
    _LIB = lib
    return _LIB


def available() -> bool:
  return load() is not None


def edt2d(mask: np.ndarray, black_border: bool = True,
          num_threads: int = 0) -> np.ndarray | None:
  """Exact 2d EDT via the native kernel; None if unavailable."""
  lib = load()
  if lib is None:
    return None
  mask8 = np.ascontiguousarray(mask != 0, dtype=np.uint8)
  h, w = mask8.shape
  out = np.empty((h, w), np.float32)
  if num_threads <= 0:
    num_threads = min(os.cpu_count() or 1, 16)
  lib.sofima_edt2d(
      mask8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      h, w, int(black_border), num_threads)
  return out


def relabel(data: np.ndarray, sorted_ids: np.ndarray,
            num_threads: int = 0) -> np.ndarray | None:
  """data (uint64) -> indices into sorted_ids; None if unavailable."""
  lib = load()
  if lib is None:
    return None
  data64 = np.ascontiguousarray(data, dtype=np.uint64)
  ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
  out = np.empty(data64.shape, np.int32)
  if num_threads <= 0:
    num_threads = min(os.cpu_count() or 1, 16)
  lib.sofima_relabel(
      data64.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
      ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
      len(ids), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      data64.size, num_threads)
  return out


def remap_bilinear(img: np.ndarray, sy: np.ndarray, sx: np.ndarray,
                   cval: float = 0.0,
                   num_threads: int = 0) -> np.ndarray | None:
  """CPU bilinear remap fallback; None if unavailable."""
  lib = load()
  if lib is None:
    return None
  img32 = np.ascontiguousarray(img, np.float32)
  sy32 = np.ascontiguousarray(sy, np.float32)
  sx32 = np.ascontiguousarray(sx, np.float32)
  out = np.empty(sy32.shape, np.float32)
  if num_threads <= 0:
    num_threads = min(os.cpu_count() or 1, 16)
  lib.sofima_remap_bilinear(
      img32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      img32.shape[0], img32.shape[1],
      sy32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      sx32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
      sy32.size, cval, num_threads)
  return out
