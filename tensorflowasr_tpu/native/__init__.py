"""Native (C++) components, loaded via ctypes with pure-Python fallbacks.

The shared library is built on demand from the bundled sources (g++) and
cached next to them; ``lib()`` returns None when no toolchain is available,
in which case callers fall back to the Python implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger("tensorflowasr_tpu")

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtfasr_native.so")
_SOURCES = [os.path.join(_NATIVE_DIR, "flac_decoder.cc")]

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, *_SOURCES]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native build unavailable (%s); using pure-Python fallbacks", e)
        return False


def lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or any(os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in _SOURCES):
            if not _build():
                return None
        try:
            l = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.info("failed to load native lib: %s", e)
            return None
        l.tfasr_flac_info.restype = ctypes.c_int
        l.tfasr_flac_info.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        l.tfasr_flac_decode.restype = ctypes.c_int64
        l.tfasr_flac_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _lib = l
        return _lib


def read_flac_native(path: str):
    """Decode a FLAC file with the native decoder.

    Returns (float32 samples [N] or [N, C], rate) or None if unavailable.
    """
    import numpy as np

    l = lib()
    if l is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    rate = ctypes.c_int32()
    channels = ctypes.c_int32()
    bps = ctypes.c_int32()
    total = ctypes.c_int64()
    if l.tfasr_flac_info(data, len(data), ctypes.byref(rate), ctypes.byref(channels), ctypes.byref(bps), ctypes.byref(total)) != 0:
        return None
    n = int(total.value)
    ch = int(channels.value)
    out = np.empty(n * ch, np.int32)
    written = l.tfasr_flac_decode(data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)
    if written < 0:
        logger.warning("native FLAC decode failed (%d) for %s; falling back", written, path)
        return None
    pcm = out[: written * ch].reshape(-1, ch)
    scale = float(1 << (int(bps.value) - 1))
    x = (pcm.astype(np.float32) / scale).astype(np.float32)
    if ch == 1:
        x = x[:, 0]
    return x, int(rate.value)
