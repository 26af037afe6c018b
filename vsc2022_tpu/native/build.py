"""On-demand compilation + ctypes loading of the native components."""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "match_metric.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _cache_dir() -> str:
    d = os.environ.get(
        "VSC2022_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/vsc2022_tpu/native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"vsc_native_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", _SRC, "-o", tmp,
        ]
        logger.info("Building native library: %s", " ".join(cmd))
        subprocess.check_call(cmd)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.vsc_match_metric.restype = ctypes.c_int
    lib.vsc_match_metric.argtypes = [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


def get_library() -> Optional[ctypes.CDLL]:
    """The native library, or None if disabled/unbuildable."""
    global _LIB, _FAILED
    if os.environ.get("VSC2022_TPU_NO_NATIVE") == "1":
        return None
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _FAILED:
            try:
                _LIB = _build()
            except Exception as e:  # toolchain missing → Python fallback
                logger.warning("Native build failed (%s); using Python path", e)
                _FAILED = True
    return _LIB


def native_available() -> bool:
    return get_library() is not None
