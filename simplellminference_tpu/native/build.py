"""Build + load the native shared library (g++, cached by source hash)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_CACHE: dict[str, ctypes.CDLL] = {}


def _build(src_path: str, out_path: str):
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
           "-o", out_path, src_path]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(
            f"native build failed for {src_path}:\n{res.stderr}")


def load_library(name: str) -> ctypes.CDLL:
    """Compile native/<name>.cpp (once per source hash) and dlopen it."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_HERE, f"{name}.cpp")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(
            os.environ.get("SLI_NATIVE_CACHE",
                           os.path.join(tempfile.gettempdir(),
                                        "sli_native")), digest)
        os.makedirs(cache_dir, exist_ok=True)
        so = os.path.join(cache_dir, f"lib{name}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            _build(src, tmp)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        _CACHE[name] = lib
        return lib
