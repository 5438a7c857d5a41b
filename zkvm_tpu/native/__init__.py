"""Native (C++) host modules, loaded via ctypes.

Built lazily with the system compiler on first import (no pybind11 in this
image); falls back silently so the pure-Python oracle remains authoritative.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    here = os.path.dirname(__file__)
    src = os.path.join(here, "strobe.cpp")
    build_dir = os.path.join(here, "build")
    so_path = os.path.join(build_dir, "libzkvmnative.so")
    if not os.path.exists(so_path) or (
        os.path.getmtime(so_path) < os.path.getmtime(src)
    ):
        os.makedirs(build_dir, exist_ok=True)
        subprocess.run(
            ["c++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so_path, src],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(so_path)
    lib.strobe_sizeof.restype = ctypes.c_int
    lib.strobe_init.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t
    ]
    for name in ("strobe_meta_ad", "strobe_ad", "strobe_key"):
        getattr(lib, name).argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int
        ]
    lib.strobe_prf.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int
    ]
    lib.keccak_f1600.argtypes = [ctypes.c_char_p]
    return lib


def get_lib():
    """The native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            if os.environ.get("ZKVM_TPU_NO_NATIVE"):
                return None
            try:
                _lib = _build_and_load()
            except Exception:
                _lib = None
    return _lib


class NativeStrobe128:
    """ctypes-backed Strobe128 with the same API as the oracle class."""

    __slots__ = ("_buf", "_lib")

    def __init__(self, protocol_label: bytes, _copy_from=None):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        self._buf = ctypes.create_string_buffer(lib.strobe_sizeof())
        if _copy_from is None:
            lib.strobe_init(self._buf, protocol_label, len(protocol_label))
        else:
            ctypes.memmove(self._buf, _copy_from._buf, lib.strobe_sizeof())

    def clone(self) -> "NativeStrobe128":
        return NativeStrobe128(b"", _copy_from=self)

    def meta_ad(self, data: bytes, more: bool):
        self._lib.strobe_meta_ad(self._buf, data, len(data), int(more))

    def ad(self, data: bytes, more: bool):
        self._lib.strobe_ad(self._buf, data, len(data), int(more))

    def prf(self, n: int, more: bool) -> bytes:
        out = ctypes.create_string_buffer(n)
        self._lib.strobe_prf(self._buf, out, n, int(more))
        return out.raw

    def key(self, data: bytes, more: bool):
        self._lib.strobe_key(self._buf, data, len(data), int(more))


def make_strobe(protocol_label: bytes):
    """Factory: native when available, else the pure-Python oracle."""
    if get_lib() is not None:
        return NativeStrobe128(protocol_label)
    from ..oracle.strobe import Strobe128
    return Strobe128(protocol_label)
