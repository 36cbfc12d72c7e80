"""ctypes binding + lazy build of the native capture reader.

`CaptureReader` iterates (sample_offset, planar int8 block) tuples with
overlap-save halos, prefetched by a C++ producer thread (capture_reader.cpp
— the sdrrcv.c:3-107 ring-buffer equivalent). Falls back to a pure-numpy
reader when no C++ toolchain is available, keeping the API identical.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "capture_reader.cpp")
_SO = os.path.join(_HERE, "_capture_reader.so")
_LOCK = threading.Lock()
_LIB = None
_BUILD_ERR: str | None = None


def _build() -> str | None:
    """Compile the shared library if missing/stale. Returns error or None."""
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return None
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               _SRC, "-o", _SO + ".tmp"]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            return r.stderr[-2000:]
        os.replace(_SO + ".tmp", _SO)
        return None
    except Exception as e:          # toolchain missing, read-only fs, ...
        return repr(e)


def _load():
    global _LIB, _BUILD_ERR
    with _LOCK:
        if _LIB is not None or _BUILD_ERR is not None:
            return _LIB
        err = _build()
        if err is not None:
            _BUILD_ERR = err
            return None
        lib = ctypes.CDLL(_SO)
        lib.rdr_open.restype = ctypes.c_void_p
        lib.rdr_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int,
                                 ctypes.c_int]
        lib.rdr_next.restype = ctypes.c_int64
        lib.rdr_next.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.POINTER(ctypes.c_int8)),
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.rdr_release.argtypes = [ctypes.c_void_p]
        lib.rdr_close.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "rdr_quantpack"):
            lib.rdr_quantpack.restype = None
            lib.rdr_quantpack.argtypes = [
                ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int8)]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def quantpack_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "rdr_quantpack")


def quantpack(w: np.ndarray, lut: np.ndarray, bits: int) -> np.ndarray:
    """Fused quantize + bit-pack of planar int8 planes (C++, GIL-free).

    w: (n_planes, W) contiguous int8; lut: 256-entry int8 quantizer
    indexed by the raw byte's uint8 value; bits in {4, 2, 1}. Returns
    (n_planes, W*bits//8) int8 in the BLOCK wire layout rx_stream's
    device unpack expects. Must only be called when
    quantpack_available(); the numpy path is the fallback.
    """
    lib = _load()
    n_planes, width = w.shape
    assert w.dtype == np.int8 and w.flags.c_contiguous
    out = np.empty((n_planes, width * bits // 8), np.int8)
    lib.rdr_quantpack(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_int64(n_planes), ctypes.c_int64(width),
        np.ascontiguousarray(lut, np.int8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_int(bits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out


class CaptureReader:
    """Stream a uint8 I/Q capture as planar int8 blocks with halos.

    Iterating yields (sample_offset, block) where block is an int8 array of
    shape (2, halo + n) — row 0 = I plane, row 1 = Q plane — and
    sample_offset indexes the first post-halo sample. The final block may
    be shorter than `block_samples`.
    """

    def __init__(self, path: str, block_samples: int,
                 halo_samples: int = 0, n_buffers: int = 4,
                 force_numpy: bool = False):
        self.path = path
        self.block = int(block_samples)
        self.halo = int(halo_samples)
        self.n_buffers = int(n_buffers)
        self._h = None
        self._lib = None if force_numpy else _load()
        if self._lib is not None:
            self._h = self._lib.rdr_open(path.encode(), self.block,
                                         self.halo, self.n_buffers, 1)
            if not self._h:
                raise FileNotFoundError(path)
        else:
            if not os.path.exists(path):
                raise FileNotFoundError(path)

    @property
    def using_native(self) -> bool:
        return self._h is not None

    def __iter__(self):
        if self._h is not None:
            yield from self._iter_native()
        else:
            yield from self._iter_numpy()

    def _iter_native(self):
        data = ctypes.POINTER(ctypes.c_int8)()
        off = ctypes.c_int64()
        while True:
            n = self._lib.rdr_next(self._h, ctypes.byref(data),
                                   ctypes.byref(off))
            if n == 0:
                return
            total = self.halo + n
            buf = np.ctypeslib.as_array(data, shape=(2 * total,))
            out = buf.reshape(2, total).copy()    # copy before release
            self._lib.rdr_release(self._h)
            yield int(off.value), out

    def _iter_numpy(self):
        halo = np.zeros((2, self.halo), np.int8)
        offset = 0
        with open(self.path, "rb") as f:
            while True:
                raw = np.frombuffer(f.read(2 * self.block), dtype=np.uint8)
                n = raw.size // 2
                if n == 0:
                    return
                conv = (raw[: 2 * n] ^ 0x80).view(np.int8)
                block = np.stack([conv[0::2], conv[1::2]])
                out = np.concatenate([halo, block], axis=1)
                if self.halo:
                    halo = block[:, -self.halo:] if n >= self.halo else \
                        np.concatenate([halo, block], axis=1)[:, -self.halo:]
                yield offset, out
                offset += n

    def close(self) -> None:
        if self._h is not None:
            self._lib.rdr_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
