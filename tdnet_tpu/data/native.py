"""ctypes binding for the native C++ frame loader (native/loader.cpp).

Builds on demand with the system toolchain (g++ + libz); falls back to
the pure-Python FrameSource when the toolchain or library is
unavailable. The native pool decodes PNGs (own zlib-based decoder),
resizes (cv2-convention bilinear), normalizes, and prefetches frames
in submission order on a bounded ring.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtdloader.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tdl_create.restype = ctypes.c_void_p
    lib.tdl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_int]
    lib.tdl_next.restype = ctypes.c_int
    lib.tdl_next.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_int)]
    lib.tdl_destroy.argtypes = [ctypes.c_void_p]
    lib.tdl_decode_png.restype = ctypes.c_int
    lib.tdl_decode_png.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                   ctypes.POINTER(ctypes.c_ubyte),
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    return get_lib() is not None


def decode_png(data: bytes):
    """Decode a PNG byte string -> uint8 array [H, W, C] (C in {1, 3})."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = lib.tdl_decode_png(data, len(data), None, ctypes.byref(w),
                           ctypes.byref(h))
    if c == 0:
        raise ValueError("PNG decode failed")
    buf = np.empty((h.value, w.value, 3 if c != 1 else 1), np.uint8)
    # second call fills; decoder outputs c==1 for gray, 3 otherwise
    c2 = lib.tdl_decode_png(
        data, len(data), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.byref(w), ctypes.byref(h))
    assert c2 == c
    return buf


class NativeFrameSource:
    """Drop-in for data.streaming.FrameSource backed by the C++ pool."""

    def __init__(self, img_path: str, in_size: tuple[int, int],
                 n_threads: int = 4, normalize: bool = True):
        from tdnet_tpu.data.streaming import recursive_glob
        self.files = recursive_glob(img_path, ".png")
        if not self.files:
            raise FileNotFoundError(f"no .png frames under {img_path}")
        self.in_size = in_size
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(self.files))(
            *[f.encode() for f in self.files])
        self._handle = lib.tdl_create(arr, len(self.files), in_size[0],
                                      in_size[1], n_threads,
                                      1 if normalize else 0, 8)

    def __len__(self):
        return len(self.files)

    def __iter__(self):
        h, w = self.in_size
        buf = np.empty((h, w, 3), np.float32)
        for path in self.files:
            oh = ctypes.c_int()
            ow = ctypes.c_int()
            rc = self._lib.tdl_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(oh), ctypes.byref(ow))
            if rc < 0:
                return
            if rc == 0:
                continue  # undecodable frame skipped
            yield (buf.copy()[None], os.path.basename(path),
                   os.path.basename(os.path.dirname(path)),
                   (oh.value, ow.value))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.tdl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
