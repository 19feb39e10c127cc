"""Native (C++) components: the scanline rasterizer and TIFF decoders.

Built on demand with the system compiler into shared libraries next to
the sources; loaded via ctypes.  The loaders return None when no compiler
is available — callers fall back to the pure-Python implementations
(geo/rasterize.py, io/geotiff.py).
"""
import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCE = os.path.join(_HERE, "rasterize.cpp")
# the non-".so" filename keeps Python's import machinery from mistaking
# the ctypes library for an importable extension module in package walks
_LIBRARY = os.path.join(_HERE, "librasterize.bin")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SOURCE,
        "-o",
        _LIBRARY,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_rasterizer():
    """Load (building if necessary) the native rasterizer, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIBRARY) or os.path.getmtime(
                _LIBRARY
            ) < os.path.getmtime(_SOURCE):
                _build()
            lib = ctypes.CDLL(_LIBRARY)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("Native rasterizer unavailable (%s); using numpy", e)
            return None

        c_double_p = ctypes.POINTER(ctypes.c_double)
        c_int64_p = ctypes.POINTER(ctypes.c_int64)
        for name, value_type in (
            ("rasterize_int32", ctypes.POINTER(ctypes.c_int32)),
            ("rasterize_float64", c_double_p),
            ("rasterize_uint8", ctypes.POINTER(ctypes.c_uint8)),
        ):
            func = getattr(lib, name)
            func.restype = None
            func.argtypes = [
                c_double_p,
                c_int64_p,
                c_int64_p,
                ctypes.c_int64,
                value_type,
                value_type,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
            ]
        _lib = lib
        return _lib


_TIFF_SOURCE = os.path.join(_HERE, "tiffcodec.cpp")
_TIFF_LIBRARY = os.path.join(_HERE, "libtiffcodec.bin")
_tiff_lib = None
_tiff_tried = False


def load_tiffcodec():
    """Load (building if necessary) the native TIFF decoders, or None."""
    global _tiff_lib, _tiff_tried
    with _lock:
        if _tiff_lib is not None or _tiff_tried:
            return _tiff_lib
        _tiff_tried = True
        try:
            if not os.path.exists(_TIFF_LIBRARY) or os.path.getmtime(
                _TIFF_LIBRARY
            ) < os.path.getmtime(_TIFF_SOURCE):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        _TIFF_SOURCE, "-o", _TIFF_LIBRARY,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_TIFF_LIBRARY)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("Native TIFF codec unavailable (%s); using Python", e)
            return None
        u8_p = ctypes.POINTER(ctypes.c_uint8)
        for name in ("lzw_decode", "packbits_decode"):
            func = getattr(lib, name)
            func.restype = ctypes.c_int64
            func.argtypes = [u8_p, ctypes.c_int64, u8_p, ctypes.c_int64]
        _tiff_lib = lib
        return _tiff_lib


def tiff_decode_native(kind, data, expected_size):
    """Decode an LZW/PackBits TIFF chunk natively.

    Returns the decoded bytes, None when the native library is missing
    (caller falls back to Python), or raises on corrupt input.
    """
    lib = load_tiffcodec()
    if lib is None:
        return None
    func = lib.lzw_decode if kind == "lzw" else lib.packbits_decode
    # chunks may decode to slightly more than the nominal tile/strip
    # payload (trailing pad rows); give some slack then retry-grow
    capacity = int(expected_size) + 4096
    for _ in range(3):
        out = np.empty(capacity, dtype=np.uint8)
        n = func(
            np.frombuffer(data, dtype=np.uint8).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)
            ),
            len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            capacity,
        )
        if n == -1:
            raise ValueError("Corrupt %s stream" % kind)
        if n == -2:
            capacity *= 4
            continue
        return out[: int(n)].tobytes()
    raise ValueError("%s output exceeded expected size" % kind)


_FETCH_SOURCE = os.path.join(_HERE, "fetchdecode.cpp")
_FETCH_LIBRARY = os.path.join(_HERE, "libfetchdecode.bin")
_fetch_lib = None
_fetch_tried = False


def load_fetchdecode():
    """Load (building if necessary) the native fetch unpacker, or None."""
    global _fetch_lib, _fetch_tried
    with _lock:
        if _fetch_lib is not None or _fetch_tried:
            return _fetch_lib
        _fetch_tried = True
        try:
            if not os.path.exists(_FETCH_LIBRARY) or os.path.getmtime(
                _FETCH_LIBRARY
            ) < os.path.getmtime(_FETCH_SOURCE):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _FETCH_SOURCE, "-o", _FETCH_LIBRARY,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_FETCH_LIBRARY)
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("Native fetch decoder unavailable (%s); using numpy", e)
            return None
        u8_p = ctypes.POINTER(ctypes.c_uint8)
        lib.fetch_decode.restype = None
        lib.fetch_decode.argtypes = [
            u8_p, ctypes.c_int64, u8_p, ctypes.c_int64, u8_p,
        ]
        _fetch_lib = lib
        return _fetch_lib


def fetch_decode_native(packed, lut, out):
    """Gather ``out[i] = lut[packed[i]]`` rows natively.

    ``packed`` is a C-contiguous uint8 array (any shape), ``lut`` a
    C-contiguous (256, ...) array whose row byte-width matches ``out``'s
    trailing extent; ``out`` must be C-contiguous with out.size ==
    packed.size * lut[0].size elements of lut's dtype.  Returns False when
    the native library is unavailable (caller falls back to numpy).
    """
    lib = load_fetchdecode()
    if lib is None:
        return False
    stride = lut.nbytes // 256
    u8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.fetch_decode(
        packed.ctypes.data_as(u8_p),
        packed.size,
        lut.ctypes.data_as(u8_p),
        stride,
        out.ctypes.data_as(u8_p),
    )
    return True


_FUNC_BY_DTYPE = {
    "int32": "rasterize_int32",
    "float64": "rasterize_float64",
    "uint8": "rasterize_uint8",
}


def rasterize_native(polygon_coords, ring_sizes, ring_counts, values, out, gt):
    """Burn features into ``out`` (2D) using the native scanline rasterizer.

    Args mirror the flat layout documented in rasterize.cpp.  Returns False
    when the native library is unavailable (caller must fall back).
    """
    lib = load_rasterizer()
    if lib is None:
        return False
    func_name = _FUNC_BY_DTYPE.get(str(out.dtype))
    if func_name is None:
        return False

    coords = np.ascontiguousarray(polygon_coords, dtype=np.float64)
    sizes = np.ascontiguousarray(ring_sizes, dtype=np.int64)
    counts = np.ascontiguousarray(ring_counts, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=out.dtype)
    assert out.flags["C_CONTIGUOUS"]

    p, a, _, q, _, d = gt
    func = getattr(lib, func_name)
    func(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(counts),
        values.ctypes.data_as(func.argtypes[4]),
        out.ctypes.data_as(func.argtypes[5]),
        out.shape[0],
        out.shape[1],
        float(p),
        float(a),
        float(q),
        float(d),
    )
    return True
