"""ctypes bridge to the system libwebp — the independent conformance
reference for the clean-room VP8/VP8L decoders. Test-only: the engine
itself never imports this."""

from __future__ import annotations

import ctypes

import numpy as np

_PATHS = (
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
    "libwebp.so.7",
    "libwebp.so",
)


def load():
    for p in _PATHS:
        try:
            lib = ctypes.CDLL(p)
            break
        except OSError:
            continue
    else:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


def encode_lossless(lib, img: np.ndarray) -> bytes:
    """Lossless VP8L encode of (h, w, 3|4) uint8 via libwebp."""
    h, w, c = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = lib.WebPEncodeLosslessRGB if c == 3 else lib.WebPEncodeLosslessRGBA
    n = fn(np.ascontiguousarray(img).tobytes(), w, h, w * c,
           ctypes.byref(out))
    if n == 0:
        raise RuntimeError("libwebp lossless encode failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def encode_rgba(lib, rgba: np.ndarray, quality: float) -> bytes:
    """Lossy VP8 + lossless ALPH encode of (h, w, 4) uint8."""
    h, w, _ = rgba.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4,
        ctypes.c_float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("libwebp RGBA encode failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_rgba(lib, data: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise RuntimeError("libwebp RGBA decode failed")
    arr = np.ctypeslib.as_array(p, (h.value, w.value, 4)).copy()
    lib.WebPFree(p)
    return arr


def encode_rgb(lib, rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(rgb).tobytes(), w, h, w * 3,
        ctypes.c_float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("libwebp encode failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_yuv(lib, data: bytes):
    """-> (Y, U, V) uint8 planes as decoded by libwebp."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not yp:
        raise RuntimeError("libwebp decode failed")
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.ctypeslib.as_array(yp, (H, S))[:, :W].copy()
    u = np.ctypeslib.as_array(up, (ch, US))[:, :cw].copy()
    v = np.ctypeslib.as_array(vp, (ch, US))[:, :cw].copy()
    lib.WebPFree(yp)
    return y, u, v


def vp8_chunk(data: bytes) -> bytes:
    """Extract the raw 'VP8 ' chunk payload from a .webp container."""
    import struct

    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"VP8 ":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")
