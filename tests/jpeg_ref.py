"""Compile-on-demand bridge to the system libjpeg — the independent
conformance reference for the clean-room arithmetic JPEG codec
(sources/jpeg_arith.py). Test-only: the engine never imports this.

Builds tests/jpeg_ref.c with the system cc into a per-session temp
binary; returns None when cc or jpeglib.h is unavailable so callers
can skip."""

from __future__ import annotations

import functools
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "jpeg_ref.c")


@functools.lru_cache(maxsize=1)
def binary() -> str | None:
    out = os.path.join(
        tempfile.gettempdir(), f"jpegref_{os.getuid()}_{os.getpid()}"
    )
    try:
        r = subprocess.run(
            ["cc", "-O2", "-o", out, _SRC, "-ljpeg"],
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if r.returncode != 0 or not os.path.exists(out):
        return None
    # smoke: arithmetic coding must be compiled into this libjpeg
    probe = np.zeros((8, 8), dtype=np.uint8)
    try:
        encode(probe, arith=1, _bin=out)
    except Exception:
        return None
    return out


def encode(
    img: np.ndarray,
    quality: int = 90,
    arith: int = 1,
    prog: int = 0,
    hs: int = 1,
    vs: int = 1,
    ri: int = 0,
    _bin: str | None = None,
) -> bytes:
    exe = _bin or binary()
    assert exe, "libjpeg reference unavailable"
    nc = 1 if img.ndim == 2 else img.shape[2]
    h, w = img.shape[:2]
    with tempfile.TemporaryDirectory() as td:
        raw = os.path.join(td, "i.raw")
        jpg = os.path.join(td, "o.jpg")
        with open(raw, "wb") as f:
            f.write(f"{w} {h} {nc}\n".encode())
            f.write(np.ascontiguousarray(img).tobytes())
        r = subprocess.run(
            [exe, "encode", raw, jpg, str(quality), str(arith),
             str(prog), str(hs), str(vs), str(ri)],
            capture_output=True,
            timeout=60,
        )
        if r.returncode != 0:
            raise RuntimeError(f"jpegref encode: {r.stderr.decode()}")
        with open(jpg, "rb") as f:
            return f.read()


def decode(blob: bytes) -> np.ndarray:
    exe = binary()
    assert exe, "libjpeg reference unavailable"
    with tempfile.TemporaryDirectory() as td:
        jpg = os.path.join(td, "i.jpg")
        raw = os.path.join(td, "o.raw")
        with open(jpg, "wb") as f:
            f.write(blob)
        r = subprocess.run(
            [exe, "decode", jpg, raw], capture_output=True, timeout=60
        )
        if r.returncode != 0:
            raise RuntimeError(f"jpegref decode: {r.stderr.decode()}")
        with open(raw, "rb") as f:
            data = f.read()
    nl = data.index(b"\n")
    w, h, nc = map(int, data[:nl].split())
    return np.frombuffer(data[nl + 1 :], dtype=np.uint8).reshape(h, w, nc)
