"""Differential verification of the J2K surface.

Two layers:

1. A hand-derived T.800 B.12 order pin for the PARTIAL-first-precinct
   trigger (runs everywhere): when a tile's reference origin is not on
   a component's scaled precinct grid, the position progressions must
   visit that precinct at the TILE origin (the ``x == tx0`` arm of
   pi.c's position test), not at the component's clamped origin scaled
   up — the two rules order packets differently across resolutions.

2. Binding-gated external-decoder differentials: when glymur / PIL /
   opj_decompress is available in the environment, every new-geometry
   fixture (image/tile offsets, subsampling, misaligned precinct
   grids, POC) is encoded by this repo and decoded by the EXTERNAL
   decoder, pixel-compared to the source. This is the cross-check an
   in-repo roundtrip cannot provide: a shared encoder/decoder
   misreading of T.800 passes roundtrips but fails here. The tests
   skip (visibly) where no external binding exists — mirroring the
   policy tests/test_isobmff.py uses for libheif.

Reference parity: the reference repo never parses J2K at all (it
delegates to tifffile/PIL); this module exists to keep the clean-room
codec honest, not to mirror reference behavior.
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pytest

from hortacloud_importer_spark.sources.j2k import (
    _build_bands,
    _packet_sequence,
    decode_j2k,
    encode_j2k,
)


def test_partial_precinct_triggers_at_tile_origin():
    """Hand-derived PCRL order on a tile whose reference origin (x=3)
    is off every precinct grid. Geometry: tile covers reference
    x [3, 11), levels=1, precinct exponent 3 (size 8 in resolution
    coordinates); comp0 full-rate, comp1 subsampled (2, 1).

    Per T.800 B.12 every partial first precinct triggers at x = 3
    (the tile origin), so at that position the loop nest emits
    c0r0, c0r1, c1r0, c1r1, and only comp0's SECOND r1 precinct
    (full, grid corner x = 8) follows. The pre-fix clamped-origin
    rule gave c0r1 x=3 but c0r0/c1r0/c1r1 x=4, mis-sorting
    resolution 1 ahead of resolution 0."""
    comps = [
        _build_bands(8, 8, 1, 8, 8, 8, x0=3, y0=0,
                     precincts=[(3, 3), (3, 3)], rate=(1, 1),
                     tile_origin=(3, 0)),
        _build_bands(8, 4, 1, 8, 8, 8, x0=2, y0=0,
                     precincts=[(3, 3), (3, 3)], rate=(2, 1),
                     tile_origin=(3, 0)),
    ]
    # precinct counts: comp0 r1 spans [3,11) -> 2 precincts, all else 1
    assert comps[0][1][0].pcx == 2
    assert comps[0][0][0].pcx == comps[1][0][0].pcx == 1
    seq = _packet_sequence(3, [2, 2], 2, 1, comps)  # PCRL
    assert [(c, r, p) for (l, r, c, p) in seq] == [
        (0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, 0), (0, 1, 1),
    ]


def test_partial_precinct_trigger_is_per_axis():
    """The tile-origin fallback applies PER AXIS: a precinct partial
    in x but aligned in y keys at (grid_y, tx0)."""
    from hortacloud_importer_spark.sources.j2k import _pgrid_pos

    comps = [
        _build_bands(16, 8, 1, 8, 8, 8, x0=3, y0=0,
                     precincts=[(3, 3), (3, 3)], rate=(1, 1),
                     tile_origin=(3, 0)),
    ]
    _, pos = _pgrid_pos(comps)
    b = comps[0][1][0]
    assert (b.pcx, b.pcy) == (2, 2)
    # precinct raster: p = py * pcx + px
    assert pos(0, 1, 0) == (0, 3)   # partial in x, aligned in y
    assert pos(0, 1, 1) == (0, 8)   # full
    assert pos(0, 1, 2) == (8, 3)   # y row 2 aligned at 8, x partial
    assert pos(0, 1, 3) == (8, 8)


# --- external-decoder differentials (binding-gated) -----------------

def _decode_with_glymur(data: bytes) -> "np.ndarray | None":
    try:
        import glymur
    except ImportError:
        return None
    with tempfile.NamedTemporaryFile(suffix=".j2k") as f:
        f.write(data)
        f.flush()
        return np.asarray(glymur.Jp2k(f.name)[:])


def _decode_with_pil(data: bytes) -> "np.ndarray | None":
    try:
        from PIL import Image
    except ImportError:
        return None
    with tempfile.NamedTemporaryFile(suffix=".j2k") as f:
        f.write(data)
        f.flush()
        try:
            with Image.open(f.name) as im:
                return np.asarray(im)
        except Exception:
            return None  # PIL built without openjpeg


def _decode_with_opj(data: bytes) -> "np.ndarray | None":
    if shutil.which("opj_decompress") is None:
        return None
    with tempfile.TemporaryDirectory() as d:
        src = Path(d) / "in.j2k"
        dst = Path(d) / "out.pgx"
        src.write_bytes(data)
        r = subprocess.run(
            ["opj_decompress", "-i", str(src), "-o", str(dst)],
            capture_output=True,
        )
        if r.returncode != 0:
            return None
        # PGX is per-component; single-component gray fixtures only
        raw = dst.read_bytes() if dst.exists() else None
        if raw is None:
            return None
        head, _, body = raw.partition(b"\n")
        parts = head.split()
        w, h = int(parts[-2]), int(parts[-1])
        depth = int(parts[-3].lstrip(b"+-").decode())
        dt = np.dtype(">u2" if depth > 8 else "u1")
        return (
            np.frombuffer(body, dtype=dt, count=h * w)
            .reshape(h, w)
            .astype(np.uint16 if depth > 8 else np.uint8)
        )


_EXTERNAL = [
    ("glymur", _decode_with_glymur),
    ("PIL", _decode_with_pil),
    ("opj_decompress", _decode_with_opj),
]


def _new_geometry_fixtures():
    rng = np.random.default_rng(20260816)
    gray = rng.integers(0, 255, (37, 53), dtype=np.uint8)
    return [
        # image+tile offsets, tile grid misaligned to precinct grids
        ("offsets_rpcl", gray, dict(
            levels=2, prog=2, tile=(16, 16),
            precincts=[(3, 3)] * 3, offsets=(3, 5, 0, 0),
        )),
        ("offsets_pcrl", gray, dict(
            levels=2, prog=3, tile=(16, 16),
            precincts=[(4, 3)] * 3, offsets=(7, 1, 4, 0),
        )),
        ("offsets_cprl_odd_origin", gray, dict(
            levels=3, prog=4, precincts=[(3, 4)] * 4,
            offsets=(1, 1, 0, 0),
        )),
    ]


@pytest.mark.parametrize(
    "name,img,kw", _new_geometry_fixtures(),
    ids=[n for n, _, _ in _new_geometry_fixtures()],
)
def test_new_geometry_roundtrips_in_repo(name, img, kw):
    """The same fixtures the differential test feeds external decoders
    must at minimum roundtrip in-repo (runs everywhere)."""
    out = decode_j2k(encode_j2k(img, **kw))
    np.testing.assert_array_equal(np.squeeze(out), img)


@pytest.mark.parametrize("dec_name,dec", _EXTERNAL,
                         ids=[n for n, _ in _EXTERNAL])
@pytest.mark.parametrize(
    "name,img,kw", _new_geometry_fixtures(),
    ids=[n for n, _, _ in _new_geometry_fixtures()],
)
def test_external_decoder_reads_new_geometry(dec_name, dec, name, img, kw):
    """INDEPENDENT decode of this repo's new-geometry codestreams.
    Lossless 5/3: the external decoder must reproduce the source
    pixels exactly — including walking the packet sequence our
    encoder emitted, which is what cross-checks the B.12 position
    rules a shared-rule roundtrip cannot."""
    got = dec(encode_j2k(img, **kw))
    if got is None:
        pytest.skip(f"{dec_name} not available in this environment")
    np.testing.assert_array_equal(np.squeeze(got), img)
