"""Corrupt-payload behavior across every clean-room media codec.

At crawl scale, bit-rotted payloads are a certainty; the contract is
that a decoder confronted with ARBITRARY corruption either succeeds
or raises its NAMED parse error — never an IndexError/struct.error
from deep inside the bit readers (which a skip-on-error kernel could
not distinguish from an engine bug), and never a hang. The fuzz here
is seeded and bounded so it is deterministic in CI."""

from __future__ import annotations

import random
import zlib

import numpy as np
import pytest

from hortacloud_importer_spark.sources import (
    avi,
    bmp,
    flac,
    gif,
    jpeg,
    jpeg_arith,
    png,
    tiff,
    wav,
    webp,
)
from hortacloud_importer_spark.sources.j2k import J2kUnsupported
from hortacloud_importer_spark.sources.jp2 import Jp2ParseError, decode_jp2, encode_jp2


def _mutations(payload: bytes, n: int, seed: int):
    rnd = random.Random(seed)
    for trial in range(n):
        b = bytearray(payload)
        mode = trial % 3
        if mode == 0:  # truncate anywhere
            b = b[: rnd.randrange(len(b))]
        elif mode == 1:  # flip 1-4 bytes
            for _ in range(rnd.randrange(1, 5)):
                b[rnd.randrange(len(b))] = rnd.randrange(256)
        else:  # splice 8 garbage bytes
            at = rnd.randrange(len(b))
            b[at : at + 8] = bytes(rnd.randrange(256) for _ in range(8))
        yield bytes(b)


def _fixture_payloads():
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    frames = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    pcm = rng.integers(-2000, 2000, (256,), dtype=np.int16)
    img16 = rng.integers(0, 65535, (16, 16), dtype=np.uint16)
    return [
        ("gif", gif.encode_gif(img, pal), gif.decode_gif, (gif.GifParseError,)),
        ("bmp", bmp.encode_bmp(rgb), bmp.decode_bmp, (bmp.BmpParseError,)),
        (
            "avi",
            avi.encode_avi(frames, codec="DIB"),
            avi.decode_avi,
            (avi.AviParseError, jpeg.JpegParseError),
        ),
        ("png", png.encode_png(img), png.decode_png, (png.PngParseError,)),
        (
            "apng",
            png.encode_apng([rgb, rgb], dispose=1),
            png.decode_png_frames,
            (png.PngParseError,),
        ),
        ("jpeg", jpeg.encode_jpeg(img), jpeg.decode_jpeg, (jpeg.JpegParseError,)),
        (
            "jpeg_arith",
            jpeg_arith.encode_jpeg_arith(img),
            jpeg.decode_jpeg,
            (jpeg.JpegParseError,),
        ),
        (
            "tiff",
            tiff.encode_tiff(img16[None, ...], compression="zlib"),
            tiff.decode_tiff,
            (tiff.TiffParseError,),
        ),
        (
            "wav",
            wav.encode_wav(pcm, rate=8000),
            lambda b: wav.decode_wav(b)[0],
            (wav.WavParseError,),
        ),
        (
            "flac",
            flac.encode_flac(
                pcm.astype(np.int64), rate=8000, block_size=192
            ),
            lambda b: flac.decode_flac(b)[0],
            (flac.FlacParseError,),
        ),
        ("webp", webp.encode_webp(rgb), webp.decode_webp, (webp.WebpParseError,)),
    ]


@pytest.mark.parametrize(
    "name,payload,decode,allowed",
    _fixture_payloads(),
    ids=[f[0] for f in _fixture_payloads()],
)
def test_fuzzed_corruption_raises_named_errors(name, payload, decode, allowed):
    seed = zlib.crc32(name.encode()) & 0xFFFF  # stable across processes
    for mutated in _mutations(payload, 600, seed=seed):
        try:
            decode(mutated)
        except allowed:
            pass
        # any other exception type propagates and fails the test


def test_fuzzed_jp2_raises_named_errors():
    rng = np.random.default_rng(99)
    img16 = rng.integers(0, 65535, (16, 16), dtype=np.uint16)
    payload = encode_jp2(img16, levels=1)
    # NotImplementedError is decode_jp2's documented binding gate: a
    # mangled header can look like an out-of-scope geometry
    allowed = (Jp2ParseError, J2kUnsupported, NotImplementedError)
    for mutated in _mutations(payload, 250, seed=0x32AF):
        try:
            decode_jp2(mutated)
        except allowed:
            pass


def test_media_features_error_modes(spark):
    from hortacloud_importer_spark.operators.multimodal import media_features

    rng = np.random.default_rng(7)
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    good = gif.encode_gif(rng.integers(0, 256, (8, 8), dtype=np.uint8), pal)
    bad = good[: len(good) // 2]
    media = spark.createDataFrame(
        [
            (1, "image", "gif", bytearray(good), (8, 8, 3, 0, 1)),
            (2, "image", "gif", bytearray(bad), (8, 8, 3, 0, 1)),
        ],
        "media_id long, kind string, format string, payload binary, "
        "meta struct<height:int,width:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    )
    # raise (default): the corrupt row fails the job
    with pytest.raises(Exception, match="Gif|LZW|truncated"):
        media_features(media).collect()
    # skip: only the clean row survives, schema unchanged
    rows = media_features(media, errors="skip").collect()
    assert [r["media_id"] for r in rows] == [1]
    assert "decode_error" not in rows[0].asDict()
    # tag: both rows, the corrupt one zeroed and labeled
    rows = {r["media_id"]: r for r in media_features(media, errors="tag").collect()}
    assert rows[1]["decode_error"] is None and rows[1]["n_bytes"] > 0
    assert "GifParseError" in rows[2]["decode_error"]
    # n_bytes is a payload property — the tagged row keeps the true
    # length (quarantine queries size the corrupt set with it)
    assert rows[2]["n_bytes"] == len(bad)
    with pytest.raises(ValueError, match="raise/skip/tag"):
        media_features(media, errors="quarantine")


def test_resize_and_frame_sample_skip_modes(spark):
    """The composable kernels get the same crawl knob: skip drops the
    corrupt row, raise (default) fails the stage."""
    from hortacloud_importer_spark.operators.multimodal import (
        resize_images,
        sample_frames,
    )
    from hortacloud_importer_spark.sources.avi import encode_avi

    rng = np.random.default_rng(13)
    fr = rng.integers(0, 256, (4, 6, 6, 3), dtype=np.uint8)
    good = encode_avi(fr, codec="DIB")
    media = spark.createDataFrame(
        [
            (1, "video", "avi", bytearray(good), (6, 6, 3, 0, 4)),
            (2, "video", "avi", bytearray(good[:50]), (6, 6, 3, 0, 4)),
        ],
        "media_id long, kind string, format string, payload binary, "
        "meta struct<height:int,width:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    )
    rows = sample_frames(media, 2, errors="skip").collect()
    assert sorted(r["media_id"] for r in rows) == [1000, 1002]
    rows = resize_images(media, 3, 3, errors="skip").collect()
    assert [r["media_id"] for r in rows] == [1]
    with pytest.raises(Exception):
        sample_frames(media, 2).collect()
    with pytest.raises(ValueError, match="raise/skip"):
        resize_images(media, 3, 3, errors="tag")


def test_media_features_skip_all_rows_batch(spark):
    """A batch where EVERY row is corrupt still yields the declared
    schema (the empty-DataFrame path in the kernel)."""
    from hortacloud_importer_spark.operators.multimodal import media_features

    media = spark.createDataFrame(
        [(1, "image", "gif", bytearray(b"GIF89a junk"), (1, 1, 1, 0, 1))],
        "media_id long, kind string, format string, payload binary, "
        "meta struct<height:int,width:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    )
    out = media_features(media, errors="skip")
    assert out.count() == 0
    assert out.columns[0] == "media_id"


def test_media_schema_kernels_skip_all_rows_batch(spark):
    """All-skipped batches through the MEDIA_SCHEMA kernels (resize,
    sample_frames) must produce exactly the declared five columns —
    the empty-batch column parser has to split only TOP-LEVEL commas,
    because META_SCHEMA's struct type contains ', ' internally."""
    from hortacloud_importer_spark.operators.multimodal import (
        resize_images,
        sample_frames,
    )

    media = spark.createDataFrame(
        [(1, "video", "avi", bytearray(b"RIFFjunk"), (1, 1, 1, 0, 1))],
        "media_id long, kind string, format string, payload binary, "
        "meta struct<height:int,width:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    ).coalesce(1)
    for out in (
        resize_images(media, 2, 2, errors="skip"),
        sample_frames(media, 1, errors="skip"),
    ):
        rows = out.collect()
        assert rows == []
        assert out.columns == ["media_id", "kind", "format", "payload", "meta"]


def test_empty_batch_column_names_nested_types():
    """The worker-side empty-batch builder handles nested struct/array
    types without the JVM DDL parser."""
    from hortacloud_importer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _empty_batch,
    )

    assert list(_empty_batch(MEDIA_SCHEMA).columns) == [
        "media_id",
        "kind",
        "format",
        "payload",
        "meta",
    ]
    assert list(
        _empty_batch(
            "a int, b map<string, array<struct<x:int, y:int>>>, c string"
        ).columns
    ) == ["a", "b", "c"]


def test_fuzzed_probes_raise_named_errors():
    """Header probes obey the same corruption contract as the full
    decoders — named errors only, never raw struct/Index errors."""
    from hortacloud_importer_spark.sources.jp2 import Jp2ParseError
    from hortacloud_importer_spark.sources.pnm import (
        PnmParseError,
        encode_pnm,
        pnm_probe,
    )
    from hortacloud_importer_spark.sources.webp import webp_probe

    rng = np.random.default_rng(101)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    frames = rng.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
    pcm = rng.integers(-2000, 2000, (256,), dtype=np.int16)
    img16 = rng.integers(0, 65535, (16, 16), dtype=np.uint16)
    cases = [
        ("gif", gif.encode_gif(img, pal), gif.gif_probe, (gif.GifParseError,)),
        ("bmp", bmp.encode_bmp(rgb), bmp.bmp_probe, (bmp.BmpParseError,)),
        (
            "avi",
            avi.encode_avi(frames, codec="DIB"),
            avi.avi_probe,
            (avi.AviParseError,),
        ),
        ("png", png.encode_png(img), png.png_probe, (png.PngParseError,)),
        ("jpeg", jpeg.encode_jpeg(img), jpeg.jpeg_probe, (jpeg.JpegParseError,)),
        (
            "tiff",
            tiff.encode_tiff(img16[None, ...], compression="zlib"),
            tiff.tiff_probe,
            (tiff.TiffParseError,),
        ),
        ("wav", wav.encode_wav(pcm, rate=8000), wav.wav_probe, (wav.WavParseError,)),
        (
            "flac",
            flac.encode_flac(pcm.astype(np.int64), rate=8000),
            flac.flac_probe,
            (flac.FlacParseError,),
        ),
        ("webp", webp.encode_webp(rgb), webp_probe, (webp.WebpParseError,)),
        ("pnm", encode_pnm(rgb), pnm_probe, (PnmParseError,)),
    ]
    for name, payload, probe, allowed in cases:
        seed = zlib.crc32(f"probe-{name}".encode()) & 0xFFFF
        for mutated in _mutations(payload, 400, seed=seed):
            try:
                probe(mutated)
            except allowed:
                pass
