"""§2.K4 — multimodal query registrations.

The decode/feature kernels are rows-only (binary payloads aren't
SQL-comparable), but the byte-length accounting over real fixture
data IS oracle-checked, which pins down the payload plumbing
(documents.text -> binary -> Arrow batch -> decode -> stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hortacloud_importer_spark.catalog import table
from hortacloud_importer_spark.operators.multimodal import (
    media_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from hortacloud_importer_spark.registry import register


def _doc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as raw8 'audio' payloads (1 x n_bytes x 1)."""
    # the fixture is one small parquet file -> one input split -> one
    # Python worker; spread the Arrow batches across workers before the
    # decode kernel (at real scale the source has many splits and this
    # repartition is unnecessary — splits already parallelize)
    d = table(spark, sf_dir, "documents").repartition(16, "doc_id")
    payload = F.encode("text", "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("raw8").alias("format"),
        payload.alias("payload"),
        F.struct(
            F.lit(1).alias("height"),
            F.octet_length(payload).cast("int").alias("width"),
            F.lit(1).alias("channels"),
            F.lit(8000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


@register(
    "mm_doc_bytes",
    "K4",
    oracle="""
SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
FROM documents
""",
)
def mm_doc_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 payload plumbing, oracle-checked: text -> binary column ->
    mapInPandas decode -> per-item byte count must equal DuckDB's
    octet_length. Only n_bytes is consumed, so the wanted-column
    pushdown skips the stats + 16-bin histogram the opaque mapInPandas
    would otherwise compute and ship for every payload (guide §4.1 —
    Spark cannot prune through the Python boundary itself)."""
    return media_features(
        _doc_media(spark, sf_dir), columns=("n_bytes",)
    ).select("media_id", "n_bytes")


@register(
    "mm_doc_features",
    "K4",
    driver=False,
    oracle="""
WITH bytes AS (
  SELECT doc_id,
         CAST('0x' || substr(hex(encode(text)),
                             CAST(2 * t.i - 1 AS INT), 2) AS INT) AS v
  FROM documents,
       UNNEST(range(1, octet_length(encode(text)) + 1)) AS t(i)
),
stats AS (
  SELECT doc_id, COUNT(*) AS n_bytes, AVG(v) AS mean_intensity,
         MIN(v) AS min_intensity, MAX(v) AS max_intensity
  FROM bytes GROUP BY 1
),
hist AS (
  SELECT doc_id, v // 16 AS bin, COUNT(*) AS c FROM bytes GROUP BY 1, 2
),
hist_full AS (
  SELECT s.doc_id, b.range AS bin, COALESCE(h.c, 0) AS c
  FROM stats s CROSS JOIN range(16) b
  LEFT JOIN hist h ON h.doc_id = s.doc_id AND h.bin = b.range
)
SELECT s.doc_id AS media_id,
       CAST(s.n_bytes AS INT) AS n_bytes,
       s.mean_intensity,
       CAST(s.min_intensity AS INT) AS min_intensity,
       CAST(s.max_intensity AS INT) AS max_intensity,
       (SELECT string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin)
        FROM hist_full h WHERE h.doc_id = s.doc_id) AS hist16_csv
FROM stats s
""",
)
def mm_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 full feature extraction, oracle-exact: intensity stats AND
    the 16-bin histogram over the documents' UTF-8 payload bytes —
    DuckDB regenerates every byte via hex(encode(text)) pair
    extraction, so the whole mapInPandas feature kernel (byte walk,
    integer mean, uint8 binning v >> 4, zero bins included) is pinned
    value-for-value. The histogram ships as CSV so the hash compare
    stays scalar."""
    feats = media_features(_doc_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        "mean_intensity",
        "min_intensity",
        "max_intensity",
        F.array_join(
            F.transform("hist16", lambda v: v.cast("string")), ","
        ).alias("hist16_csv"),
    )


_MM_SEED = 11  # synthetic_media's default seed, shared with the SQL


def _pbyte_sql(m: str, si: str) -> str:
    """DuckDB mirror of synthetic_media(portable=True)'s byte stream:
    byte ``si`` of item ``m`` is hex pair ``si % 16`` of
    ``md5('{seed}:{m}:{si // 16}')``."""
    return (
        f"CAST('0x' || substr(md5('{_MM_SEED}:' || {m} || ':' ||"
        f" (({si}) // 16)), 2 * (({si}) % 16) + 1, 2) AS INT)"
    )


def _h8_sql(m: str, tag: str) -> str:
    """DuckDB mirror of the portable dimension hash."""
    return (
        f"CAST('0x' || substr(md5('{_MM_SEED}:' || {m} || ':{tag}'),"
        " 1, 8) AS BIGINT)"
    )


def _feat_stats_sql(vals_sql: str, facet: str | None = None) -> str:
    """Stats + full 16-bin histogram (CSV) over a ``(media_id, v)``
    byte relation — the SQL dual of media_features' uint8 path (mean
    of ints is an exact long sum + one division in both engines;
    hist bin = v >> 4 with zero bins included)."""
    facet_col = f"'{facet}' AS facet,\n       " if facet else ""
    return f"""
WITH vals AS ({vals_sql}),
stats AS (
  SELECT media_id, COUNT(*) AS n_bytes, AVG(v) AS mean_intensity,
         MIN(v) AS min_intensity, MAX(v) AS max_intensity
  FROM vals GROUP BY 1
),
hist AS (
  SELECT media_id, v // 16 AS bin, COUNT(*) AS c FROM vals GROUP BY 1, 2
),
hist_full AS (
  SELECT s.media_id, b.range AS bin, COALESCE(h.c, 0) AS c
  FROM stats s CROSS JOIN range(16) b
  LEFT JOIN hist h ON h.media_id = s.media_id AND h.bin = b.range
)
SELECT {facet_col}s.media_id,
       CAST(s.n_bytes AS INT) AS n_bytes,
       s.mean_intensity,
       CAST(s.min_intensity AS INT) AS min_intensity,
       CAST(s.max_intensity AS INT) AS max_intensity,
       (SELECT string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin)
        FROM hist_full h WHERE h.media_id = s.media_id) AS hist16_csv
FROM stats s
"""


# nearest-neighbor 8x8 resize of the 64 portable images: output pixel
# (y, x, c) reads source byte ((y*h//8)*w + (x*w//8))*3 + c
_RESIZE_VALS_SQL = f"""
  SELECT p.m AS media_id,
         {_pbyte_sql('p.m', '((p.y * d.h // 8) * d.w + (p.x * d.w // 8)) * 3 + p.c')} AS v
  FROM (
    SELECT tm.range AS m, ty.range AS y, tx.range AS x, tc.range AS c
    FROM range(64) tm CROSS JOIN range(8) ty
    CROSS JOIN range(8) tx CROSS JOIN range(3) tc
  ) p
  JOIN (
    SELECT range AS m,
           4 + {_h8_sql('range', 'h')} % 13 AS h,
           4 + {_h8_sql('range', 'w')} % 13 AS w
    FROM range(64)
  ) d ON d.m = p.m
"""

# every 2nd frame of the 16 portable videos (8x8x1 = 64 bytes/frame);
# the sampled frame becomes media_id m*1000 + fi
_FRAMES_VALS_SQL = f"""
  SELECT m * 1000 + fi AS media_id,
         {_pbyte_sql('m', 'fi * 64 + j')} AS v
  FROM (
    SELECT v.m, t.fi, b.range AS j
    FROM (
      SELECT range AS m, 4 + {_h8_sql('range', 'f')} % 9 AS nf
      FROM range(16)
    ) v,
    UNNEST(range(0, v.nf, 2)) AS t(fi),
    range(64) b
  )
"""

# the documents' UTF-8 payload bytes (mm_doc_features' byte relation)
_DOC_VALS_SQL = """
  SELECT doc_id AS media_id,
         CAST('0x' || substr(hex(encode(text)),
                             CAST(2 * t.i - 1 AS INT), 2) AS INT) AS v
  FROM documents,
       UNNEST(range(1, octet_length(encode(text)) + 1)) AS t(i)
"""


def _feat_csv(df: DataFrame) -> DataFrame:
    """FEATURES_SCHEMA -> scalar-only columns (hist16 -> CSV)."""
    return df.select(
        "media_id",
        "n_bytes",
        "mean_intensity",
        "min_intensity",
        "max_intensity",
        F.array_join(
            F.transform("hist16", lambda v: v.cast("string")), ","
        ).alias("hist16_csv"),
    )


@register("mm_resize_features", "K4",
          oracle=_feat_stats_sql(_RESIZE_VALS_SQL), driver=False)
def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4, oracle-exact since round 14 (was rows-only): portable
    synthetic raw8 images -> nearest-neighbor resize to 8x8 ->
    features. The DuckDB oracle regenerates every payload byte from
    the md5 chain (synthetic_media portable mode), replays the
    nearest-neighbor index arithmetic ((y*h//8)*w + x*w//8 per
    channel), and re-derives the stats + full 16-bin histogram — so
    the whole compose-by-schema pipeline (dims hash, byte stream,
    resize taps, feature moments, zero-bin handling) is pinned
    value-for-value."""
    media = synthetic_media(spark, 64, "image", portable=True)
    return _feat_csv(media_features(resize_images(media, 8, 8)))


@register("mm_frame_sample", "K4",
          oracle=_feat_stats_sql(_FRAMES_VALS_SQL), driver=False)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4, oracle-exact since round 14 (was rows-only): video frame
    sampling (every 2nd frame — the 1->N explode dual, J4) -> per-
    frame features. Deterministic end to end: the oracle regenerates
    each video's frame count from the dimension hash, enumerates the
    sampled frame offsets (fi * 64 + j byte indexing), and replays
    the per-frame stats — including the m*1000+fi sampled-frame id."""
    media = synthetic_media(spark, 16, "video", portable=True)
    return _feat_csv(media_features(sample_frames(media, 2)))


@register(
    "mm_decode_errors",
    "K4",
    driver=False,
    oracle="""
SELECT fmt, status, n FROM (VALUES
  ('gif', 'ok', 4), ('gif', 'error', 2),
  ('bmp', 'ok', 3), ('bmp', 'error', 1),
  ('webp', 'error', 2)
) AS t(fmt, status, n)
""",
)
def mm_decode_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 corrupt-payload accounting, oracle-exact: a mixed corpus of
    good GIFs/BMPs, bit-rot-truncated variants, and gated webp
    payloads runs through ``media_features(errors="tag")`` — the
    100 TB crawl mode where a corrupt file becomes a counted row
    instead of a failed stage. The oracle pins the exact ok/error
    split per format, so a decoder that starts silently accepting
    truncated streams (or a kernel that drops clean rows) breaks the
    hash."""
    import numpy as np

    rng = np.random.default_rng(53)
    from hortacloud_importer_spark.sources.bmp import encode_bmp
    from hortacloud_importer_spark.sources.gif import encode_gif

    pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    rows = []
    for i in range(4):  # media_id decade 0x: clean GIFs
        img = rng.integers(0, 256, (12, 12), dtype=np.uint8)
        rows.append((i, "gif", bytearray(encode_gif(img, pal))))
    for i in range(2):  # decade 1x: GIFs truncated mid-LZW
        img = rng.integers(0, 256, (12, 12), dtype=np.uint8)
        g = encode_gif(img, pal)
        rows.append((10 + i, "gif", bytearray(g[: len(g) // 2])))
    for i in range(3):  # decade 2x: clean BMPs
        img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        rows.append((20 + i, "bmp", bytearray(encode_bmp(img))))
    # decade 3x: BMP with its pixel data sheared off
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    rows.append((30, "bmp", bytearray(encode_bmp(img)[:60])))
    for i in range(2):  # decade 4x: webp is a gated format
        rows.append((40 + i, "webp", bytearray(b"RIFF\x10\x00\x00\x00WEBPVP8 ")))
    media = spark.createDataFrame(
        [
            (mid, "image", fmt, payload, (12, 12, 3, 0, 1))
            for mid, fmt, payload in rows
        ],
        "media_id long, kind string, format string, payload binary, "
        "meta struct<height:int,width:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    )
    feats = media_features(media, errors="tag")
    return (
        feats.select(
            F.when(F.col("media_id") < 20, F.lit("gif"))
            .when(F.col("media_id") < 40, F.lit("bmp"))
            .otherwise(F.lit("webp"))
            .alias("fmt"),
            F.when(F.col("decode_error").isNull(), F.lit("ok"))
            .otherwise(F.lit("error"))
            .alias("status"),
        )
        .groupBy("fmt", "status")
        .agg(F.count("*").cast("int").alias("n"))
    )


@register(
    "mm_probe",
    "K4",
    driver=False,
    oracle="""
SELECT media_id, fmt, height, width, channels, n_frames, sample_rate
FROM (VALUES
  (0, 'gif',  16, 16, 3, 3, 0),
  (1, 'bmp',   9, 11, 3, 1, 0),
  (2, 'webp', 10, 14, 3, 1, 0),
  (3, 'webp', 24, 33, 3, 1, 0),
  (4, 'pgm',  16, 16, 1, 1, 0),
  (5, 'wav',   1, 256, 2, 1, 8000),
  (6, 'avi',   6,  6, 3, 4, 0),
  (7, 'heic', 480, 640, 3, 1, 0),
  (8, 'mp4', 720, 1280, 3, 90, 48000),
  (9, 'flac', 1, 256, 2, 1, 8000),
  (10, 'mp3', 1, 11520, 2, 10, 44100),
  (11, 'aac', 1, 6144, 2, 6, 48000),
  (12, 'ogg', 1, 8192, 2, 8, 44100),
  (13, 'opus', 1, 5760, 1, 6, 48000)
) AS t(media_id, fmt, height, width, channels, n_frames, sample_rate)
""",
)
def mm_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 metadata pass, oracle-exact: header-only probe (media_probe,
    NO pixel/sample decode) over one payload per format — including a
    hand-built LOSSY WebP whose pixels gate but whose dimensions
    still parse from the public VP8 keyframe header (media_id 3).
    The oracle pins every dimension/frame-count/rate, so a header
    walk that silently drifts breaks the hash."""
    import struct

    import numpy as np

    from hortacloud_importer_spark.operators.multimodal import media_probe
    from hortacloud_importer_spark.sources.avi import encode_avi
    from hortacloud_importer_spark.sources.bmp import encode_bmp
    from hortacloud_importer_spark.sources.adts import encode_adts_headers
    from hortacloud_importer_spark.sources.flac import encode_flac
    from hortacloud_importer_spark.sources.gif import encode_gif
    from hortacloud_importer_spark.sources.mp3 import encode_mp3_headers
    from hortacloud_importer_spark.sources.pnm import encode_pnm
    from hortacloud_importer_spark.sources.wav import encode_wav
    from hortacloud_importer_spark.sources.webp import encode_webp

    rng = np.random.default_rng(67)
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
    gif_p = encode_gif(
        rng.integers(0, 256, (3, 16, 16), dtype=np.uint8), pal
    )
    bmp_p = encode_bmp(rng.integers(0, 256, (9, 11, 3), dtype=np.uint8))
    webp_p = encode_webp(rng.integers(0, 256, (10, 14, 3), dtype=np.uint8))
    # lossy VP8 with only the public keyframe header populated: the
    # probe reads 24x33 from it; decode_webp would raise the gate
    vp8_hdr = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 33, 24)
    lossy_p = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(vp8_hdr))
        + b"WEBPVP8 "
        + struct.pack("<I", len(vp8_hdr))
        + vp8_hdr
    )
    pgm_p = encode_pnm(
        rng.integers(0, 65536, (16, 16)).astype(np.uint16)
    )
    wav_p = encode_wav(
        rng.integers(-2000, 2000, (256, 2), dtype=np.int16), rate=8000
    )
    avi_p = encode_avi(
        rng.integers(0, 256, (4, 6, 6, 3), dtype=np.uint8), codec="DIB"
    )
    flac_p = encode_flac(
        rng.integers(-2000, 2000, (256, 2)).astype(np.int64),
        rate=8000,
        bits=16,
        block_size=192,
        stereo="left_side",
    )
    mp3_p = encode_mp3_headers(10, rate=44100, kbps=128, channels=2)
    aac_p = encode_adts_headers(6, rate=48000, channels=2)
    from hortacloud_importer_spark.sources.ogg import (
        encode_ogg_opus_headers,
        encode_ogg_vorbis_headers,
    )

    ogg_p = encode_ogg_vorbis_headers(
        8, rate=44100, channels=2, samples_per_packet=1024
    )
    opus_p = encode_ogg_opus_headers(
        6, channels=1, preskip=0, samples_per_packet=960
    )

    # hand-assembled ISOBMFF containers (the coded payload gates;
    # only the box-tree metadata is under test — sources/isobmff.py)
    def _box(t: bytes, payload: bytes = b"") -> bytes:
        return struct.pack(">I", len(payload) + 8) + t + payload

    def _full(t: bytes, payload: bytes) -> bytes:
        return _box(t, b"\x00\x00\x00\x00" + payload)

    heic_p = (
        _box(b"ftyp", b"heic\x00\x00\x00\x00mif1")
        + _full(
            b"meta",
            _full(b"pitm", struct.pack(">H", 1))
            + _box(
                b"iprp",
                _box(
                    b"ipco",
                    _full(b"ispe", struct.pack(">II", 640, 480))
                    + _full(b"ispe", struct.pack(">II", 160, 120)),
                ),
            )
            + _full(
                b"ipma",
                struct.pack(">I", 1) + struct.pack(">HB", 1, 1) + b"\x01",
            ),
        )
    )
    _tkhd0 = b"\x00" * 20 + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
    mp4_p = (
        _box(b"ftyp", b"isom\x00\x00\x00\x00mp42")
        + _box(
            b"moov",
            _box(
                b"trak",
                _full(b"tkhd", _tkhd0 + struct.pack(">II", 1280 << 16, 720 << 16))
                + _box(
                    b"mdia",
                    _full(b"mdhd", struct.pack(">IIII", 0, 0, 30000, 0) + b"\x00" * 4)
                    + _box(
                        b"minf",
                        _box(b"stbl", _full(b"stsz", struct.pack(">II", 0, 90))),
                    ),
                ),
            )
            + _box(
                b"trak",
                _full(b"tkhd", _tkhd0 + struct.pack(">II", 0, 0))
                + _box(
                    b"mdia",
                    _full(
                        b"mdhd", struct.pack(">IIII", 0, 0, 48000, 0) + b"\x00" * 4
                    ),
                ),
            ),
        )
    )
    rows = [
        (0, "gif", gif_p),
        (1, "bmp", bmp_p),
        (2, "webp", webp_p),
        (3, "webp", lossy_p),
        (4, "pgm", pgm_p),
        (5, "wav", wav_p),
        (6, "avi", avi_p),
        (7, "heic", heic_p),
        (8, "mp4", mp4_p),
        (9, "flac", flac_p),
        (10, "mp3", mp3_p),
        (11, "aac", aac_p),
        (12, "ogg", ogg_p),
        (13, "opus", opus_p),
    ]
    media = spark.createDataFrame(
        [
            (mid, "media", fmt, bytearray(p), (0, 0, 0, 0, 1))
            for mid, fmt, p in rows
        ],
        "media_id long, kind string, format string, payload binary, "
        "meta struct<height:int,width:int,channels:int,"
        "sample_rate:int,n_frames:int>",
    )
    return media_probe(media).select(
        "media_id",
        F.col("format").alias("fmt"),
        "height",
        "width",
        "channels",
        "n_frames",
        "sample_rate",
    )


def _feat_tagged(df: DataFrame, facet: str) -> DataFrame:
    """FEATURES_SCHEMA -> scalar-only driver schema (hist16 -> CSV)."""
    return df.select(
        F.lit(facet).alias("facet"),
        "media_id",
        "n_bytes",
        "mean_intensity",
        "min_intensity",
        "max_intensity",
        F.array_join(F.transform("hist16", lambda v: v.cast("string")), ",").alias(
            "hist16_csv"
        ),
    )


_MM_FEATURES_ORACLE = f"""
SELECT * FROM ({_feat_stats_sql(_DOC_VALS_SQL, facet="doc")})
UNION ALL
SELECT * FROM ({_feat_stats_sql(_RESIZE_VALS_SQL, facet="resize")})
UNION ALL
SELECT * FROM ({_feat_stats_sql(_FRAMES_VALS_SQL, facet="frames")})
"""


@register("mm_features", "K4", oracle=_MM_FEATURES_ORACLE, driver=False)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated K4 query, oracle-exact since round 14 (was
    rows-only), union-with-tag: `doc` = full feature extraction over
    fixture-derived raw8 payloads; `resize` = portable synthetic
    images -> nearest-neighbor 8x8 resize -> features
    (compose-by-schema); `frames` = video frame sampling (every 2nd
    frame) -> per-frame features (the 1->N explode dual, J4). Each
    facet's DuckDB oracle regenerates the payload bytes (hex pairs of
    the text for `doc`, the portable md5 chain for the synthetics)
    and replays the downstream arithmetic, so all three pipelines are
    pinned value-for-value in one hash. The 16-bin histogram ships as
    CSV so every output column is a scalar the canonicalizer can
    hash. Standalone variants stay registered driver=False."""
    doc = _feat_tagged(media_features(_doc_media(spark, sf_dir)), "doc")
    rs = _feat_tagged(
        media_features(
            resize_images(
                synthetic_media(spark, 64, "image", portable=True), 8, 8
            )
        ),
        "resize",
    )
    fr = _feat_tagged(
        media_features(
            sample_frames(
                synthetic_media(spark, 16, "video", portable=True), 2
            )
        ),
        "frames",
    )
    return doc.unionByName(rs).unionByName(fr)


def _frame_index_fixtures() -> "list[tuple[int, bytes]]":
    """Two hand-assembled ISOBMFF containers for the frame-index path:
    (0) an unfragmented MP4 — interleaved video/audio chunks, a two-run
    stts, an stss sync table — and (1) a fragmented MP4 — moof with
    tfhd defaults, tfdt, and two truns (data-offset + per-sample sizes,
    first-sample-flags on one, per-sample flags on the other)."""
    import struct

    def box(t: bytes, payload: bytes = b"") -> bytes:
        return struct.pack(">I", len(payload) + 8) + t + payload

    def full(t: bytes, payload: bytes, ver: int = 0, fl: int = 0) -> bytes:
        return box(t, bytes([ver]) + fl.to_bytes(3, "big") + payload)

    def tkhd(track_id: int) -> bytes:
        return full(
            b"tkhd",
            struct.pack(">II", 0, 0) + struct.pack(">I", track_id)
            + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 36
            + struct.pack(">II", 0, 0),
        )

    def mdhd(timescale: int) -> bytes:
        return full(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, 0) + b"\x00" * 4,
        )

    def u32s(*vals: int) -> bytes:
        return b"".join(struct.pack(">I", v) for v in vals)

    # ---------- unfragmented: video(6 samples) + audio(4), one mdat
    vid_sizes = [100, 101, 102, 103, 104, 105]
    aud_size, aud_n = 50, 4

    def moov_unfrag(mdat0: int) -> bytes:
        v_stbl = (
            full(b"stts", u32s(2, 4, 1001, 2, 1500))
            + full(b"stsc", u32s(1, 1, 3, 1))
            + full(b"stsz", u32s(0, 6, *vid_sizes))
            + full(b"stco", u32s(2, mdat0 + 0, mdat0 + 503))
            + full(b"stss", u32s(2, 1, 4))
        )
        a_stbl = (
            full(b"stts", u32s(1, 4, 1024))
            + full(b"stsc", u32s(1, 1, 4, 1))
            + full(b"stsz", u32s(aud_size, aud_n))
            + full(b"stco", u32s(1, mdat0 + 303))
        )
        return box(
            b"moov",
            box(b"trak", tkhd(1) + box(b"mdia", mdhd(30000)
                + box(b"minf", box(b"stbl", v_stbl))))
            + box(b"trak", tkhd(2) + box(b"mdia", mdhd(48000)
                + box(b"minf", box(b"stbl", a_stbl)))),
        )

    ftyp = box(b"ftyp", b"isom\x00\x00\x00\x00mp42")
    mdat0 = len(ftyp) + len(moov_unfrag(0)) + 8
    payload = bytes((i * 7) & 0xFF for i in range(815))
    unfrag = ftyp + moov_unfrag(mdat0) + box(b"mdat", payload)

    # ---------- fragmented: empty moov stbl, one moof, two truns
    moov_frag = box(
        b"moov",
        box(b"trak", tkhd(1) + box(b"mdia", mdhd(1000)
            + box(b"minf", box(b"stbl", b"")))),
    )

    def moof(data_off: int) -> bytes:
        tfhd = full(
            b"tfhd",
            struct.pack(">I", 1) + struct.pack(">I", 40),
            fl=0x020008,  # default-base-is-moof + default-duration
        )
        tfdt = full(b"tfdt", struct.pack(">I", 0))
        trun1 = full(
            b"trun",
            u32s(3, data_off, 0, 10, 20, 30),
            fl=0x000205,  # data-offset + first-sample-flags + sizes
        )
        trun2 = full(
            b"trun",
            u32s(3, data_off + 60)
            + u32s(40, 0, 50, 0x00010000, 60, 0),
            fl=0x000601,  # data-offset + sizes + per-sample flags
        )
        return box(b"moof", box(b"traf", tfhd + tfdt + trun1 + trun2))

    doff = len(moof(0)) + 8  # mdat body starts right after the moof
    frag = (
        ftyp + moov_frag + moof(doff)
        + box(b"mdat", bytes((i * 3) & 0xFF for i in range(210)))
    )
    return [(0, unfrag), (1, frag)]


@register(
    "mm_frame_index",
    "K4",
    driver=False,
    oracle="""
SELECT media_id, track_id, sample_idx, rel_offset, byte_size,
       dts, duration, timescale, is_sync
FROM (VALUES
  (0, 1, 0,   0, 100,    0, 1001, 30000, TRUE),
  (0, 1, 1, 100, 101, 1001, 1001, 30000, FALSE),
  (0, 1, 2, 201, 102, 2002, 1001, 30000, FALSE),
  (0, 1, 3, 503, 103, 3003, 1001, 30000, TRUE),
  (0, 1, 4, 606, 104, 4004, 1500, 30000, FALSE),
  (0, 1, 5, 710, 105, 5504, 1500, 30000, FALSE),
  (0, 2, 0, 303,  50,    0, 1024, 48000, TRUE),
  (0, 2, 1, 353,  50, 1024, 1024, 48000, TRUE),
  (0, 2, 2, 403,  50, 2048, 1024, 48000, TRUE),
  (0, 2, 3, 453,  50, 3072, 1024, 48000, TRUE),
  (1, 1, 0,   0,  10,    0,   40,  1000, TRUE),
  (1, 1, 1,  10,  20,   40,   40,  1000, TRUE),
  (1, 1, 2,  30,  30,   80,   40,  1000, TRUE),
  (1, 1, 3,  60,  40,  120,   40,  1000, TRUE),
  (1, 1, 4, 100,  50,  160,   40,  1000, FALSE),
  (1, 1, 5, 150,  60,  200,   40,  1000, TRUE)
) AS t(media_id, track_id, sample_idx, rel_offset, byte_size,
       dts, duration, timescale, is_sync)
""",
)
def mm_frame_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 video sample-table enumeration, oracle-exact: per-frame
    byte ranges + decode timestamps from hand-assembled unfragmented
    (stts/stsc/stco/stsz/stss, interleaved chunks) and fragmented
    (moof/tfhd/tfdt/trun) MP4s — the metadata pass that lets a crawl
    scheduler range-read selected frames (sync samples) from object
    storage without shipping mdat payloads. Offsets are reported
    relative to each file's first sample so the oracle VALUES stay
    layout-independent; every dts/duration/size/sync bit is pinned.

    Caveat: the fixtures here are hand-assembled (no third-party MP4
    muxer exists in this container — the JDK's imageio has no MP4
    writer). Two mitigations cross-check the same stbl/moof walker:
    scan_mp4_frames decodes MJPEG samples located by it, and
    mm_video_sync_decode feeds its byte ranges to libheif (an
    INDEPENDENT parser of the coded payload), which would reject any
    mis-offset sample as a corrupt HEVC/AV1 bitstream."""
    from pyspark.sql.window import Window

    from hortacloud_importer_spark.operators.multimodal import (
        media_frame_index,
    )

    rows = [
        (mid, "video", "mp4", bytearray(blob))
        for mid, blob in _frame_index_fixtures()
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, format string, payload binary"
    ).withColumn(
        "meta",
        F.expr(
            "named_struct('height', 0, 'width', 0, 'channels', 0,"
            " 'sample_rate', 0, 'n_frames', 0)"
        ),
    )
    idx = media_frame_index(media)
    w = Window.partitionBy("media_id")
    return idx.select(
        F.col("media_id").cast("int").alias("media_id"),
        "track_id",
        "sample_idx",
        (F.col("byte_offset") - F.min("byte_offset").over(w))
        .cast("int")
        .alias("rel_offset"),
        F.col("byte_size").cast("int").alias("byte_size"),
        F.col("dts").cast("int").alias("dts"),
        F.col("duration").cast("int").alias("duration"),
        "timescale",
        "is_sync",
    )


@register(
    "mm_video_sync_decode",
    "K4",
    driver=False,
    oracle="""
SELECT codec, n_sync_frames, height, width, channels, matches_still
FROM (VALUES
  ('av01', 3, 64, 64, 3, TRUE),
  ('hvc1', 3, 64, 64, 3, TRUE)
) AS t(codec, n_sync_frames, height, width, channels, matches_still)
""",
)
def mm_video_sync_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 HEVC/AV1 video-track sample decode through the libheif
    binding, oracle-exact on the route-equivalence invariant: three
    lossless stills per codec are lifted into an hvc1/av01 MP4 track
    (sources/isobmff.py build_video_mp4), each SYNC sample is
    rewrapped as a HEIF/AVIF still on the executors
    (decode_isobmff_video) and decoded by the same de265/dav1d
    binding — and every MP4-route frame must equal the still-route
    decode BIT-EXACTLY (same decoder, same coded bytes; codec-version
    drift cancels out, so the pin is portable). Requires the libheif
    binding + x265/aom encoders (present in this container); absent
    bindings raise the standard named gate rather than fake rows."""
    import numpy as np

    from hortacloud_importer_spark.sources.heif import (
        decode_heif,
        encode_heif,
    )
    from hortacloud_importer_spark.sources.isobmff import (
        build_video_mp4,
        heif_primary_item_payload,
    )

    yy, xx = np.mgrid[0:64, 0:64]
    rows = []
    for codec, fourcc in (("hevc", b"hvc1"), ("av1", b"av01")):
        stills = []
        for f in range(3):
            img = np.stack(
                [
                    (yy * 3 + xx + f * 11) % 256,
                    (xx * 5 + f * 29) % 256,
                    (yy * 2 + xx * 7 + f * 47) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            stills.append(encode_heif(img, codec=codec, lossless=True))
        parts = [heif_primary_item_payload(s) for s in stills]
        _t, cfg, cw, ch, _p = parts[0]
        mp4 = build_video_mp4(fourcc, cfg, cw, ch, [p[4] for p in parts])
        rows.append(
            (fourcc.decode(), bytearray(mp4), [bytearray(s) for s in stills])
        )
    media = spark.createDataFrame(
        rows, "codec string, mp4 binary, stills array<binary>"
    ).repartition(2, "codec")

    def kernel(batches):
        import pandas as pd

        from hortacloud_importer_spark.sources.heif import decode_heif
        from hortacloud_importer_spark.sources.isobmff import (
            decode_isobmff_video,
        )

        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                frames = decode_isobmff_video(bytes(row.mp4))
                ok = all(
                    np.array_equal(frames[i], decode_heif(bytes(s)))
                    for i, s in enumerate(row.stills)
                )
                out.append(
                    {
                        "codec": row.codec,
                        "n_sync_frames": int(frames.shape[0]),
                        "height": int(frames.shape[1]),
                        "width": int(frames.shape[2]),
                        "channels": int(frames.shape[3]),
                        "matches_still": bool(ok),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        kernel,
        "codec string, n_sync_frames int, height int, width int,"
        " channels int, matches_still boolean",
    )
