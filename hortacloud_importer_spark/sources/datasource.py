"""Spark Python DataSource front door for the volume container formats.

The reference's entry points are directory scans that build a lazy
chunked array and read blocks on demand — ``slice_to_dask_array``
(tiff2octree.py:653-691), ``n5_zarr_to_dask_array``
(tiff2octree.py:779-823) with the windowed block read
``get_cropped_image_rasterio`` (tiff2octree.py:281-292). The Spark-4
Python DataSource API lets the engine register those front doors as
real formats:

    spark.dataSource.register(N5VolumeDataSource)
    spark.read.format("n5_volume").load(root)      # batch
    spark.readStream.format("tiff_volume").load(d) # ordered z stream

Scale design:

- **Planning = chunk grid, not payloads.** ``partitions()`` lists the
  chunk files (driver side, metadata only) and emits one input
  partition per ~``target_partition_bytes`` of decoded voxels, so a
  100 TB store with millions of chunks plans into input splits the
  same way the built-in Parquet source sizes its splits. Payload
  bytes are only ever touched inside ``read()`` on executors.
- **Filter pushdown prunes chunks.** ``pushFilters`` accepts range /
  equality predicates on ``z``/``y``/``x`` and drops whole chunks
  whose coordinate extent cannot intersect — the A4 windowed-read
  dual, same contract as Parquet row-group skipping. All filters are
  returned to Spark as "unsupported" so row-level evaluation still
  runs: pruning is a pure optimization and can never under-deliver.
- **Arrow batches out.** ``read()`` yields one pyarrow RecordBatch
  per chunk (columnar, zero row-at-a-time Python), so decode cost is
  NumPy-bound like the mapInPandas readers in sources/n5.py.
- **No JVM dependence.** Planning and decode run in Python workers
  (no py4j gateway there); file IO goes through ``pyarrow.fs`` like
  sources/ktx.py's executor-side sink, so local / HDFS / S3 paths
  behave identically.

The streaming half (``tiff_volume`` with ``readStream``) implements
the reference's ordered z-slice consumption (I1,
ktx_from_rendered_tiff.py:331-342): each micro-batch takes the next
``max_slices_per_batch`` files in sorted order; offsets are the
number of slices consumed, so restart/replay re-reads a deterministic
file range.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

VOXEL_DDL = "z bigint, y bigint, x bigint, intensity bigint"
_AXES = ("z", "y", "x")
_DEFAULT_PARTITION_BYTES = 128 * 1024 * 1024


def _pa_fs(path: str):
    """pyarrow filesystem + normalized path for local or URI paths.

    ``s3a://`` (the Hadoop spelling every cluster writes in configs)
    aliases to pyarrow's ``s3://`` — the same store; executors would
    otherwise reject the URI form the JVM side accepts."""
    from pyarrow import fs as pafs

    if path.startswith("s3a://"):
        path = "s3://" + path[6:]
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _read_bytes(path: str) -> bytes:
    filesystem, p = _pa_fs(path)
    with filesystem.open_input_stream(p) as fh:
        return fh.read()


def _copy_file(src_fs, src_path: str, dst_fs, dst_path: str) -> None:
    """Cross-filesystem single-file copy (pyarrow streams). The caller
    ensures the destination directory exists."""
    with src_fs.open_input_stream(src_path) as fh:
        payload = fh.read()
    with dst_fs.open_output_stream(dst_path) as fh:
        fh.write(payload)


def _list_files(root: str) -> list[str]:
    from pyarrow import fs as pafs

    filesystem, base = _pa_fs(root)
    infos = filesystem.get_file_info(pafs.FileSelector(base, recursive=True))
    # scheme prefix, with any ?opts query (pyarrow filesystem options
    # like s3 endpoint_override ride in the URI query and must follow
    # every child path so executor-side _pa_fs calls reconstruct the
    # same filesystem)
    bare, sep, query = root.partition("?")
    prefix = bare[: len(bare) - len(base)]
    return [
        prefix + i.path + sep + query
        for i in infos
        if i.type == pafs.FileType.File
    ]


@dataclass
class _Bounds:
    """Per-axis inclusive [lo, hi] coordinate bounds from pushed filters."""

    lo: dict[str, int] = field(default_factory=dict)
    hi: dict[str, int] = field(default_factory=dict)

    def narrow(self, axis: str, lo: int | None = None, hi: int | None = None):
        if lo is not None:
            self.lo[axis] = max(self.lo.get(axis, lo), lo)
        if hi is not None:
            self.hi[axis] = min(self.hi.get(axis, hi), hi)

    def admits(self, axis: str, ext_lo: int, ext_hi: int) -> bool:
        """Could [ext_lo, ext_hi] intersect the bounds on `axis`?"""
        if axis in self.lo and ext_hi < self.lo[axis]:
            return False
        if axis in self.hi and ext_lo > self.hi[axis]:
            return False
        return True


def _absorb_filters(filters: list[Filter], bounds: _Bounds) -> list[Filter]:
    """Tighten `bounds` from z/y/x predicates; return ALL filters as
    unsupported so Spark re-applies them row-level (pruning-only
    pushdown — the Parquet row-group-skip contract)."""
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not (isinstance(attr, tuple) and len(attr) == 1 and attr[0] in _AXES):
            continue
        axis = attr[0]
        try:
            if isinstance(f, EqualTo):
                bounds.narrow(axis, lo=int(f.value), hi=int(f.value))
            elif isinstance(f, GreaterThan):
                bounds.narrow(axis, lo=int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                bounds.narrow(axis, lo=int(f.value))
            elif isinstance(f, LessThan):
                bounds.narrow(axis, hi=int(f.value) - 1)
            elif isinstance(f, LessThanOrEqual):
                bounds.narrow(axis, hi=int(f.value))
            elif isinstance(f, In):
                vals = [int(v) for v in f.value]
                if vals:
                    bounds.narrow(axis, lo=min(vals), hi=max(vals))
        except (TypeError, ValueError):
            continue  # non-integer comparand: no pruning from this filter
    return filters


@dataclass
class _ChunkPartition(InputPartition):
    """A group of chunk files decoded by one task."""

    chunks: list[tuple[str, int, int, int]]  # (path, gx|gz, gy, gz|gx)


def _group_chunks(
    chunks: list[tuple[str, int, int, int]], bytes_per_chunk: int, target: int
) -> list[_ChunkPartition]:
    per = max(1, target // max(1, bytes_per_chunk))
    return [
        _ChunkPartition(chunks[i : i + per]) for i in range(0, len(chunks), per)
    ]


def _voxel_batch(z, y, x, i) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [
            pa.array(z, type=pa.int64()),
            pa.array(y, type=pa.int64()),
            pa.array(x, type=pa.int64()),
            pa.array(i, type=pa.int64()),
        ],
        names=["z", "y", "x", "intensity"],
    )


class _PushdownMixin:
    """The ``pushFilters`` half of the chunk readers, split out so
    :func:`register_volume_sources` can register no-pushdown reader
    variants when a session refuses
    ``spark.sql.python.filterPushdown.enabled``: Spark will not plan a
    Python DataSource whose reader overrides ``pushFilters`` while that
    conf is off, and chunk pruning is a pure optimization (all filters
    are re-applied row-level), so dropping it is always safe."""

    def pushFilters(self, filters: list[Filter]):
        return _absorb_filters(filters, self.bounds)


class _N5ReaderNoPushdown(DataSourceReader):
    def __init__(self, options: dict):
        from hortacloud_importer_spark.sources.n5 import n5_meta

        import json

        self.root = options["path"].rstrip("/")
        self.target = int(
            options.get("target_partition_bytes", _DEFAULT_PARTITION_BYTES)
        )
        attrs = json.loads(_read_bytes(f"{self.root}/attributes.json"))
        self.dims_xyz, self.block_xyz, self.codec, self.np_dtype = n5_meta(attrs)
        self.bounds = _Bounds()

    def partitions(self):
        bx, by, bz = self.block_xyz
        chunks = []
        base_len = len(self.root) + 1
        for path in _list_files(self.root):
            rel = path[base_len:]
            parts = rel.split("/")
            if len(parts) != 3:
                continue  # attributes.json and non-chunk files
            try:
                gx, gy, gz = (int(p) for p in parts)
            except ValueError:
                continue
            if not (
                self.bounds.admits("z", gz * bz, (gz + 1) * bz - 1)
                and self.bounds.admits("y", gy * by, (gy + 1) * by - 1)
                and self.bounds.admits("x", gx * bx, (gx + 1) * bx - 1)
            ):
                continue
            chunks.append((path, gx, gy, gz))
        chunks.sort(key=lambda c: (c[3], c[2], c[1]))
        voxel_bytes = bx * by * bz * np.dtype(self.np_dtype).itemsize
        return _group_chunks(chunks, voxel_bytes, self.target)

    def read(self, partition: _ChunkPartition):
        from hortacloud_importer_spark.sources.n5 import n5_chunk_axes

        for path, gx, gy, gz in partition.chunks:
            try:
                z, y, x, i = n5_chunk_axes(
                    _read_bytes(path), self.codec, self.np_dtype,
                    self.block_xyz, gx, gy, gz,
                )
            except Exception as exc:
                raise ValueError(f"bad N5 chunk {path}: {exc}") from exc
            yield _voxel_batch(z, y, x, i)


class _N5Reader(_PushdownMixin, _N5ReaderNoPushdown):
    pass


class N5VolumeDataSource(DataSource):
    """``spark.read.format("n5_volume").load(dataset_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "n5_volume"

    def schema(self) -> str:
        return VOXEL_DDL

    def reader(self, schema) -> _N5Reader:
        return _N5Reader(dict(self.options))


class _ZarrReaderNoPushdown(DataSourceReader):
    def __init__(self, options: dict):
        from hortacloud_importer_spark.sources.n5 import zarr3_meta, zarr_meta

        import json

        self.root = options["path"].rstrip("/")
        self.target = int(
            options.get("target_partition_bytes", _DEFAULT_PARTITION_BYTES)
        )
        self.v3_codecs = None  # None = v2; a list = v3 bytes->bytes chain
        self.v3_shard = None  # ZEP-2 shard spec for sharded v3 stores
        self.v3_transpose = None
        self.verify = str(options.get("verify", "false")).lower() == "true"
        try:
            meta = json.loads(_read_bytes(f"{self.root}/.zarray"))
        except FileNotFoundError:
            # missing .zarray only — a transient IO/permission error
            # on a genuine v2 store must surface as itself, not as a
            # misleading zarr.json complaint
            # Zarr v3 (zarr-python 3.x default): zarr.json metadata,
            # c/<i>/<j>/<k> chunk keys, codec chain
            meta = json.loads(_read_bytes(f"{self.root}/zarr.json"))
            (
                self.shape,
                self.chunks_zyx,
                self.np_dtype,
                self.v3_codecs,
                self.sep,
                self.v3_shard,
                extra,
            ) = zarr3_meta(meta)
            self.codec, self.order = "raw", "C"
            self.v3_transpose = extra["transpose"]
            self.v3_prefixed = extra["kenc"] == "default"  # v2: bare keys
            self.fill = extra["fill"]
            if self.v3_shard is not None and self.verify:
                self.v3_shard = dict(self.v3_shard, verify=True)
        else:
            (
                self.shape,
                self.chunks_zyx,
                self.codec,
                self.order,
                self.np_dtype,
                self.sep,
                self.fill,
            ) = zarr_meta(meta)
        self.bounds = _Bounds()

    def partitions(self):
        cz, cy, cx = self.chunks_zyx
        base_len = len(self.root) + 1
        chunks = []
        for path in _list_files(self.root):
            rel = path[base_len:]
            name = rel.replace("/", self.sep) if self.sep == "/" else rel
            if name.startswith("."):
                continue  # .zarray / .zattrs
            if self.v3_codecs is not None and self.v3_prefixed:
                if not name.startswith(f"c{self.sep}"):
                    continue  # zarr.json and any non-chunk keys
                name = name[len(f"c{self.sep}") :]
            try:
                gz, gy, gx = (int(p) for p in name.split(self.sep))
            except ValueError:
                continue
            if not (
                self.bounds.admits("z", gz * cz, (gz + 1) * cz - 1)
                and self.bounds.admits("y", gy * cy, (gy + 1) * cy - 1)
                and self.bounds.admits("x", gx * cx, (gx + 1) * cx - 1)
            ):
                continue
            chunks.append((path, gz, gy, gx))
        if self.fill:
            # a nonzero declared fill_value materializes never-written
            # chunks — synthesize path-less partitions for the grid
            # cells (within pushed bounds) no file covers; read()
            # expands them to fill voxels with zero I/O
            present = {(gz, gy, gx) for _, gz, gy, gx in chunks}
            for gz in range(-(-self.shape[0] // cz)):
                if not self.bounds.admits("z", gz * cz, (gz + 1) * cz - 1):
                    continue
                for gy in range(-(-self.shape[1] // cy)):
                    if not self.bounds.admits("y", gy * cy, (gy + 1) * cy - 1):
                        continue
                    for gx in range(-(-self.shape[2] // cx)):
                        if (gz, gy, gx) in present or not self.bounds.admits(
                            "x", gx * cx, (gx + 1) * cx - 1
                        ):
                            continue
                        chunks.append((None, gz, gy, gx))
        chunks.sort(key=lambda c: (c[1], c[2], c[3]))
        voxel_bytes = cz * cy * cx * self.np_dtype.itemsize
        return _group_chunks(chunks, voxel_bytes, self.target)

    def read(self, partition: _ChunkPartition):
        from hortacloud_importer_spark.sources.n5 import (
            zarr3_chunk_bytes,
            zarr3_shard_bytes,
            zarr_chunk_axes,
        )

        import numpy as np

        for path, gz, gy, gx in partition.chunks:
            try:
                if path is None:  # never-written chunk: fill_value
                    raw = np.full(
                        self.chunks_zyx, self.fill, dtype=self.np_dtype
                    ).tobytes()
                    z, y, x, i = zarr_chunk_axes(
                        raw, "raw", self.np_dtype,
                        self.chunks_zyx, "C", self.shape, gz, gy, gx,
                    )
                    yield _voxel_batch(z, y, x, i)
                    continue
                raw = _read_bytes(path)
                if self.v3_shard is not None:
                    raw = zarr3_shard_bytes(
                        raw, self.v3_shard, self.chunks_zyx, self.np_dtype
                    )
                elif self.v3_codecs is not None:
                    raw = zarr3_chunk_bytes(
                        raw, self.v3_codecs, self.v3_transpose,
                        self.chunks_zyx, self.np_dtype, verify=self.verify,
                    )
                z, y, x, i = zarr_chunk_axes(
                    raw, self.codec, self.np_dtype,
                    self.chunks_zyx, self.order, self.shape, gz, gy, gx,
                )
            except Exception as exc:
                raise ValueError(f"bad Zarr chunk {path}: {exc}") from exc
            yield _voxel_batch(z, y, x, i)


class _ZarrReader(_PushdownMixin, _ZarrReaderNoPushdown):
    pass


class ZarrVolumeDataSource(DataSource):
    """``spark.read.format("zarr_volume").load(array_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "zarr_volume"

    def schema(self) -> str:
        return VOXEL_DDL

    def reader(self, schema) -> _ZarrReader:
        return _ZarrReader(dict(self.options))


def _sorted_slices(root: str, suffix: str, channel: str | None = None) -> list[str]:
    """Sorted slice paths == z order (the reference's
    ``img_files.sort()``, tiff2octree.py:1034 — F2 semantics).

    ``channel`` selects one channel of a multi-channel slice dir by
    the reference's ``default.{ch}.{z}`` naming — without it a
    2-channel directory would sort channel-major and assign wrong z
    indices to the second channel's files."""
    files = (
        p for p in _list_files(root)
        if p.partition("?")[0].endswith(suffix)
    )
    if channel is not None:
        prefix = f"default.{channel}."
        files = (
            p for p in files
            if p.partition("?")[0].rsplit("/", 1)[-1].startswith(prefix)
        )
    return sorted(files)


def _requant_float_pages(pages: np.ndarray) -> np.ndarray:
    """float32 [0,1] pages -> uint16, skimage ``img_as_uint``
    semantics (the conversion the reference's float32 branch rides,
    tiff2octree.py:250-251): scale by 65535 with round-half-even;
    out-of-range values clip instead of raising (crawl data carries
    them), NaN means "no data" and maps to 0 like the reference's
    zeros-are-missing convention (ktx/util.py:151-158)."""
    v = np.nan_to_num(pages, nan=0.0, posinf=1.0, neginf=0.0)
    return np.rint(np.clip(v, 0.0, 1.0) * 65535.0).astype(np.uint16)


def _decode_slice_pages(
    data: bytes, path: str, float_mode: str = "raise"
) -> np.ndarray:
    """One slice file -> (pages, h, w, samples), dispatched on the
    file extension: TIFF via the built-in clean-room codec, JPEG 2000
    via the gated OpenJPEG hook (sources/jp2.py; the reference reads
    .jp2 slices through rasterio, tiff2octree.py:673-678).

    ``float_mode`` is the voxel-boundary policy for float32 pages
    (TIFF SampleFormat 3 — the reference accepts float32 stacks,
    tiff2octree.py:250-251): ``"requant"`` converts them to uint16 at
    ingest via :func:`_requant_float_pages`; the ``"raise"`` default
    keeps the integer voxel model strict and names the knob."""
    if path.partition("?")[0].lower().endswith((".jp2", ".j2k", ".jpf")):
        from hortacloud_importer_spark.sources.jp2 import decode_jp2

        pages = decode_jp2(data)
        # executor-side dual of the plan-time check_jp2_uint16 probe:
        # whatever the codec returned must FIT the uint16 voxel model
        # (TIFF ingest gets this from _page_dtype + the float gate
        # below) — reject rather than wrap
        if pages.dtype.kind != "u" or pages.dtype.itemsize > 2:
            raise ValueError(
                f"{path}: decoded JP2 samples are {pages.dtype}; "
                "octree ingest supports unsigned <=16-bit samples only"
            )
        return pages
    from hortacloud_importer_spark.sources.tiff import decode_tiff

    pages = decode_tiff(data)
    if pages.dtype.kind == "f":
        if float_mode == "requant":
            return _requant_float_pages(pages)
        raise ValueError(
            f"{path}: float32 samples need float_mode='requant' "
            "(uint16 requant at ingest); the voxel model is integer"
        )
    return pages


def _slice_axes(data: bytes, z: int, path: str = ".tif",
                float_mode: str = "raise"):
    # (pages, height, width, samples)
    pages = _decode_slice_pages(data, path, float_mode)
    if pages.shape[0] != 1 or pages.shape[3] != 1:
        raise ValueError(
            f"slice file has shape {pages.shape}; one single-sample z-slice "
            "per file expected (stacks/channels go through queries/scans.py)"
        )
    arr = pages[0, :, :, 0]
    yy, xx = np.indices(arr.shape)
    return (
        np.full(arr.size, z, dtype=np.int64),
        yy.ravel(),
        xx.ravel(),
        arr.astype(np.int64).ravel(),
    )


def _slice_array(data: bytes, path: str = ".tif",
                 float_mode: str = "raise") -> np.ndarray:
    """One z-slice file -> its 2-D page (validation shared with
    :func:`_slice_axes`)."""
    pages = _decode_slice_pages(data, path, float_mode)
    if pages.shape[0] != 1 or pages.shape[3] != 1:
        raise ValueError(
            f"slice file has shape {pages.shape}; one single-sample z-slice "
            "per file expected (stacks/channels go through queries/scans.py)"
        )
    return pages[0, :, :, 0]


def _slice_batch(z: int, arr: np.ndarray) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [
            pa.array([z], type=pa.int64()),
            pa.array([arr.shape[0]], type=pa.int32()),
            pa.array([arr.shape[1]], type=pa.int32()),
            pa.array([arr.astype(np.int64).ravel()],
                     type=pa.list_(pa.int64())),
        ],
        names=["z", "height", "width", "voxels"],
    )


@dataclass
class _SlicePartition(InputPartition):
    slices: list[tuple[str, int]]  # (path, z)


class _TiffSliceReaderNoPushdown(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["path"].rstrip("/")
        self.suffix = options.get("suffix", ".tif")
        self.channel = options.get("channel")
        self.per_partition = int(options.get("slices_per_partition", 1))
        self.emit = options.get("emit", "voxels")
        self.float_mode = options.get("float_mode", "raise")
        self.bounds = _Bounds()

    def partitions(self):
        files = [
            (p, z)
            for z, p in enumerate(_sorted_slices(self.root, self.suffix, self.channel))
            if self.bounds.admits("z", z, z)
        ]
        per = max(1, self.per_partition)
        return [
            _SlicePartition(files[i : i + per])
            for i in range(0, len(files), per)
        ] or [_SlicePartition([])]

    def read(self, partition: _SlicePartition):
        for path, z in partition.slices:
            if self.emit == "slices":
                yield _slice_batch(
                    z, _slice_array(_read_bytes(path), path, self.float_mode)
                )
            else:
                yield _voxel_batch(
                    *_slice_axes(_read_bytes(path), z, path, self.float_mode)
                )


class _TiffSliceReader(_PushdownMixin, _TiffSliceReaderNoPushdown):
    pass


class _TiffSliceStreamReader(DataSourceStreamReader):
    """Ordered z-slice micro-batch source (I1). Offset = number of
    slices consumed; files appended later (higher sort order) are
    picked up by subsequent batches.

    Partition-planning variant: the driver only ever lists file names
    (metadata); each planned partition decodes its slice inside
    ``read()`` on an executor and yields one Arrow batch — the same
    executor-side decode path as the batch reader, so no slice payload
    visits the driver (the reference streams slices the same way,
    ktx_from_rendered_tiff.py:331-342)."""

    def __init__(self, options: dict):
        self.root = options["path"].rstrip("/")
        self.suffix = options.get("suffix", ".tif")
        self.channel = options.get("channel")
        self.per_batch = int(options.get("max_slices_per_batch", 8))
        self.emit = options.get("emit", "voxels")
        self.float_mode = options.get("float_mode", "raise")
        # High-water mark already offered to Spark; keeps each
        # micro-batch bounded to per_batch slices no matter how large
        # the directory backlog is.
        self._advanced = 0

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        total = len(_sorted_slices(self.root, self.suffix, self.channel))
        # never move backward: _advanced is floored at every offset
        # Spark has already shown us (partitions()/commit() raise it on
        # restart), so a fresh reader instance cannot offer an offset
        # below the checkpointed commit even if total shrank
        self._advanced = max(
            self._advanced, min(total, self._advanced + self.per_batch)
        )
        return {"n": self._advanced}

    def partitions(self, start: dict, end: dict):
        a, b = int(start["n"]), int(end["n"])
        # On checkpoint restart Spark replans the pending batch without
        # calling latestOffset; keep the high-water mark consistent.
        self._advanced = max(self._advanced, b)
        files = _sorted_slices(self.root, self.suffix, self.channel)[a:b]
        return [
            _SlicePartition([(p, a + i)]) for i, p in enumerate(files)
        ] or [_SlicePartition([])]

    def read(self, partition: _SlicePartition):
        for path, z in partition.slices:
            if self.emit == "slices":
                yield _slice_batch(
                    z, _slice_array(_read_bytes(path), path, self.float_mode)
                )
            else:
                yield _voxel_batch(
                    *_slice_axes(_read_bytes(path), z, path, self.float_mode)
                )

    def commit(self, end: dict) -> None:
        # restart path: Spark commits recovered batches before asking
        # for a new latestOffset — floor the high-water mark here so a
        # fresh reader never offers an offset below the checkpoint
        self._advanced = max(self._advanced, int(end["n"]))


SLICE_DDL = "z bigint, height int, width int, voxels array<bigint>"


class TiffVolumeDataSource(DataSource):
    """``spark.read.format("tiff_volume").load(slice_dir)`` (batch) or
    ``spark.readStream.format("tiff_volume")`` (ordered z stream).

    ``option("emit", "slices")`` switches the row grain from one row
    per voxel to one row per z-slice (z, height, width, voxels) — the
    reference's streaming unit (ktx_from_rendered_tiff.py:331-342),
    directly consumable by streaming/cascade.py::streaming_cascade."""

    @classmethod
    def name(cls) -> str:
        return "tiff_volume"

    def schema(self) -> str:
        if self.options.get("emit", "voxels") == "slices":
            return SLICE_DDL
        return VOXEL_DDL

    def reader(self, schema) -> _TiffSliceReader:
        return _TiffSliceReader(dict(self.options))

    def streamReader(self, schema) -> _TiffSliceStreamReader:
        return _TiffSliceStreamReader(dict(self.options))


# --- KTX sink (A8) as a writable format ------------------------------------


@dataclass
class _KtxCommit(WriterCommitMessage):
    files: list[str]
    n_rows: int


class _KtxWriter(DataSourceWriter):
    """``df.write.format("ktx_files").save(dir)`` over KTX_SCHEMA rows
    (zi, yi, xi, channel, n_levels, ktx) — the DataSource-API form of
    sources/ktx.py::write_ktx_files, with real commit semantics:

    - ``write()`` (executors) stages blobs via pyarrow.fs with
      idempotent names, tmp+rename on local FS (single-PUT object
      stores need no staging); a retried task overwrites its own
      files, so speculative/retried attempts cannot duplicate.
    - ``commit()`` (driver) appends ONE manifest shard naming the
      files this run committed (sources/manifest.py — the Delta-log
      pattern) — the atomic-visibility marker the reference implements
      as sentinel files (do_step1/dummy_generated,
      tiff2octree.py:1328-1355; I5), and what a resume anti-join (C4)
      reads instead of listing the store. O(run) per commit, never
      O(store).
    - ``overwrite`` mode clears prior ``.ktx`` files + manifest first.
    """

    def __init__(self, options: dict, overwrite: bool):
        self.out_dir = options["path"].rstrip("/")
        self.overwrite = overwrite
        # .ktx.lz4 side-compression (reference's LZ4.exe post-pass,
        # ktx_from_rendered_tiff.py:565-583) done inline per executor
        self.lz4 = str(options.get("lz4", "false")).lower() == "true"
        if overwrite:
            from pyarrow import fs as pafs

            from hortacloud_importer_spark.sources import manifest

            filesystem, base = _pa_fs(self.out_dir)
            manifest.clear(filesystem, base)
            try:
                infos = filesystem.get_file_info(
                    pafs.FileSelector(base, recursive=False)
                )
            except (FileNotFoundError, OSError):
                infos = []
            for info in infos:
                if info.type == pafs.FileType.File and info.base_name.endswith(
                    (".ktx", ".ktx.lz4")
                ):
                    filesystem.delete_file(info.path)

    def write(self, iterator) -> _KtxCommit:
        from pyarrow import fs as pafs

        from hortacloud_importer_spark.sources import manifest as _m

        filesystem, base = _pa_fs(self.out_dir)
        filesystem.create_dir(base, recursive=True)
        # stage+rename wherever rename is atomic (non-object-store),
        # not only LocalFileSystem — same rule as the manifest commit
        local = _m.should_stage(filesystem)
        files, n = [], 0
        from hortacloud_importer_spark.sources.ktx import ktx_block_name

        if self.lz4:
            from hortacloud_importer_spark.sources.codecs import (
                lz4_frame_compress,
            )
        for row in iterator:
            name = ktx_block_name(row, lz4=self.lz4)
            staged = f"{base}/.{name}.tmp" if local else f"{base}/{name}"
            blob = bytes(row["ktx"])
            if self.lz4:
                blob = lz4_frame_compress(blob)
            with filesystem.open_output_stream(staged) as fh:
                fh.write(blob)
            if local:
                filesystem.move(staged, f"{base}/{name}")
            files.append(name)
            n += 1
        return _KtxCommit(files, n)

    def commit(self, messages) -> None:
        from hortacloud_importer_spark.sources import manifest

        filesystem, base = _pa_fs(self.out_dir)
        files = {f for m in messages if m for f in m.files}
        # one immutable shard per commit: append/resume runs accumulate
        # shards, nothing merges or rewrites (prior commits stay
        # visible through the shard union — sources/manifest.py)
        filesystem.create_dir(base, recursive=True)
        manifest.write_commit(filesystem, base, sorted(files))

    def abort(self, messages) -> None:
        filesystem, base = _pa_fs(self.out_dir)
        for m in messages:
            if not m:
                continue
            for name in m.files:
                try:
                    filesystem.delete_file(f"{base}/{name}")
                except (FileNotFoundError, OSError):
                    pass  # best-effort: uncommitted leftovers are inert


class KtxFilesDataSource(DataSource):
    """Writable ``ktx_files`` format (read back with ``binaryFile`` +
    sources/ktx.py::ktx_decode_blocks)."""

    @classmethod
    def name(cls) -> str:
        return "ktx_files"

    def schema(self) -> str:
        # depth is optional on write (0/absent = single-level store)
        return (
            "zi int, yi int, xi int, depth int, channel int,"
            " n_levels int, ktx binary"
        )

    def writer(self, schema, overwrite: bool) -> _KtxWriter:
        return _KtxWriter(dict(self.options), overwrite)


def _octree_rel_dir(zi: int, yi: int, xi: int, nlevels: int) -> str:
    """Octant-digit directory for a leaf block, MSB first — the same
    ``1 + x_bit + 2*y_bit + 4*z_bit`` key as volume.model.octree_path
    (tiff2octree.py:263-279)."""
    parts = []
    for bit in range(nlevels - 2, -1, -1):
        parts.append(
            str(
                1
                + ((xi >> bit) & 1)
                + 2 * ((yi >> bit) & 1)
                + 4 * ((zi >> bit) & 1)
            )
        )
    return "/".join(parts)


@dataclass
class _TiffBlockCommit(WriterCommitMessage):
    files: list[str]
    n_rows: int
    n_skipped: int


class _TiffBlockWriter(DataSourceWriter):
    """``df.write.format("tiff_blocks").save(root)`` over blockify rows
    (zi, yi, xi, channel, shape, voxels) — the reference's ACTUAL block
    output: ``{octree-path}/default.{channel}.tif``, zlib-compressed,
    all-zero blocks skipped (save_block, tiff2octree.py:298-317; ZLIB
    at :315). Written with the clean-room encoder (sources/tiff.py), so
    a store produced here is byte-readable by the reference's tooling
    and by this engine's decode_tiff / tiff_volume scan.

    Commit semantics mirror ``ktx_files``: executors stage via
    pyarrow.fs (tmp+rename on local FS, idempotent names so retried
    tasks overwrite themselves), the driver appends ONE manifest shard
    per commit (sources/manifest.py) — the atomic-visibility marker
    the reference implements as sentinel files
    (tiff2octree.py:1328-1355), and the input a resume anti-join (C4)
    reads instead of walking the tree.
    Options: ``nlevels`` (octree depth, default 1 = flat), ``dtype``
    (``uint8``/``uint16``, default uint16), ``skip_empty`` (default
    true)."""

    def __init__(self, options: dict, overwrite: bool):
        self.out_dir = options["path"].rstrip("/")
        self.nlevels = int(options.get("nlevels", 1))
        self.dtype = options.get("dtype", "uint16")
        if self.dtype not in ("uint8", "uint16"):
            raise ValueError("dtype must be uint8 or uint16")
        self.skip_empty = str(options.get("skip_empty", "true")).lower() == "true"
        self.overwrite = overwrite
        if overwrite:
            from pyarrow import fs as pafs

            from hortacloud_importer_spark.sources import manifest

            filesystem, base = _pa_fs(self.out_dir)
            manifest.clear(filesystem, base)
            try:
                infos = filesystem.get_file_info(
                    pafs.FileSelector(base, recursive=True)
                )
            except (FileNotFoundError, OSError):
                infos = []
            for info in infos:
                if info.type == pafs.FileType.File and info.base_name.endswith(
                    ".tif"
                ):
                    filesystem.delete_file(info.path)

    def write(self, iterator) -> _TiffBlockCommit:
        from pyarrow import fs as pafs

        from hortacloud_importer_spark.sources.tiff import encode_tiff

        from hortacloud_importer_spark.sources import manifest as _m

        filesystem, base = _pa_fs(self.out_dir)
        local = _m.should_stage(filesystem)
        files, n, skipped = [], 0, 0
        made_dirs: set[str] = set()
        for row in iterator:
            arr = np.asarray(row["voxels"], dtype=np.int64)
            if self.skip_empty and (arr.size == 0 or arr.max() <= 0):
                skipped += 1
                continue
            bz, by, bx = (int(s) for s in row["shape"])
            vol = arr[: bz * by * bx].reshape(bz, by, bx).astype(self.dtype)
            rel_dir = _octree_rel_dir(
                int(row["zi"]), int(row["yi"]), int(row["xi"]), self.nlevels
            )
            name = f"default.{int(row['channel'])}.tif"
            rel = f"{rel_dir}/{name}" if rel_dir else name
            target_dir = f"{base}/{rel_dir}".rstrip("/")
            if target_dir not in made_dirs:
                filesystem.create_dir(target_dir, recursive=True)
                made_dirs.add(target_dir)
            payload = encode_tiff(vol, compression="zlib")
            staged = (
                f"{target_dir}/.{name}.tmp" if local else f"{base}/{rel}"
            )
            with filesystem.open_output_stream(staged) as fh:
                fh.write(payload)
            if local:
                filesystem.move(staged, f"{base}/{rel}")
            files.append(rel)
            n += 1
        return _TiffBlockCommit(files, n, skipped)

    def commit(self, messages) -> None:
        from hortacloud_importer_spark.sources import manifest

        filesystem, base = _pa_fs(self.out_dir)
        files = {f for m in messages if m for f in m.files}
        skipped = sum(m.n_skipped for m in messages if m)
        # one immutable shard per commit: successive per-level writes
        # of one octree build (pipelines/octree.py) accumulate shards
        # under the shared root, prior commits stay visible through
        # the shard union, and nothing is ever rewritten (the
        # reference's sentinel files accumulate the same way,
        # tiff2octree.py:1328-1355). n_skipped is per-RUN by contract.
        filesystem.create_dir(base, recursive=True)
        manifest.write_commit(filesystem, base, sorted(files), n_skipped=skipped)

    def abort(self, messages) -> None:
        filesystem, base = _pa_fs(self.out_dir)
        for m in messages:
            if not m:
                continue
            for rel in m.files:
                try:
                    filesystem.delete_file(f"{base}/{rel}")
                except (FileNotFoundError, OSError):
                    pass  # best-effort: uncommitted leftovers are inert


class TiffBlocksDataSource(DataSource):
    """Writable ``tiff_blocks`` format — the reference's octree block
    store (read back with ``binaryFile`` + sources/tiff.py::decode_tiff
    or the ``tiff_volume`` scan)."""

    @classmethod
    def name(cls) -> str:
        return "tiff_blocks"

    def schema(self) -> str:
        return (
            "zi int, yi int, xi int, channel int,"
            " shape array<int>, voxels array<int>"
        )

    def writer(self, schema, overwrite: bool) -> _TiffBlockWriter:
        return _TiffBlockWriter(dict(self.options), overwrite)


class N5VolumeDataSourceNoPushdown(N5VolumeDataSource):
    def reader(self, schema) -> _N5ReaderNoPushdown:
        return _N5ReaderNoPushdown(dict(self.options))


class ZarrVolumeDataSourceNoPushdown(ZarrVolumeDataSource):
    def reader(self, schema) -> _ZarrReaderNoPushdown:
        return _ZarrReaderNoPushdown(dict(self.options))


class TiffVolumeDataSourceNoPushdown(TiffVolumeDataSource):
    def reader(self, schema) -> _TiffSliceReaderNoPushdown:
        return _TiffSliceReaderNoPushdown(dict(self.options))


_SOURCES = (
    N5VolumeDataSource,
    ZarrVolumeDataSource,
    TiffVolumeDataSource,
    KtxFilesDataSource,
    TiffBlocksDataSource,
)

# Same format names, readers without pushFilters — registered when the
# session cannot enable spark.sql.python.filterPushdown.enabled (chunk
# pruning lost, results identical: Spark applies all filters row-level).
_SOURCES_NO_PUSHDOWN = (
    N5VolumeDataSourceNoPushdown,
    ZarrVolumeDataSourceNoPushdown,
    TiffVolumeDataSourceNoPushdown,
    KtxFilesDataSource,
    TiffBlocksDataSource,
)

_PUSHDOWN_CONF = "spark.sql.python.filterPushdown.enabled"


def _enable_filter_pushdown(spark) -> bool:
    """Turn on Python DataSource filter pushdown for this session.

    It is a runtime SQL conf, so ``spark.conf.set`` works on a vanilla
    ``SparkSession.builder`` session (the driver's case). Returns
    whether pushdown readers may be planned."""
    try:
        spark.conf.set(_PUSHDOWN_CONF, "true")
        return True
    except Exception:
        try:
            return str(spark.conf.get(_PUSHDOWN_CONF)).lower() == "true"
        except Exception:
            return False


def register_volume_sources(spark) -> None:
    """Register all volume formats on this session (idempotent —
    re-registration overwrites with the same class).

    Enables ``spark.sql.python.filterPushdown.enabled`` first: Spark
    refuses to plan a Python DataSource whose reader overrides
    ``pushFilters`` while that conf is off. If the conf cannot be set
    (e.g. a locked-down session), falls back to registering readers
    without ``pushFilters`` — chunk pruning is lost but results are
    identical because every filter is re-applied row-level anyway."""
    sources = _SOURCES if _enable_filter_pushdown(spark) else _SOURCES_NO_PUSHDOWN
    for cls in sources:
        try:
            spark.dataSource.register(cls)
        except Exception as exc:  # cloned sessions inherit the registry:
            # same-session re-register overwrites (WARN), but a session
            # created via newSession() raises DATA_SOURCE_ALREADY_EXISTS
            # for names inherited from its parent — the format is already
            # usable there, so that error is not a failure.
            if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
                raise
