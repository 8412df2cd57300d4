"""CCITT G3/G4 (ITU-T T.4/T.6) decoder tests: library-independent
roundtrips through this repo's own minimal encoders, bit-exact parity
against an independent implementation (the JDK's javax.imageio TIFF
plugin — skipped when no JDK), multi-strip and FillOrder variants,
and the named-error corruption contract."""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from hortacloud_importer_spark.sources.ccitt import (
    CcittParseError,
    decode_g3,
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)
from hortacloud_importer_spark.sources.tiff import (
    TiffParseError,
    decode_tiff,
    encode_tiff,
)

_HAVE_JAVA = shutil.which("javac") is not None and shutil.which("java") is not None

_JAVA_SRC = r"""
import java.awt.image.BufferedImage;
import java.io.*;
import java.nio.file.*;
import javax.imageio.*;
import javax.imageio.stream.*;
import java.util.Iterator;
public class TiffRef {
  public static void main(String[] a) throws Exception {
    if (a[0].equals("encode")) {
      byte[] bits = Files.readAllBytes(Paths.get(a[1]));
      int w = Integer.parseInt(a[2]), h = Integer.parseInt(a[3]);
      BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          img.getRaster().setSample(x, y, 0, bits[y * w + x]);
      Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("tiff");
      ImageWriter wr = it.next();
      ImageWriteParam p = wr.getDefaultWriteParam();
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
      p.setCompressionType(a[4]);
      try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[5]))) {
        wr.setOutput(os);
        wr.write(null, new IIOImage(img, null, null), p);
      }
    } else {
      BufferedImage img = ImageIO.read(new File(a[1]));
      int w = img.getWidth(), h = img.getHeight();
      byte[] out = new byte[w * h];
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          out[y * w + x] = (byte) img.getRaster().getSample(x, y, 0);
      Files.write(Paths.get(a[2]), out);
      System.out.println(w + " " + h);
    }
  }
}
"""


@pytest.fixture(scope="module")
def java_ref(tmp_path_factory):
    if not _HAVE_JAVA:
        pytest.skip("no JDK in environment")
    d = tmp_path_factory.mktemp("javatiff")
    (d / "TiffRef.java").write_text(_JAVA_SRC)
    subprocess.run(
        ["javac", "TiffRef.java"], cwd=d, check=True, capture_output=True
    )

    def encode(raster: np.ndarray, comp: str) -> bytes:
        h, w = raster.shape
        (d / "in.raw").write_bytes(raster.astype(np.uint8).tobytes())
        subprocess.run(
            ["java", "-cp", str(d), "TiffRef", "encode", str(d / "in.raw"),
             str(w), str(h), comp, str(d / "out.tif")],
            check=True, capture_output=True,
        )
        return (d / "out.tif").read_bytes()

    def decode(tiff_bytes: bytes) -> np.ndarray:
        (d / "in.tif").write_bytes(tiff_bytes)
        r = subprocess.run(
            ["java", "-cp", str(d), "TiffRef", "decode", str(d / "in.tif"),
             str(d / "back.raw")],
            check=True, capture_output=True, text=True,
        )
        w, h = map(int, r.stdout.split())
        return np.frombuffer((d / "back.raw").read_bytes(), np.uint8).reshape(
            h, w
        )

    return encode, decode


def _rand_ink(seed: int, h: int, w: int, density: float) -> np.ndarray:
    return (np.random.default_rng(seed).random((h, w)) < density).astype(
        np.uint8
    )


def test_own_encoder_roundtrips():
    rng = np.random.default_rng(5)
    for seed in range(20):
        h, w = int(rng.integers(1, 30)), int(rng.integers(1, 90))
        ink = _rand_ink(seed, h, w, 0.3)
        assert np.array_equal(decode_g4(encode_g4(ink), w, h), ink)
        assert np.array_equal(decode_mh(encode_mh(ink), w, h), ink)
    # make-up chains past 2560 (T.4 extended codes + accumulation)
    ink = np.zeros((2, 6000), np.uint8)
    ink[0, 100:5000] = 1
    assert np.array_equal(decode_g4(encode_g4(ink), 6000, 2), ink)
    assert np.array_equal(decode_mh(encode_mh(ink), 6000, 2), ink)


def test_tiff_container_roundtrip_and_multistrip():
    rng = np.random.default_rng(8)
    for comp in ("g4", "ccitt_rle"):
        ink = (rng.random((3, 21, 50)) < 0.25).astype(np.uint8)
        back = decode_tiff(encode_tiff(ink, compression=comp))
        assert np.array_equal(back[:, :, :, 0], ink)
    # hand-assembled 2-strip G4 page: each strip restarts with an
    # all-white reference line
    ink = (rng.random((8, 40)) < 0.3).astype(np.uint8)
    s0, s1 = encode_g4(ink[:4]), encode_g4(ink[4:])
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8)
    entries = [
        (256, 3, [40]), (257, 3, [8]), (258, 3, [1]), (259, 3, [4]),
        (262, 3, [0]), (273, 4, [0, 0]), (277, 3, [1]), (278, 3, [4]),
        (279, 4, [len(s0), len(s1)]),
    ]
    ifd = struct.pack("<H", len(entries))
    overflow_pos = 8 + 2 + 12 * len(entries) + 4
    data_pos = overflow_pos + 16  # two LONG[2] overflow arrays
    body = b""
    for tag, ft, vals in entries:
        if tag == 273:
            vals = [data_pos, data_pos + len(s0)]
        payload = struct.pack("<" + "I" * len(vals), *vals) if ft == 4 else (
            struct.pack("<" + "H" * len(vals), *vals)
        )
        if len(payload) <= 4:
            ifd += struct.pack("<HHI4s", tag, ft, len(vals), payload.ljust(4, b"\0"))
        else:
            ifd += struct.pack("<HHII", tag, ft, len(vals), overflow_pos + len(body))
            body += payload
    ifd += struct.pack("<I", 0)
    blob = bytes(out) + ifd + body + s0 + s1
    back = decode_tiff(blob)
    assert np.array_equal(back[0, :, :, 0], ink)


def test_photometric_one_inverts_samples():
    ink = np.array([[1, 0, 1, 1, 0, 0, 0, 1]], np.uint8)
    data = bytearray(encode_tiff(ink[None], compression="g4"))
    i = data.find(struct.pack("<HH", 262, 3))
    assert i > 0
    struct.pack_into("<I", data, i + 8, 1)  # BlackIsZero
    back = decode_tiff(bytes(data))
    assert np.array_equal(back[0, :, :, 0], 1 - ink)


def test_fill_order_2():
    """A hand-assembled G4 TIFF with FillOrder 2 (LSB-first bytes)
    decodes identically after the per-byte bit reversal."""
    ink = _rand_ink(3, 5, 17, 0.4)
    strip = bytes(int(f"{b:08b}"[::-1], 2) for b in encode_g4(ink))
    entries = [
        (256, 3, [17]), (257, 3, [5]), (258, 3, [1]), (259, 3, [4]),
        (262, 3, [0]), (266, 3, [2]), (273, 4, [0]), (277, 3, [1]),
        (278, 3, [5]), (279, 4, [len(strip)]),
    ]
    data_pos = 8 + 2 + 12 * len(entries) + 4
    ifd = struct.pack("<H", len(entries))
    for tag, ft, vals in entries:
        if tag == 273:
            vals = [data_pos]
        fmt = "I" if ft == 4 else "H"
        payload = struct.pack("<" + fmt * len(vals), *vals)
        ifd += struct.pack("<HHI4s", tag, ft, len(vals), payload.ljust(4, b"\0"))
    ifd += struct.pack("<I", 0)
    blob = b"II*\x00" + struct.pack("<I", 8) + ifd + strip
    assert np.array_equal(decode_tiff(blob)[0, :, :, 0], ink)


@pytest.mark.parametrize("comp", ["CCITT T.6", "CCITT RLE", "CCITT T.4"])
def test_forward_parity_java_encoded(java_ref, comp):
    """Java-encoded CCITT streams (T.6, byte-aligned MH, and 2-D G3)
    decode to Java's own raster. Java's TYPE_BYTE_BINARY sample is the
    inverse of the stored bit under PhotometricInterpretation 0."""
    encode, decode = java_ref
    for seed, (h, w), density in (
        (0, (12, 40), 0.1), (1, (7, 33), 0.3), (2, (20, 64), 0.5),
        (3, (3, 8), 0.8), (4, (1, 1), 0.5), (5, (64, 128), 0.2),
    ):
        raster = _rand_ink(seed, h, w, density)
        data = encode(raster, comp)
        got = decode_tiff(data)[0, :, :, 0]
        assert np.array_equal(got, 1 - raster), (comp, seed)


def test_reverse_parity_java_decodes_own_streams(java_ref):
    _, decode = java_ref
    for comp in ("g4", "ccitt_rle"):
        ink = _rand_ink(11, 9, 37, 0.3)
        back = decode(encode_tiff(ink[None], compression=comp))
        assert np.array_equal(back, 1 - ink), comp


def test_ccitt_corruption_contract_fuzz():
    """Arbitrary corruption of a CCITT TIFF raises TiffParseError
    (wrapping CcittParseError) — never raw Index/struct errors."""
    ink = _rand_ink(7, 11, 43, 0.35)
    payload = encode_tiff(ink[None], compression="g4")
    rng = np.random.default_rng(0xCC17)
    for _ in range(300):
        buf = bytearray(payload)
        kind = rng.integers(0, 3)
        if kind == 0 and len(buf) > 12:
            buf = buf[: int(rng.integers(10, len(buf)))]
        elif kind == 1:
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        else:
            pos = int(rng.integers(0, len(buf)))
            buf[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_tiff(bytes(buf))
        except TiffParseError:
            pass


def test_raw_ccitt_corruption_named_errors():
    ink = _rand_ink(9, 6, 30, 0.4)
    g4 = encode_g4(ink)
    rng = np.random.default_rng(0x7E4)
    for _ in range(200):
        buf = bytearray(g4)
        if len(buf) > 2 and rng.random() < 0.5:
            buf = buf[: int(rng.integers(1, len(buf)))]
        else:
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        try:
            decode_g4(bytes(buf), 30, 6)
            decode_g3(bytes(buf), 30, 6)
            decode_mh(bytes(buf), 30, 6)
        except CcittParseError:
            pass


def test_t6_uncompressed_mode_round_trips():
    """T.6 uncompressed mode (T6Options bit 1): whole rows coded as
    extension code + Table-4 literal pixel codes + exit-T, mixed with
    horizontal-mode rows; the decoder handles the extension inline."""
    for seed, (h, w), density in (
        (21, (12, 40), 0.1), (22, (7, 33), 0.5), (23, (5, 64), 0.9),
        (24, (1, 1), 0.5), (25, (16, 16), 0.3),
    ):
        ink = _rand_ink(seed, h, w, density)
        rng = np.random.default_rng(seed)
        ur = set(int(x) for x in rng.integers(0, h, max(1, h // 2)))
        blob = encode_g4(ink, uncompressed_rows=ur)
        assert np.array_equal(decode_g4(blob, w, h), ink), seed
        # all rows uncompressed
        blob = encode_g4(ink, uncompressed_rows=set(range(h)))
        assert np.array_equal(decode_g4(blob, w, h), ink), seed
    # degenerate rows: all white (long 000001 chains + exit) and all
    # black (every pixel a '1' code, exit after a black)
    for fill in (0, 1):
        ink = np.full((3, 41), fill, np.uint8)
        blob = encode_g4(ink, uncompressed_rows={0, 1, 2})
        assert np.array_equal(decode_g4(blob, 41, 3), ink)


def test_t6_uncompressed_mid_row_entry_and_exit_t():
    """Hand-built stream: a horizontal-mode run pair, then the
    extension code enters uncompressed mode MID-ROW; the exit's T bit
    sets the color of the resumed 2-D coding."""
    from hortacloud_importer_spark.sources.ccitt import _BitWriter

    # width 16: row = 4 white, 2 black (horizontal), then literals
    # 1,0,1,1 (uncompressed), exit with T=0 (white), then V0 codes
    # the rest against the all-white reference via b1=16
    bw = _BitWriter()
    bw.write("001")  # horizontal mode
    bw.write("1011")  # white run 4 (T.4 terminating code)
    bw.write("11")  # black run 2
    bw.write("0000001111")  # extension -> uncompressed
    bw.write("1")  # literal black
    bw.write("01")  # literal white, black
    bw.write("1")  # literal black
    bw.write("0000001" + "0")  # exit, 0 trailing whites, T=white
    bw.write("1")  # V0: a1 = b1 = 16 (row completes white)
    bw.align()
    expect = np.array(
        [[0, 0, 0, 0, 1, 1, 1, 0, 1, 1, 0, 0, 0, 0, 0, 0]], np.uint8
    )
    assert np.array_equal(decode_g4(bytes(bw.out), 16, 1), expect)


def test_t6_uncompressed_tiff_t6options_and_named_errors():
    """encode_tiff writes T6Options bit 1 alongside uncompressed-mode
    strips; decode reads them; other extension types stay gated."""
    import struct as _s

    from hortacloud_importer_spark.sources.ccitt import (
        _BitWriter,
        _decode_uncompressed,
        _Bits,
    )
    from hortacloud_importer_spark.sources.tiff import (
        decode_tiff,
        encode_tiff,
    )

    ink = _rand_ink(31, 16, 16, 0.35)
    blob = encode_tiff(ink[None], compression="g4",
                       g4_uncompressed_rows={0, 7, 15})
    assert _s.pack("<H", 293) in blob  # T6Options tag on the wire
    assert np.array_equal(decode_tiff(blob)[0, :, :, 0], ink)
    # a non-uncompressed extension type raises by NAME
    bw = _BitWriter()
    bw.write("0000001" + "101")  # extension type 5
    bw.align()
    with pytest.raises(CcittParseError, match="extension type"):
        decode_g4(bytes(bw.out), 8, 1)
    # >10 zeros inside uncompressed mode raises by name
    bits = _Bits(bytes(2))
    with pytest.raises(CcittParseError, match="10 zeros"):
        _decode_uncompressed(bits, 8)
    # literal overrun raises by name
    bw = _BitWriter()
    bw.write("0000001111" + "1" * 9 + "00000010")
    bw.align()
    with pytest.raises(CcittParseError, match="overrun"):
        decode_g4(bytes(bw.out), 8, 1)
