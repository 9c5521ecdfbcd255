"""Native C++ PNG/JPEG decoder: bit-parity with PIL, fallback, threading.

The decoder (cutmix_seg_tpu/native/decode.cpp) must return exactly
``np.array(PIL.Image.open(bytes))`` for every format the datasets use:
palette-index PNG labels (VOC), RGB PNG (converted Cityscapes/CamVid/ISIC
zips), JPEG images (VOC JPEGImages), plus gray/alpha variants. Unsupported
inputs must fall back to PIL, never crash.
"""

import io
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest
from PIL import Image

from cutmix_seg_tpu.native import decode as nd


pytestmark = pytest.mark.skipif(
    not nd.native_available(), reason="native decoder unavailable (no g++?)"
)


def _png(img: Image.Image, **kw) -> bytes:
    b = io.BytesIO()
    img.save(b, "PNG", **kw)
    return b.getvalue()


def _ref(data: bytes) -> np.ndarray:
    return np.array(Image.open(io.BytesIO(data)))


def _cases():
    rng = np.random.RandomState(7)
    cases = {}
    cases["rgb_png"] = _png(
        Image.fromarray(rng.randint(0, 256, (37, 53, 3), np.uint8)))
    cases["rgba_png"] = _png(
        Image.fromarray(rng.randint(0, 256, (37, 53, 4), np.uint8), "RGBA"))
    gray = rng.randint(0, 256, (41, 29), np.uint8)
    cases["gray_png"] = _png(Image.fromarray(gray, "L"))
    cases["la_png"] = _png(Image.fromarray(np.dstack([gray, gray]), "LA"))
    pal = Image.fromarray(rng.randint(0, 21, (37, 53), np.uint8), "P")
    pal.putpalette([i % 256 for i in range(768)])
    cases["palette_png"] = _png(pal)
    cases["interlaced_png"] = _png(
        Image.fromarray(rng.randint(0, 256, (37, 53, 3), np.uint8)),
        interlace=True)
    jpg = Image.fromarray(rng.randint(0, 256, (64, 80, 3), np.uint8))
    b = io.BytesIO()
    jpg.save(b, "JPEG", quality=90)
    cases["rgb_jpeg"] = b.getvalue()
    b = io.BytesIO()
    jpg.convert("L").save(b, "JPEG", quality=85)
    cases["gray_jpeg"] = b.getvalue()
    b = io.BytesIO()
    jpg.save(b, "JPEG", quality=90, progressive=True)
    cases["progressive_jpeg"] = b.getvalue()
    return cases


@pytest.mark.parametrize("name", sorted(_cases()))
def test_native_bit_parity_with_pil(name):
    data = _cases()[name]
    nat = nd._decode_native(data)
    assert nat is not None, f"{name}: expected native decode, got fallback"
    np.testing.assert_array_equal(nat, _ref(data))


def test_all_png_filter_types_decode():
    """Hand-built PNG whose rows use every filter type (0..4); libpng must
    reconstruct exactly what PIL does."""
    h, w = 5, 8
    rng = np.random.RandomState(3)
    raw = rng.randint(0, 256, (h, w, 3), np.uint8)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    # filter each row with type == row index (none/sub/up/avg/paeth)
    prev = np.zeros((w, 3), np.int32)
    stream = b""
    for y in range(h):
        row = raw[y].astype(np.int32)
        ft = y % 5
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        up = prev
        ul = np.zeros_like(row)
        ul[1:] = prev[:-1]
        if ft == 0:
            out = row
        elif ft == 1:
            out = row - left
        elif ft == 2:
            out = row - up
        elif ft == 3:
            out = row - (left + up) // 2
        else:  # paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, ul))
            out = row - pred
        stream += bytes([ft]) + (out % 256).astype(np.uint8).tobytes()
        prev = row
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(stream))
           + chunk(b"IEND", b""))
    nat = nd._decode_native(png)
    assert nat is not None
    np.testing.assert_array_equal(nat, raw)
    np.testing.assert_array_equal(nat, _ref(png))


def test_unsupported_falls_back_to_pil():
    a16 = np.random.RandomState(0).randint(0, 65535, (10, 11)).astype(np.uint16)
    b = io.BytesIO()
    Image.fromarray(a16).save(b, "PNG")  # 16-bit: outside the native subset
    data = b.getvalue()
    assert nd._decode_native(data) is None
    out = nd.decode_array(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, _ref(data))


def test_corrupt_data_raises_via_pil():
    assert nd._decode_native(b"not an image") is None
    with pytest.raises(Exception):
        nd.decode_array(b"not an image")


def test_truncated_png_does_not_crash():
    data = _cases()["rgb_png"]
    for cut in (8, 20, 40, len(data) // 2, len(data) - 5):
        assert nd._decode_native(data[:cut]) is None


def test_threaded_decode_parity():
    cases = _cases()
    names = sorted(cases) * 8
    with ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(lambda n: nd.decode_array(cases[n]), names))
    for name, out in zip(names, outs):
        np.testing.assert_array_equal(out, _ref(cases[name]))


def test_env_disable(monkeypatch):
    """CUTMIX_SEG_NATIVE_DECODE=0 must route through PIL (fresh state)."""
    monkeypatch.setenv("CUTMIX_SEG_NATIVE_DECODE", "0")
    monkeypatch.setattr(nd, "_lib", None)
    monkeypatch.setattr(nd, "_lib_failed", False)
    assert not nd.native_available()
    data = _cases()["rgb_png"]
    np.testing.assert_array_equal(nd.decode_array(data), _ref(data))


def test_decompression_bomb_header_routed_to_pil():
    """A 60000x60000 IHDR must not make the native path allocate ~10 GB —
    oversized declarations fall back to PIL, which raises its bomb error."""
    import PIL

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    bomb = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00"))
            + chunk(b"IEND", b""))
    assert nd._decode_native(bomb) is None
    with pytest.raises(PIL.Image.DecompressionBombError):
        nd.decode_array(bomb)


def test_require_native_raises_on_every_call(monkeypatch):
    """CUTMIX_SEG_NATIVE_DECODE=1 with a failed build must raise for every
    caller, not only the first."""
    monkeypatch.setenv("CUTMIX_SEG_NATIVE_DECODE", "1")
    monkeypatch.setattr(nd, "_lib", None)
    monkeypatch.setattr(nd, "_lib_failed", True)
    monkeypatch.setattr(nd, "_lib_error", RuntimeError("g++ exploded"))
    data = _cases()["rgb_png"]
    for _ in range(3):
        with pytest.raises(RuntimeError, match="native decoder is unavailable"):
            nd.decode_array(data)


def test_encode_png_roundtrip_parity():
    """Native PNG encode: the file must decode (via PIL) to the same array
    PIL's own save would store, for every dtype the export path uses."""
    rng = np.random.RandomState(11)
    cases = {
        "gray8": rng.randint(0, 256, (23, 31), np.uint8),
        "rgb8": rng.randint(0, 256, (23, 31, 3), np.uint8),
        "gray16": rng.randint(0, 65536, (23, 31)).astype(np.uint16),
        "labels_u32": rng.randint(0, 21, (23, 31)).astype(np.uint32),
    }
    for name, arr in cases.items():
        data = nd.encode_png(arr)
        got = _ref(data)
        # PIL's own write of the same array (uint32 -> mode I -> 16-bit png)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "PNG")
        pil_stored = _ref(b.getvalue())
        np.testing.assert_array_equal(got, pil_stored.astype(got.dtype), name)
        np.testing.assert_array_equal(got.astype(np.int64),
                                      arr.astype(np.int64), name)


def test_encode_png_native_path_used():
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, (16, 16, 3), np.uint8)
    assert nd._encode_native(arr) is not None
    # float input: unsupported by the native path, must not crash encode_png
    assert nd._encode_native(arr.astype(np.float32)) is None


def test_save_prediction_by_index_writes_16bit_png(tmp_path):
    from cutmix_seg_tpu.data.sources import DataSource

    src = DataSource()
    src.sample_names = ["val/sample_007"]
    pred = np.random.RandomState(0).randint(0, 21, (40, 50)).astype(np.int32)
    src.save_prediction_by_index(str(tmp_path), pred, 0)
    path = tmp_path / "val" / "sample_007.png"
    assert path.exists()
    got = np.array(Image.open(path))
    np.testing.assert_array_equal(got.astype(np.int64), pred.astype(np.int64))


def test_fuzz_random_images_parity():
    """Randomized sweep: many modes/sizes/encoder settings, all bit-equal."""
    rng = np.random.RandomState(42)
    for trial in range(60):
        h, w = int(rng.randint(1, 180)), int(rng.randint(1, 180))
        mode = ["L", "RGB", "RGBA", "P", "LA"][trial % 5]
        if mode == "L":
            img = Image.fromarray(rng.randint(0, 256, (h, w), np.uint8), "L")
        elif mode == "RGB":
            img = Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8))
        elif mode == "RGBA":
            img = Image.fromarray(rng.randint(0, 256, (h, w, 4), np.uint8),
                                  "RGBA")
        elif mode == "P":
            img = Image.fromarray(rng.randint(0, 256, (h, w), np.uint8), "P")
            img.putpalette([int(v) for v in rng.randint(0, 256, 768)])
        else:
            g = rng.randint(0, 256, (h, w, 2), np.uint8)
            img = Image.fromarray(g, "LA")
        b = io.BytesIO()
        img.save(b, "PNG", optimize=bool(trial % 2),
                 compress_level=int(rng.randint(0, 10)))
        data = b.getvalue()
        nat = nd._decode_native(data)
        assert nat is not None, (trial, mode, h, w)
        np.testing.assert_array_equal(nat, _ref(data), err_msg=str((trial, mode)))
        if mode in ("L", "RGB"):
            b = io.BytesIO()
            img.save(b, "JPEG", quality=int(rng.randint(10, 101)))
            data = b.getvalue()
            nat = nd._decode_native(data)
            assert nat is not None, (trial, mode, "jpeg")
            np.testing.assert_array_equal(nat, _ref(data))
