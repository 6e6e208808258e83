import numpy as np
import pytest
from pyspark.sql import functions as F

from ds2_spark.operators.multimodal import (
    MIME_FROM_EXT,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_video_frame,
    frame_sample,
    image_features,
)


def _encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def _encode_bmp(img: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BI_RGB BMP."""
    h, w, _ = img.shape
    row_size = (w * 3 + 3) // 4 * 4
    pad = row_size - w * 3
    body = b"".join(
        img[r, :, ::-1].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    data_off = 54
    header = (
        b"BM"
        + (data_off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def _encode_png(img: np.ndarray, ctype: int, filters, pal=None) -> bytes:
    """Reference PNG encoder (independent of the decoder under test):
    8-bit non-interlaced, per-row filter types chosen by the caller so
    every unfilter branch (None/Sub/Up/Average/Paeth) is exercised."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * c).astype(np.int32)
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        f = filters[y % len(filters)]
        if f == 0:
            filt = line
        elif f == 1:
            a = np.zeros_like(line)
            a[bpp:] = line[:-bpp]
            filt = (line - a) & 0xFF
        elif f == 2:
            filt = (line - prev) & 0xFF
        elif f == 3:
            a = np.zeros_like(line)
            a[bpp:] = line[:-bpp]
            filt = (line - (a + prev) // 2) & 0xFF
        else:  # Paeth
            filt = np.zeros_like(line)
            for x in range(w * c):
                a = int(line[x - bpp]) if x >= bpp else 0
                b_ = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b_ - cc
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else cc)
                filt[x] = (int(line[x]) - pred) & 0xFF
        raw.append(f)
        raw.extend(bytes(filt.astype(np.uint8)))
        prev = line
    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    if pal is not None:
        out += chunk(b"PLTE", bytes(pal.astype(np.uint8).ravel()))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_decoder_all_filters_and_color_types():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 17, 3)).astype(np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert np.array_equal(decode_png(_encode_png(img, 2, filters)), img)
    gray = rng.integers(0, 256, size=(9, 11)).astype(np.uint8)
    assert np.array_equal(
        decode_png(_encode_png(gray, 0, [0, 1, 2, 3, 4]))[..., 0], gray
    )
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    pidx = rng.integers(0, 16, size=(7, 5)).astype(np.uint8)
    assert np.array_equal(decode_png(_encode_png(pidx, 3, [0, 1, 4], pal=pal)), pal[pidx])
    rgba = rng.integers(0, 256, size=(6, 6, 4)).astype(np.uint8)
    assert np.array_equal(decode_png(_encode_png(rgba, 6, [0, 2, 4])), rgba[..., :3])
    for bad in (b"", b"\x89PNG\r\n\x1a\nXX", b"nope"):
        with pytest.raises(ValueError):
            decode_png(bad)


def test_numpy_decoders_roundtrip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(5, 7, 3), dtype=np.uint8)  # odd width: BMP padding
    assert np.array_equal(decode_ppm(_encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(_encode_bmp(img)), img)
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII PPM unsupported
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated header


def test_media_folder_to_features_end_to_end(spark, tmp_path):
    """Real bytes from a binaryFile scan through the registry decoders:
    decoded_ok=true reachable end-to-end for codec-free formats, and a
    corrupt payload degrades to decoded_ok=false, never a crash."""
    from ds2_spark.sources.readers import read_media_folder

    rng = np.random.default_rng(9)
    imgs = {}
    d = tmp_path / "media"
    d.mkdir()
    for name in ("a", "b"):
        img = rng.integers(0, 255, size=(6, 5, 3), dtype=np.uint8)
        imgs[name + "_ppm"] = img
        (d / f"{name}_ppm.ppm").write_bytes(_encode_ppm(img))
        img2 = rng.integers(0, 255, size=(4, 9, 3), dtype=np.uint8)
        imgs[name + "_bmp"] = img2
        (d / f"{name}_bmp.bmp").write_bytes(_encode_bmp(img2))
    (d / "broken.ppm").write_bytes(b"P6\n99999 99999\n255\n\x00\x01")
    (d / "photo.png").write_bytes(b"\x89PNG\r\n\x1a\nnotreal")  # malformed PNG
    png_img = rng.integers(0, 255, size=(5, 4, 3), dtype=np.uint8)
    imgs["real_png"] = png_img
    (d / "real_png.png").write_bytes(_encode_png(png_img, 2, [0, 1, 2, 3, 4]))

    scan = read_media_folder(spark, str(d))
    mime_map = F.create_map(
        *[F.lit(x) for kv in MIME_FROM_EXT.items() for x in kv]
    )
    media = scan.select(
        F.col("clip_id").alias("media_id"),
        "bytes",
        mime_map[F.col("codec")].alias("mime"),
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(out) == 7
    for name, img in imgs.items():
        r = out[name]
        assert r["decoded_ok"], name
        assert abs(r["mean_luma"] - float(img.mean())) < 1e-6
    assert not out["broken"]["decoded_ok"]   # malformed: flagged, no crash
    assert not out["photo"]["decoded_ok"]    # malformed PNG: flagged, no crash


@pytest.fixture(scope="module")
def media(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        payload = rng.integers(0, 255, size=8 * 8 * 3, dtype=np.uint8).tobytes()
        rows.append((f"m{i}", payload, "image/fake-rgb", 8, 8, 10))
    rows.append(("bad", b"\x01\x02", "image/jpeg", 0, 0, 4))  # no decoder registered
    return spark.createDataFrame(
        rows, "media_id string, bytes binary, mime string, width int, height int, n_frames int"
    )


def test_image_features_plumbing(spark, media):
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(out) == 7
    ok = out["m0"]
    assert ok["decoded_ok"] and 0 <= ok["mean_luma"] <= 255
    assert len(ok["feature"]) == 16
    assert abs(sum(ok["feature"]) - 1.0) < 1e-5  # normalized histogram
    # unregistered codec: explicit stub path, no crash
    assert not out["bad"]["decoded_ok"]
    assert out["bad"]["feature"] == [0.0] * 16


def test_frame_sample_fanout(spark, media):
    rows = frame_sample(media, every_n=3).collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(per["m0"]) == [0, 3, 6, 9]
    assert sorted(per["bad"]) == [0, 3]


def test_video_decode_refuses_non_avi():
    """Non-MJPEG-AVI payloads are refused with ValueError (the
    registry-level decoded_ok=false path), never mis-decoded."""
    with pytest.raises(ValueError):
        decode_video_frame(b"x", 0)
    with pytest.raises(ValueError):
        decode_video_frame(b"RIFF\x00\x00\x00\x00WAVE", 0)
