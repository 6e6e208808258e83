"""Multimodal (image/video) column plumbing.

Audio is this engine's real multimodal payload (operators/audio.py —
full decode path). Images are handled with the SAME Spark-side
architecture — opaque `binary` column + typed metadata, processed by
Arrow-batched mapInPandas with bounded batch sizes. Codec-free
formats decode for REAL in pure NumPy (PPM/P6 and uncompressed
24-bit BMP — the re-expression of the reference's image-folder
loaders, score_curation/docta/datasets/cifar.py /
customize_img_folder.py, which also read raw pixel buffers), and PNG
decodes for real too — its only compression is DEFLATE, which stdlib
zlib provides (8-bit non-interlaced; gray/RGB/palette/alpha). JPEG
decodes for real via the pure-NumPy baseline codec in
operators/jpeg.py, and video decodes for real for MJPEG-in-AVI
(RIFF container walk + per-frame JPEG — no inter-frame codec
needed). Inter-frame codecs (H.264 etc.) need libraries absent from
this container and raise ValueError (decoded_ok=false) behind the
same registry, swappable in production.

Schema convention:
  media(media_id string, bytes binary, mime string,
        width int, height int, n_frames int)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# mime -> decoder(bytes) -> np.ndarray [h, w, c] (or [frames, h, w, c])
_IMAGE_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}


def register_image_decoder(mime: str, fn: Callable[[bytes], np.ndarray]) -> None:
    _IMAGE_DECODERS[mime] = fn


def _decode_fake_rgb(b: bytes) -> np.ndarray:
    """Deterministic fake decoder (sandbox): interprets the payload as
    a flat uint8 RGB buffer 8x8x3, zero-padded/truncated. Replace with
    a real codec (PIL/ffmpeg) via register_image_decoder in prod."""
    buf = np.frombuffer(b or b"", dtype=np.uint8)
    flat = np.zeros(8 * 8 * 3, dtype=np.uint8)
    flat[: min(len(buf), flat.size)] = buf[: flat.size]
    return flat.reshape(8, 8, 3)


register_image_decoder("image/fake-rgb", _decode_fake_rgb)


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval<=255) -> uint8 [h, w, 3]. Pure NumPy —
    the format is a text header + raw RGB bytes, no codec needed."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    w, h, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    i += 1  # single whitespace byte after maxval, then raw data
    arr = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3)


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) -> uint8
    [h, w, 3] RGB. Handles bottom-up (positive height) and top-down
    rows and 4-byte row padding. Pure NumPy."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    top_down = h < 0
    ah = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(b, dtype=np.uint8, count=row_size * ah, offset=data_off)
    img = arr.reshape(ah, row_size)[:, : w * 3].reshape(ah, w, 3)[..., ::-1]  # BGR->RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def _png_unfilter(rr: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (0=None 1=Sub 2=Up
    3=Average 4=Paeth). Row-sequential by spec (each row references
    the reconstructed row above); Sub rows vectorize as per-residue
    cumulative sums, Average/Paeth fall back to a per-byte loop on
    that row only."""
    h = rr.shape[0]
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(rr[y, 0])
        line = rr[y, 1:]
        if f == 0:
            row = line.copy()
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            row = line.copy()
            for r in range(bpp):
                row[r::bpp] = (
                    np.cumsum(row[r::bpp].astype(np.uint64)) & 0xFF
                ).astype(np.uint8)
        elif f == 2:  # Up
            row = line + prev
        elif f == 3:  # Average
            row = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(line[x]) + (a + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            row = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                bb = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                row[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        recon[y] = row
        prev = recon[y]
    return recon


def decode_png(b: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> uint8 [h, w, c] (alpha dropped).
    Pure NumPy + stdlib zlib — PNG's only compression is DEFLATE, so
    no codec library is needed. Supports color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); 16-bit and
    Adam7-interlaced files raise (rare in training corpora and
    honestly refused rather than mis-decoded)."""
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, pal = 8, bytearray(), None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, interlace = data[8], data[9], data[12]
        elif typ == b"PLTE":
            pal = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError("only 8-bit PNG supported")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG data")
    rr = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    recon = _png_unfilter(rr, stride, channels).reshape(h, w, channels)
    if ctype == 3:
        if pal is None:
            raise ValueError("palette PNG missing PLTE")
        return pal[recon[..., 0]]
    if ctype == 4:
        return recon[..., :1]     # drop alpha
    if ctype == 6:
        return recon[..., :3]     # drop alpha
    return recon


register_image_decoder("image/x-portable-pixmap", decode_ppm)
register_image_decoder("image/bmp", decode_bmp)
register_image_decoder("image/png", decode_png)

# baseline JPEG: real pure-NumPy decoder (operators/jpeg.py). The
# entropy decode is bit-serial correctness-grade Python; production
# swaps in a native codec via register_image_decoder — same plumbing.
from .jpeg import decode_jpeg  # noqa: E402

register_image_decoder("image/jpeg", decode_jpeg)

# file extension -> mime for rows coming off read_media_folder (which
# carries a codec column derived from the extension)
MIME_FROM_EXT: dict[str, str] = {
    "ppm": "image/x-portable-pixmap",
    "bmp": "image/bmp",
    "png": "image/png",    # real decoder: decode_png (zlib + NumPy)
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
}


def image_features(media: DataFrame) -> DataFrame:
    """(media_id, decoded_ok, mean_luma, feature array<float>[16]) —
    decode + feature-extract over pruned (media_id, bytes, mime);
    bytes never shuffle (joined back by key only)."""
    pruned = media.select("media_id", "bytes", "mime")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            luma = np.zeros(n, dtype=np.float64)
            feats: list[list[float]] = []
            for i, (b, mime) in enumerate(zip(pdf["bytes"], pdf["mime"])):
                dec = _IMAGE_DECODERS.get(mime)
                if dec is None:
                    # compressed codecs absent in this container — explicit stub
                    feats.append([0.0] * 16)
                    continue
                try:
                    img = dec(b)
                except (ValueError, IndexError):
                    # malformed payload: a hostile file must not kill
                    # the task — surfaced as decoded_ok=false
                    feats.append([0.0] * 16)
                    continue
                ok[i] = True
                luma[i] = float(img.mean())
                # 16-bin grayscale histogram as the stand-in feature
                gray = img.mean(axis=2)
                hist, _ = np.histogram(gray, bins=16, range=(0, 255))
                s = hist.sum()
                feats.append((hist / s if s else hist).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded_ok": ok,
                    "mean_luma": luma,
                    "feature": feats,
                }
            )

    return pruned.mapInPandas(
        _op,
        schema="media_id string, decoded_ok boolean, mean_luma double, feature array<float>",
    )


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (media_id, frame_idx). Frame decode itself is the stubbed
    step; the row fan-out, partitioning, and schema are the real
    Spark-side work."""
    from pyspark.sql import functions as F

    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def parse_avi_mjpeg(b: bytes) -> list[bytes]:
    """RIFF-AVI container walk -> per-frame JPEG payloads, in stream
    order. Pure bytes (the same codec-free container logic as
    audio.parse_wav_header): frames are the '##dc'/'##db' chunks
    inside the 'movi' LIST; for MJPEG each chunk body is a complete
    baseline JPEG. Raises ValueError if not a RIFF-AVI."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF-AVI container")
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            size = int.from_bytes(b[pos + 4 : pos + 8], "little")
            body = pos + 8
            stop = min(body + size, end)
            if cid in (b"LIST", b"RIFF"):
                walk(body + 4, stop)  # skip the 4-byte list type
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(b[body:stop])
            pos = body + size + (size & 1)  # chunks are word-aligned

    walk(12, len(b))
    return frames


def decode_video_frame(b: bytes, idx: int) -> np.ndarray:
    """Decode frame `idx` of an MJPEG-in-AVI payload -> uint8 pixel
    array (via operators/jpeg.py). Other containers/codecs raise
    ValueError — swap in an ffmpeg-backed decoder in production via
    the same call site."""
    frames = parse_avi_mjpeg(b)
    if not frames:
        raise ValueError("AVI has no video frames")
    if not 0 <= idx < len(frames):
        raise ValueError(f"frame {idx} out of range (n={len(frames)})")
    from .jpeg import decode_jpeg

    return decode_jpeg(frames[idx])




def _dhash_from_img(img: np.ndarray) -> "tuple[int, int] | None":
    """64-bit difference hash of a decoded [h, w, c] uint8 image as
    two 32-bit halves (hi = rows 0..3, lo = rows 4..7; bit 0 of each
    half is its MSB). Exact integer pipeline:

      1. luma = (299*R + 587*G + 114*B) // 1000 (weights sum to 1000,
         so an R==G==B image keeps its exact gray values);
      2. area-mean resize to 9 cols x 8 rows: target cell (r, c)
         averages source block rows floor(r*H/8)..floor((r+1)*H/8)-1
         (cols analogous), mean = sum // count — integer, no float
         resample kernel to disagree about;
      3. bit(r, c) = g[r][c] > g[r][c+1], row-major.

    Two BIGINT halves instead of one int64: bit 63 would overflow a
    signed 64-bit pack on the SQL side (DuckDB refuses to wrap), and
    Hamming distance is popcount(xor) per half either way. Returns
    None for images smaller than the 9x8 grid (no meaningful hash).
    Anchors the reference's row-op discipline to images the same way
    audio_fingerprint does for PCM (cited: docta has no image path;
    this is the beyond-reference multimodal dedup family)."""
    h, w = img.shape[0], img.shape[1]
    if h < 8 or w < 9:
        return None
    px = img.astype(np.int64)
    gray = (
        (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
        if img.ndim == 3 and img.shape[2] >= 3
        else px.reshape(h, w)
    )
    re = np.add.reduceat(gray, (np.arange(8) * h) // 8, axis=0)
    rc = np.diff(np.append((np.arange(8) * h) // 8, h))
    ce = np.add.reduceat(re, (np.arange(9) * w) // 9, axis=1)
    cc = np.diff(np.append((np.arange(9) * w) // 9, w))
    g = ce // (rc[:, None] * cc[None, :])
    bits = (g[:, :8] > g[:, 1:9]).astype(np.int64)
    weights = 1 << (31 - np.arange(32, dtype=np.int64))
    flat = bits.reshape(64)
    return int((flat[:32] * weights).sum()), int((flat[32:] * weights).sum())


IMAGE_DHASH_SCHEMA = (
    "media_id string, decoded_ok boolean, dhash_hi bigint, dhash_lo bigint"
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Per-image difference hash (media_id, decoded_ok, dhash_hi,
    dhash_lo) — the perceptual-dedup key for image payloads: re-saves
    and mild brightness shifts keep neighbor ORDER, so near-identical
    images land within a few Hamming bits while distinct photos are
    ~32 bits apart. Same bytes-discipline as image_features: pruned
    scan -> mapInPandas -> small keyed output; undecodable / too-small
    / unknown-mime rows surface decoded_ok=false with NULL hashes."""
    pruned = media.select("media_id", "bytes", "mime")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            hi: list = [None] * n
            lo: list = [None] * n
            for i, (b, mime) in enumerate(zip(pdf["bytes"], pdf["mime"])):
                dec = _IMAGE_DECODERS.get(mime)
                if dec is None or b is None:
                    continue
                try:
                    hash_ = _dhash_from_img(dec(b))
                except (ValueError, IndexError):
                    continue
                if hash_ is None:
                    continue
                ok[i] = True
                hi[i], lo[i] = hash_
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded_ok": ok,
                    "dhash_hi": pd.array(hi, dtype="Int64"),
                    "dhash_lo": pd.array(lo, dtype="Int64"),
                }
            )

    return pruned.mapInPandas(_op, schema=IMAGE_DHASH_SCHEMA)


def image_dhash_pairs(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image pairs (id_a, id_b, hamming) from dhash
    rows — banded exact-match candidate generation, then Hamming
    verify. Scale shape (the dedup.py LSH discipline): the 64-bit
    hash splits into four 16-bit bands; by pigeonhole a pair with
    hamming <= 3 cannot differ in all four bands, so recall is FULL
    for max_hamming <= 3 and recall-documented above it (a pair
    spreading 4+ differing bits across all four bands is missed —
    the standard banded-LSH trade, same as simhash_neardup's
    pigeonhole banding). Shuffles carry
    (band_val, id) only; verify joins hashes back by id, never
    payloads; all-pairs never forms."""
    from pyspark.sql import functions as F

    # lazy localCheckpoint: h feeds FOUR plan subtrees (bands a/b and
    # both verify-join sides) and upstream is usually the mapInPandas
    # decode+hash kernel — without a cut Spark re-runs that kernel
    # per subtree (the q_html_extract / NOTES #84(d) discipline)
    h = (
        hashes.filter(F.col("decoded_ok"))
        .select("media_id", "dhash_hi", "dhash_lo")
        .localCheckpoint(eager=False)
    )
    # the 64-bit hash rides the band rows (two longs — still ids+keys,
    # never payloads), so the exact popcount verify runs IN the band
    # join and the distinct's shuffle carries only TRUE pairs (guide
    # §2.3, same shape as dedup.simhash_banded_pairs): hamming is a
    # pure function of the pair, so filter-then-distinct equals the
    # former distinct -> re-join hashes -> filter, minus two joins
    # and a full-candidate exchange
    bands = h.select(
        "media_id",
        "dhash_hi",
        "dhash_lo",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("b"),
                         F.shiftright("dhash_hi", 16).alias("v")),
                F.struct(F.lit(1).alias("b"),
                         (F.col("dhash_hi") % 65536).alias("v")),
                F.struct(F.lit(2).alias("b"),
                         F.shiftright("dhash_lo", 16).alias("v")),
                F.struct(F.lit(3).alias("b"),
                         (F.col("dhash_lo") % 65536).alias("v")),
            )
        ).alias("band"),
    ).select("media_id", "dhash_hi", "dhash_lo", "band.b", "band.v")
    a, b = bands.alias("a"), bands.alias("b")
    ham = (
        F.bit_count(F.col("a.dhash_hi").bitwiseXOR(F.col("b.dhash_hi")))
        + F.bit_count(F.col("a.dhash_lo").bitwiseXOR(F.col("b.dhash_lo")))
    )
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
