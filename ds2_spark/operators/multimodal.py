"""Multimodal (image/video) column plumbing.

Audio is this engine's real multimodal payload (operators/audio.py —
full decode path). Images are handled with the SAME Spark-side
architecture — opaque `binary` column + typed metadata, processed by
Arrow-batched mapInPandas with bounded batch sizes. Codec-free
formats decode for REAL in pure NumPy (PPM/P6 and uncompressed
24-bit BMP — the re-expression of the reference's image-folder
loaders, score_curation/docta/datasets/cifar.py /
customize_img_folder.py, which also read raw pixel buffers);
compressed codecs (PNG/JPEG) and video need libraries absent from
this container and stay explicit stubs (`NotImplementedError` /
decoded_ok=false) behind the same registry, swappable in production.

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


register_image_decoder("image/x-portable-pixmap", decode_ppm)
register_image_decoder("image/bmp", decode_bmp)

# file extension -> mime for rows coming off read_media_folder (which
# carries a codec column derived from the extension)
MIME_FROM_EXT: dict[str, str] = {
    "ppm": "image/x-portable-pixmap",
    "bmp": "image/bmp",
    "png": "image/png",    # no decoder in this container -> decoded_ok=false
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


def decode_video_frame(_b: bytes, _idx: int) -> np.ndarray:
    """Explicit stub: no video codec in this container."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav; register a real decoder in production"
    )
