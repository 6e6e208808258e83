"""Multimodal (image/video) column plumbing.

Audio is this engine's real multimodal payload (operators/audio.py —
full decode path). Image/video are handled with the SAME Spark-side
architecture — opaque `binary` column + typed metadata, processed by
Arrow-batched mapInPandas with bounded batch sizes — but the codec
decode itself is STUBBED: no image/video libraries exist in this
container. The stubs are explicit (`NotImplementedError` or a
deterministic fake) so the plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested while the decode body is
swappable.

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
                    # real codecs absent in this container — explicit stub
                    feats.append([0.0] * 16)
                    continue
                img = dec(b)
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
