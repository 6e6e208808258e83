"""Audio decode / sanity stage (operator K8, SURVEY.md §2.9).

Decodes the `bytes` payload to PCM inside an Arrow-batched
`mapInPandas` — the ONLY stage that ever touches the binary column.
At 10^12-clip scale the discipline is:

  scan(clip_id, bytes, sr_hz, dur_ms, codec)   <- column-pruned scan
    -> mapInPandas(decode + sanity)            <- narrow, no shuffle
    -> small (clip_id, metrics) output         <- only THIS joins back

so audio bytes never enter a shuffle (SURVEY.md §7.3 "bytes column
discipline"). Fixtures are raw PCM16-LE (decode = np.frombuffer);
real codecs (flac/opus/mp3) need external decoders not present in
this container — their decode path is stubbed behind
``register_decoder`` and marked explicitly.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_SANITY_SCHEMA = (
    "clip_id string, pcm_ok boolean, dur_actual_ms int, dur_ok boolean, "
    "rms double, peak double, n_samples bigint"
)

# codec -> bytes->float32 PCM decoder. PCM16 is real; compressed codecs
# are a documented stub (no audio libs in this container): fixtures
# always carry PCM16 payloads regardless of the codec metadata field
# (FIXTURES.md §1), so the PCM decoder applies to every fixture row.
_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}


def _decode_pcm16(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i2").astype(np.float32) / 32767.0


def register_decoder(codec: str, fn: Callable[[bytes], np.ndarray]) -> None:
    _DECODERS[codec] = fn


register_decoder("pcm_s16le", _decode_pcm16)
# sandbox simplification: payloads are PCM16 for all codec tags
for _c in ("flac", "opus", "mp3"):
    register_decoder(_c, _decode_pcm16)


def audio_sanity_fast(clips: DataFrame, dur_tolerance: float = 0.10) -> DataFrame:
    """Metadata-level audio sanity as PURE column expressions — zero
    bytes cross the JVM->Python boundary (at 100TB of audio, shipping
    payloads to Python to compute a length is the single largest
    avoidable cost; measured here: 20.5s -> sub-second on a 250MB
    fixture). Valid for fixed-width PCM (dur = len/2/sr); compressed
    codecs would fall back to the decode stage below.

    Returns (clip_id, pcm_ok, dur_actual_ms, dur_ok)."""
    known = F.col("codec").isin(*_DECODERS.keys())
    blen = F.coalesce(F.length("bytes"), F.lit(0))
    pcm_ok = known & (blen >= 2) & (blen % 2 == 0)
    dur_actual = F.round(
        blen / 2 * 1000.0 / F.greatest(F.col("sr_hz"), F.lit(1))
    ).cast("int")
    rel = F.abs(F.col("dur_ms") - dur_actual) / F.greatest(dur_actual, F.lit(1))
    return clips.select(
        "clip_id",
        pcm_ok.alias("pcm_ok"),
        dur_actual.alias("dur_actual_ms"),
        (pcm_ok & (rel <= dur_tolerance)).alias("dur_ok"),
    )


def audio_sanity(clips: DataFrame, dur_tolerance: float = 0.10) -> DataFrame:
    """(clip_id, pcm_ok, dur_actual_ms, dur_ok, rms, peak, n_samples).

    dur_ok: stored dur_ms within `dur_tolerance` of decoded duration.
    """
    pruned = clips.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec")

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            pcm_ok = np.zeros(n, dtype=bool)
            dur_actual = np.zeros(n, dtype=np.int64)
            rms = np.zeros(n, dtype=np.float64)
            peak = np.zeros(n, dtype=np.float64)
            nsamp = np.zeros(n, dtype=np.int64)
            for i, (b, sr, codec) in enumerate(
                zip(pdf["bytes"], pdf["sr_hz"], pdf["codec"])
            ):
                dec = _DECODERS.get(codec)
                if dec is None or b is None or len(b) < 2 or len(b) % 2:
                    continue
                try:
                    pcm = dec(b)
                except Exception:
                    continue
                pcm_ok[i] = True
                nsamp[i] = len(pcm)
                dur_actual[i] = round(len(pcm) * 1000 / max(int(sr), 1))
                rms[i] = float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0
                peak[i] = float(np.abs(pcm).max()) if len(pcm) else 0.0
            stored = pdf["dur_ms"].to_numpy()
            with np.errstate(divide="ignore", invalid="ignore"):
                rel = np.abs(stored - dur_actual) / np.maximum(dur_actual, 1)
            dur_ok = pcm_ok & (rel <= dur_tolerance)
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "pcm_ok": pcm_ok,
                    "dur_actual_ms": dur_actual.astype(np.int32),
                    "dur_ok": dur_ok,
                    "rms": rms,
                    "peak": peak,
                    "n_samples": nsamp,
                }
            )

    return pruned.mapInPandas(_op, schema=AUDIO_SANITY_SCHEMA)


def decode_pcm(clips: DataFrame) -> DataFrame:
    """(clip_id, pcm array<float>) — test/oracle helper; NOT for the
    10^12-row path (materializes full PCM)."""
    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b, codec in zip(pdf["bytes"], pdf["codec"]):
                dec = _DECODERS.get(codec, _decode_pcm16)
                try:
                    out.append(dec(b).tolist() if b else [])
                except Exception:
                    out.append([])
            yield pd.DataFrame({"clip_id": pdf["clip_id"], "pcm": out})

    return clips.select("clip_id", "bytes", "codec").mapInPandas(
        _op, schema="clip_id string, pcm array<float>"
    )
