"""NumPy oracle for the heuristic rule stage (plans/pipeline.rule_decisions).

Independent straight-line re-implementation: reads the raw clips
parquet with pyarrow, decodes PCM with frombuffer, computes langid /
ppl via the shared deterministic kernels, and applies the same
first-failing-reason rule order. Used to verify the Spark plan
end-to-end (keep/drop F1 target: exact match = 1.0 >= 0.99).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from ds2_spark.config import PipelineConfig
from ds2_spark.functions import textkernels as tk


def rule_reasons(clips_parquet: str, cfg: PipelineConfig | None = None) -> dict[str, str]:
    cfg = cfg or PipelineConfig()
    q = cfg.quality
    tbl = pq.read_table(clips_parquet)
    ids = tbl.column("clip_id").to_pylist()
    texts = [t or "" for t in tbl.column("transcript").to_pylist()]
    codecs = tbl.column("codec").to_pylist()
    dur_stored = np.array(tbl.column("dur_ms").to_pylist())
    srs = np.array(tbl.column("sr_hz").to_pylist())
    payloads = tbl.column("bytes").to_pylist()

    idx, margin, _ = tk.langid_scores(texts)
    _, langs = tk.langid_model()
    ppl = tk.perplexities(texts)

    # mirror of operators.audio decodability: real decoders (pcm_s16le,
    # wav) plus the cfg's explicit PCM16 aliases; everything else
    # REFUSES (pcm_ok false -> dur_ok false -> dur_mismatch)
    decodable = {"pcm_s16le", "wav"} | set(q.pcm16_alias_codecs)

    out: dict[str, str] = {}
    for i, cid in enumerate(ids):
        n_chars = len(texts[i].strip())
        n_tokens = len(texts[i].split())  # whitespace tokens, 0 if empty
        pcm = np.frombuffer(payloads[i], dtype="<i2")
        dur_actual = round(len(pcm) * 1000 / max(int(srs[i]), 1))
        dur_ok = (
            codecs[i] in decodable
            and abs(int(dur_stored[i]) - dur_actual) / max(dur_actual, 1)
            <= q.dur_tolerance
        )
        lang = langs[idx[i]]
        if n_chars < q.min_transcript_chars:
            r = "empty_transcript"
        elif codecs[i] not in q.codec_whitelist:
            r = "bad_codec"
        elif not dur_ok:
            r = "dur_mismatch"
        elif (q.wpm_min is not None or q.wpm_max is not None) and (
            int(dur_stored[i]) <= 0
            or (
                q.wpm_min is not None
                and n_tokens * 60000 < int(dur_stored[i]) * q.wpm_min
            )
            or (
                q.wpm_max is not None
                and n_tokens * 60000 > int(dur_stored[i]) * q.wpm_max
            )
        ):
            r = "rate_outlier"
        elif lang not in q.allowed_langs or margin[i] < q.langid_margin_min:
            r = "langid_fail"
        elif ppl[i] > q.ppl_max:
            r = "ppl_outlier"
        else:
            r = "candidate"
        out[cid] = r
    return out
