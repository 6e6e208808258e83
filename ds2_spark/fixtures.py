"""Deterministic fixture generator (FIXTURES.md).

Produces the engine's primary input table

    clips(clip_id, bytes, sr_hz, dur_ms, codec, transcript)

plus a fixtures-only truth table (never read by the engine) and the
ratings table

    scores(clip_id, rater, raw_score)

with DS2-style label noise: a clean score derived from quality
features, corrupted by a fixed row-stochastic 6x6 transition matrix —
the same synthesis semantics as the reference
(score_curation/docta/datasets/data_utils.py:32-92 `noisify_general`,
re-implemented independently in NumPy).

Everything is seeded; generation uses pyarrow directly (no Spark
needed to make test data).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import NUM_CLASSES, SEED
from .functions.corpus import WORD_LISTS
from .functions.scrub import TOX_LEXICON
from .functions.textkernels import langid_scores, perplexities

LANG_WEIGHTS = {"en": 0.62, "es": 0.14, "de": 0.10, "fr": 0.10, "zh": 0.04}
SR_CHOICES = np.array([8000, 16000, 22050, 44100])
SR_WEIGHTS = np.array([0.1, 0.6, 0.1, 0.2])
CODECS = np.array(["pcm_s16le", "flac", "opus", "mp3"])
CODEC_WEIGHTS = np.array([0.7, 0.1, 0.1, 0.1])
RATERS = ("rater_a", "rater_b", "rater_c")

PII_EMAILS = ["alice.smith@example.com", "bob+test@mail-host.org", "c.wu@uni.edu"]
PII_PHONES = ["+1 415 555 0123", "020-7946-0958", "(303) 555-2368"]
PII_SSNS = ["123-45-6789", "987-65-4321"]


def make_t_true(seed: int = SEED, diag: float = 0.7) -> np.ndarray:
    """Row-stochastic 6x6 noise matrix, diagonal 0.7 +/- 0.05."""
    rng = np.random.default_rng(seed)
    t = np.zeros((NUM_CLASSES, NUM_CLASSES))
    for i in range(NUM_CLASSES):
        d = diag + 0.05 * np.sin(i + 1)
        off = rng.dirichlet(np.ones(NUM_CLASSES - 1)) * (1 - d)
        row = np.insert(off, i, d)
        t[i] = row
    assert np.allclose(t.sum(axis=1), 1.0)
    return t


def _gibberish(rng: np.random.Generator, n_chars: int) -> str:
    cps = rng.integers(0x400, 0x4FF, size=n_chars)  # Cyrillic block: off-corpus
    return "".join(chr(c) for c in cps)


def _transcript(rng: np.random.Generator, lang: str, target_chars: int) -> str:
    words = WORD_LISTS[lang]
    sep = "" if lang == "zh" else " "
    parts: list[str] = []
    total = 0
    while total < target_chars:
        w = words[int(rng.integers(0, len(words)))]
        parts.append(w)
        total += len(w) + len(sep)
    return sep.join(parts)


def generate_clips(
    n: int,
    out_dir: str,
    seed: int = SEED,
    dur_median_ms: float = 500.0,
    dur_max_ms: int = 2000,
    chars_per_sec: float = 120.0,
    with_audio: bool = True,
    lang_weights: dict[str, float] | None = None,
    long_tail_frac: float = 0.005,
) -> dict[str, str]:
    """Write clips.parquet + clips_truth.parquet under out_dir.

    dur defaults are unit-scale (small PCM payloads keep pytest fast,
    chars_per_sec inflated so transcript lengths still span the
    quality bands); pass dur_median_ms=6000, dur_max_ms=120000,
    chars_per_sec=12 for the FIXTURES.md full profile. Rates of
    corruption/PII/tox/empty/gibberish follow FIXTURES.md §1.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    weights = LANG_WEIGHTS if lang_weights is None else lang_weights
    langs = list(weights)
    lang_p = np.array([weights[l] for l in langs])
    lang_p = lang_p / lang_p.sum()

    clip_ids = np.array([f"clip_{i:012d}" for i in range(n)])
    lang_idx = rng.choice(len(langs), size=n, p=lang_p)
    sr = SR_CHOICES[rng.choice(len(SR_CHOICES), size=n, p=SR_WEIGHTS)].astype(np.int32)
    codec = CODECS[rng.choice(len(CODECS), size=n, p=CODEC_WEIGHTS)]
    dur_actual = np.exp(rng.normal(np.log(dur_median_ms), 0.6, size=n))
    dur_actual = np.clip(dur_actual, 100, dur_max_ms).astype(np.int64)

    # special-row masks (disjoint where it matters)
    u = rng.random(n)
    is_empty = u < 0.02
    is_gib = (u >= 0.02) & (u < 0.03)
    has_pii = (u >= 0.03) & (u < 0.06)
    has_tox = (u >= 0.06) & (u < 0.08)
    dur_corrupt = rng.random(n) < 0.01
    long_tail = rng.random(n) < long_tail_frac

    transcripts: list[str] = []
    for i in range(n):
        lang = langs[lang_idx[i]]
        tchars = max(int(dur_actual[i] * chars_per_sec / 1000), 6)
        if long_tail[i]:
            tchars *= 50
        if is_empty[i]:
            t = "   " if rng.random() < 0.5 else ""
        elif is_gib[i]:
            t = _gibberish(rng, max(tchars, 20))
        else:
            t = _transcript(rng, lang, tchars)
            if has_pii[i]:
                kind = int(rng.integers(0, 3))
                tok = [PII_EMAILS, PII_PHONES, PII_SSNS][kind][
                    int(rng.integers(0, len([PII_EMAILS, PII_PHONES, PII_SSNS][kind])))
                ]
                t = t + " " + tok + " " + _transcript(rng, lang, 12)
            if has_tox[i]:
                tox = TOX_LEXICON[int(rng.integers(0, len(TOX_LEXICON)))]
                t = _transcript(rng, lang, 8) + " " + tox + " " + t
        transcripts.append(t)

    # stored dur: corrupted rows off by +30% (>10% tolerance)
    dur_stored = np.where(dur_corrupt, (dur_actual * 1.3).astype(np.int64), dur_actual)

    # audio synthesis: 1-3 sine tones + gaussian noise at per-clip SNR
    snr_db = rng.choice(np.arange(20, 65, 5), size=n).astype(np.float64)
    payloads: list[bytes] = []
    tone_freqs: list[list[float]] = []
    tone_amps: list[list[float]] = []
    tone_phases: list[list[float]] = []
    noise_stds: list[float] = []
    n_samples_all = (sr.astype(np.int64) * dur_actual // 1000).astype(np.int64)
    for i in range(n):
        k = int(rng.integers(1, 4))
        freqs = rng.uniform(80, 4000, size=k)
        amps = rng.uniform(0.1, 0.8, size=k)
        amps *= 0.8 / max(amps.sum(), 0.8)
        phases = rng.uniform(0, 2 * np.pi, size=k)
        tone_freqs.append(freqs.tolist())
        tone_amps.append(amps.tolist())
        tone_phases.append(phases.tolist())
        if with_audio:
            ns = int(n_samples_all[i])
            t_ax = np.arange(ns) / sr[i]
            sig = np.zeros(ns)
            for f, a, ph in zip(freqs, amps, phases):
                sig += a * np.sin(2 * np.pi * f * t_ax + ph)
            p_sig = float(np.mean(sig**2)) if ns else 0.0
            nstd = float(np.sqrt(p_sig / 10 ** (snr_db[i] / 10))) if p_sig else 0.0
            noise_stds.append(nstd)
            noisy = sig + rng.normal(0, nstd, size=ns)
            pcm = np.clip(noisy, -1.0, 1.0 - 1 / 32768)
            payloads.append((pcm * 32767).astype("<i2").tobytes())
        else:
            noise_stds.append(0.0)
            payloads.append(b"")

    clips = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array(sr, pa.int32()),
            "dur_ms": pa.array(dur_stored.astype(np.int32), pa.int32()),
            "codec": pa.array(codec, pa.string()),
            "transcript": pa.array(transcripts, pa.string()),
        }
    )
    clips_path = os.path.join(out_dir, "clips.parquet")
    pq.write_table(clips, clips_path)

    truth = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "lang_true": pa.array([langs[j] for j in lang_idx], pa.string()),
            "snr_db": pa.array(snr_db, pa.float64()),
            "dur_actual_ms": pa.array(dur_actual.astype(np.int32), pa.int32()),
            "dur_corrupt": pa.array(dur_corrupt, pa.bool_()),
            "is_empty": pa.array(is_empty, pa.bool_()),
            "is_gibberish": pa.array(is_gib, pa.bool_()),
            "has_pii": pa.array(has_pii, pa.bool_()),
            "has_tox": pa.array(has_tox, pa.bool_()),
            "tone_freqs": pa.array(tone_freqs, pa.list_(pa.float64())),
            "tone_amps": pa.array(tone_amps, pa.list_(pa.float64())),
            "tone_phases": pa.array(tone_phases, pa.list_(pa.float64())),
            "noise_std": pa.array(noise_stds, pa.float64()),
        }
    )
    truth_path = os.path.join(out_dir, "clips_truth.parquet")
    pq.write_table(truth, truth_path)
    return {"clips": clips_path, "truth": truth_path}


def clean_scores_from_quality(transcripts: list[str]) -> np.ndarray:
    """Deterministic clean score y* in [0,5] from quality features
    (length band + ppl band + langid margin), per FIXTURES.md §2."""
    texts = [t or "" for t in transcripts]
    n_chars = np.array([len(t.strip()) for t in texts])
    _, margin, _ = langid_scores(texts)
    ppl = perplexities(texts)
    length_band = np.digitize(n_chars, [1, 12, 40, 120, 400])  # 0..5
    score = length_band.astype(np.int64)
    score = np.where(ppl > 40.0, np.minimum(score, 1), score)
    score = np.where(margin < 0.2, np.maximum(score - 2, 0), score)
    return np.clip(score, 0, NUM_CLASSES - 1)


def generate_scores(clips_parquet: str, out_dir: str, seed: int = SEED) -> str:
    """Write scores.parquet (3 raters, DS2-style noisy labels) + the
    clean scores into scores_truth.parquet."""
    tbl = pq.read_table(clips_parquet, columns=["clip_id", "transcript"])
    clip_ids = tbl.column("clip_id").to_pylist()
    clean = clean_scores_from_quality(tbl.column("transcript").to_pylist())
    t_true = make_t_true(seed)
    cdf = np.cumsum(t_true, axis=1)

    rows_id, rows_rater, rows_raw = [], [], []
    for ri, rater in enumerate(RATERS):
        rng = np.random.default_rng(seed ^ (7919 * (ri + 1)))
        u = rng.random(len(clip_ids))
        noisy = (u[:, None] < cdf[clean]).argmax(axis=1)
        rows_id.extend(clip_ids)
        rows_rater.extend([rater] * len(clip_ids))
        rows_raw.extend(noisy.tolist())

    scores = pa.table(
        {
            "clip_id": pa.array(rows_id, pa.string()),
            "rater": pa.array(rows_rater, pa.string()),
            "raw_score": pa.array(np.array(rows_raw, dtype=np.int8), pa.int8()),
        }
    )
    path = os.path.join(out_dir, "scores.parquet")
    pq.write_table(scores, path)
    truth = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "clean_score": pa.array(clean.astype(np.int8), pa.int8()),
        }
    )
    pq.write_table(truth, os.path.join(out_dir, "scores_truth.parquet"))
    return path


def generate_all(out_dir: str, n: int = 2000, seed: int = SEED, **clip_kwargs) -> dict[str, str]:
    paths = generate_clips(n, out_dir, seed=seed, **clip_kwargs)
    paths["scores"] = generate_scores(paths["clips"], out_dir, seed=seed)
    paths["t_true"] = os.path.join(out_dir, "t_true.npy")
    np.save(paths["t_true"], make_t_true(seed))
    return paths


def _gen_shard(args) -> str:
    shard, n_shard, out_dir, seed, clip_kwargs = args
    shard_dir = os.path.join(out_dir, f"_shard_{shard}")
    p = generate_clips(n_shard, shard_dir, seed=(seed * 1_000_003 + shard) & 0x7FFFFFFF,
                       **clip_kwargs)
    return p["clips"], p["truth"], shard


def generate_all_sharded(
    out_dir: str,
    n: int,
    n_shards: int = 16,
    seed: int = SEED,
    workers: int = 8,
    **clip_kwargs,
) -> dict[str, str]:
    """Parallel, sharded fixture generation: clips.parquet becomes a
    DIRECTORY of n_shards files — giving Spark natural scan parallelism
    (a 10^12-row table has millions of files; a single-file bench
    fixture would serialize every scan stage). Deterministic per shard.
    clip_ids are globally unique via a shard prefix offset."""
    import multiprocessing as mp
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    per = n // n_shards
    jobs = [(s, per, out_dir, seed, clip_kwargs) for s in range(n_shards)]
    with mp.Pool(min(workers, n_shards)) as pool:
        results = pool.map(_gen_shard, jobs)

    clips_dir = os.path.join(out_dir, "clips.parquet")
    truth_dir = os.path.join(out_dir, "clips_truth.parquet")
    for d in (clips_dir, truth_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    # re-key clip_ids with shard prefix to keep them globally unique
    for clips_path, truth_path, shard in results:
        for src, dst_dir, col in (
            (clips_path, clips_dir, "clip_id"),
            (truth_path, truth_dir, "clip_id"),
        ):
            tbl = pq.read_table(src)
            ids = [f"s{shard:03d}_{c}" for c in tbl.column(col).to_pylist()]
            tbl = tbl.set_column(
                tbl.schema.get_field_index(col), col, pa.array(ids, pa.string())
            )
            pq.write_table(tbl, os.path.join(dst_dir, f"part-{shard:04d}.parquet"))
        shutil.rmtree(os.path.dirname(clips_path), ignore_errors=True)

    scores_path = generate_scores(clips_dir, out_dir, seed=seed)
    np.save(os.path.join(out_dir, "t_true.npy"), make_t_true(seed))
    return {
        "clips": clips_dir,
        "truth": truth_dir,
        "scores": scores_path,
        "t_true": os.path.join(out_dir, "t_true.npy"),
    }
