from ds2_spark.config import PipelineConfig, QualityConfig
from ds2_spark.operators.audio import FIXTURE_PCM16_ALIASES, audio_sanity
from ds2_spark.plans.pipeline import rule_decisions, transcript_features

from .oracle.rules_oracle import rule_reasons

# fixture payloads are PCM16 under every codec tag (FIXTURES.md §1) —
# explicit opt-in; engine and oracle read the SAME cfg knob
FIXTURE_CFG = PipelineConfig(
    quality=QualityConfig(pcm16_alias_codecs=FIXTURE_PCM16_ALIASES)
)


def test_rule_decisions_match_oracle_exactly(spark, clips_df, fixture_paths):
    """Keep/drop parity vs the independent NumPy oracle — the F1>=0.99
    correctness gate (here required exact: F1 == 1.0)."""
    dec = rule_decisions(
        transcript_features(clips_df, FIXTURE_CFG),
        audio_sanity(clips_df, pcm16_alias_codecs=FIXTURE_PCM16_ALIASES),
        FIXTURE_CFG,
    )
    got = {r["clip_id"]: r["reason"] for r in dec.select("clip_id", "reason").collect()}
    expected = rule_reasons(fixture_paths["clips"], FIXTURE_CFG)
    assert got == expected


def test_rule_decisions_refuse_aliased_codecs_by_default(
    spark, clips_df, fixture_paths
):
    """DEFAULT cfg (no PCM16 alias opt-in): flac/opus-tagged fixture
    rows refuse to decode -> pcm_ok false -> dur_mismatch (unless an
    earlier rule fires); engine and oracle agree on the refuse path."""
    dec = rule_decisions(transcript_features(clips_df), audio_sanity(clips_df))
    got = {r["clip_id"]: r["reason"] for r in dec.select("clip_id", "reason").collect()}
    expected = rule_reasons(fixture_paths["clips"])
    assert got == expected
    # and the refuse path is actually exercised: some flac/opus rows
    # that were candidates under the opt-in now fail dur_mismatch
    opted = rule_reasons(fixture_paths["clips"], FIXTURE_CFG)
    flipped = [i for i, r in got.items()
               if r == "dur_mismatch" and opted[i] == "candidate"]
    assert len(flipped) > 0


def test_rules_catch_planted_defects(spark, clips_df, fixture_paths):
    import pyarrow.parquet as pq

    truth = pq.read_table(fixture_paths["truth"]).to_pandas().set_index("clip_id")
    dec = rule_decisions(
        transcript_features(clips_df, FIXTURE_CFG),
        audio_sanity(clips_df, pcm16_alias_codecs=FIXTURE_PCM16_ALIASES),
        FIXTURE_CFG,
    )
    got = {r["clip_id"]: r["reason"] for r in dec.select("clip_id", "reason").collect()}
    for cid, t in truth.iterrows():
        if t.is_empty:
            assert got[cid] == "empty_transcript"
    # every corrupted-duration clip is caught unless dropped earlier
    for cid, t in truth.iterrows():
        if t.dur_corrupt and got[cid] not in ("empty_transcript", "bad_codec"):
            assert got[cid] == "dur_mismatch"
    # gibberish rows never reach candidate
    for cid, t in truth.iterrows():
        if t.is_gibberish:
            assert got[cid] in ("langid_fail", "ppl_outlier", "bad_codec", "dur_mismatch")


def test_inplace_rules_plan_single_scan_no_exchange(spark, clips_df):
    """The production rules shape (plans/curation._rules_stage default:
    sanity exprs in place) must compile to ONE scan of clips and ZERO
    exchanges — the former features ⋈ sanity self-join shuffled the
    transcript payload and was the top scale regression found in the
    round-4 stage decomposition (NOTES.md #28)."""
    import io
    from contextlib import redirect_stdout

    from ds2_spark.config import PipelineConfig
    from ds2_spark.operators.audio import audio_sanity_exprs

    cfg = PipelineConfig()
    aud = audio_sanity_exprs(cfg.quality.dur_tolerance)
    enriched = clips_df.withColumn("pcm_ok", aud["pcm_ok"]).withColumn(
        "dur_ok", aud["dur_ok"]
    )
    feats = transcript_features(enriched, cfg, keep_cols=("pcm_ok", "dur_ok"))
    plan_df = rule_decisions(feats, audio=None, cfg=cfg)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    # a scan appears once in the tree ("+- Scan parquet  (n)") and once
    # in the node details ("(n) Scan parquet") — count tree entries
    assert plan.count("Scan parquet  (") == 1, plan
    assert "Exchange" not in plan, plan

    # and it must produce the same reasons as the join form
    from ds2_spark.operators.audio import audio_sanity_fast

    join_form = rule_decisions(
        transcript_features(clips_df, cfg),
        audio_sanity_fast(clips_df, cfg.quality.dur_tolerance),
        cfg,
    )
    a = {r["clip_id"]: r["reason"] for r in plan_df.select("clip_id", "reason").collect()}
    b = {r["clip_id"]: r["reason"] for r in join_form.select("clip_id", "reason").collect()}
    assert a == b


def test_rules_over_real_mixed_codec_corpus(spark):
    """End-to-end rules stage over a corpus of GENUINELY compressed
    payloads (G.711 mu-law/A-law, IMA ADPCM, real FLAC) with NO PCM16
    alias: the width-aware sanity math accepts 1-byte/sample and
    nibble-packed clips with correct stored durations, a PCM16 payload
    falsely tagged flac fails real FLAC decode and drops as
    dur_mismatch (fast path cannot metadata-check a variable-rate
    codec), and an unlisted codec drops as bad_codec."""
    import numpy as np

    from ds2_spark.config import PipelineConfig, QualityConfig
    from ds2_spark.operators.audio import audio_sanity_fast
    from ds2_spark.plans.pipeline import rule_decisions, transcript_features
    from .test_flac import _frame, _streaminfo, _sub_verbatim

    rng = np.random.default_rng(44)
    text = "the quick brown fox jumps over the lazy dog again and again"
    ub = rng.integers(0, 256, size=801, dtype=np.uint8).tobytes()
    ad = ((0).to_bytes(2, "little", signed=True) + bytes([10, 0])
          + rng.integers(0, 256, size=100, dtype=np.uint8).tobytes())
    flac_vals = [int(v) for v in rng.integers(-2000, 2000, size=16)]
    fl = _streaminfo(total=16) + _frame([_sub_verbatim(flac_vals)], 16)
    pcm16_as_flac = rng.integers(-30000, 30000, 400, np.int64).astype("<i2").tobytes()
    rows = [
        # (clip_id, bytes, sr, dur_ms, codec) — durations all correct
        ("ul", ub, 8000, round(801 * 1000 / 8000), "pcm_ulaw"),
        ("ad", ad, 8000, round(200 * 1000 / 8000), "adpcm_ima"),
        ("fl", fl, 8000, 2, "flac"),
        ("fake_flac", pcm16_as_flac, 8000, round(400 * 1000 / 8000), "flac"),
        ("mp3", ub, 8000, 100, "mp3"),
    ]
    clips = spark.createDataFrame(
        [(c, bytearray(b), sr, d, cod, text) for c, b, sr, d, cod in rows],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string",
    )
    cfg = PipelineConfig(
        quality=QualityConfig(
            codec_whitelist=(
                "pcm_s16le", "flac", "pcm_ulaw", "pcm_alaw", "adpcm_ima",
            )
        )
    )
    dec = rule_decisions(
        transcript_features(clips, cfg),
        audio_sanity_fast(clips, cfg.quality.dur_tolerance),
        cfg=cfg,
    )
    reason = {r["clip_id"]: r["reason"] for r in dec.collect()}
    assert reason["ul"] not in ("bad_codec", "dur_mismatch"), reason
    assert reason["ad"] not in ("bad_codec", "dur_mismatch"), reason
    assert reason["fake_flac"] == "dur_mismatch", reason
    assert reason["mp3"] == "bad_codec", reason
    # the REAL flac clip: fast metadata sanity cannot claim it (length
    # says nothing) — the decoding sanity stage is the right path
    from ds2_spark.operators.audio import audio_sanity

    dec2 = rule_decisions(
        transcript_features(clips, cfg), audio_sanity(clips), cfg=cfg
    )
    reason2 = {r["clip_id"]: r["reason"] for r in dec2.collect()}
    assert reason2["fl"] not in ("bad_codec", "dur_mismatch"), reason2
    assert reason2["fake_flac"] == "dur_mismatch", reason2
    assert reason2["ul"] not in ("bad_codec", "dur_mismatch"), reason2


def test_rate_rule_off_by_default(spark, clips_df, fixture_paths):
    """No wpm bounds configured -> the ladder is bit-identical to the
    pre-rate behavior: rate_outlier can never fire."""
    dec = rule_decisions(
        transcript_features(clips_df, FIXTURE_CFG),
        audio_sanity(clips_df, pcm16_alias_codecs=FIXTURE_PCM16_ALIASES),
        FIXTURE_CFG,
    )
    reasons = {r["reason"] for r in dec.select("reason").distinct().collect()}
    assert "rate_outlier" not in reasons


def test_rate_rule_bounds_and_precedence(spark):
    """Speech-rate rule on synthetic feature rows: too slow, too fast,
    in-band, exact boundary (NOT an outlier — strict inequality),
    zero/NULL duration, and first-failing precedence (dur_mismatch and
    bad_codec outrank it; it outranks langid/ppl)."""
    cfg = PipelineConfig(quality=QualityConfig(wpm_min=30, wpm_max=300))
    rows = [
        # clip_id, n_chars, codec, dur_ok, lang, margin, ppl, dur_ms, n_tokens
        ("slow", 20, "pcm_s16le", True, "en", 0.5, 10.0, 60000, 10),
        ("fast", 20, "pcm_s16le", True, "en", 0.5, 10.0, 1000, 20),
        ("ok", 20, "pcm_s16le", True, "en", 0.5, 10.0, 60000, 100),
        # boundary: 30 wpm * 2000 ms == 1 token * 60000 exactly -> keep
        ("edge_lo", 20, "pcm_s16le", True, "en", 0.5, 10.0, 2000, 1),
        # boundary: 300 wpm * 2000 ms == 10 tokens * 60000 -> keep
        ("edge_hi", 20, "pcm_s16le", True, "en", 0.5, 10.0, 2000, 10),
        ("zero_dur", 20, "pcm_s16le", True, "en", 0.5, 10.0, 0, 10),
        ("null_dur", 20, "pcm_s16le", True, "en", 0.5, 10.0, None, 10),
        # precedence: duration mismatch fires before the rate rule
        ("dur_first", 20, "pcm_s16le", False, "en", 0.5, 10.0, 60000, 10),
        ("codec_first", 20, "mp3", True, "en", 0.5, 10.0, 60000, 10),
        # rate fires before langid/ppl
        ("rate_before_lang", 20, "pcm_s16le", True, "xx", 0.5, 10.0, 60000, 10),
        ("rate_before_ppl", 20, "pcm_s16le", True, "en", 0.5, 99.0, 60000, 10),
        ("lang_after_ok_rate", 20, "pcm_s16le", True, "xx", 0.5, 10.0, 60000, 100),
    ]
    df = spark.createDataFrame(
        rows,
        "clip_id string, n_chars int, codec string, dur_ok boolean, "
        "lang string, lang_margin double, ppl double, dur_ms int, "
        "n_tokens int",
    )
    got = {
        r["clip_id"]: r["reason"]
        for r in rule_decisions(df, audio=None, cfg=cfg).collect()
    }
    assert got == {
        "slow": "rate_outlier",
        "fast": "rate_outlier",
        "ok": "candidate",
        "edge_lo": "candidate",
        "edge_hi": "candidate",
        "zero_dur": "rate_outlier",
        "null_dur": "rate_outlier",
        "dur_first": "dur_mismatch",
        "codec_first": "bad_codec",
        "rate_before_lang": "rate_outlier",
        "rate_before_ppl": "rate_outlier",
        "lang_after_ok_rate": "langid_fail",
    }


def test_rate_rule_oracle_parity_with_bounds(spark, clips_df, fixture_paths):
    """Engine vs the independent NumPy oracle with wpm bounds ENABLED
    on the real fixture — the rate rule must agree row-for-row, and
    the bounds must actually fire on some fixture rows (else the test
    proves nothing)."""
    cfg = PipelineConfig(
        quality=QualityConfig(
            pcm16_alias_codecs=FIXTURE_PCM16_ALIASES, wpm_min=30, wpm_max=300
        )
    )
    dec = rule_decisions(
        transcript_features(clips_df, cfg),
        audio_sanity(clips_df, pcm16_alias_codecs=FIXTURE_PCM16_ALIASES),
        cfg,
    )
    got = {r["clip_id"]: r["reason"] for r in dec.select("clip_id", "reason").collect()}
    expected = rule_reasons(fixture_paths["clips"], cfg)
    assert got == expected
    assert any(r == "rate_outlier" for r in got.values())
