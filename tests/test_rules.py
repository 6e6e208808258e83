from ds2_spark.operators.audio import audio_sanity
from ds2_spark.plans.pipeline import rule_decisions, transcript_features

from .oracle.rules_oracle import rule_reasons


def test_rule_decisions_match_oracle_exactly(spark, clips_df, fixture_paths):
    """Keep/drop parity vs the independent NumPy oracle — the F1>=0.99
    correctness gate (here required exact: F1 == 1.0)."""
    dec = rule_decisions(transcript_features(clips_df), audio_sanity(clips_df))
    got = {r["clip_id"]: r["reason"] for r in dec.select("clip_id", "reason").collect()}
    expected = rule_reasons(fixture_paths["clips"])
    assert got == expected


def test_rules_catch_planted_defects(spark, clips_df, fixture_paths):
    import pyarrow.parquet as pq

    truth = pq.read_table(fixture_paths["truth"]).to_pandas().set_index("clip_id")
    dec = rule_decisions(transcript_features(clips_df), audio_sanity(clips_df))
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
