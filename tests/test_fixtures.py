import numpy as np
import pyarrow.parquet as pq

from ds2_spark.fixtures import make_t_true


def test_clips_schema_and_rates(fixture_paths):
    clips = pq.read_table(fixture_paths["clips"])
    assert clips.column_names == ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    truth = pq.read_table(fixture_paths["truth"]).to_pandas()
    n = len(truth)
    assert clips.num_rows == n
    # FIXTURES.md §1 rates (binomial tolerance)
    assert 0.005 < truth.is_empty.mean() < 0.05
    assert 0.01 < truth.has_pii.mean() < 0.06
    assert truth.is_gibberish.mean() > 0
    assert truth.dur_corrupt.mean() > 0
    # hot-language skew present
    counts = truth.lang_true.value_counts(normalize=True)
    assert counts["en"] > 0.5


def test_t_true_row_stochastic():
    t = make_t_true()
    assert t.shape == (6, 6)
    assert np.allclose(t.sum(axis=1), 1.0)
    assert (np.diag(t) > 0.6).all()


def test_scores_noise_consistent(fixture_paths):
    scores = pq.read_table(fixture_paths["scores"]).to_pandas()
    clean = pq.read_table(fixture_paths["scores_truth"]).to_pandas()
    assert set(scores.rater) == {"rater_a", "rater_b", "rater_c"}
    m = scores.merge(clean, on="clip_id")
    agree = (m.raw_score == m.clean_score).mean()
    # diagonal of T_true is ~0.7
    assert 0.6 < agree < 0.8


def test_determinism(tmp_path):
    from ds2_spark.fixtures import generate_clips

    p1 = generate_clips(50, str(tmp_path / "a"), seed=7)
    p2 = generate_clips(50, str(tmp_path / "b"), seed=7)
    t1 = pq.read_table(p1["clips"])
    t2 = pq.read_table(p2["clips"])
    assert t1.equals(t2)
