import duckdb
from pyspark.sql import functions as F

from ds2_spark.functions.scrub import scrub_col, scrub_py, scrub_sql


def test_scrub_examples():
    assert scrub_py("mail me at a.b@c.org now") == "mail me at <EMAIL> now"
    assert scrub_py("ssn 123-45-6789 end") == "ssn <SSN> end"
    assert scrub_py("call +1 415 555 0123 ok") == "call <PHONE> ok"
    assert scrub_py("zorgblat07 is rude") == "<TOX> is rude"
    assert scrub_py("clean text") == "clean text"


def test_scrub_idempotent(fixture_paths):
    import pyarrow.parquet as pq

    texts = pq.read_table(fixture_paths["clips"], columns=["transcript"]).column(0).to_pylist()
    for t in texts:
        once = scrub_py(t or "")
        assert scrub_py(once) == once


def test_spark_matches_python_and_duckdb(spark, clips_df, fixture_paths):
    got = dict(
        clips_df.select("clip_id", scrub_col("transcript").alias("s")).collect()
    )
    import pyarrow.parquet as pq

    tbl = pq.read_table(fixture_paths["clips"], columns=["clip_id", "transcript"])
    ids = tbl.column("clip_id").to_pylist()
    texts = tbl.column("transcript").to_pylist()
    expected = {i: scrub_py(t or "") for i, t in zip(ids, texts)}
    assert got == expected

    duck = duckdb.connect()
    sql = f"select clip_id, {scrub_sql('transcript')} as s from '{fixture_paths['clips']}'"
    got_duck = dict(duck.sql(sql).fetchall())
    assert got_duck == expected


def test_scrubbed_frac_matches_truth(spark, clips_df, fixture_paths):
    import pyarrow.parquet as pq

    truth = pq.read_table(fixture_paths["truth"]).to_pandas().set_index("clip_id")
    changed = {
        r["clip_id"]
        for r in clips_df.select(
            "clip_id",
            (scrub_col("transcript") != F.col("transcript")).alias("chg"),
        ).collect()
        if r["chg"]
    }
    flagged = set(truth.index[truth.has_pii | truth.has_tox])
    # every injected-PII/tox row must be scrubbed; no normal row touched
    assert changed == flagged
