import duckdb
from pyspark.sql import functions as F

from ds2_spark.functions.scrub import scrub_col, scrub_py, scrub_sql


def test_scrub_examples():
    assert scrub_py("mail me at a.b@c.org now") == "mail me at <EMAIL> now"
    assert scrub_py("ssn 123-45-6789 end") == "ssn <SSN> end"
    assert scrub_py("call +1 415 555 0123 ok") == "call <PHONE> ok"
    assert scrub_py("zorgblat07 is rude") == "<TOX> is rude"
    assert scrub_py("clean text") == "clean text"


def test_scrub_adjacent_bounded_hits(spark):
    """Two bounded hits sharing a single delimiter: pass 1 consumes the
    delimiter and misses the even-positioned hits; the mandatory second
    pass of every bounded pattern catches them. All three engines must
    scrub ALL of a run of adjacent lexicon terms / SSNs."""
    cases = {
        "zorgblat00 zorgblat01": "<TOX> <TOX>",
        "zorgblat00 zorgblat01 zorgblat02 zorgblat03": "<TOX> <TOX> <TOX> <TOX>",
        "a zorgblat04,zorgblat05.zorgblat06 b": "a <TOX>,<TOX>.<TOX> b",
        "x 123-45-6789 987-65-4321 y": "x <SSN> <SSN> y",
    }
    for t, want in cases.items():
        assert scrub_py(t) == want
        assert scrub_py(want) == want  # fixed point
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i int, t string"
    )
    got = [r["s"] for r in df.select("i", scrub_col("t").alias("s")).orderBy("i").collect()]
    assert got == list(cases.values())
    duck = duckdb.connect()
    duck.execute("create table adj(i int, t varchar)")
    duck.executemany("insert into adj values (?, ?)", list(enumerate(cases)))
    got_duck = [r[0] for r in duck.sql(f"select {scrub_sql('t')} from adj order by i").fetchall()]
    assert got_duck == list(cases.values())


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


def test_unicode_three_way_agreement(spark):
    """Java regex, RE2 and Python disagree on \\b/\\d/\\s semantics for
    non-ASCII input (Java's \\b is Unicode-aware even in default mode)
    — the chain avoids those shorthands entirely, so all three engines
    must agree on hostile non-ASCII input."""
    hostile = [
        "caf\u00e9123-45-6789x",      # e-acute left, word char right: no scrub
        "caf\u00e9 123-45-6789 fin",  # e-acute + real delimiters: scrub
        "n\u00famero \u0661\u0662\u0663\u0664\u0665\u0666\u0667\u0668\u0669",  # Arabic-Indic digits: not [0-9]
        "tel +49\u00a0170\u00a0555\u00a00199 ok",  # NBSP separators: not in the phone class
        "z\u00fcrich zorgblat03\u00df",  # eszett delimits the lexicon term in every engine
        "\u4f60\u597d 123-45-6789 \u518d\u89c1",  # CJK context around an SSN
        "123-45-6789 987-65-4321",   # shared single delimiter: 2nd pass catches it
        "end with ssn 123-45-6789",  # $ right-boundary
        "123-45-6789\n",            # trailing newline: $ vs [^w] paths converge
    ]
    expected = [scrub_py(t) for t in hostile]
    # pin the Python-twin semantics we claim
    # no SSN boundary on the left, but the (unbounded) phone pattern
    # still catches the digit run — identically in every engine
    assert expected[0] == "caf\u00e9<PHONE>x"
    assert expected[1] == "caf\u00e9 <SSN> fin"
    assert expected[3] == "tel +49\u00a0170\u00a0555\u00a00199 ok"
    assert expected[4] == "z\u00fcrich <TOX>\u00df"
    # pass 1 consumes the shared delimiter and misses the second SSN;
    # the second identical pass (every bounded pattern runs twice)
    # catches it — both are tagged as SSNs, not rescued by PHONE
    assert expected[6] == "<SSN> <SSN>"
    assert expected[7] == "end with ssn <SSN>"
    assert expected[8] == "<SSN>\n"

    df = spark.createDataFrame([(i, t) for i, t in enumerate(hostile)], "i int, t string")
    got_spark = [r["s"] for r in df.select("i", scrub_col("t").alias("s")).orderBy("i").collect()]
    assert got_spark == expected

    duck = duckdb.connect()
    duck.execute("create table h(i int, t varchar)")
    duck.executemany("insert into h values (?, ?)", list(enumerate(hostile)))
    got_duck = [r[0] for r in duck.sql(f"select {scrub_sql('t')} from h order by i").fetchall()]
    assert got_duck == expected


def test_scrub_audit_counts(spark):
    """scrub_audit_cols (JVM length arithmetic) vs the Python twin on
    planted cases: multiple hits, adjacent bounded hits needing the
    second fixed-point pass, pre-existing literal tags that must NOT
    count, and empty/no-PII rows."""
    from pyspark.sql import functions as F

    from ds2_spark.functions.scrub import scrub_audit_cols, scrub_audit_py

    texts = [
        "a@b.com and c.d+x@e.org wrote",               # 2 emails
        "ssn 123-45-6789 ok",                           # 1 ssn
        "pair 111-22-3333 444-55-6666 end",             # adjacent ssns
        "call +1 (415) 555-0199 now",                   # 1 phone
        "zorgblat07 and zorgblat33!",                   # 2 tox
        "literal <EMAIL> marker, no pii",               # 0 everything
        "<SSN> pre-existing plus real 123-45-6789",     # 1 ssn only
        "clean text",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_ssn"], r["n_phone"], r["n_tox"])
        for r in df.select("doc_id", *scrub_audit_cols("text")).collect()
    }
    for i, t in enumerate(texts):
        exp = scrub_audit_py(t)
        assert got[i] == (
            exp["n_email"], exp["n_ssn"], exp["n_phone"], exp["n_tox"]
        ), (i, t)
    assert got[0] == (2, 0, 0, 0)
    assert got[2] == (0, 2, 0, 0)   # second pass counted
    assert got[5] == (0, 0, 0, 0)   # pre-existing tag not counted
    assert got[6] == (0, 1, 0, 0)
