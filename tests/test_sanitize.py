"""Invisible-char / confusable-width sanitization (functions/text.sanitize_col).

Parity model: the Spark chain (Java regex + StringTranslate) vs
`sanitize_py` (CPython re + str.translate) — two regex engines running
one spec. The CONTRACT oracle (q_sanitize) adds the third engine
(DuckDB RE2); here we pin the hostile cases that matter row-by-row and
the properties (idempotence, dedup-key collapse, NULL passthrough) a
value-hash alone would not explain.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds2_spark.functions.text import (
    SANITIZE_FW_FROM,
    SANITIZE_FW_TO,
    fingerprint_col,
    sanitize_col,
    sanitize_py,
)

# Hostile inputs, each built from escapes so a file normalizer can't
# neuter the test. Covers every set member class: ZW chars, bidi
# embeddings/overrides/isolates, soft hyphen, Mongolian VS, BOM,
# NBSP/quads/thin/LS/PS/narrow-NBSP/math/ideographic spaces,
# fullwidth ASCII, and clean text that must round-trip.
HOSTILE = [
    "zero\u200bwidth\u200c\u200djoin",
    "bidi \u202ekcatta\u202c end",
    "iso \u2066ltr\u2069 \u202aemb\u202c",
    "marks \u200eL\u200fR",
    "hy\u00adphen \u180evs \u2060wj \u2061fn",
    "\ufeffbom prefix",
    "nb\u00a0sp \u1680og \u2000q \u2009thin \u200ahair",
    "ls\u2028ps\u2029nnb\u202fm\u205fideo\u3000end",
    "\uff26\uff35\uff2c\uff2c\uff57\uff49\uff44\uff54\uff48\uff01",
    "mixed \u200b\uff41\u00a0\u202e!",
    "plain ascii stays",
    "",
]


def test_sanitize_spark_matches_python_twin(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(HOSTILE)], "i int, t string")
    rows = df.select("i", sanitize_col(F.col("t")).alias("c")).collect()
    got = {r["i"]: r["c"] for r in rows}
    for i, t in enumerate(HOSTILE):
        assert got[i] == sanitize_py(t), (i, repr(t), repr(got[i]))


def test_sanitize_idempotent_and_expected_values():
    # spot-pin a few exact outputs (independent of both engines)
    assert sanitize_py(HOSTILE[0]) == "zerowidthjoin"
    assert sanitize_py(HOSTILE[1]) == "bidi kcatta end"
    assert sanitize_py(HOSTILE[8]) == "FULLwidth!"
    assert sanitize_py(HOSTILE[10]) == "plain ascii stays"
    assert sanitize_py("ls\u2028ps\u2029x") == "ls ps x"
    for t in HOSTILE:
        once = sanitize_py(t)
        assert sanitize_py(once) == once  # idempotent


def test_sanitize_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i int, t string")
    r = df.select(sanitize_col(F.col("t")).alias("c")).collect()[0]
    assert r["c"] is None
    assert sanitize_py(None) is None


def test_sanitize_collapses_dedup_keys(spark):
    # the attack sanitize exists to stop: visually-identical transcripts
    # with planted ZWSP/NBSP/fullwidth chars must fingerprint EQUAL
    # after sanitize (and unequal without it).
    a = "the quick brown fox!"
    b = "the\u00a0quick \u200bbrown fox\uff01"
    df = spark.createDataFrame([(1, a), (2, b)], "i int, t string")
    raw_fp = df.select(fingerprint_col("t").alias("fp")).collect()
    assert raw_fp[0]["fp"] != raw_fp[1]["fp"]
    clean = df.withColumn("t", sanitize_col(F.col("t")))
    fp = clean.select(fingerprint_col("t").alias("fp")).collect()
    assert fp[0]["fp"] == fp[1]["fp"]


def test_sanitize_translate_tables_aligned():
    assert len(SANITIZE_FW_FROM) == len(SANITIZE_FW_TO) == 94
    # bijection onto printable ASCII, order-aligned
    assert [ord(c) - 0xFEE0 for c in SANITIZE_FW_FROM] == [ord(c) for c in SANITIZE_FW_TO]
