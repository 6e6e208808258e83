"""Compaction planning invariants (operators/maintenance.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds2_spark.operators.maintenance import compaction_plan


def _manifest(spark, rows):
    return spark.createDataFrame(
        rows, "pt string, file_id long, size_bytes long"
    )


def test_compaction_groups_fill_to_target(spark):
    # ten 3-byte files, target 10: offset binning cuts the 30-byte run
    # at byte boundaries 10 and 20 -> starts 0..9 / 12..18 / 21..27
    rows = [("a", i, 3) for i in range(10)]
    out = compaction_plan(
        _manifest(spark, rows), target_bytes=10, partition_cols=("pt",)
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert {g: len(v) for g, v in by_grp.items()} == {0: 4, 1: 3, 2: 3}
    for g, v in by_grp.items():
        assert all(r["group_files"] == len(v) for r in v)
        assert all(r["group_bytes"] == 3 * len(v) for r in v)
    # every group's bytes is within one small-file size of target
    for g, v in by_grp.items():
        assert v[0]["group_bytes"] > 10 - 3 - 1
        assert v[0]["group_bytes"] < 10 + 3


def test_compaction_respects_partitions_and_threshold(spark):
    rows = [
        ("a", 1, 5), ("a", 2, 5), ("a", 3, 99),  # 99 >= small: excluded
        ("b", 4, 5), ("b", 5, 5),
    ]
    out = compaction_plan(
        _manifest(spark, rows),
        target_bytes=10,
        small_bytes=50,
        partition_cols=("pt",),
    ).collect()
    ids = {r["file_id"] for r in out}
    assert ids == {1, 2, 4, 5}
    # groups never span partitions: (pt, grp) keys are disjoint by pt
    assert {(r["pt"], r["grp"]) for r in out} == {("a", 0), ("b", 0)}
    a_bytes = {r["group_bytes"] for r in out if r["pt"] == "a"}
    assert a_bytes == {10}


def test_compaction_stable_under_extra_files(spark):
    """Appending files with HIGHER ids never reassigns existing
    files' groups (the id order is the resume-safe property: a size
    order would reshuffle every group on any change)."""
    rows = [("a", i, 4) for i in range(6)]
    base = {
        r["file_id"]: r["grp"]
        for r in compaction_plan(
            _manifest(spark, rows), target_bytes=10, partition_cols=("pt",)
        ).collect()
    }
    more = rows + [("a", 10, 4), ("a", 11, 4)]
    grown = {
        r["file_id"]: r["grp"]
        for r in compaction_plan(
            _manifest(spark, more), target_bytes=10, partition_cols=("pt",)
        ).collect()
    }
    assert all(grown[fid] == g for fid, g in base.items())


def test_compaction_rejects_bad_target(spark):
    with pytest.raises(ValueError):
        compaction_plan(_manifest(spark, [("a", 1, 1)]), target_bytes=0)


def test_compaction_no_partition_cols(spark):
    rows = [(None, i, 7) for i in range(4)]
    out = compaction_plan(
        _manifest(spark, rows).drop("pt"), target_bytes=20
    ).collect()
    assert {r["grp"] for r in out} == {0, 1}
    assert sum(r["size_bytes"] for r in out) == 28
    assert out[0]["group_bytes"] in (21, 7)


def test_compaction_big_totals_exact(spark):
    """int64 byte totals well beyond float53 stay exact."""
    big = 2**52 + 3
    rows = [("a", i, big) for i in range(4)]
    out = compaction_plan(
        _manifest(spark, rows),
        target_bytes=2**53,
        small_bytes=2**60,
        partition_cols=("pt",),
    ).collect()
    # cum-sum binning: files 0,1 -> grp 0 (cum-size < 2^53), file 2's
    # preceding total 2*(2^52+3) >= 2^53 -> grp 1, file 3 -> grp 1
    grps = {r["file_id"]: r["grp"] for r in out}
    assert grps == {0: 0, 1: 0, 2: 1, 3: 1}
    assert all(
        r["group_bytes"] == 2 * big for r in out
    )
