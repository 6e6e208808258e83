"""Kill-and-resume: a stage that dies mid-run resumes from its
_lineage checkpoints without reprocessing completed waves and
produces byte-identical results to a one-shot run."""

import os

import pytest
from pyspark.sql import functions as F

from ds2_spark.sources.lineage import read_lineage, read_metrics, run_stage


def _stage(df):
    return df.withColumn("out_val", F.length("transcript") * 2)


def _collect(df):
    return sorted(
        (r["clip_id"], r["out_val"])
        for r in df.select("clip_id", "out_val").collect()
    )


def test_kill_and_resume_exact(spark, clips_df, tmp_path):
    inp = clips_df.select("clip_id", "transcript")
    oneshot = run_stage(
        spark, inp, _stage, str(tmp_path / "oneshot"), "run1", "feat", n_waves=4
    )
    expected = _collect(oneshot)

    # crashing run: fail while processing wave 2 (waves_per_commit=1 →
    # finest failure granularity, one stage_fn call per wave)
    root = str(tmp_path / "crashy")
    crash_marker = tmp_path / "crash_armed"
    crash_marker.write_text("1")
    calls = []

    def crashy_stage(df):
        calls.append(1)
        if len(calls) == 3 and crash_marker.exists():
            raise RuntimeError("simulated executor loss")
        return _stage(df)

    with pytest.raises(RuntimeError):
        run_stage(
            spark, inp, crashy_stage, root, "run1", "feat",
            n_waves=4, waves_per_commit=1,
        )

    lineage = read_lineage(spark, root)
    done_before = lineage.filter("status = 'done'").count()
    assert done_before == 2  # waves 0,1 checkpointed before the crash

    # resume: same run_id + stage
    crash_marker.unlink()
    calls.clear()
    resumed = run_stage(
        spark, inp, crashy_stage, root, "run1", "feat",
        n_waves=4, waves_per_commit=1,
    )
    assert _collect(resumed) == expected
    # only the 2 missing waves were reprocessed
    assert len(calls) == 2
    lineage = read_lineage(spark, root)
    assert lineage.filter("status = 'done'").count() == 4

    metrics = read_metrics(spark, root)
    names = {r["metric"] for r in metrics.select("metric").distinct().collect()}
    assert {"rows_per_sec", "input_rows", "output_rows"} <= names


def test_key_rewrite_fails_fast_without_clobber(spark, clips_df, tmp_path):
    """A stage_fn that rewrites keys on a partial (resume) commit must
    raise — and must NOT overwrite any completed wave's partition with
    partial data (ADVICE r2 #1)."""
    inp = clips_df.select("clip_id", "transcript")
    root = str(tmp_path / "rewrite")
    # complete waves 0 and 1 only, honest stage
    crash = []

    def two_waves_then_die(df):
        crash.append(1)
        if len(crash) == 3:
            raise RuntimeError("die after wave 0,1")
        return _stage(df)

    with pytest.raises(RuntimeError):
        run_stage(
            spark, inp, two_waves_then_die, root, "r", "s",
            n_waves=4, waves_per_commit=1,
        )
    lineage = read_lineage(spark, root)
    assert lineage.filter("status = 'done'").count() == 2
    good = run_stage(spark, inp, _stage, str(tmp_path / "ref"), "r", "s", n_waves=4)
    wave01 = {
        (r["clip_id"], r["out_val"])
        for r in good.withColumn("_w", F.pmod(F.hash("clip_id"), F.lit(4)))
        .filter(F.col("_w") < 2)
        .select("clip_id", "out_val")
        .collect()
    }

    # resume with a DISHONEST stage: rewrites every key to a constant
    # that provably hashes into completed wave 0
    w0_key = (
        inp.withColumn("_w", F.pmod(F.hash("clip_id"), F.lit(4)))
        .filter("_w = 0")
        .select("clip_id")
        .first()[0]
    )

    def key_rewriter(df):
        return _stage(df).withColumn("clip_id", F.lit(w0_key))

    with pytest.raises(ValueError, match="outside the commit group"):
        run_stage(
            spark, inp, key_rewriter, root, "r", "s", n_waves=4,
        )
    # completed waves are intact on disk and not marked undone
    lineage = read_lineage(spark, root)
    assert lineage.filter("status = 'done'").count() == 2
    disk = spark.read.parquet(os.path.join(root, "s"))
    got01 = {
        (r["clip_id"], r["out_val"])
        for r in disk.filter(F.col("_wave") < 2).select("clip_id", "out_val").collect()
    }
    assert got01 == wave01


def test_rerun_is_noop(spark, clips_df, tmp_path):
    inp = clips_df.select("clip_id", "transcript")
    root = str(tmp_path / "noop")
    first = _collect(run_stage(spark, inp, _stage, root, "r", "s", n_waves=3))
    calls = []

    def counting_stage(df):
        calls.append(1)
        return _stage(df)

    second = _collect(run_stage(spark, inp, counting_stage, root, "r", "s", n_waves=3))
    assert second == first
    assert calls == []  # everything checkpointed -> zero work


def test_new_run_id_reprocesses(spark, clips_df, tmp_path):
    inp = clips_df.select("clip_id", "transcript").limit(50)
    root = str(tmp_path / "rid")
    run_stage(spark, inp, _stage, root, "run_a", "s", n_waves=2)
    calls = []

    def counting_stage(df):
        calls.append(1)
        return _stage(df)

    run_stage(
        spark, inp, counting_stage, root, "run_b", "s",
        n_waves=2, waves_per_commit=1,
    )
    assert len(calls) == 2  # different run_id -> fresh processing


def test_one_pass_default_single_scan(spark, clips_df, tmp_path):
    """Default waves_per_commit=None: a fresh run calls stage_fn ONCE
    (one input scan) yet still records one lineage row per wave with
    exact per-wave counts, and a mixed resume processes only the
    missing waves."""
    inp = clips_df.select("clip_id", "transcript")
    root = str(tmp_path / "onepass")
    calls = []

    def counting_stage(df):
        calls.append(1)
        return _stage(df)

    out = run_stage(spark, inp, counting_stage, root, "r", "s", n_waves=4)
    assert len(calls) == 1  # one commit group = one scan
    lineage = read_lineage(spark, root)
    rows = {
        int(r["partition_id"]): (int(r["input_rows"]), int(r["output_rows"]))
        for r in lineage.filter("status = 'done'").collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    assert sum(i for i, _ in rows.values()) == inp.count()
    assert all(i == o for i, o in rows.values())  # row-preserving stage
    assert out.count() == inp.count()

    # rerun is a zero-call noop even in one-pass mode
    calls.clear()
    again = run_stage(spark, inp, counting_stage, root, "r", "s", n_waves=4)
    assert calls == []
    assert _collect(again) == _collect(out)


def test_nwaves_mismatch_fails_fast(spark, clips_df, tmp_path):
    """Reusing a checkpoint root with a smaller n_waves must not
    silently include stale wave partitions — it fails fast."""
    inp = clips_df.select("clip_id", "transcript")
    root = str(tmp_path / "mismatch")
    run_stage(spark, inp, _stage, root, "r", "s", n_waves=4)
    with pytest.raises(ValueError, match="different wave count"):
        run_stage(spark, inp, _stage, root, "r", "s", n_waves=2)


def test_iceberg_fallback_engages(spark, clips_df, tmp_path):
    """No Iceberg jars in this container: the probe must report
    unavailable and overwrite_partitions must take the partitioned-
    parquet path, replacing exactly the partitions it is given."""
    from pyspark.sql import functions as F

    from ds2_spark.sources.iceberg import iceberg_available, overwrite_partitions

    assert iceberg_available(spark) is False
    path = str(tmp_path / "ckpt")
    df = clips_df.select("clip_id").limit(20).withColumn(
        "_wave", F.pmod(F.crc32(F.col("clip_id")), F.lit(2)).cast("int")
    )
    engine = overwrite_partitions(df, path, "_wave")
    assert engine == "parquet"
    n_all = spark.read.parquet(path).count()
    assert n_all == 20
    # rewriting only wave 0 must leave wave 1 untouched (dynamic overwrite)
    w0 = df.filter("_wave = 0")
    n0 = w0.count()
    engine = overwrite_partitions(w0.limit(max(n0 - 1, 1)), path, "_wave")
    assert engine == "parquet"
    after = spark.read.parquet(path)
    assert after.filter("_wave = 1").count() == 20 - n0


def test_snapshot_diff_merkle_equals_naive(spark):
    """Merkle-pruned diff == the naive full-outer diff on snapshots
    with adds/removes/changes/duplicate-able rows; equal snapshots
    diff to zero rows and zero differing buckets."""
    from pyspark.sql import functions as F

    from ds2_spark.operators.diff import bucket_digests, snapshot_diff

    a = spark.createDataFrame(
        [(i, i * 10, f"s{i % 3}") for i in range(300)],
        "k long, v long, tag string",
    )
    b = spark.createDataFrame(
        [
            (i, i * 10 + (5 if i % 7 == 0 else 0), f"s{i % 3}")
            for i in range(300)
            if i % 11 != 0
        ]
        + [(1000 + i, i, "new") for i in range(8)],
        "k long, v long, tag string",
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(a, b, "k", ["v", "tag"], n_buckets=32).collect()
    }
    exp = {}
    av = {i: (i * 10, f"s{i % 3}") for i in range(300)}
    bv = {
        i: (i * 10 + (5 if i % 7 == 0 else 0), f"s{i % 3}")
        for i in range(300)
        if i % 11 != 0
    }
    bv.update({1000 + i: (i, "new") for i in range(8)})
    for k in set(av) | set(bv):
        if k not in av:
            exp[k] = "added"
        elif k not in bv:
            exp[k] = "removed"
        elif av[k] != bv[k]:
            exp[k] = "changed"
    assert got == exp and len(got) > 0

    # identical snapshots: all bucket digests equal, empty diff
    assert snapshot_diff(a, a, "k", ["v", "tag"], n_buckets=32).count() == 0
    da = {r["bucket"]: (r["n_rows"], r["digest_sum"])
          for r in bucket_digests(a, "k", ["v", "tag"], 32).collect()}
    db = {r["bucket"]: (r["n_rows"], r["digest_sum"])
          for r in bucket_digests(a, "k", ["v", "tag"], 32).collect()}
    assert da == db
