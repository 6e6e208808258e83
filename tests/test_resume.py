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

    # crashing run: fail while processing wave 2
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
        run_stage(spark, inp, crashy_stage, root, "run1", "feat", n_waves=4)

    lineage = read_lineage(spark, root)
    done_before = lineage.filter("status = 'done'").count()
    assert done_before == 2  # waves 0,1 checkpointed before the crash

    # resume: same run_id + stage
    crash_marker.unlink()
    calls.clear()
    resumed = run_stage(spark, inp, crashy_stage, root, "run1", "feat", n_waves=4)
    assert _collect(resumed) == expected
    # only the 2 missing waves were reprocessed
    assert len(calls) == 2
    lineage = read_lineage(spark, root)
    assert lineage.filter("status = 'done'").count() == 4

    metrics = read_metrics(spark, root)
    names = {r["metric"] for r in metrics.select("metric").distinct().collect()}
    assert {"rows_per_sec", "input_rows", "output_rows"} <= names


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

    run_stage(spark, inp, counting_stage, root, "run_b", "s", n_waves=2)
    assert len(calls) == 2  # different run_id -> fresh processing
