"""Generate PLANS.md — a physical-plan audit of the headline contract
queries and the pipeline's heavy stages.

For each query: `.explain('formatted')` output plus automated findings:
  - ReadSchema of every parquet scan (column pruning — `bytes` must
    never appear outside the audio stage);
  - PushedFilters present on filtered scans;
  - broadcast joins chosen where a small side exists;
  - WholeStageCodegen coverage (count of codegen'd vs interpreted
    nodes).

Usage: python tools/make_plans.py [sf_dir]   (writes PLANS.md)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

AUDITED = [
    "q_tpch_q1",
    "q_revenue_by_nation",
    "q_topk_per_group",
    "q_semi_anti",
    "q_dedup_exact",
    "q_minhash_jaccard",
    "q_simhash_neardup",
    "q_knn_topk",
    "q_ann_lsh",
    "q_lsh_neardup",
    "q_simhash",
    "q_select_subset",
    "q_votes_agg",
    "q_audio_sanity",
    "q_audio_features",
    "q_audio_fingerprint",
    "q_cube",
    "q_asof_join",
    "q_sessionize",
    "q_stratified_sample",
    "q_repetition_filter",
    "q_salted_agg",
    "q_rolling_zscore",
    "q_char_entropy",
    "q_decontaminate",
    "q_tfidf_top_terms",
    "q_chunk_pack",
    "q_bm25_topk",
    "q_temperature_mix",
    "q_containment_pairs",
    "q_fuzzy_pairs",
    "q_funnel",
    "q_audio_vad",
    "q_g711_energy",
    "q_adpcm_energy",
    "q_flac_energy",
    "q_g711_transcode",
    "q_audio_chunk",
    "q_wav_energy",
    "q_audio_tone_probe",
    "q_rule_decisions",
    "q_audio_trim",
    "q_scrub_audit",
    "q_hll_distinct",
    "q_bloom_decontaminate",
    "q_cms_heavy",
    "q_priority_sample",
    "q_proto_outlier",
    "q_audio_gain",
    "q_audio_downmix",
    "q_salted_join",
    "q_upsert",
    "q_pivot",
    "q_unpivot",
    "q_ntile",
    "q_zorder",
    "q_audio_clipping",
    "q_audio_compress",
    "q_audio_master",
    "q_full_outer",
    "q_sentences",
    "q_pagerank",
    "q_mad_outliers",
    "q_table_diff",
    "q_compaction_plan",
    "q_rater_agreement",
    "q_crossmodal_dup",
    "q_dedup_keep_best",
    "q_pq_topk",
    "q_pq_rerank",
    "q_ivfpq_topk",
    "q_span_dedup",
    "q_span_incremental",
    "q_auc_scores",
    "q_wer_pairs",
    "q_calibration_bins",
    "q_f1_sweep",
    "q_cluster_split",
    "q_bucketed_join",
    "q_drift",
    "q_pq_incremental",
    "q_bpe_encode",
    "q_corpus_build",
    "q_lm_kn",
    "q_percentile_hist",
    "q_url_canonical",
    "q_domain_stats",
    "q_html_extract",
    "q_image_dhash",
    "q_image_neardup",
    "q_quality_probe",
    "q_wav_wrap",
    "q_datacard",
    "q_script_mix",
    "flagship",
]

# hand-maintained strategy notes rendered under the matching query's
# plan — measured facts that the plan dump alone can't show
STRATEGY_NOTES = {
    "q_url_canonical": """\
**URL canonicalization shape:** nine derived columns over one pruned
scan, every expression a pure-JVM regexp/string chain (codegen) plus
bounded HOFs for param sort — no UDF, no shuffle except the output
sort. The nested expression tree recomputes shared subtrees per output
column; that is acceptable at projection cost (string ops) but the
ORACLE side goes superlinear, hence url_parts_sql_ctes stages every
intermediate exactly once in MATERIALIZED steps (6.5s -> 0.03s at
sf0.01). At 10^12 rows this projection pipelines inside the scan stage
with zero exchanges; the canonical column then becomes the exact-dedup
shuffle key downstream.""",
    "q_domain_stats": """\
**Domain aggregate shape:** canonicalize-then-groupBy(domain) —
shuffle carries (domain, canonical) only, never page payloads.
count_distinct(canonical) plans as the standard two-phase
partial_count + Expand; domain is a low-cardinality key whose hot-head
(a dominant CDN/host) is the classic salted-agg case at scale
(plans/pipeline.salted_scatter); the broadcast blocklist is an isin
literal, no join at all.""",
    "q_html_extract": """\
**HTML extraction shape:** the interpreted regex+entity-fold chain is
referenced by THREE consumers (text, length, keep), so the query cuts
with a lazy localCheckpoint — CollapseProject would otherwise inline
the chain per consumer (measured 1.79s -> 1.2s cold at sf0.01; same
fix as the tfidf re-explode trap). The oracle's CTE is AS MATERIALIZED
for the identical reason on the DuckDB side (6.1s -> 0.7s).""",
    "q_image_dhash": """\
**Image dhash shape:** pruned (media_id, bytes, mime) -> ONE
mapInPandas decode+hash -> small keyed output; bytes never enter a
shuffle. The synthesized media frame is repartitioned to
defaultParallelism BEFORE the mapInPandas (NOTES #22: the 1-partition
documents scan ran the decode serial — 1.82s -> 1.4s warm sf0.1, and
the real win is at scale where partitions ~ cores).""",
    "q_image_neardup": """\
**Banded Hamming near-dup shape:** the hash frame is lazily
localCheckpointed because FOUR plan subtrees consume it (bands a/b +
both verify-join sides) and upstream is the decode kernel — without
the cut Spark re-ran the mapInPandas per subtree (2.3s -> 1.3s at
sf0.01). Candidate generation is an ids-only band self-join (16-bit
exact-match buckets); verify joins the two 32-bit halves back by id
and filters popcount(xor) — no all-pairs anywhere.""",
    "q_wav_wrap": """\
**WAV wrap shape:** pruned scan -> ONE bytes-in/bytes-out mapInPandas
(decode through the shared _decode_int_batch quarantine rules, wrap
as canonical 44-byte-header WAV) -> lazy localCheckpoint, because TWO
consumers (the length projection and the decode-back energy pass)
would otherwise each re-run the kernel. NaN-safe sr guard: Arrow
delivers NULL ints as NaN, which slips past `is None`/`<= 0` — the
`sr != sr` test routes such rows to quarantine instead of killing
the task.""",
    "q_quality_probe": """\
**Trained probe shape:** 8 training steps = 8 map-side-combined
aggregates over the localCheckpointed feature frame, each reducing to
d=3 BIGINT gradient sums — the shuffle is d scalars per partition,
nothing else moves. The integer quantization (floor(x*r*1e6+0.5)
summed as BIGINT) is what makes the distributed sum order-free, so
the weight trajectory is bit-identical at any partitioning — the
DuckDB oracle re-runs the whole training as unrolled CTE rounds and
matches on hash. At 10^12 rows: subsample upstream
(stratified_sample is shuffle-free) — full-batch GD is k full scans
by design.""",
    "q_percentile_hist": """\
**Histogram-percentile decomposition (operators/percentile.py):** the
first aggregate is groupBy(group, value).count() — partial_count on the
map side means each task emits at most |value domain| rows (<=50 here)
regardless of input rows scanned, so the one wide shuffle carries
HISTOGRAM rows, not data rows. The window + conditional-max rank-owner
pick + lerp all run over that tiny histogram. Contrast: exact
percentile() ships every value into one aggregation buffer per group on
one reducer — correct, but a hot group is a straggler and the buffer is
single-executor-bounded; here reducer state is spread by (group, value)
hash and bounded by the domain size.""",
    "q_lm_kn": """\
**LM training shape:** the corpus is scanned ONCE — the trigram
explode flows straight into a partially-aggregated groupBy (map-side
combine absorbs hot trigrams), and the resulting vocabulary-sized
count table is cut with a lazy localCheckpoint because four consumers
(context totals, continuation counts, type count, the final join)
would otherwise each re-run the corpus explode (the tfidf re-explode
trap). The production byte-bucket path (operators/lm.
train_trigram_counts) has the same shape with a hard output bound:
each task emits at most `buckets` (2^18) rows regardless of input
size, so the shuffle is tasks x buckets and the model collect is
4 MB, never corpus-sized. pytest pins it bit-exactly against the
driver-built fixture LM; scoring via perplexities(model=...) is then
bit-identical by construction.""",
    "q_funnel": """\
**Funnel strategies (measured sf0.1, local[32], min-of-3 warm):**
two implementations share exact semantics (parity pinned in
tests/test_timeseries.py::test_funnel_arrays_matches_kpass):

| strategy | plan | k=3 | k=5 |
|---|---|---|---|
| `funnel` (k keyed passes) — **used here** | k filtered groupBy-min passes, partitioning on user reused | 0.596s | 0.508s |
| `funnel_arrays` (sort-once) | ONE groupBy(user) collect + array_sort + JVM aggregate() walk | 0.707s | 0.539s |

At this scale the k-pass form wins: each pass shuffles only its
step's slice (predicate pushdown), and the (k-1) frontier
re-shuffles are tiny (1 row per user). The arrays form trades k
narrow shuffles for one wide shuffle of every funnel-relevant
event plus collect_list materialization — its crossover is large k
(k passes of fixed overhead each) or when the per-step slices are
nearly the whole table (the k passes then re-shuffle ~k times the
data the single wide shuffle moves once). It also concentrates a
user's full event history in one task, so a hot user needs a
pre-cap. Both forms stay JVM-side end to end.""",
    "q_pq_topk": """\
**PQ scale shape:** the only pass over raw vectors is the encode
mapInPandas (one vectorized diff+argmin per Arrow batch); the ADC
scan joins the (id, 8-codes) relation against a BROADCAST of the
query LUTs and runs entirely in JVM array arithmetic
(zip_with/element_at/aggregate). At 10^12 vectors the codes relation
is ~32x smaller than the embeddings; only (query, neighbor, dist)
ids enter the top-k exchange. Exact ordering within quantization
error comes from the rerank_k composition (q_pq_rerank), which
rejoins vectors for the shortlist ids only.""",
    "q_ivfpq_topk": """\
**IVF-PQ scale shape:** candidates pass once through assign+encode
(-> id, cell, 8 codes); queries explode to nprobe (id, cell, LUT)
rows and broadcast. The equi-join on `cell` IS the IVF prune — only
probed cells' codes are scanned, cutting the ADC work by ~C/nprobe
vs flat PQ while the residual encoding spends the same codebook
budget on a much tighter distribution. All distances exact int64.""",
    "q_crossmodal_dup": """\
**Cross-modal shape:** the transcript md5 rides the audio
fingerprint's Arrow pass (audio_fingerprint passthrough), so clip
bytes are read ONCE and never rescanned or shuffled; after that pass
only (clip_id, fp, t_hash) scalars move — two scalar-key groupBys
with map-side combine and two count-joins back.""",
    "q_span_dedup": """\
**Span-dedup scale shape:** the text payload is hashed where it is
scanned — only (doc_id, pos, 16-hex key) rows enter the key groupBy,
and the marked-interval stream that comes back is (doc_id, s, e)
triples. The rewrite joins the bounded per-doc spans ARRAY to a
second pruned scan by doc_id (broadcast-ready: touched docs are a
small fraction of the corpus). Standard 100TB refinement, same as
decontaminate: a Bloom/count prefilter so singleton grams (the vast
majority under Zipf) never shuffle at all — constants, not shape.""",
    "q_bpe_encode": """\
**BPE scale shape:** training's distributed half is one map-side
combined word-frequency groupBy whose key space is the VOCABULARY
(Zipf-bounded), not the corpus; the merge loop runs driver-side on
the bounded top-N list (collect_pool discipline). Encoding is a
single mapInPandas pass whose unit of work is the unique word per
partition (memoized — the standard tokenizer word cache), so
per-batch cost is O(unique words), a small fraction of rows. Only
fixed-width count/hash scalars leave the pass.""",
    "q_corpus_build": """\
**Capstone composition shape:** five individually-verified stages
chained as one job — span scrub, exact dedup on scrubbed text,
benchmark decontamination, BPE tokenization of survivors, token-
budget sampling. Lazy localCheckpoints at each stage boundary stop
Catalyst re-executing the upstream chain once per reason-ladder
consumer (NOTES #41; 19s -> 6.5s warm at sf0.1). On a cluster the
checkpoints become real checkpoint()s over the lineage store —
which the pipeline's resume machinery already provides.""",
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> list[str]:
    notes = []
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    for s in schemas:
        cols = [c.split(":")[0] for c in s.split(",") if c]
        notes.append(f"- scan reads only: `{', '.join(cols) or '(none)'}`")
        if "bytes" in cols:
            notes.append("- **WARNING: scan reads `bytes`**")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    for p in pushed:
        if p.strip():
            notes.append(f"- pushed filters: `{p.strip()[:120]}`")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    n_bnl = plan.count("BroadcastNestedLoopJoin")
    if n_bhj or n_smj or n_bnl:
        notes.append(
            f"- joins: {n_bhj} broadcast-hash, {n_smj} sort-merge, "
            f"{n_bnl} broadcast-nested-loop"
        )
    n_wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    if n_wsc:
        notes.append(f"- WholeStageCodegen spans: {n_wsc}")
    n_exch = plan.count("Exchange")
    notes.append(f"- exchanges (shuffles incl. broadcasts): {n_exch}")
    return notes


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from ds2_spark import queries_catalog
    from ds2_spark.session import get_spark

    spark = get_spark(app_name="make_plans", cpus=8)
    qs = queries_catalog.queries()

    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `tools/make_plans.py` at `{sf_dir}` (plans are",
        "size-independent; AQE may re-plan exchanges at runtime).",
        "Checklist per plan: column-pruned scans (ReadSchema), pushed",
        "filters, broadcast joins for small sides, WholeStageCodegen",
        "coverage, shuffle count. `bytes` must never appear in a",
        "ReadSchema outside the audio stage.",
        "",
    ]
    for name in AUDITED:
        df = qs[name](spark, sf_dir)
        plan = formatted_plan(df)
        out.append(f"## {name}")
        out.append("")
        out.extend(audit(plan))
        out.append("")
        if name in STRATEGY_NOTES:
            out.append(STRATEGY_NOTES[name])
            out.append("")
        out.append("<details><summary>formatted plan</summary>")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("</details>")
        out.append("")

    # pipeline stage plans: rules (bytes-free) + audio (bytes, pruned)
    from ds2_spark.config import PipelineConfig, QualityConfig
    from ds2_spark.fixtures import generate_all
    from ds2_spark.operators.audio import (
        FIXTURE_PCM16_ALIASES,
        audio_sanity_exprs,
    )
    from ds2_spark.plans.pipeline import rule_decisions, transcript_features

    fx = "/tmp/ds2_plans_fixture"
    if not os.path.exists(os.path.join(fx, "clips.parquet")):
        generate_all(fx, n=300)
    clips = spark.read.parquet(f"{fx}/clips.parquet")
    cfg = PipelineConfig(
        quality=QualityConfig(pcm16_alias_codecs=FIXTURE_PCM16_ALIASES)
    )
    # production rules shape (plans/curation._rules_stage): sanity
    # exprs IN PLACE on the same frame — single scan, zero exchanges
    aud = audio_sanity_exprs(
        cfg.quality.dur_tolerance, cfg.quality.pcm16_alias_codecs
    )
    enriched = clips.withColumn("pcm_ok", aud["pcm_ok"]).withColumn(
        "dur_ok", aud["dur_ok"]
    )
    feats = transcript_features(enriched, cfg, keep_cols=("pcm_ok", "dur_ok"))
    stages = {
        "pipeline_rules (single scan; bytes only feeds JVM sanity exprs)": (
            rule_decisions(feats, audio=None, cfg=cfg)
        ),
    }
    for name, df in stages.items():
        plan = formatted_plan(df)
        out.append(f"## {name}")
        out.append("")
        notes = audit(plan)
        # the audio-sanity branch reads bytes ONLY to take length();
        # flag it as expected rather than a warning
        notes = [
            n.replace(
                "**WARNING: scan reads `bytes`**",
                "`bytes` read by the audio-sanity branch only (JVM "
                "length(); never crosses to Python — see "
                "operators/audio.audio_sanity_fast)",
            )
            for n in notes
        ]
        out.extend(notes)
        out.append("")
        out.append("<details><summary>formatted plan</summary>")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("</details>")
        out.append("")

    with open(os.path.join(ROOT, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(out)} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
