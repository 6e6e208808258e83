"""Data-contract validation: single-scan batch expectations.

Before accepting an ingest batch into a 10^12-row table, a production
pipeline validates a declared contract — null rates, value ranges,
categorical domains, format regexes, key uniqueness (the Delta
`CHECK`-constraint / Great-Expectations pattern). The reference has no
counterpart (its inputs are trusted benchmark dumps); at 100 TB this
is the difference between refusing a bad batch in one scan and
discovering it in downstream corruption.

Scale shape:
- Every predicate rule compiles to one conditional-sum column inside a
  SINGLE global aggregate over the batch — ONE scan regardless of rule
  count, map-side combined, no per-rule jobs. Column pruning holds:
  the scan reads only columns some rule references.
- Uniqueness rules ride the same aggregate as exact countDistinct
  terms (Catalyst plans one Expand + two-phase aggregate). dup_rows =
  n_nonnull_keys - n_distinct_keys, exactly the number of rows that
  must be dropped/deduped. Exact distinct over a genuinely
  high-cardinality key is shuffle-heavy by nature; batches are
  validated per-ingest (bounded), and the docstring-recommended scale
  relaxation is `approx=True` (HLL approx_count_distinct) when the
  check is advisory, at the cost of the exact-oracle property.
- Output is LONG format (one row per rule) so adding a rule never
  changes the schema, and downstream gating is a trivial
  `violations > 0` filter over |rules| rows.

Rule predicates must follow the repo's 3-engine regex discipline if
they are to be oracle-checked (explicit ASCII classes, no \\b / \\d —
see functions/scrub.py); the operator itself imposes nothing beyond
"a Column predicate that is TRUE on violation".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, violation_predicate) — predicate TRUE means the row VIOLATES
# the rule. NULL predicate results count as violations for range/set/
# regex rules built by the helpers below ONLY when the helper says so;
# raw tuples are counted with null-as-false (F.when semantics).
RuleSpec = tuple[str, Column]


def rule_not_null(name: str, col: str) -> RuleSpec:
    return (name, F.col(col).isNull())


def rule_range(
    name: str, col: str, lo: float | int, hi: float | int, null_ok: bool = True
) -> RuleSpec:
    """Violation: value outside [lo, hi]. NULLs pass unless
    null_ok=False (compose with rule_not_null to report nulls as their
    own line instead of conflating the two failure modes)."""
    out = (F.col(col) < lo) | (F.col(col) > hi)
    if not null_ok:
        out = out | F.col(col).isNull()
    return (name, out)


def rule_in_set(
    name: str, col: str, values: Sequence, null_ok: bool = True
) -> RuleSpec:
    out = ~F.col(col).isin(list(values))
    if not null_ok:
        out = out | F.col(col).isNull()
    return (name, out)


def rule_rlike(name: str, col: str, pattern: str, null_ok: bool = True) -> RuleSpec:
    """Violation: non-NULL value does NOT match `pattern`."""
    out = ~F.col(col).rlike(pattern)
    if not null_ok:
        out = out | F.col(col).isNull()
    return (name, out)


def check_contract(
    df: DataFrame,
    rules: Sequence[RuleSpec] = (),
    unique: Sequence[str] = (),
    approx: bool = False,
) -> DataFrame:
    """Validate `df` against predicate `rules` and `unique` key
    columns in ONE aggregate pass.

    Returns a long-format frame: (rule string, n_rows long,
    violations long, pass boolean), ordered by rule. For a predicate
    rule, violations = rows where the predicate is TRUE (NULL counts
    as not-violating — helpers expose null_ok to change that). For a
    uniqueness rule `unique:<col>`, violations = n_nonnull - n_distinct
    (the exact number of surplus duplicate rows); NULL keys are not
    counted as duplicates of each other (report them via
    rule_not_null). `approx=True` swaps exact countDistinct for
    approx_count_distinct — advisory mode for unbounded-cardinality
    keys at extreme scale; leave False wherever the result feeds a
    gate or an exact oracle.
    """
    if not rules and not unique:
        raise ValueError("check_contract: no rules given")
    names = [n for n, _ in rules] + [f"unique:{c}" for c in unique]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    # coalesce: sum() over an EMPTY batch is NULL — an empty batch has
    # zero violations, and a NULL here would make `pass` NULL (a gate
    # filtering `NOT pass` silently drops the row — neither accept nor
    # refuse)
    aggs += [
        F.coalesce(
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    cd = F.approx_count_distinct if approx else F.count_distinct
    for j, col in enumerate(unique):
        aggs.append(F.count(F.col(col)).alias(f"__k{j}"))  # non-null keys
        aggs.append(cd(F.col(col)).alias(f"__d{j}"))
    wide = df.agg(*aggs)

    # stack the wide single row to long format — a projection over ONE
    # row, no second pass over the data
    pairs: list[Column] = []
    for i, (name, _) in enumerate(rules):
        pairs += [F.lit(name), F.col(f"__v{i}").cast("long")]
    for j, col in enumerate(unique):
        # greatest(0, ...): approx_count_distinct may OVERestimate the
        # distinct count above the non-null count, which would report
        # negative violations and a spurious pass=False on a clean key
        pairs += [
            F.lit(f"unique:{col}"),
            F.greatest(
                F.lit(0).cast("long"),
                (F.col(f"__k{j}") - F.col(f"__d{j}")).cast("long"),
            ),
        ]
    n_pairs = len(rules) + len(unique)
    return (
        wide.select(
            F.col("__n").cast("long").alias("n_rows"),
            F.stack(F.lit(n_pairs), *pairs).alias("rule", "violations"),
        )
        .select("rule", "n_rows", "violations", (F.col("violations") == 0).alias("pass"))
        .orderBy("rule")
    )


def violating_rows(df: DataFrame, rule: RuleSpec, limit: int = 100) -> DataFrame:
    """Bounded sample of rows violating one rule — the triage follow-up
    after check_contract flags it. Deterministic order is the caller's
    concern (add .orderBy on a key before relying on WHICH rows)."""
    name, pred = rule
    return df.filter(pred).limit(limit)
