"""Score/rating column functions.

Re-expresses the reference's score handling as column expressions:
  - compress_score: clamp raw 1-10 'Overall' rating to [4,9] then
    shift to [0,5] (reference LLM_scoring/scoring.py:129-146,
    README.md:67) — operator P2 in SURVEY.md §2.2
  - parse_rating_json: structured parse of an LLM rating blob
    (reference's recursive-regex + json.loads, scoring.py:238-268,
    operator F2/F3) via regexp_extract + from_json with a [0,0,0,0]
    default on failure (P8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RATING_SCHEMA = (
    "Rarity INT, Complexity INT, Informativeness INT, `Overall rating` INT"
)


def compress_score(col: Column | str) -> Column:
    """[1,10] overall rating -> [0,5] class label: clamp [4,9], −4."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.least(F.greatest(c, F.lit(4)), F.lit(9)) - F.lit(4)).cast("int")


def balanced_brace_pattern(depth: int = 4) -> str:
    """Regex matching the LAST balanced {...} object nested up to
    `depth` levels — the bounded-depth equivalent of the reference's
    recursive `(?R)` extractor (LLM_scoring/scoring.py:209), which
    matches braces purely structurally (no string-literal awareness),
    exactly as this does. The alternation branches are disjoint on
    their first character ('{' vs non-brace), so matching is linear —
    no catastrophic backtracking. depth=4 covers any sane rating blob;
    deeper nesting extracts the deepest covered object and falls back
    to the zero default downstream (P8), it never mis-parses silently
    as the old flat pattern did."""
    obj = r"\{[^{}]*\}"
    for _ in range(depth - 1):
        obj = r"\{(?:[^{}]|" + obj + r")*\}"
    return "(" + obj + r")[^{}]*$"


def parse_rating_json(col: Column | str, depth: int = 4) -> Column:
    """Extract the last balanced {...} json object (nesting handled to
    `depth` levels — reference parity for its recursive-regex + loads,
    scoring.py:238-268) and parse the 4 rating fields; unparseable ->
    struct of zeros. JVM-only: regexp_extract + from_json, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    blob = F.regexp_extract(c, balanced_brace_pattern(depth), 1)
    parsed = F.from_json(blob, RATING_SCHEMA)
    zero = F.lit(0)
    return F.struct(
        F.coalesce(parsed["Rarity"], zero).alias("rarity"),
        F.coalesce(parsed["Complexity"], zero).alias("complexity"),
        F.coalesce(parsed["Informativeness"], zero).alias("informativeness"),
        F.coalesce(parsed["Overall rating"], zero).alias("overall"),
    )
