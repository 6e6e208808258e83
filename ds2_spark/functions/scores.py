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


def parse_rating_json(col: Column | str) -> Column:
    """Extract the last {...} json object (non-recursive approximation
    of the reference's (?R) regex — sufficient for flat rating blobs)
    and parse the 4 rating fields; unparseable -> struct of zeros."""
    c = F.col(col) if isinstance(col, str) else col
    blob = F.regexp_extract(c, r"(\{[^{}]*\})[^{}]*$", 1)
    parsed = F.from_json(blob, RATING_SCHEMA)
    zero = F.lit(0)
    return F.struct(
        F.coalesce(parsed["Rarity"], zero).alias("rarity"),
        F.coalesce(parsed["Complexity"], zero).alias("complexity"),
        F.coalesce(parsed["Informativeness"], zero).alias("informativeness"),
        F.coalesce(parsed["Overall rating"], zero).alias("overall"),
    )
