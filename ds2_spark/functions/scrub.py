"""PII / toxicity scrubbing.

One regex chain, three implementations that must agree exactly:
  - Spark column expression (`scrub_col`) — built-in `regexp_replace`,
    JVM-side, codegen'd (the production path; no Python in the loop)
  - DuckDB SQL snippet (`scrub_sql`) — the correctness oracle
  - plain Python (`scrub_py`) — the NumPy-oracle / fixture golden path

Patterns deliberately avoid constructs whose semantics differ across
Java regex / RE2 / Python `re` (no lookaround, no possessive
quantifiers, no recursive regex — cf. the reference's `(?R)` JSON
extractor, LLM_scoring/scoring.py:209, which we do NOT need since
scores are structured columns here).

Scope note: EMAIL_RE targets conventional addresses
([A-Za-z0-9._%+-] locals). RFC-exotic locals ('*@a.com',
quoted-string locals) are intentionally out of scope — matching them
requires patterns greedy enough to eat surrounding punctuation.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"

# Fixture toxicity lexicon — placeholder terms (FIXTURES.md §1), not a
# real-word list; production users supply their own lexicon.
TOX_LEXICON: tuple[str, ...] = tuple(f"zorgblat{i:02d}" for i in range(40))
TOX_RE = r"\b(" + "|".join(TOX_LEXICON) + r")\b"

# (pattern, replacement) — ORDER MATTERS: SSN before PHONE (an SSN is
# also a valid phone-ish digit run).
SCRUB_CHAIN: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
    (TOX_RE, "<TOX>"),
)


def scrub_col(col: Column | str) -> Column:
    """Spark expression applying the scrub chain (JVM regexp_replace)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in SCRUB_CHAIN:
        c = F.regexp_replace(c, pat, rep)
    return c


def scrub_sql(expr: str) -> str:
    """DuckDB SQL expression applying the identical chain to `expr`."""
    out = expr
    for pat, rep in SCRUB_CHAIN:
        pat_sql = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{rep}', 'g')"
    return out


_COMPILED = [(re.compile(p), r) for p, r in SCRUB_CHAIN]


def scrub_py(text: str) -> str:
    """Python twin for oracles/fixtures."""
    for cre, rep in _COMPILED:
        text = cre.sub(rep, text)
    return text
