"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship quality-filter query on sf0.001.
`queries()` exposes one callable per implemented operator from
SURVEY.md §2; `oracle_sql()` gives the DuckDB-equivalent SQL the
driver compares against at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ds2_spark import queries_catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the transcript quality-filter plan over sf0.001
    `documents` (the transcript analog of the clips table): language
    ID + perplexity + quality heuristics + PII/toxicity scrub +
    keep/drop with reason codes."""
    return queries_catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_catalog.queries()


def oracle_sql() -> dict[str, str]:
    return queries_catalog.oracle_sql()
