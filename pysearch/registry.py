"""Operator registry shared by the breadth modules.

Each engine module (relational, dedup, similarity, textstats, multimodal)
exposes ``REGISTRY: dict[str, Entry]``; ``__spark_entry__`` merges them into
the driver contract (``queries()`` / ``oracle_sql()``).

An Entry couples the Spark implementation with its DuckDB oracle SQL
(``sql=None`` → driver records the weaker rows-only check — reserved for
genuinely non-SQL-expressible ops like approximate sketches / LSH recall).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Entry:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver parquet table (region … documents embeddings)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
