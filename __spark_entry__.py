"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship sessionization query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
north-star dedup/similarity/text surface); ``oracle_sql()`` gives the DuckDB
twin for each SQL-expressible query. See
``commerce_sessionization_spark/plans/queries.py`` for the catalog.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from commerce_sessionization_spark.plans.queries import (  # noqa: E402
    oracle_queries,
    spark_queries,
)


def _ensure_conf(spark: SparkSession) -> SparkSession:
    """The driver owns the session; set the confs our reads depend on."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; tables.load_table still works if set
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_conf(spark)
    return spark_queries()["sessionize_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    fns = spark_queries()
    return {
        name: (lambda spark, sf_dir, _f=fn: _f(_ensure_conf(spark), sf_dir))
        for name, fn in fns.items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return oracle_queries()
