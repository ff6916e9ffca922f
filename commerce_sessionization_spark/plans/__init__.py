from commerce_sessionization_spark.plans.queries import (
    CATALOG,
    QueryDef,
    oracle_queries,
    spark_queries,
)

__all__ = ["CATALOG", "QueryDef", "oracle_queries", "spark_queries"]
