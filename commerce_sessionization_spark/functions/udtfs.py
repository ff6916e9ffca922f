"""Python user-defined TABLE functions (Spark 4 UDTF API) — tier c.

The engine's Python-surface policy (SURVEY §2.9, COVERAGE §2.9) has
three tiers: (a) JVM column expressions everywhere possible, (b)
Arrow-batched ``mapInPandas``/``applyInPandas`` where per-row state
forces Python, and — added here — (c) row-at-a-time UDTFs for LATERAL
table-generating logic that neither ``explode`` over built-ins nor a
pandas batch can express cleanly. Tier c is the SLOW path (pickled rows,
one Python call per input row): use it for control-plane / low-volume
lateral expansion, never inside a 100 TB scan — the hot-path plan tests
(``tests/test_plans.py::test_hot_paths_stay_jvm_side``) enforce that no
catalog query routes through Python eval nodes.

``register_udtfs(spark)`` installs them for SQL (``LATERAL parse_kv(s)``).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, value: string")
class ParseKV:
    """'a=1;b=2' → one (key, value) row per pair; blank/malformed
    segments are skipped rather than raised (quarantine upstream with
    ``read_source_permissive`` when provenance matters)."""

    def eval(self, s: str):
        for part in (s or "").split(";"):
            if "=" in part:
                k, v = part.split("=", 1)
                if k.strip():
                    yield (k.strip(), v.strip())


@udtf(returnType="start: int, length: int, chunk: string")
class SlidingChunks:
    """Character-window chunker: (start, length, text[start:start+size])
    stepping by ``step`` — the lateral form of ``chunk_documents`` for
    ad-hoc SQL exploration (the production path stays the zero-shuffle
    built-in pipeline in ``operators/chunking.py``)."""

    def eval(self, s: str, size: int, step: int):
        s = s or ""
        if size <= 0 or step <= 0:
            raise ValueError("size and step must be positive")
        for start in range(0, max(len(s) - size + step, 1), step):
            piece = s[start : start + size]
            if piece:
                yield (start, len(piece), piece)


def register_udtfs(spark) -> None:
    """Register every tier-c UDTF for SQL LATERAL use."""
    spark.udtf.register("parse_kv", ParseKV)
    spark.udtf.register("sliding_chunks", SlidingChunks)
