"""Out-of-Spark pipeline validation (SURVEY §2.1 S9).

Mirrors the reference's E2E data-quality DAG
(``airflow/dags/sessionization_batch_test.py:39-87``): per hour partition,
assert (1) row-count parity between ``logs`` and ``sessions`` and (2) the
``session_id`` column exists and is fully non-null — using pyarrow directly
so validation does not depend on the engine under test.

    python tools/validate_pipeline.py BASE_DIR [--date D] [--hour H]

Exit code 0 = all checked partitions pass.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import pyarrow.parquet as pq


def partition_row_count(base: str, table: str, date: str, hour: str) -> int:
    pattern = os.path.join(
        base, table, f"event_date={date}", f"event_hour={hour}", "*.parquet"
    )
    return sum(pq.read_metadata(f).num_rows for f in glob.glob(pattern))


def session_id_nulls(base: str, date: str, hour: str) -> tuple[int, int]:
    """(rows, nulls) of session_id in one sessions/ partition."""
    pattern = os.path.join(
        base, "sessions", f"event_date={date}", f"event_hour={hour}", "*.parquet"
    )
    rows = nulls = 0
    for f in glob.glob(pattern):
        t = pq.read_table(f, columns=["session_id"])
        rows += t.num_rows
        nulls += t.column("session_id").null_count
    return rows, nulls


def discover_partitions(base: str) -> list[tuple[str, str]]:
    out = []
    for p in sorted(glob.glob(os.path.join(base, "sessions", "event_date=*", "event_hour=*"))):
        parts = dict(
            kv.split("=") for kv in p.split(os.sep) if "=" in kv
        )
        out.append((parts["event_date"], parts["event_hour"]))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("--date")
    ap.add_argument("--hour")
    args = ap.parse_args()

    parts = (
        [(args.date, args.hour)]
        if args.date and args.hour
        else discover_partitions(args.base)
    )
    if not parts:
        print("no sessions partitions found")
        return 1

    failures = 0
    for date, hour in parts:
        n_logs = partition_row_count(args.base, "logs", date, hour)
        n_sess, n_null = session_id_nulls(args.base, date, hour)
        ok = n_logs == n_sess and n_null == 0
        status = "ok  " if ok else "FAIL"
        print(
            f"{status} {date} {hour}: logs={n_logs} sessions={n_sess} "
            f"null_session_ids={n_null}"
        )
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
