"""Regenerate CATALOG.md from plans/queries.py (run after catalog edits).

The doc is generated, not hand-written, so it can't drift from the code:
every query's name, driver-window membership, oracle status, and
one-line description come straight from the QueryDef list.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from commerce_sessionization_spark.plans.queries import (  # noqa: E402
    CATALOG,
    EXTENDED_CATALOG,
)


def main() -> None:
    out = Path(__file__).resolve().parent.parent / "CATALOG.md"
    lines = [
        "# Query catalog (generated — do not edit; run "
        "`python tools/gen_catalog_md.py`)",
        "",
        f"{len(CATALOG) + len(EXTENDED_CATALOG)} queries: the driver "
        f"grades the {len(CATALOG)}-query window; the "
        f"{len(EXTENDED_CATALOG)} extended entries hold the same "
        "QueryDef contract (oracle-paired unless noted) and are checked "
        "by `tools/check_oracle.py` + pytest.",
        "",
    ]
    for title, cat in (
        ("Driver window (graded)", CATALOG),
        ("Extended catalog", EXTENDED_CATALOG),
    ):
        lines += [f"## {title}", "", "| query | oracle | description |",
                  "|---|---|---|"]
        for q in cat:
            oracle = "sql" if q.oracle is not None else "rows-only"
            lines.append(f"| `{q.name}` | {oracle} | {q.doc} |")
        lines.append("")
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(CATALOG) + len(EXTENDED_CATALOG)} queries)")


if __name__ == "__main__":
    main()
