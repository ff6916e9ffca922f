"""Receipt: content-defined vs fixed-window dedup under offset shift.

Builds a corpus where every doc embeds the SAME boilerplate run behind
a unique random-length prefix (the shifted-nav-bar case every crawl
corpus has), then measures what fraction of boilerplate tokens each
strategy actually removes:

- fixed 4-token windows (segment_dedup_docs' re-lining): windows only
  align across docs when prefix lengths agree mod 4, so most of the
  duplicated run survives;
- CDC anchor chunks (cdc_chunk_dedup): chunking realigns at the first
  anchor inside the run, so everything from that anchor on dedups
  regardless of prefix length.

    python tools/cdc_shift_probe.py [n_docs] [boiler_tokens] [group_size]

``group_size`` = how many docs share each boilerplate run. With a run
shared corpus-wide (group_size = n_docs) fixed windows get bailed out
by prefix-length collisions mod 4 — with enough docs, every alignment
residue recurs and the windows dedup anyway. The regime that separates
the strategies is small groups at distinct offsets (group_size 2, the
pairwise near-dup case): no two copies align, fixed windows remove
~0%, CDC realigns at the first anchor inside the run. Prints one
removal-rate line per strategy; both regimes land in SCALE.md's
round-10 CDC receipt.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from commerce_sessionization_spark.operators.dedup import (  # noqa: E402
    cdc_chunk_dedup,
    segment_dedup,
)
from commerce_sessionization_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_boiler = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    rng = random.Random(10)
    docs = []
    boiler_set: set[str] = set()
    for i in range(n_docs):
        g = i // group
        grng = random.Random(1000 + g)
        boiler = [f"nav{g}x{grng.randrange(10_000)}" for _ in range(n_boiler)]
        boiler_set.update(boiler)
        # members of a group get DISTINCT prefix lengths mod 4, so no
        # two copies of a run ever share a fixed-window alignment
        plen = rng.randrange(0, 40, 4) + (i % group) % 4
        prefix = [f"u{i}w{j}" for j in range(plen)]
        body = [f"u{i}b{j}" for j in range(rng.randint(10, 60))]
        docs.append((i, " ".join(prefix + boiler + body)))

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    boiler_total = n_docs * n_boiler

    def removed(clean_col_rows) -> int:
        kept = 0
        for r in clean_col_rows:
            kept += sum(1 for t in r.clean_text.split(" ") if t in boiler_set)
        return boiler_total - kept

    # fixed 4-token windows, re-lined then line-deduped (the
    # segment_dedup_docs plan, minus the sf-dir plumbing)
    toks = df.select("doc_id", F.split("text", " ").alias("_w"))
    w = F.col("_w")
    nseg = F.ceil(F.size(w) / F.lit(4.0)).cast("long")
    segs = F.transform(
        F.sequence(F.lit(1), nseg),
        lambda i: F.array_join(F.slice(w, (i - 1) * 4 + 1, 4), " "),
    )
    lined = toks.select("doc_id", F.array_join(segs, "\n").alias("text"))
    fixed = segment_dedup(lined, sep="\n", min_docs=2).withColumn(
        "clean_text", F.replace(F.col("clean_text"), F.lit("\n"), F.lit(" "))
    )
    fixed_removed = removed(fixed.select("clean_text").collect())

    cdc = cdc_chunk_dedup(df, divisor=8, min_docs=2)
    cdc_removed = removed(cdc.select("clean_text").collect())

    print(
        f"docs={n_docs} boiler_tokens_per_doc={n_boiler} "
        f"group_size={group} (total {boiler_total})"
    )
    print(
        f"fixed-4-token windows: removed {fixed_removed} "
        f"({100 * fixed_removed / boiler_total:.1f}% of boilerplate)"
    )
    print(
        f"cdc anchor chunks:     removed {cdc_removed} "
        f"({100 * cdc_removed / boiler_total:.1f}% of boilerplate)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
