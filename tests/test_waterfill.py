"""Mixture waterfill: exact-solve parity vs a Fraction reference,
conservation/cap invariants, and the saturation-prefix law."""

from __future__ import annotations

import random
from fractions import Fraction

from commerce_sessionization_spark.operators.sampling import (
    mixture_waterfill,
)
from commerce_sessionization_spark.plans.queries import q_mixture_waterfill

SF_DIR = "/root/testdata/sf0.01"


def _reference(domains, budget):
    """Exact waterfill in Fractions: sort by A/w, grow the saturated
    prefix while each cap sits below the level implied by the residual,
    then alloc = min(A, floor(w·R/W))."""
    live = [(d, a, w) for d, a, w in domains if w > 0]
    dead = [(d, a, w) for d, a, w in domains if w <= 0]
    live.sort(key=lambda t: (Fraction(t[1], t[2]), t[0]))
    tw = sum(w for _, _, w in live)
    sat: set[str] = set()
    cuma = cumw = 0
    for d, a, w in live:
        # saturates iff a/w < (B - prevA) / (TW - prevW)
        if a * (tw - cumw) < w * (budget - cuma):
            sat.add(d)
            cuma += a
            cumw += w
        else:
            break  # sorted ⇒ nobody later saturates either
    r, rw = budget - cuma, tw - cumw
    out = {}
    for d, a, w in live:
        if d in sat:
            alloc = a
        elif rw > 0:
            alloc = max(0, (w * r) // rw)
        else:
            alloc = 0
        out[d] = (a, w, 1 if d in sat else 0, alloc)
    for d, a, w in dead:
        out[d] = (a, w, 0, 0)
    return out


def _run(spark, domains, budget):
    avail = spark.createDataFrame(
        [(d, a, w) for d, a, w in domains],
        "domain string, available long, target_ppm long",
    )
    bdf = spark.createDataFrame([(budget,)], "budget long")
    rows = mixture_waterfill(avail, bdf).collect()
    return {
        r.domain: (r.available, r.target_ppm, r.saturated, r.alloc_tokens)
        for r in rows
    }


def test_matches_fraction_reference_on_seeded_cases(spark):
    rng = random.Random(100)
    for case in range(8):
        n = rng.randint(1, 12)
        domains = [
            (f"d{i:02d}", rng.randint(0, 10_000), rng.randint(0, 900_000))
            for i in range(n)
        ]
        total_a = sum(a for _, a, _ in domains)
        budget = rng.randint(0, max(1, 2 * total_a))
        got = _run(spark, domains, budget)
        want = _reference(domains, budget)
        assert got == want, (case, domains, budget, got, want)


def test_budget_conservation_and_caps(spark):
    domains = [("web", 9_000, 500_000), ("code", 800, 300_000),
               ("books", 150, 200_000)]
    budget = 5_000
    got = _run(spark, domains, budget)
    total = sum(v[3] for v in got.values())
    n_unsat = sum(1 for v in got.values() if v[2] == 0)
    # never overshoots; floor losses < one token per unsaturated domain
    assert total <= budget
    assert budget - total < max(1, n_unsat)
    for d, (a, _w, _s, alloc) in got.items():
        assert 0 <= alloc <= a, (d, alloc, a)
    # books (150 avail vs 200k ppm of 5k ≈ 1000 wanted) must saturate
    assert got["books"][2] == 1 and got["books"][3] == 150


def test_all_saturate_when_budget_covers_availability(spark):
    domains = [("a", 100, 600_000), ("b", 50, 400_000)]
    got = _run(spark, domains, budget=1_000)
    assert all(v[2] == 1 and v[3] == v[0] for v in got.values())


def test_unsaturated_allocs_follow_target_proportion(spark):
    # plenty of availability everywhere ⇒ nobody saturates,
    # alloc_i·w_j ≈ alloc_j·w_i within one floor step each
    domains = [("a", 10**9, 700_000), ("b", 10**9, 300_000)]
    budget = 1_000_003
    got = _run(spark, domains, budget)
    assert all(v[2] == 0 for v in got.values())
    (aa, wa, _, ta), (ab, wb, _, tb) = got["a"], got["b"]
    assert abs(ta * wb - tb * wa) < max(wa, wb)
    assert budget - (ta + tb) < 2


def test_zero_weight_and_zero_availability_domains(spark):
    domains = [("live", 1_000, 1_000_000), ("off", 999, 0),
               ("empty", 0, 500_000)]
    got = _run(spark, domains, budget=400)
    assert got["off"] == (999, 0, 0, 0)
    # zero availability saturates at zero tokens
    assert got["empty"][2] == 1 and got["empty"][3] == 0
    assert got["live"][3] <= 400


def test_fill_ppm_floor_is_exact_not_half_up(spark):
    # alloc=2 over available=2,000,001 → fill = floor(0.9999995·1e6) = 0.
    # Spark decimal division HALF_UP-rounds at scale 6 (0.9999995 → 1.0)
    # before a floor, so a naive division reports 1; the subtract-modulo
    # identity must hold the exact 0 (matches the oracle's integer //).
    avail = spark.createDataFrame(
        [("a", 2_000_001, 1_000_000)],
        "domain string, available long, target_ppm long",
    )
    bdf = spark.createDataFrame([(2,)], "budget long")
    row = mixture_waterfill(avail, bdf).collect()[0]
    assert row.saturated == 0 and row.alloc_tokens == 2
    assert row.fill_ppm == 0


def test_empty_input_yields_empty_output(spark):
    assert _run(spark, [], budget=10) == {}


def test_sample_plan_delivers_the_allocation(spark):
    """Composition law: the executed sample's per-language char mass
    tracks the waterfill allocation — saturated languages keep every
    doc, the residual absorber keeps ≈ fill_ppm of its chars."""
    from commerce_sessionization_spark.plans.queries import (
        q_mixture_sample_plan,
    )

    plan = {r.domain: r for r in q_mixture_waterfill(spark, SF_DIR).collect()}
    kept = (
        q_mixture_sample_plan(spark, SF_DIR)
        .groupBy("lang")
        .agg({"n_chars": "sum", "*": "count"})
        .collect()
    )
    for r in kept:
        p = plan[r.lang]
        if p.saturated:
            # fill_ppm == 1e6 ⇒ the gate passes every doc
            assert r["sum(n_chars)"] == p.available
        else:
            # hash gate ⇒ kept chars ≈ alloc within sampling noise
            assert abs(r["sum(n_chars)"] - p.alloc_tokens) < 0.25 * p.available


def test_catalog_query_runs_and_is_feasible(spark):
    rows = q_mixture_waterfill(spark, SF_DIR).collect()
    assert rows, "documents table has languages"
    total_avail = sum(r.available for r in rows)
    budget = total_avail * 9 // 10
    total_alloc = sum(r.alloc_tokens for r in rows)
    assert total_alloc <= budget
    assert budget - total_alloc < len(rows) + 1
    for r in rows:
        assert 0 <= r.alloc_tokens <= r.available
        if r.saturated:
            assert r.alloc_tokens == r.available and r.fill_ppm == 1_000_000
    # the interesting branch fires on real data: temperature targets
    # overshoot low-resource languages at a 90% budget
    assert any(r.saturated for r in rows) and any(not r.saturated
                                                  for r in rows)
