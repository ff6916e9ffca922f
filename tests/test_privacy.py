"""Privacy operator semantics on crafted tables (the DuckDB oracles cover
cross-engine parity on the customer table; these pin the math)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from commerce_sessionization_spark.operators.privacy import (
    dp_noisy_counts,
    k_anonymity_report,
    k_anonymize,
    l_diversity_report,
    laplace_noise,
)


@pytest.fixture(scope="module")
def people(spark):
    # (city, job) quasi-identifier; salary sensitive
    rows = [
        # class A: 3 members, diverse salaries
        (1, "ny", "eng", 100),
        (2, "ny", "eng", 120),
        (3, "ny", "eng", 140),
        # class B: 2 members, constant salary
        (4, "sf", "eng", 200),
        (5, "sf", "eng", 200),
        # class C: singleton
        (6, "la", "law", 300),
    ]
    return spark.createDataFrame(
        rows, "id long, city string, job string, salary long"
    )


def test_k_anonymity_report_flags_small_classes(people):
    viol = {
        (r.city, r.job): r.qi_count
        for r in k_anonymity_report(people, ["city", "job"], k=3).collect()
    }
    assert viol == {("sf", "eng"): 2, ("la", "law"): 1}


def test_k_anonymize_suppresses_only_small_classes(people):
    out = {r.id: r for r in k_anonymize(people, ["city", "job"], k=3).collect()}
    # large class keeps stringified QI values
    assert (out[1].city, out[1].job) == ("ny", "eng")
    # small classes fully redacted, non-QI columns untouched
    for i in (4, 5, 6):
        assert (out[i].city, out[i].job) == ("*", "*")
    assert out[6].salary == 300
    # column order and count preserved
    assert list(out[1].asDict()) == ["id", "city", "job", "salary"]


def test_l_diversity_flags_constant_sensitive_class(people):
    viol = {
        (r.city, r.job): (r.qi_count, r.n_sensitive)
        for r in l_diversity_report(
            people, ["city", "job"], "salary", l=2
        ).collect()
    }
    # class B is 2-anonymous at k=2 but its salary is constant -> leaks
    assert viol == {("sf", "eng"): (2, 1), ("la", "law"): (1, 1)}


def test_laplace_noise_deterministic_and_distributed(spark):
    df = spark.range(4000).select(F.col("id").cast("string").alias("k"))
    n1 = df.select(laplace_noise(F.col("k"), 1.0, "s1").alias("x")).collect()
    n2 = df.select(laplace_noise(F.col("k"), 1.0, "s1").alias("x")).collect()
    assert [r.x for r in n1] == [r.x for r in n2]  # pure function of (seed, key)
    xs = sorted(r.x for r in n1)
    assert all(math.isfinite(x) for x in xs)
    # Laplace(0, 1): median ~0, P(|x| > ln(2)=0.693) = 0.5, mean |x| = 1
    n = len(xs)
    med = (xs[n // 2 - 1] + xs[n // 2]) / 2
    assert abs(med) < 0.1
    big = sum(1 for x in xs if abs(x) > math.log(2.0)) / n
    assert 0.45 < big < 0.55
    mean_abs = sum(abs(x) for x in xs) / n
    assert 0.9 < mean_abs < 1.1
    # scale acts linearly on the same uniforms
    n3 = df.select(laplace_noise(F.col("k"), 2.0, "s1").alias("x")).collect()
    assert all(abs(b.x - 2 * a.x) < 1e-12 for a, b in zip(n1, n3))


def test_dp_noisy_counts_bias_and_exactness(people):
    out = {
        (r.city, r.job): r
        for r in dp_noisy_counts(people, ["city", "job"], epsilon=1.0).collect()
    }
    assert out[("ny", "eng")].exact_count == 3
    for r in out.values():
        assert math.isfinite(r.noisy_count)
        assert r.noisy_count != r.exact_count  # noise actually applied


def test_k_anonymize_redacts_null_qi_singletons(spark):
    """NULL QI values form their own equivalence class; a singleton with
    a NULL component must be redacted, not silently passed through."""
    rows = [
        (1, None, "eng", 100),
        (2, "ny", "eng", 120),
        (3, "ny", "eng", 140),
        (4, "ny", "eng", 160),
    ]
    df = spark.createDataFrame(
        rows, "id long, city string, job string, salary long"
    )
    out = {r.id: r for r in k_anonymize(df, ["city", "job"], k=3).collect()}
    assert (out[1].city, out[1].job) == ("*", "*")  # NULL-QI singleton
    assert (out[2].city, out[2].job) == ("ny", "eng")
    # two NULL-QI rows still below k -> both redacted
    rows2 = rows + [(5, None, "eng", 99)]
    df2 = spark.createDataFrame(
        rows2, "id long, city string, job string, salary long"
    )
    out2 = {r.id: r for r in k_anonymize(df2, ["city", "job"], k=3).collect()}
    assert (out2[1].city, out2[5].city) == ("*", "*")


def test_dp_noise_key_is_injective_across_groups(spark):
    """(NULL,'x') vs ('x',NULL) and delimiter-bearing values must draw
    DIFFERENT noise — the collision the prefix-free encoding prevents."""
    df = spark.createDataFrame(
        [(None, "x"), ("x", None), ("a|b", "c"), ("a", "b|c")],
        "g1 string, g2 string",
    )
    out = dp_noisy_counts(df, ["g1", "g2"], epsilon=1.0).collect()
    noises = [r.noisy_count - r.exact_count for r in out]
    assert len(set(noises)) == len(noises), noises


def test_noise_key_encoding_is_injective_property(spark):
    """Property: the prefix-free per-column encoding maps distinct group
    tuples (including NULLs and delimiter-bearing strings) to distinct
    keys — checked over an adversarial value pool crossed with itself."""
    from itertools import product

    from commerce_sessionization_spark.operators.privacy import (
        _enc_key_part,
    )
    from pyspark.sql import functions as F

    pool = [None, "", "n", "v", ":", "|", "a", "a|b", "b|c", "v1:", "10",
            "1", "0:", "v0:"]
    rows = [(a, b) for a, b in product(pool, pool)]
    df = spark.createDataFrame(rows, "g1 string, g2 string")
    keys = [
        r.key
        for r in df.select(
            F.concat(_enc_key_part("g1"), _enc_key_part("g2")).alias("key")
        ).collect()
    ]
    assert len(set(keys)) == len(rows), "encoding collision"
