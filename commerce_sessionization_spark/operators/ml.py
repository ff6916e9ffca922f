"""Distributed model fitting via sufficient statistics (north-star ML).

The pattern every scalable closed-form fit shares (and the one k-means
and the OLS-trend query already use): the 100 TB scan reduces to a tiny
mergeable state — here the normal-equation moments X'X (d×d) and X'y
(d) — and the driver solves the d-dimensional system with numpy, the
model-state pattern (d ≤ a few thousand; state is O(d²) floats,
independent of row count). One aggregation pass, map-side combinable,
no gradient iterations, no per-row Python.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_ridge_regression(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    l2: float = 0.0,
    fit_intercept: bool = True,
):
    """Closed-form (ridge) linear regression from ONE scan.

    Accumulates the upper triangle of X'X plus X'y as
    d(d+1)/2 + d + 1 plain double sums (an intercept is a constant-1
    feature), then solves (X'X + λI)w = X'y on the driver. The
    aggregate is map-side combinable — the only data movement is the
    1-row partial-state merge — so the fit costs exactly one pass at
    any scale. Double sums make the result order-dependent in the last
    ulps (unlike the engine's oracle-paired decimal queries); model
    fitting tolerates that, and tests pin recovery of planted weights
    to float tolerance instead of hashes.

    Returns ``(weights: np.ndarray[d], intercept: float)``; the
    intercept is 0.0 when ``fit_intercept=False``. λ is not applied to
    the intercept row (standard ridge convention).
    """
    cols = list(feature_cols)
    if not cols:
        raise ValueError("need at least one feature column")
    xs = [F.col(c).cast("double") for c in cols]
    if fit_intercept:
        xs = xs + [F.lit(1.0)]
    y = F.col(target_col).cast("double")
    d = len(xs)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"xx_{i}_{j}"))
        aggs.append(F.sum(xs[i] * y).alias(f"xy_{i}"))
    row = df.agg(*aggs).collect()[0]
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"]
        xty[i] = row[f"xy_{i}"]
    if l2:
        reg = np.eye(d) * float(l2)
        if fit_intercept:
            reg[d - 1, d - 1] = 0.0  # don't shrink the intercept
        xtx = xtx + reg
    w = np.linalg.solve(xtx, xty)
    if fit_intercept:
        return w[:-1], float(w[-1])
    return w, 0.0


def apply_linear_model(
    df: DataFrame,
    feature_cols: list[str],
    weights,
    intercept: float = 0.0,
    out_col: str = "prediction",
) -> DataFrame:
    """Score rows with a fitted linear model as a pure column expression
    (JVM-side, codegen): prediction = Σ wᵢ·xᵢ + b. The inference twin of
    ``fit_ridge_regression`` — broadcastable scalars, zero shuffles."""
    expr = F.lit(float(intercept))
    for c, w in zip(feature_cols, weights):
        expr = expr + F.col(c).cast("double") * F.lit(float(w))
    return df.withColumn(out_col, expr)


def vector_sufficient_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    quantize_scale: int = 9,
) -> DataFrame:
    """One-pass mergeable sufficient statistics for a vector column:
    n, Σxᵢ per dimension, and Σxᵢxⱼ per upper-triangle pair — the state
    PCA / covariance / whitening need, O(d²) and independent of rows.

    Engine-replayable by construction: each component is snapped to an
    integer grid (``floor(x·10^scale)`` — one double multiply + floor,
    bit-identical in any IEEE engine, no decimal-cast rounding-rule
    dependence at all), and every sum is EXACT integer arithmetic,
    which is order-independent, unlike double sums.

    Round-11 accumulation fast path (same values, ~half the cost): a
    cheap narrow pre-scan takes max|cell| over the quantized grid; when
    every product fits 63 bits — |cell| ≤ 3 037 000 499 =
    floor(sqrt(2^63−1)), i.e. |x| ≲ 3.03 at the default scale 9, true
    for unit-style embeddings — cells and products live in LONGs. Each
    product splits into ``hi = p div 10^9`` / ``lo = p % 10^9`` (trunc
    div/mod, so ``p = hi·10^9 + lo`` exactly, signs included); hi and
    lo sum as plain longs per (moment, scan-partition) — a
    map-task-bounded total (< 2^63 while one scan task holds < ~10^9
    rows, i.e. any sane split size) — and only the per-task partials
    merge in ``decimal(38,0)``. The reconstruction
    ``Σp = 10^9·Σhi + Σlo`` is exact integer algebra, so the output is
    bit-identical to the all-decimal(38) accumulation (oracle
    hash-verified) while the BigDecimal adds drop from one per cell to
    one per task. Vectors outside the long domain keep the decimal
    path: identical values either way, only the accumulator type — and
    the pre-scan cost (one scan, no explode) — differ.

    The plan is the scalable one, not the obvious one: the per-row
    upper-triangle product array is built JVM-side with nested
    ``transform`` over ``sequence`` (no 2000-expression aggregate, no
    self-join on row id), then ONE ``posexplode`` feeds a two-level
    aggregate — partial map-side combine reduces every partition to
    d(d+3)/2 rows before the only shuffle.

    Output: long-form ``(i, j, s)`` where j = -1 rows carry Σxᵢ and
    i = -1, j = -1 carries n; i ≤ j rows carry Σxᵢxⱼ. Sums are on the
    scaled-integer grid (divide by 10^scale per factor to recover
    units). 1-indexed dimensions (matches SQL ``generate_subscripts``).
    """
    grid = float(10 ** quantize_scale)
    # floor(sqrt(2^63 - 1)): products of such cells always fit a long
    _B = 3_037_000_499
    cell = lambda x: F.floor(x.cast("double") * F.lit(grid))  # noqa: E731
    vq_long = F.transform(F.col(vec_col), lambda x: cell(x).cast("long"))
    # narrow pre-scan (no explode): does every cell sit inside the
    # long-product domain? Chooses the accumulator type only — both
    # branches compute the identical integer sums.
    mx_row = df.select(
        F.max(
            F.array_max(F.transform(vq_long, lambda v: F.abs(v)))
        ).alias("mx")
    ).collect()[0]
    long_ok = mx_row["mx"] is not None and int(mx_row["mx"]) <= _B
    if long_ok:
        df = df.select(vq_long.alias("_v"))
    else:
        df = df.select(
            F.transform(
                F.col(vec_col), lambda x: cell(x).cast("decimal(19,0)")
            ).alias("_v")
        )
    if dim is None:
        dim = df.select(F.size("_v").alias("d")).limit(1).collect()[0]["d"]
    d = int(dim)
    # [x_1..x_d] ++ flatten([x_i*x_j for i<=j]) — one array per row.
    idx = F.sequence(F.lit(1), F.lit(d))
    moments = F.concat(
        F.col("_v"),
        F.flatten(
            F.transform(
                idx,
                lambda i: F.transform(
                    F.sequence(i, F.lit(d)),
                    lambda j: F.element_at("_v", i.cast("int"))
                    * F.element_at("_v", j.cast("int")),
                ),
            )
        ),
    )
    if long_ok:
        _SPLIT = 10 ** 9
        exploded = df.select(
            F.spark_partition_id().alias("_pid"),
            F.posexplode(moments).alias("_k", "_x"),
        ).select(
            "_pid",
            "_k",
            F.expr(f"_x div {_SPLIT}").alias("_hi"),
            (F.col("_x") % F.lit(_SPLIT)).alias("_lo"),
        )
        # level 1: long sums per (moment, scan task) — grouping on the
        # task's own partition id makes every group single-task, so the
        # partial totals stay inside the documented long bound; level 2
        # merges the few per-task partials in decimal and reconstructs
        # Σp = 10^9·Σhi + Σlo exactly.
        part = exploded.groupBy("_k", "_pid").agg(
            F.sum("_hi").alias("_phi"),
            F.sum("_lo").alias("_plo"),
            F.count(F.lit(1)).alias("_pn"),
        )
        sums = part.groupBy("_k").agg(
            (
                F.sum(F.col("_phi").cast("decimal(38,0)")) * F.lit(_SPLIT)
                + F.sum(F.col("_plo").cast("decimal(38,0)"))
            ).cast("decimal(38,0)").alias("s"),
            F.sum("_pn").alias("_n"),
        )
    else:
        # wide-domain fallback: the pre-round all-decimal accumulation
        exploded = df.select(F.posexplode(moments).alias("_k", "_x"))
        sums = exploded.groupBy("_k").agg(
            F.sum(F.col("_x").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("_n"),
        )
    # Decode flat index k (0-based) -> (i, j). First d entries are means.
    k = F.col("_k")
    is_mean = k < F.lit(d)
    # pair block: k' = k - d; row i (0-based) starts at offset
    # i*d - i*(i-1)/2; invert with the triangular-number formula.
    kp = (k - F.lit(d)).cast("double")
    i0 = F.floor(
        (F.lit(2 * d + 1) - F.sqrt(F.lit(float((2 * d + 1) ** 2)) - 8 * kp))
        / F.lit(2.0)
    ).cast("long")
    j0 = (k - F.lit(d)) - (i0 * F.lit(d) - i0 * (i0 - 1) / F.lit(2)) + i0
    stats = sums.select(
        F.when(is_mean, k + 1).otherwise(i0 + 1).cast("long").alias("i"),
        F.when(is_mean, F.lit(-1)).otherwise(j0 + 1).cast("long").alias("j"),
        F.col("s").cast("decimal(38,0)").alias("s"),
        F.col("_n").alias("_n"),
    )
    n_row = stats.filter(F.col("i") == 1).limit(1).select(
        F.lit(-1).cast("long").alias("i"),
        F.lit(-1).cast("long").alias("j"),
        F.col("_n").cast("decimal(38,0)").alias("s"),
        F.col("_n").alias("_n"),
    )
    return stats.unionByName(n_row).select("i", "j", "s")


def covariance_from_stats(
    stats: DataFrame, quantize_scale: int = 9
) -> DataFrame:
    """(i, j, cov) population covariance matrix (upper triangle) from
    ``vector_sufficient_stats`` output: cov = (n·Σxy − Σx·Σy)/n² (then
    /10^2·scale back to input units). The exact decimal sums are cast
    to double FIRST, so the final arithmetic runs on identical operands
    in any engine (decimal multiply overflow rules differ across
    engines; double ops don't). Three broadcast-sized joins over a
    d(d+3)/2-row relation."""
    n = stats.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").cast("double").alias("_count")
    )
    means = stats.filter((F.col("j") == -1) & (F.col("i") > 0)).select(
        F.col("i").alias("_mi"), F.col("s").cast("double").alias("_sx")
    )
    pairs = stats.filter(F.col("j") > 0).select(
        "i", "j", F.col("s").cast("double").alias("_sxy")
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .join(F.broadcast(means).withColumnRenamed("_mi", "i").withColumnRenamed("_sx", "_sa"), "i")
        .join(F.broadcast(means).withColumnRenamed("_mi", "j").withColumnRenamed("_sx", "_sb"), "j")
        .select(
            "i",
            "j",
            (
                (F.col("_count") * F.col("_sxy") - F.col("_sa") * F.col("_sb"))
                / (F.col("_count") * F.col("_count"))
                / F.lit(float(10 ** (2 * quantize_scale)))
            ).alias("cov"),
        )
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    dim: int | None = None,
    quantize_scale: int = 9,
):
    """PCA from one distributed pass: covariance via
    ``vector_sufficient_stats`` (the only scan), then a d×d ``eigh`` on
    the driver — the model-state pattern again (d ≤ a few thousand).

    Sign convention: each component is flipped so its
    largest-magnitude coordinate is positive, making the fit
    deterministic across LAPACK builds.

    Returns ``(components: np.ndarray[k, d], mean: np.ndarray[d],
    explained_variance: np.ndarray[k])``, eigenvalue-descending.
    """
    # quantize_scale is forwarded and the grid derived from it (ADVICE
    # r8): a hardcoded grid=1e9 silently coupled to the stats default.
    stats = vector_sufficient_stats(
        df, vec_col, dim=dim, quantize_scale=quantize_scale
    ).collect()
    grid = 10.0 ** quantize_scale
    d = max(r.j for r in stats)
    n = float(next(r.s for r in stats if r.i == -1))
    mean = np.zeros(d)
    sxy = np.zeros((d, d))
    for r in stats:
        if r.i == -1:
            continue
        if r.j == -1:
            mean[r.i - 1] = float(r.s)
        else:
            sxy[r.i - 1, r.j - 1] = sxy[r.j - 1, r.i - 1] = float(r.s)
    cov = (n * sxy - np.outer(mean, mean)) / (n * n) / (grid * grid)
    mean = mean / n / grid
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for c in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[c]))
        if comps[c, m] < 0:
            comps[c] = -comps[c]
    return comps, mean, vals[order]


def pca_project(
    df: DataFrame,
    components,
    mean,
    vec_col: str = "embedding",
    out_col: str = "pca",
    center: bool = True,
    explained_variance=None,
    eps: float = 0.0,
) -> DataFrame:
    """Project vectors onto fitted components as pure column
    expressions: yₖ = Σᵢ (xᵢ − μᵢ)·wₖᵢ via ``zip_with`` +
    ``aggregate`` over literal weight arrays — JVM-side, zero
    shuffles, broadcast-free (the model rides the plan as literals,
    exactly like ``apply_linear_model``).

    ``center=False`` skips the mean shift (yₖ = Σᵢ xᵢ·wₖᵢ): translation
    changes angles, so COSINE search over compressed vectors must
    project uncentered — centering is for L2 / reconstruction /
    whitening uses. Pinned by the PCA-vs-JL recall test.

    ``explained_variance`` (the eigenvalues from ``pca_fit``) turns the
    projection into PCA WHITENING: yₖ /= sqrt(λₖ + ε), giving
    unit-variance decorrelated coordinates — the normalization step
    before Mahalanobis-style distances or feature standardization."""
    v = F.col(vec_col).cast("array<double>")
    if center:
        mu = F.array(*[F.lit(float(m)) for m in mean])
        centered = F.zip_with(v, mu, lambda x, m: x - m)
    else:
        centered = v
    outs = []
    for ci, comp in enumerate(components):
        w = F.array(*[F.lit(float(v)) for v in comp])
        y = F.aggregate(
            F.zip_with(centered, w, lambda x, wv: x * wv),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if explained_variance is not None:
            y = y / F.lit(float((explained_variance[ci] + eps) ** 0.5))
        outs.append(y.alias(f"_pc{ci}"))
    return df.withColumn(out_col, F.array(*outs))
