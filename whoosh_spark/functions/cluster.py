"""K-means clustering as a Spark batch utility.

Capability-parallel to the reference's 1-D ``kmeans`` batch helper
(/root/reference/src/whoosh/classify.py:265-332, Lloyd's algorithm with a
squared-euclidean objective and a tolerance/maxiter stop rule), re-expressed
for scale: each iteration is ONE map-side assignment against broadcast
centers plus ONE groupBy-mean shuffle; only the k centroids and the scalar
error ever reach the driver. Works on a scalar double column (the
reference's case) or an array<double> embedding column (the IVF-training
case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dist2_scalar(x, c):
    return (x - F.lit(float(c))) ** 2


def _dist2_vec(x, c):
    arr = F.array(*[F.lit(float(v)) for v in c])
    return F.aggregate(
        F.zip_with(x, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda s, v: s + v,
    )


def kmeans(
    df: DataFrame,
    col: str,
    k: int,
    centers: list,
    t: float = 0.0001,
    maxiter: int = 50,
    id_col: str | None = None,
) -> tuple[DataFrame, list]:
    """Lloyd's k-means over ``df[col]``.

    Same stop rule as the reference (|error - old_error| < t, or more than
    maxiter iterations) and the same empty-cluster behavior (an empty
    cluster keeps a 0/sum centroid). ``centers`` is required — the
    reference falls back to random.sample, which has no place in a
    deterministic distributed job; pass your own seeds (e.g. the first k
    distinct values).

    Returns (assignments DataFrame with a ``label`` column, final centers).
    Scalar column -> scalar centers; array column -> list-of-list centers.
    """
    from pyspark.sql import types as T

    # the schema knows the column shape — a first() here would launch a
    # whole Spark job just to sniff the type
    is_vec = isinstance(df.schema[col].dataType, T.ArrayType)
    dist2 = _dist2_vec if is_vec else _dist2_scalar
    c = [list(x) if is_vec else float(x) for x in centers]
    if len(c) != k:
        raise ValueError(f"need {k} centers, got {len(c)}")

    def assign(centers_now):
        # argmin via array_min over (dist, cell) structs: smallest distance,
        # ties -> smallest cell (the reference's first-minimum-wins loop).
        # A when-chain here would DUPLICATE each k-term distance subtree
        # O(k^2) times and blow up Catalyst analysis.
        entries = F.array(*[
            F.struct(dist2(F.col("_x"), ci).alias("d"), F.lit(i).alias("cell"))
            for i, ci in enumerate(centers_now)
        ])
        best = F.array_min(entries)
        return base.withColumn("label", best["cell"]).withColumn("_d", best["d"])

    base = df.select(*( [id_col] if id_col else [] ), F.col(col).alias("_x"))
    error = float("inf")
    niter = 0
    while True:
        old_error = error
        assigned = assign(c)
        if is_vec:
            agg = assigned.groupBy("label").agg(
                F.count("*").alias("n"),
                F.array(*[
                    F.sum(F.element_at(F.col("_x"), i + 1)).alias(f"s{i}")
                    for i in range(len(c[0]))
                ]).alias("s"),
                F.sum("_d").alias("err"),
            )
        else:
            agg = assigned.groupBy("label").agg(
                F.count("*").alias("n"),
                F.sum("_x").alias("s"),
                F.sum("_d").alias("err"),
            )
        rows = {r["label"]: r for r in agg.collect()}
        error = sum(float(r["err"]) for r in rows.values())
        for i in range(k):
            r = rows.get(i)
            if r is None:
                c[i] = [0.0] * len(c[0]) if is_vec else 0.0
            elif is_vec:
                c[i] = [float(s) / r["n"] for s in r["s"]]
            else:
                c[i] = float(r["s"]) / r["n"]
        niter += 1
        if abs(error - old_error) < t or niter > maxiter:
            break

    # the reference's returned labels are the LAST iteration's assignment
    # (computed against that iteration's pre-update centers); `assigned`
    # captured those centers as literals, so it is exactly that
    return assigned.drop("_d"), c
