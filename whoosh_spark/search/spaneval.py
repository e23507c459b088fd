"""Physical evaluation of span queries (whoosh_spark/query/spans.py nodes).

A span frame is DataFrame(doc_id, spans: array<struct<start,end>>, score).
Docs with empty span lists are dropped at every step — the reference
SpanWrappingMatcher's skip-empty behavior (spans.py:183-239).

Set-like span filters (SpanFirst/Not/Contains/Before) are pure JVM
higher-order array expressions; only the SpanNear pairwise combination and
SpanOr's merge (which need the reference's exact accumulate semantics,
spans.py:465-491 and Span.merge at spans.py:92-119) run in an Arrow-batched
pandas UDF over the (tiny) per-doc span lists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.pandas.functions import pandas_udf

from whoosh_spark.query import nodes as Q
from whoosh_spark.query import spans as SQ

SPAN_T = T.ArrayType(
    T.StructType([T.StructField("start", T.IntegerType()), T.StructField("end", T.IntegerType())])
)


def _overlaps(a, b) -> bool:
    return not (a[1] < b[0] or b[1] < a[0])


def _merge_spans(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Span.merge: combine overlapping AND touching spans (reference
    spans.py:92-119 loop replicated)."""
    spans = list(spans)
    i = 0
    while i < len(spans) - 1:
        here = spans[i]
        j = i + 1
        while j < len(spans):
            there = spans[j]
            if there[0] > here[1] + 1:
                break
            touches = here[0] == there[1] + 1 or here[1] == there[0] - 1
            if touches or _overlaps(here, there):
                here = (min(here[0], there[0]), max(here[1], there[1]))
                spans[i] = here
                del spans[j]
            else:
                j += 1
        i += 1
    return spans


def _near_combine(aspans, bspans, slop: int, ordered: bool, mindist: int):
    """SpanNearMatcher._get_spans: pairwise combination (spans.py:465-491)."""
    found = set()
    for a0, a1 in aspans:
        for b0, b1 in bspans:
            if b1 < a0 - slop or (ordered and a0 > b0):
                continue
            if b0 > a1 + slop:
                break
            if _overlaps((a0, a1), (b0, b1)):
                dist = 0
            elif a1 < b0:
                dist = b0 - a1
            else:
                dist = a0 - b1
            if mindist <= dist <= slop:
                found.add((min(a0, b0), max(a1, b1)))
    return sorted(found)


def _as_pairs(cell) -> list[tuple[int, int]]:
    if cell is None:
        return []
    return [(int(s["start"]), int(s["end"])) for s in cell]


def _to_rows(pairs) -> list[dict]:
    return [{"start": s, "end": e} for s, e in pairs]


def _near_udf(slop: int, ordered: bool, mindist: int):
    @pandas_udf(SPAN_T)
    def combine(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [_to_rows(_near_combine(_as_pairs(a), _as_pairs(b), slop, ordered, mindist))
             for a, b in zip(sa, sb)]
        )

    return combine


@pandas_udf(SPAN_T)
def _or_merge_udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
    out = []
    for a, b in zip(sa, sb):
        spans = sorted(set(_as_pairs(a)) | set(_as_pairs(b)))
        out.append(_to_rows(_merge_spans(spans)))
    return pd.Series(out)


class SpanEval:
    """Compiles a span query tree against a prepared _PlanContext."""

    def __init__(self, plan):
        self.plan = plan

    # ---- frame algebra ----

    def _nonempty(self, df: DataFrame) -> DataFrame:
        return df.filter(F.size("spans") > 0)

    def _joined(self, a: DataFrame, b: DataFrame, how: str) -> DataFrame:
        l = a.select("doc_id", F.col("spans").alias("_sa"), F.col("score").alias("_xa"))
        r = b.select("doc_id", F.col("spans").alias("_sb"), F.col("score").alias("_xb"))
        return l.join(r, on="doc_id", how=how)

    def frame(self, q) -> DataFrame:
        if isinstance(q, Q.Term):
            base = self.plan.pos_base
            if base is None:
                return self._empty()
            df = base.filter((F.col("field") == q.field) & (F.col("term") == q.text))
            spans = F.transform(F.col("positions"), lambda p: F.struct(p.alias("start"), p.alias("end")))
            score = F.col("score") * F.lit(float(q.boost)) if q.boost != 1.0 else F.col("score")
            return df.select("doc_id", spans.alias("spans"), score.alias("score"))
        if isinstance(q, Q.ConstantScore):
            # constant-score multiterm expansion inside a span: positions
            # from the child union, score pinned (engine.py ConstantScore
            # semantics; boost NOT applied, as the reference multiterm quirk)
            child = self.frame(q.child)
            return child.select("doc_id", "spans", F.lit(float(q.score)).alias("score"))
        if isinstance(q, Q.Or):
            # UnionMatcher spans: sorted dedup union, scores sum (binary.py:221-234)
            return self._fold(q.subqueries, "full_outer", merge=False)
        if isinstance(q, Q.And):
            # IntersectionMatcher spans: sorted dedup union over docs in both
            return self._fold(q.subqueries, "inner", merge=False)
        if isinstance(q, SQ.SpanFirst):
            child = self.frame(q.q)
            spans = F.filter(F.col("spans"), lambda s: s["end"] <= F.lit(q.limit))
            return self._nonempty(child.select("doc_id", spans.alias("spans"), "score"))
        if isinstance(q, SQ.SpanNear):
            return self._near(self.frame(q.a), self.frame(q.b), q.slop, q.ordered, q.mindist)
        if isinstance(q, SQ.SpanNear2):
            acc = self.frame(q.qs[0])
            for c in q.qs[1:]:
                acc = self._near(acc, self.frame(c), q.slop, q.ordered, q.mindist)
            return acc
        if isinstance(q, SQ.SpanOr):
            acc = self.frame(q.subqs[0])
            for c in q.subqs[1:]:
                acc = self._or(acc, self.frame(c))
            return acc
        if isinstance(q, SQ.SpanNot):
            j = self._joined(self.frame(q.a), self.frame(q.b), "left")
            keep = F.filter(
                F.col("_sa"),
                lambda sa: ~F.exists(
                    F.col("_sb"),
                    lambda sb: (sa["start"] <= sb["end"]) & (sb["start"] <= sa["end"]),
                ),
            )
            spans = F.when(F.col("_sb").isNull(), F.col("_sa")).otherwise(keep)
            score = F.col("_xa") + F.coalesce(F.col("_xb"), F.lit(0.0))
            return self._nonempty(j.select("doc_id", spans.alias("spans"), score.alias("score")))
        if isinstance(q, SQ.SpanContains):
            j = self._joined(self.frame(q.a), self.frame(q.b), "inner")
            spans = F.filter(
                F.col("_sa"),
                lambda sa: F.exists(
                    F.col("_sb"),
                    lambda sb: (sb["start"] >= sa["start"]) & (sb["end"] <= sa["end"]),
                ),
            )
            return self._nonempty(
                j.select("doc_id", spans.alias("spans"), (F.col("_xa") + F.col("_xb")).alias("score"))
            )
        if isinstance(q, SQ.SpanBefore):
            j = self._joined(self.frame(q.a), self.frame(q.b), "inner")
            bmin = F.array_min(F.transform(F.col("_sb"), lambda s: s["start"]))
            spans = F.filter(F.col("_sa"), lambda sa: sa["end"] < bmin)
            return self._nonempty(
                j.select("doc_id", spans.alias("spans"), (F.col("_xa") + F.col("_xb")).alias("score"))
            )
        if isinstance(q, SQ.SpanCondition):
            j = self._joined(self.frame(q.a), self.frame(q.b), "inner")
            return j.select("doc_id", F.col("_sa").alias("spans"),
                            (F.col("_xa") + F.col("_xb")).alias("score"))
        raise TypeError(f"cannot evaluate {type(q).__name__} as a span query")

    def _fold(self, subqs, how: str, merge: bool) -> DataFrame:
        acc = self.frame(subqs[0])
        for c in subqs[1:]:
            j = self._joined(acc, self.frame(c), how)
            spans = F.array_sort(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("_sa"), F.array().cast(SPAN_T)),
                        F.coalesce(F.col("_sb"), F.array().cast(SPAN_T)),
                    )
                )
            )
            score = F.coalesce(F.col("_xa"), F.lit(0.0)) + F.coalesce(F.col("_xb"), F.lit(0.0))
            acc = j.select("doc_id", spans.alias("spans"), score.alias("score"))
        return acc

    def _near(self, a: DataFrame, b: DataFrame, slop: int, ordered: bool, mindist: int) -> DataFrame:
        j = self._joined(a, b, "inner")
        combine = _near_udf(slop, ordered, mindist)
        return self._nonempty(
            j.select(
                "doc_id",
                combine(F.col("_sa"), F.col("_sb")).alias("spans"),
                (F.col("_xa") + F.col("_xb")).alias("score"),
            )
        )

    def _or(self, a: DataFrame, b: DataFrame) -> DataFrame:
        j = self._joined(a, b, "full_outer")
        score = F.coalesce(F.col("_xa"), F.lit(0.0)) + F.coalesce(F.col("_xb"), F.lit(0.0))
        return self._nonempty(
            j.select("doc_id", _or_merge_udf(F.col("_sa"), F.col("_sb")).alias("spans"),
                     score.alias("score"))
        )

    def _empty(self) -> DataFrame:
        return self.plan.spark.createDataFrame(
            [], T.StructType(
                [T.StructField("doc_id", T.LongType()), T.StructField("spans", SPAN_T),
                 T.StructField("score", T.DoubleType())]
            )
        )


def span_frame(plan, q) -> DataFrame:
    """Public entry: DataFrame(doc_id, spans, score) for a span query."""
    return SpanEval(plan).frame(q)
