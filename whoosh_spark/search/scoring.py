"""Scoring models: BM25F (default), TF_IDF, Frequency.

Formulas are value-identical to the reference
(/root/reference/src/whoosh/scoring.py):

  idf        = log(N / (df + 1)) + 1            (scoring.py:53-60; N = doc_count_all)
  bm25       = idf * (w*(K1+1)) / (w + K1*((1-B) + B*fl/avgfl))   (scoring.py:266-274)
  tf_idf     = w * idf                          (scoring.py:449-474)
  frequency  = w                                (scoring.py:443-446)

where w = tf * field_boost (token boosts default 1.0), fl is the
*byte-quantized* field length and avgfl = total_field_length /
doc_count_all (or 1). idf and avgfl are computed driver-side with Python
floats and injected as literals; the remaining ops mirror the reference's
evaluation order so IEEE-754 doubles come out bit-identical.

Non-scorable fields fall back to the raw weight (WeightScorer,
scoring.py:138-162).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

from whoosh_spark.index.quantize import BYTE_TO_LENGTH

def byte_to_length_col(len_byte: Column) -> Column:
    """Dequantize a len_byte column via a 256-entry literal array (stays in
    whole-stage codegen — no UDF, no join)."""
    arr = F.array(*[F.lit(int(v)) for v in BYTE_TO_LENGTH])
    return F.element_at(arr, len_byte + 1).cast("double")


class WeightingModel:
    def idf(self, doc_count_all: int, df: int) -> float:
        return math.log(doc_count_all / (df + 1)) + 1

    def score_col(self, w: Column, fl: Column, idf_col: Column, avgfl_col: Column,
                  b_col: Column, one_minus_b_col: Column, scorable: Column) -> Column:
        raise NotImplementedError

    def max_quality(self, idf: float, max_w: float, min_fl: float, avgfl: float, B: float, K1: float) -> float:
        """Driver-side upper bound for WAND pruning."""
        raise NotImplementedError


class BM25F(WeightingModel):
    def __init__(self, B: float = 0.75, K1: float = 1.2, **field_B: float):
        self.B = B
        self.K1 = K1
        self._field_B = {k[:-2]: v for k, v in field_B.items() if k.endswith("_B")}

    def field_B(self, fieldname: str) -> float:
        return self._field_B.get(fieldname, self.B)

    def score_col(self, w, fl, idf_col, avgfl_col, b_col, one_minus_b_col, scorable):
        K1 = self.K1
        # exact op order of reference bm25():
        #   idf * ((tf*(K1+1)) / (tf + K1*((1-B) + B*fl/avgfl)))
        bm25 = idf_col * ((w * F.lit(K1 + 1)) / (w + F.lit(K1) * (one_minus_b_col + b_col * fl / avgfl_col)))
        return F.when(scorable, bm25).otherwise(w)

    def score_py(self, idf: float, w: float, fl: float, avgfl: float, B: float) -> float:
        K1 = self.K1
        return idf * ((w * (K1 + 1)) / (w + K1 * ((1 - B) + B * fl / avgfl)))

    def max_quality(self, idf, max_w, min_fl, avgfl, B, K1=None):
        # monotone increasing in w, decreasing in fl (scoring.py:199-221)
        return self.score_py(idf, max_w, min_fl, avgfl, B)


class TF_IDF(WeightingModel):
    def score_col(self, w, fl, idf_col, avgfl_col, b_col, one_minus_b_col, scorable):
        return F.when(scorable, w * idf_col).otherwise(w)

    def max_quality(self, idf, max_w, min_fl, avgfl, B, K1=None):
        return max_w * idf


class Frequency(WeightingModel):
    def score_col(self, w, fl, idf_col, avgfl_col, b_col, one_minus_b_col, scorable):
        return w

    def max_quality(self, idf, max_w, min_fl, avgfl, B, K1=None):
        return max_w
