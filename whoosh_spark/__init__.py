"""whoosh_spark — a PySpark-native full-text index + BM25F query engine.

A from-scratch, Spark-first rebuild of the capabilities of the Whoosh
full-text search library (reference: /root/reference, mchaput/whoosh):

- index build: analyzer chain (RegexTokenizer | LowercaseFilter | StopFilter)
  in vectorized Arrow/pandas UDFs -> explode to (term, docID, tf, positions)
  -> delta+varint, block-skippable posting lists built with a skew-proof
  doc-bucketed groupBy -> sorted Parquet posting segments with manifests,
  log-structured tiered merges and per-partition lineage for resume.
- query: a query algebra (Term/And/Or/Not/AndNot/AndMaybe/Require/Phrase/
  Prefix/Wildcard/Regex/TermRange/Every/DisMax/Boost...) planned onto
  DataFrame joins/aggregations, BM25F scoring (B=0.75, K1=1.2) that is
  rank- and score-identical to Whoosh, block-max WAND candidate pruning,
  top-k with Whoosh tie-breaking (score desc, docID asc).

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; Python appears only inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from whoosh_spark.index import (Index, build_index, create_in, exists_in,
                                open_dir)
from whoosh_spark.schema import (BOOLEAN, DATETIME, ID, KEYWORD, NGRAM,
                                 NGRAMWORDS, NUMERIC, STORED, TEXT,
                                 IndexSchema)

__all__ = [
    "IndexSchema", "TEXT", "ID", "KEYWORD", "NUMERIC", "DATETIME",
    "BOOLEAN", "NGRAM", "NGRAMWORDS", "STORED",
    "Index", "build_index", "create_in", "open_dir", "exists_in",
    "__version__",
]
