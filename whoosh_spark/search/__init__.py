from whoosh_spark.search.scoring import BM25F, TF_IDF, Frequency
from whoosh_spark.search.engine import Searcher

__all__ = ["Searcher", "BM25F", "TF_IDF", "Frequency"]
