from whoosh_spark.search.scoring import BM25F, TF_IDF, Frequency
from whoosh_spark.search.engine import Searcher
from whoosh_spark.search.batch import (
    batch_term_search,
    batch_conjunctive_search,
    batch_wand_search,
    batch_phrase_search,
    batch_prefix_search,
    batch_fuzzy_search,
    batch_multiterm_search,
    batch_search,
)
from whoosh_spark.search.results import Hit, Results, ResultsPage
from whoosh_spark.search.highlight import (
    HtmlFormatter,
    NullFormatter,
    UppercaseFormatter,
    add_highlights,
    highlight_text,
)

__all__ = [
    "Searcher", "BM25F", "TF_IDF", "Frequency",
    "Results", "ResultsPage", "Hit",
    "batch_term_search", "batch_conjunctive_search", "batch_wand_search",
    "batch_phrase_search", "batch_prefix_search", "batch_fuzzy_search",
    "batch_multiterm_search", "batch_search",
    "highlight_text", "add_highlights",
    "HtmlFormatter", "UppercaseFormatter", "NullFormatter",
]
