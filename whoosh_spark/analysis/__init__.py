from whoosh_spark.analysis.tokenize import (
    LANG_ALIASES,
    STOP_WORDS,
    Analyzer,
    fancy_analyzer,
    id_analyzer,
    language_analyzer,
    path_analyzer,
    simple_analyzer,
    standard_analyzer,
    stemming_analyzer,
)

__all__ = [
    "STOP_WORDS", "LANG_ALIASES", "Analyzer", "standard_analyzer",
    "stemming_analyzer", "fancy_analyzer", "simple_analyzer", "id_analyzer",
    "language_analyzer", "path_analyzer",
]
