from whoosh_spark.analysis.tokenize import (
    STOP_WORDS,
    Analyzer,
    standard_analyzer,
    stemming_analyzer,
    fancy_analyzer,
    simple_analyzer,
    id_analyzer,
)

__all__ = ["STOP_WORDS", "Analyzer", "standard_analyzer", "stemming_analyzer", "fancy_analyzer", "simple_analyzer", "id_analyzer"]
