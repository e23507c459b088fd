from whoosh_spark.query.nodes import (
    And,
    AndMaybe,
    AndNot,
    ConstantScore,
    DisjunctionMax,
    Every,
    FuzzyTerm,
    Not,
    NullQuery,
    Or,
    Ordered,
    Otherwise,
    Phrase,
    Prefix,
    Query,
    Regex,
    Require,
    Term,
    TermRange,
    Wildcard,
)

__all__ = [
    "Query", "Term", "And", "Or", "Not", "AndNot", "AndMaybe", "Require",
    "Otherwise", "Ordered", "DisjunctionMax", "Phrase", "Prefix", "Wildcard", "Regex",
    "FuzzyTerm", "TermRange", "Every", "ConstantScore", "NullQuery",
]
