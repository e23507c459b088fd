"""WordNet thesaurus (wn_s.pl) parsing + synonym query expansion —
capability parity with the reference's ``whoosh.lang.wordnet``
(/root/reference/src/whoosh/lang/wordnet.py). The parser keeps the
reference's exact semantics (``s(...)`` lines only, word lowercased,
non-alpha words skipped); the storage side is Spark-first: instead of a
dedicated Whoosh index the synonym table persists as an ordinary Parquet
table (word, syns) that joins/broadcasts like any dimension table.

The WordNet data file itself is NOT bundled (Princeton download, same as
the reference); tests feed a synthetic wn_s.pl snippet to both engines.
"""

from __future__ import annotations

from collections import defaultdict


def parse_file(f):
    """wn_s.pl lines -> (word2nums, num2words); reference parse_file
    semantics bit-for-bit (wordnet.py:42-68)."""
    word2nums = defaultdict(list)
    num2words = defaultdict(list)
    for line in f:
        if not line.startswith("s("):
            continue
        line = line[2:]
        num = int(line[: line.find(",")])
        qt = line.find("'")
        line = line[qt + 1:]
        qt = line.find("'")
        word = line[:qt].lower()
        if not word.isalpha():
            continue
        word2nums[word].append(num)
        num2words[num].append(word)
    return word2nums, num2words


def synonyms(word2nums, num2words, word: str) -> list[str]:
    """Sorted synonyms of ``word`` across all its synsets, excluding the
    word itself (reference wordnet.py:86-98)."""
    syns: set = set()
    for key in word2nums[word]:
        syns = syns.union(num2words[key])
    syns.discard(word)
    return sorted(syns)


class Thesaurus:
    """In-memory thesaurus with optional Parquet persistence.

    >>> t = Thesaurus.from_filename("wn_s.pl")
    >>> t.synonyms("hail")
    >>> t.to_parquet(spark, "syns.parquet")   # Spark-side storage
    >>> t2 = Thesaurus.from_parquet(spark, "syns.parquet")
    """

    def __init__(self):
        self.w2n = None
        self.n2w = None
        self._syn_cache: dict | None = None

    @classmethod
    def from_file(cls, f) -> "Thesaurus":
        t = cls()
        t.w2n, t.n2w = parse_file(f)
        return t

    @classmethod
    def from_filename(cls, path: str) -> "Thesaurus":
        with open(path, encoding="utf-8", errors="replace") as f:
            return cls.from_file(f)

    def synonyms(self, word: str) -> list[str]:
        word = word.lower()
        if self._syn_cache is not None:
            return self._syn_cache.get(word, [])
        return synonyms(self.w2n, self.n2w, word)

    # ---- Spark-side storage (the make_index/to_storage analog) ----

    def to_parquet(self, spark, path: str) -> None:
        """Persist (word, syns) to Parquet — the reference's make_index
        writes a (word ID, syns STORED) Whoosh index; a Parquet dimension
        table is the Spark-native equivalent (broadcastable at query
        time)."""
        rows = [(w, synonyms(self.w2n, self.n2w, w)) for w in self.w2n]
        spark.createDataFrame(rows, "word string, syns array<string>") \
            .repartition(1).sortWithinPartitions("word") \
            .write.mode("overwrite").parquet(path)

    @classmethod
    def from_parquet(cls, spark, path: str) -> "Thesaurus":
        t = cls()
        t._syn_cache = {
            r["word"]: list(r["syns"])
            for r in spark.read.parquet(path).collect()
        }
        return t

    def expand_query(self, fieldname: str, word: str, boost: float = 1.0):
        """Or(word, *synonyms) — the query-expansion pattern the reference
        documents for Thesaurus (each synonym as a Term)."""
        import whoosh_spark.query as Q

        terms = [Q.Term(fieldname, word, boost=boost)]
        terms += [Q.Term(fieldname, s, boost=boost) for s in self.synonyms(word)]
        return Q.Or(terms) if len(terms) > 1 else terms[0]
