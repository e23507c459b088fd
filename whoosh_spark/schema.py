"""Index schema: field types and per-field indexing config.

Capability-parallel to the reference schema system
(/root/reference/src/whoosh/fields.py:60-357, 1315-1535) but reduced to the
Spark data model: the *document table* is an ordinary DataFrame; a field
type only decides which derived tables a column feeds (postings / lengths /
stored) and with which analyzer.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field as dc_field

from whoosh_spark.analysis import Analyzer, id_analyzer, standard_analyzer


@dataclass(frozen=True)
class FieldType:
    analyzer: Analyzer | None = None
    #: optional distinct analyzer for query-time analysis (the reference
    #: MultiFilter's index/query modes, analysis/morph.py MultiFilter);
    #: None -> use ``analyzer`` for both
    query_analyzer: "Analyzer | None" = None
    indexed: bool = True
    stored: bool = False
    unique: bool = False
    scorable: bool = False  # record lengths + use BM25
    phrase: bool = False  # record positions
    #: store per-position char offsets in postings (reference Characters /
    #: CharacterBoosts formats, formats.py:264-338,406-481); implies phrase
    chars: bool = False
    #: store per-position boosts in postings (reference PositionBoosts /
    #: CharacterBoosts formats, formats.py:339-481); implies phrase. The
    #: posting WEIGHT is the boost sum either way (the weight channel);
    #: this flag additionally makes the per-occurrence boosts retrievable
    #: (value_as("position_boosts") analog).
    pos_boosts: bool = False
    vector: bool = False  # store per-doc term vectors (reference vector=True)
    #: index unstemmed words into a separate ``spell_<name>`` lexicon when
    #: the analyzer is morphic (reference fields.py:1132-1148 subfields/
    #: separate_spelling); suggest() then reads original word forms
    spelling: bool = False
    #: how a single query word that ANALYZES to several tokens becomes a
    #: query (reference fields.py multitoken_query): "default" = the
    #: parser's group, "and", "or", "phrase", "first"
    multitoken_query: str = "default"
    field_boost: float = 1.0
    kind: str = "text"

    def separate_spelling(self) -> bool:
        return bool(self.spelling and self.analyzer is not None
                    and (self.analyzer.stem or self.analyzer.lang_stem
                         or self.analyzer.alt_stem
                         or self.analyzer.dmetaphone))

    def spelling_fieldname(self, name: str) -> str:
        return ("spell_" + name) if self.separate_spelling() else name


def TEXT(stored: bool = False, phrase: bool = True, analyzer: Analyzer | None = None,
         field_boost: float = 1.0, vector: bool = False,
         spelling: bool = False, chars: bool = False,
         pos_boosts: bool = False) -> FieldType:
    """``chars``/``pos_boosts`` select the reference's Characters /
    PositionBoosts formats (both -> CharacterBoosts); either implies
    phrase=True, like reference TEXT(chars=True) (fields.py:1103-1108)."""
    return FieldType(
        analyzer=analyzer or standard_analyzer(),
        indexed=True,
        stored=stored,
        scorable=True,
        phrase=phrase or chars or pos_boosts,
        chars=chars,
        pos_boosts=pos_boosts,
        vector=vector,
        spelling=spelling,
        field_boost=field_boost,
        kind="text",
    )


def ID(stored: bool = False, unique: bool = False, lowercase: bool = False) -> FieldType:
    return FieldType(
        analyzer=id_analyzer(lowercase=lowercase),
        indexed=True,
        stored=stored,
        unique=unique,
        scorable=False,
        phrase=False,
        kind="id",
    )


def KEYWORD(stored: bool = False, lowercase: bool = False, commas: bool = False,
            scorable: bool = False) -> FieldType:
    """Space- or comma-separated keyword field (reference fields.py:1014-1035
    KeywordAnalyzer: lowercase defaults FALSE; comma mode strips whitespace
    around each token via StripFilter, tokenizers.py:304-317)."""
    pattern = r"[^,]+" if commas else r"[^ \t\r\n]+"
    return FieldType(
        analyzer=Analyzer(pattern=pattern, lowercase=lowercase,
                          use_stopfilter=False, strip=commas),
        indexed=True,
        stored=stored,
        scorable=scorable,
        kind="keyword",
    )


def NGRAM(minsize: int = 2, maxsize: int = 4, stored: bool = False) -> FieldType:
    """Char n-grams over the raw value (reference fields.py:1183-1231)."""
    return FieldType(
        analyzer=Analyzer(lowercase=True, use_stopfilter=False, ngram=(minsize, maxsize)),
        indexed=True, stored=stored, scorable=True, kind="ngram",
    )


def NGRAMWORDS(minsize: int = 2, maxsize: int = 4, stored: bool = False) -> FieldType:
    """N-grams within regex words (reference fields.py:1234-1265)."""
    return FieldType(
        analyzer=Analyzer(lowercase=True, use_stopfilter=False,
                          ngram=(minsize, maxsize), ngram_words=True),
        indexed=True, stored=stored, scorable=True, kind="ngramwords",
    )


def NUMERIC(stored: bool = False) -> FieldType:
    # Numeric predicates are native in Spark (SURVEY.md §2.4 NumericRange) —
    # no sortable-bytes/tiered-precision trick needed; kept as a doc column.
    return FieldType(analyzer=None, indexed=False, stored=True, kind="numeric")


def DATETIME(stored: bool = True) -> FieldType:
    """Native timestamp doc column (reference fields.py:835-920 packs
    datetimes into sortable longs — Parquet timestamps + Catalyst predicates
    replace that). Query strings parse via query/dateparse.py."""
    return FieldType(analyzer=None, indexed=False, stored=stored, kind="datetime")


def BOOLEAN(stored: bool = True) -> FieldType:
    """Native boolean doc column (reference fields.py:923-976)."""
    return FieldType(analyzer=None, indexed=False, stored=stored, kind="boolean")


def STORED() -> FieldType:
    return FieldType(analyzer=None, indexed=False, stored=True, kind="stored")


@dataclass(frozen=True)
class IndexSchema:
    fields: dict = dc_field(default_factory=dict)
    #: dynamic (glob) fields: pattern -> FieldType. An unknown field name
    #: resolves against these patterns at lookup time (reference
    #: fields.py:1376-1384, 1486-1488: ``schema.add("*_text", TEXT,
    #: glob=True)``); concrete columns matching a pattern materialize as
    #: real fields at build time (bind_columns).
    dyn_fields: dict = dc_field(default_factory=dict)

    def __getitem__(self, name: str) -> FieldType:
        if name in self.fields:
            return self.fields[name]
        for pat in sorted(self.dyn_fields):
            if fnmatch.fnmatchcase(name, pat):
                return self.dyn_fields[pat]
        raise KeyError(f"No field named {name!r}")

    def __contains__(self, name: str) -> bool:
        try:
            return self[name] is not None
        except KeyError:
            return False

    def names(self, check_names=None) -> list[str]:
        """Sorted static field names; ``check_names`` adds any of the given
        names the schema accepts (e.g. via a dynamic glob) — reference
        fields.py:1422-1441."""
        out = set(self.fields)
        if check_names is not None:
            out.update(n for n in set(check_names) - out if n in self)
        return sorted(out)

    def stored_names(self) -> list[str]:
        return self.stored_fields()

    def scorable_names(self) -> list[str]:
        return self.scorable_fields()

    def indexed_fields(self) -> list[str]:
        return [n for n, f in sorted(self.fields.items()) if f.indexed]

    def stored_fields(self) -> list[str]:
        return [n for n, f in sorted(self.fields.items()) if f.stored]

    def scorable_fields(self) -> list[str]:
        return [n for n, f in sorted(self.fields.items()) if f.scorable]

    def add(self, name: str, fieldtype, glob: bool = False) -> None:
        """Add a (possibly glob) field — reference Schema.add
        (fields.py:1446-1491). Accepts a FieldType or a zero-arg factory
        (the TEXT/ID/KEYWORD constructors)."""
        if not isinstance(fieldtype, FieldType):
            fieldtype = fieldtype()
        if name.startswith("_") or " " in name:
            raise ValueError(f"invalid field name {name!r}")
        if name in self.fields or name in self.dyn_fields:
            raise ValueError(f"{name!r} already in schema")
        (self.dyn_fields if glob else self.fields)[name] = fieldtype

    def remove(self, name: str) -> None:
        if name in self.fields:
            del self.fields[name]
        elif name in self.dyn_fields:
            del self.dyn_fields[name]
        else:
            raise KeyError(f"No field named {name!r}")

    def bind_columns(self, columns, exclude=("doc_id",)) -> "IndexSchema":
        """Materialize dynamic fields against a concrete DataFrame: every
        column matching a glob pattern (and not already a static field)
        becomes a real field with the pattern's type. The manifest keeps
        the original schema; binding happens per build."""
        if not self.dyn_fields:
            return self
        bound = dict(self.fields)
        for c in columns:
            if c in bound or c in exclude:
                continue
            for pat in sorted(self.dyn_fields):
                if fnmatch.fnmatchcase(c, pat):
                    bound[c] = self.dyn_fields[pat]
                    break
        if len(bound) == len(self.fields):
            return self
        return IndexSchema(bound, dict(self.dyn_fields))

    @staticmethod
    def of(**fields: FieldType) -> "IndexSchema":
        return IndexSchema(dict(fields))


def _analyzer_to_dict(a: Analyzer | None) -> dict | None:
    if a is None:
        return None
    return {
        "pattern": a.pattern,
        "lowercase": a.lowercase,
        "stopwords": sorted(a.stopwords),
        "minsize": a.minsize,
        "maxsize": a.maxsize,
        "use_stopfilter": a.use_stopfilter,
        "ngram": list(a.ngram) if a.ngram else None,
        "ngram_words": a.ngram_words,
        "stem": a.stem,
        "lang_stem": a.lang_stem,
        "alt_stem": a.alt_stem,
        "intraword": list(a.intraword) if a.intraword else None,
        "accent_fold": a.accent_fold,
        "substitutions": [list(x) for x in a.substitutions],
        "reverse": a.reverse,
        "path_mode": a.path_mode,
        "compound_words": sorted(a.compound_words) if a.compound_words else None,
        "compound_keep": a.compound_keep,
        "shingle": list(a.shingle) if a.shingle else None,
        "strip": a.strip,
        "delimited_boost": a.delimited_boost,
        "dmetaphone": list(a.dmetaphone) if a.dmetaphone else None,
        "charmap": [list(x) for x in a.charmap] if a.charmap else None,
        "tee": [_analyzer_to_dict(b) for b in a.tee] if a.tee else None,
    }


def _analyzer_from_dict(a: dict | None) -> Analyzer | None:
    if a is None:
        return None
    return Analyzer(
        pattern=a["pattern"],
        lowercase=a["lowercase"],
        stopwords=frozenset(a["stopwords"]),
        minsize=a["minsize"],
        maxsize=a["maxsize"],
        use_stopfilter=a["use_stopfilter"],
        ngram=tuple(a["ngram"]) if a.get("ngram") else None,
        ngram_words=a.get("ngram_words", False),
        stem=a.get("stem", False),
        lang_stem=a.get("lang_stem"),
        alt_stem=a.get("alt_stem"),
        intraword=tuple(a["intraword"]) if a.get("intraword") else None,
        accent_fold=a.get("accent_fold", False),
        substitutions=tuple(tuple(x) for x in a.get("substitutions", ())),
        reverse=a.get("reverse", False),
        path_mode=a.get("path_mode", False),
        compound_words=frozenset(a["compound_words"]) if a.get("compound_words") else None,
        compound_keep=a.get("compound_keep", True),
        shingle=tuple(a["shingle"]) if a.get("shingle") else None,
        strip=a.get("strip", False),
        delimited_boost=a.get("delimited_boost"),
        dmetaphone=tuple(a["dmetaphone"]) if a.get("dmetaphone") else None,
        charmap=tuple((int(o), s) for o, s in a["charmap"]) if a.get("charmap") else None,
        tee=tuple(_analyzer_from_dict(b) for b in a["tee"]) if a.get("tee") else None,
    )


def schema_to_dict(schema: IndexSchema) -> dict:
    out = {}
    for name, f in schema.fields.items():
        out[name] = _fieldtype_to_dict(f)
    for pat, f in schema.dyn_fields.items():
        d = _fieldtype_to_dict(f)
        d["glob"] = True
        out[pat] = d
    return out


def _fieldtype_to_dict(f: FieldType) -> dict:
    return {
            "analyzer": _analyzer_to_dict(f.analyzer),
            "query_analyzer": _analyzer_to_dict(f.query_analyzer),
            "indexed": f.indexed,
            "stored": f.stored,
            "unique": f.unique,
            "scorable": f.scorable,
            "phrase": f.phrase,
            "chars": f.chars,
            "pos_boosts": f.pos_boosts,
            "vector": f.vector,
            "spelling": f.spelling,
            "multitoken_query": f.multitoken_query,
            "field_boost": f.field_boost,
            "kind": f.kind,
        }


def schema_from_dict(d: dict) -> IndexSchema:
    fields = {}
    dyn_fields = {}
    for name, fd in d.items():
        (dyn_fields if fd.get("glob") else fields)[name] = FieldType(
            analyzer=_analyzer_from_dict(fd.get("analyzer")),
            query_analyzer=_analyzer_from_dict(fd.get("query_analyzer")),
            indexed=fd["indexed"],
            stored=fd["stored"],
            unique=fd["unique"],
            scorable=fd["scorable"],
            phrase=fd["phrase"],
            chars=fd.get("chars", False),
            pos_boosts=fd.get("pos_boosts", False),
            vector=fd.get("vector", False),
            spelling=fd.get("spelling", False),
            multitoken_query=fd.get("multitoken_query", "default"),
            field_boost=fd["field_boost"],
            kind=fd["kind"],
        )
    return IndexSchema(fields, dyn_fields)


def code_corpus_schema() -> IndexSchema:
    """The BASELINE.json input_hint schema: (repo, path, commit, lang, content)."""
    return IndexSchema.of(
        repo=ID(stored=True),
        path=ID(stored=True, unique=True),
        commit=ID(stored=True),
        lang=ID(stored=True),
        content=TEXT(phrase=True),
    )
