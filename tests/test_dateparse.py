"""DATETIME/BOOLEAN schema kinds + date query parsing, differential vs the
reference DateParserPlugin (mirrors the basics of reference
tests/test_dateparse.py)."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from whoosh_spark.index import Index, build_index
from whoosh_spark.query.dateparse import DateParseError, parse_timespan
from whoosh_spark.query.parser import QueryParser
from whoosh_spark.schema import BOOLEAN, DATETIME, ID, IndexSchema, TEXT
from whoosh_spark.search import Searcher

BASEDATE = datetime(2010, 9, 20, 15, 16, 6, 454000)

DOCS = [
    (0, "alfa", datetime(2009, 12, 31, 23, 59), True),
    (1, "bravo", datetime(2010, 1, 1, 0, 0), False),
    (2, "charlie", datetime(2010, 5, 23, 10, 30, 15), True),
    (3, "delta", datetime(2010, 5, 23, 11, 0), False),
    (4, "echo", datetime(2010, 9, 20, 12, 0), True),
    (5, "fox", datetime(2011, 1, 1, 0, 0), False),
    (6, "golf", datetime(2011, 6, 15, 8, 45), True),
]

QUERIES = [
    "date:2010",
    "date:201005",
    "date:20100523",
    "date:2010052310",
    "date:'2010-05-23'",
    "date:'may 2010'",
    "date:'23 may 2010'",
    "date:today",
    "date:yesterday",
    "date:[2010 TO 2011]",
    "date:[20100523 TO 20110101]",
    "date:[TO 2010]",
    "date:[2011 TO]",
    # relative forms (round 3): daynames and plusminus offsets
    "date:'next tuesday'",
    "date:'last friday'",
    "date:'last mon'",
    "date:'next monday'",  # basedate IS a Monday -> jumps a full week
    "date:'-3 weeks'",
    "date:'+1 year'",
    "date:'-1 month'",
    "date:'+2 months 10 days'",
    "date:['last tuesday' TO 'next friday']",
    "date:[-2 weeks TO now]",
]


def _ref_results(whoosh_ref, qs):
    from whoosh import fields, qparser
    from whoosh.filedb.filestore import RamStorage
    from whoosh.qparser.dateparse import DateParserPlugin

    schema = fields.Schema(
        doc_id=fields.NUMERIC(stored=True, bits=64),
        name=fields.ID,
        date=fields.DATETIME,
        flag=fields.BOOLEAN,
    )
    ix = RamStorage().create_index(schema)
    w = ix.writer()
    for did, name, date, flag in DOCS:
        w.add_document(doc_id=did, name=name, date=date, flag=flag)
    w.commit()
    qp = qparser.QueryParser("name", schema)
    qp.add_plugin(DateParserPlugin(basedate=BASEDATE))
    with ix.searcher() as s:
        q = qp.parse(qs)
        return sorted(hit["doc_id"] for hit in s.search(q, limit=None))


@pytest.fixture(scope="module")
def our_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dateix"))
    schema = IndexSchema.of(name=ID(stored=True), date=DATETIME(), flag=BOOLEAN())
    df = spark.createDataFrame(
        [Row(doc_id=i, name=n, date=dt, flag=f) for i, n, dt, f in DOCS]
    )
    build_index(spark, df, schema, d, sha_col=None)
    return Index(spark, d), schema


@pytest.mark.parametrize("qs", QUERIES)
def test_date_queries_match_reference(our_index, whoosh_ref, qs):
    ix, schema = our_index
    want = _ref_results(whoosh_ref, qs)
    qp = QueryParser("name", schema)
    qp.basedate = BASEDATE
    q = qp.parse(qs)
    s = Searcher(ix)
    got = sorted(r["doc_id"] for r in s.search(q, limit=None).collect())
    assert got == want, (qs, q, got, want)


def test_boolean_field(our_index, whoosh_ref):
    ix, schema = our_index
    s = Searcher(ix)
    for text, expect in [("true", [0, 2, 4, 6]), ("yes", [0, 2, 4, 6]),
                         ("false", [1, 3, 5]), ("0", [1, 3, 5])]:
        q = QueryParser("name", schema).parse(f"flag:{text}")
        got = sorted(r["doc_id"] for r in s.search(q, limit=None).collect())
        assert got == expect, (text, got)


def test_parse_timespan_forms():
    assert parse_timespan("2010") == (datetime(2010, 1, 1),
                                      datetime(2010, 12, 31, 23, 59, 59, 999999))
    lo, hi = parse_timespan("2010-05-23 10:30:15")
    assert lo == datetime(2010, 5, 23, 10, 30, 15)
    assert hi == datetime(2010, 5, 23, 10, 30, 15, 999999)
    lo, hi = parse_timespan("sep 2010")
    assert lo == datetime(2010, 9, 1) and hi == datetime(2010, 9, 30, 23, 59, 59, 999999)
    lo, hi = parse_timespan("today", BASEDATE)
    assert lo == datetime(2010, 9, 20)
    with pytest.raises(DateParseError):
        parse_timespan("next blursday")
