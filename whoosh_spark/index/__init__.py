from whoosh_spark.index.build import build_index, build_segment, extract_postings
from whoosh_spark.index.catalog import Index
from whoosh_spark.index.segment import Manifest, SegmentInfo, read_manifest

__all__ = [
    "build_index",
    "build_segment",
    "extract_postings",
    "Index",
    "Manifest",
    "SegmentInfo",
    "read_manifest",
]
