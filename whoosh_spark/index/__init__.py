from whoosh_spark.index.build import build_index, build_segment, extract_postings
from whoosh_spark.index.catalog import Index, create_in, exists_in, open_dir
from whoosh_spark.index.segment import Manifest, SegmentInfo, read_manifest

__all__ = [
    "build_index",
    "build_segment",
    "extract_postings",
    "Index",
    "create_in",
    "exists_in",
    "open_dir",
    "Manifest",
    "SegmentInfo",
    "read_manifest",
]
