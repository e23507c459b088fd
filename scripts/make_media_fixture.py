"""Write the committed media-oracle fixture: tests/fixtures/media_100.parquet.

One flat parquet file (no Spark needed — synth_media_row is a pure function)
holding the same 100 deterministic rows `synth_media(spark, 100)` generates,
plus their sha256 — the DuckDB side of the media_features driver oracle reads
this snapshot while Spark regenerates payloads live and really decodes them.
A hash match therefore proves (a) the generator is deterministic and
(b) the stdlib PNG/WAV decoders recover the generator's metadata.

Regenerate (only needed if synth_media_row changes):
    python scripts/make_media_fixture.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whoosh_spark.functions.multimodal import synth_media_row  # noqa: E402

N = 100


def main() -> None:
    rows = []
    for i in range(N):
        r = synth_media_row(i)
        rows.append(
            {
                "media_id": r["media_id"],
                "kind": r["kind"],
                "mime": r["mime"],
                "payload": r["payload"],
                "payload_sha256": hashlib.sha256(r["payload"]).hexdigest(),
                "width": r["meta"]["width"],
                "height": r["meta"]["height"],
                "duration_ms": r["meta"]["duration_ms"],
                "sample_rate": r["meta"]["sample_rate"],
            }
        )
    df = pd.DataFrame(rows)
    schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("kind", pa.string()),
            ("mime", pa.string()),
            ("payload", pa.binary()),
            ("payload_sha256", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("duration_ms", pa.int32()),
            ("sample_rate", pa.int32()),
        ]
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "media_100.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), out)
    print(f"wrote {out}: {len(df)} rows, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
