"""Multimodal queries: the mapInPandas decode path, oracle-checked.

The synthetic codec makes every decoded value a deterministic function of
(doc_id, text), so the DuckDB oracle re-derives the same values directly —
verifying the Arrow batch plumbing, UDF schema, and byte handling
end-to-end without any image library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import attach_synthetic_media, decode_media, frame_sample
from .registry import register

# ---------------------------------------------------------------------------
# q51 — decode features: header dims + payload size + md5 over the binary.
# content = '%04d%04d' header + utf-8 text, so the oracle rebuilds it as a
# string (all-ASCII corpus) and must agree byte-for-byte incl. the md5.
# ---------------------------------------------------------------------------

_Q51_ORACLE = """
SELECT doc_id,
       CAST(doc_id * 37 % 640 + 16 AS INT) AS width,
       CAST(doc_id * 53 % 480 + 16 AS INT) AS height,
       CAST(length(text) AS BIGINT) AS n_payload_bytes,
       md5(lpad(CAST(doc_id * 37 % 640 + 16 AS VARCHAR), 4, '0')
           || lpad(CAST(doc_id * 53 % 480 + 16 AS VARCHAR), 4, '0')
           || text) AS content_md5
FROM documents
ORDER BY doc_id
"""


@register("q51_multimodal_decode", oracle=_Q51_ORACLE)
def q51_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out_ok=False: the decode is a single Arrow pass whose cost is
    # dominated by byte movement, so the pre-decode repartition (a full
    # payload shuffle) loses more than the extra scan tasks gain —
    # measured 0.54s -> 1.24s when fan-out was applied here. Real media
    # tables are multi-row-group, where fan_out no-ops anyway.
    docs = load_table(spark, sf_dir, "documents", fan_out_ok=False)
    return decode_media(attach_synthetic_media(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q52 — frame sampling (row-expanding mapInPandas): every 64th payload byte,
# up to 8 'frames'. Oracle re-derives the sampled bytes with ascii() on the
# corresponding text positions.
# ---------------------------------------------------------------------------

_Q52_ORACLE = """
WITH frames AS (
  SELECT doc_id, CAST(f.k AS INT) AS frame_idx,
         ascii(substr(text, f.k * 64 + 1, 1)) AS frame_byte
  FROM documents,
       LATERAL (SELECT unnest(range(least(8, length(text) // 64))) AS k) f
)
SELECT doc_id, frame_idx, CAST(frame_byte AS INT) AS frame_byte
FROM frames
ORDER BY doc_id, frame_idx
"""


@register("q52_frame_sample", oracle=_Q52_ORACLE)
def q52_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out_ok=False)  # see q51
    return frame_sample(attach_synthetic_media(docs)).orderBy("doc_id", "frame_idx")
