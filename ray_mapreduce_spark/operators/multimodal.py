"""Multimodal decode / feature-extract plumbing (SURVEY.md §2d).

Real media decoding (PIL/opencv/librosa/ffmpeg) is NOT available in
this container, so the decoder is a clearly-marked deterministic fake
behind the same interface a real decoder would use. Everything
Spark-side is production-shaped:

- binary payloads travel as Arrow buffers into ``mapInPandas``
  batches (no per-row pickling);
- output schema is fixed and typed (decode never changes the plan);
- batch size is bounded via ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a partition of large blobs can't blow executor memory;
- per-blob failures divert to an error column instead of failing the
  job (the reference's U11 sentinel-group pattern,
  reference basic_mr_month_count.py:18-25).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, "
    "width int, height int, mean_luma double, decode_error string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB decoder. A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))
        return img.width, img.height, luma(img)

    The fake derives deterministic pseudo-features from a sha256 of the
    payload so tests can pin exact values.
    """
    if not payload:
        raise ValueError("empty payload")
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192          # 64..255
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def decode_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, mime) -> typed feature rows.

    Arrow-batched ``mapInPandas``: one Python worker call per batch,
    columnar transfer both ways. Failures land in ``decode_error``.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "width": [],
                "height": [],
                "mean_luma": [],
                "decode_error": [],
            }
            for payload in pdf["payload"]:
                try:
                    w, hgt, luma = _fake_decode(bytes(payload) if payload is not None else b"")
                    out["width"].append(w)
                    out["height"].append(hgt)
                    out["mean_luma"].append(luma)
                    out["decode_error"].append(None)
                except Exception as exc:  # U11: divert, don't fail the job
                    out["width"].append(0)
                    out["height"].append(0)
                    out["mean_luma"].append(0.0)
                    out["decode_error"].append(str(exc))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(decode_batches, schema=DECODE_SCHEMA)
