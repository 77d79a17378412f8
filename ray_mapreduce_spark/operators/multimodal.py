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


def real_decoder_available() -> bool:
    """True when a real image decoder (PIL) is importable — not in
    this container, but the selection logic below is what ships."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_features(blobs: DataFrame, mode: str = "auto") -> DataFrame:
    """(doc_id, payload binary, mime) -> typed feature rows.

    Arrow-batched ``mapInPandas``: one Python worker call per batch,
    columnar transfer both ways. Failures land in ``decode_error``.

    ``mode``: ``"auto"`` uses the REAL decoder (PIL) when importable
    on the worker and the deterministic fake otherwise; ``"real"``
    forces PIL (rows divert to ``decode_error`` if it's missing —
    U11, never a job failure); ``"fake"`` forces the stub (what tests
    pin). The output schema is identical on every path, so decoder
    choice never changes the plan.

    The worker closure is fully self-contained (the decode logic is
    re-declared nested so cloudpickle ships it by value), so executors
    never need this package importable — robust to harnesses that
    launch Spark from a different cwd/PYTHONPATH.
    """
    if mode not in ("auto", "real", "fake"):
        raise ValueError(f"mode must be auto/real/fake, got {mode!r}")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl  # worker-side stdlib import

        def fake_decode(payload: bytes) -> tuple[int, int, float]:
            # keep in sync with module-level _fake_decode (pinned by tests)
            if not payload:
                raise ValueError("empty payload")
            h = _hl.sha256(payload).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192, round(h[2] / 255.0, 6)

        def make_real_decode():
            import io as _io

            from PIL import Image as _Image  # raises ImportError if absent

            def real_decode(payload: bytes) -> tuple[int, int, float]:
                if not payload:
                    raise ValueError("empty payload")
                img = _Image.open(_io.BytesIO(payload))
                luma = img.convert("L")
                hist = luma.histogram()  # 256 bins, no numpy needed
                n_px = sum(hist) or 1
                mean = sum(i * c for i, c in enumerate(hist)) / n_px / 255.0
                return img.width, img.height, round(mean, 6)

            return real_decode

        if mode == "fake":
            decode = fake_decode
        elif mode == "real":
            try:
                decode = make_real_decode()
            except ImportError as exc:
                # forced-real without PIL: every row diverts (U11),
                # the job itself never fails
                _msg = f"real decoder unavailable: {exc}"

                def decode(payload: bytes, _msg: str = _msg) -> tuple[int, int, float]:
                    raise RuntimeError(_msg)
        else:  # auto: prefer real, fall back to the fake
            try:
                decode = make_real_decode()
            except ImportError:
                decode = fake_decode

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
                    w, hgt, luma = decode(bytes(payload) if payload is not None else b"")
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


RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, resize_error string"
)


def resize_images(blobs: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """STUB resize: a real implementation decodes, resamples, and
    re-encodes (PIL.Image.resize). The fake derives a deterministic
    'resized' payload (sha256 of payload + target dims) so the
    Spark-side contract — binary in, binary out, typed dims, bounded
    Arrow batches — is fully exercised."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, err = [], []
            for payload in pdf["payload"]:
                try:
                    if payload is None or len(payload) == 0:
                        raise ValueError("empty payload")
                    digest = hashlib.sha256(
                        bytes(payload) + f"{target_w}x{target_h}".encode()
                    ).digest()
                    # fake resized blob: digest tiled to a plausible size
                    out_payload.append(digest * 4)
                    err.append(None)
                except Exception as exc:
                    out_payload.append(b"")
                    err.append(str(exc))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out_payload,
                    "width": target_w,
                    "height": target_h,
                    "resize_error": err,
                }
            )

    return blobs.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_no int, frame_payload binary, ts_ms bigint"


def sample_frames(blobs: DataFrame, n_frames: int = 4, fps: float = 1.0) -> DataFrame:
    """STUB video frame sampling: one input blob -> n_frames output
    rows (the fan-out shape; a real impl seeks the container at
    ts = k/fps and decodes a frame). Deterministic fake frames are
    sha256(payload || str(k)) — a printable frame key keeps the
    derivation reproducible by any engine's VARCHAR sha256."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_payload": [], "ts_ms": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue  # zero-emit on empty input (U11 drop)
                for k in range(n_frames):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(k)
                    rows["frame_payload"].append(
                        hashlib.sha256(bytes(payload) + str(k).encode()).digest()
                    )
                    rows["ts_ms"].append(int(k * 1000 / fps))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(frame_batches, schema=FRAME_SCHEMA)
