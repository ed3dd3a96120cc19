"""Single-process oracle for the extraction pipeline (SURVEY.md §5).

Runs the identical pure functions (functions/*) over the documents + media
tables serially and emits the golden flat ``extracted`` rows
(doc_id, order, kind, text, media_ref). The Ray pipeline must match this
row-for-row on (kind, text, media_ref, order) per document — the per-row
invariant from BASELINE.json.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import schemas
from ..functions.ocr import OcrConfig, OcrEngine
from ..functions.png import decode_gray
from ..functions.text_norm import normalize_text
from ..state.weights import build_weights


def oracle_extract(
    documents: pa.Table,
    media: dict[str, bytes],
    config: OcrConfig | None = None,
    weights: dict[str, np.ndarray] | None = None,
) -> pa.Table:
    """documents + media payloads -> golden EXTRACTED_FLAT table.

    Span ordering inside a document: stable sort by (offset, region_idx)
    where text spans carry region_idx 0 and each OCR'd region its reading
    order index; ``order`` is the 0-based position in that sequence.
    Media rows whose payload is missing or fails to decode are dropped
    (mirroring DecodeImage's None -> drop contract).
    """
    engine = OcrEngine(weights or build_weights(), config)
    out_doc: list[str] = []
    out_order: list[int] = []
    out_kind: list[str] = []
    out_text: list[str] = []
    out_ref: list[str] = []

    for row in documents.to_pylist():
        rows: list[tuple[int, int, str, str, str]] = []  # (offset, ridx, kind, text, ref)
        for span in row["spans"]:
            off = span["offset"]
            if span["kind"] == "text":
                rows.append((off, 0, "text", normalize_text(span["text"]), ""))
            else:
                data = media.get(span["media_ref"])
                if data is None:
                    continue
                gray = decode_gray(data)
                if gray is None:
                    continue
                for ridx, (_box, text, _prob) in enumerate(engine.ocr_image(gray)):
                    rows.append((off, ridx, "media", text, span["media_ref"]))
        rows.sort(key=lambda r: (r[0], r[1]))
        for order, (_off, _ridx, kind, text, ref) in enumerate(rows):
            out_doc.append(row["doc_id"])
            out_order.append(order)
            out_kind.append(kind)
            out_text.append(text)
            out_ref.append(ref)

    return pa.table(
        {
            "doc_id": out_doc,
            "order": pa.array(out_order, pa.int32()),
            "kind": out_kind,
            "text": out_text,
            "media_ref": out_ref,
        },
        schema=schemas.EXTRACTED_FLAT,
    )
