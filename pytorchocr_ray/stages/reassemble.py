"""Per-document reassembly — THE shuffle of the pipeline (key: doc_id).

``groupby("doc_id").map_groups``: inside a group, stable-sort by
(offset, region_idx) and emit the 0-based ``order`` column. Document order
is restored locally per group — never a global sort (SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def reassemble_group(group: pa.Table) -> pa.Table:
    idx = pc.sort_indices(
        group,
        sort_keys=[("offset", "ascending"), ("region_idx", "ascending")],
    )
    g = group.take(idx)
    return pa.table(
        {
            "doc_id": g["doc_id"],
            "order": pa.array(np.arange(len(g), dtype=np.int32)),
            "kind": g["kind"],
            "text": g["text"],
            "media_ref": g["media_ref"],
        }
    )


def to_nested(flat_sorted: pa.Table) -> pa.Table:
    """Flat extracted rows (single doc, sorted by order) -> one nested row."""
    doc_id = flat_sorted["doc_id"][0].as_py()
    spans = [
        {
            "kind": k,
            "text": t,
            "media_ref": m,
            "order": o,
        }
        for k, t, m, o in zip(
            flat_sorted["kind"].to_pylist(),
            flat_sorted["text"].to_pylist(),
            flat_sorted["media_ref"].to_pylist(),
            flat_sorted["order"].to_pylist(),
        )
    ]
    from .. import schemas

    return pa.table(
        {"doc_id": [doc_id], "spans": [spans]},
        schema=schemas.EXTRACTED,
    )
