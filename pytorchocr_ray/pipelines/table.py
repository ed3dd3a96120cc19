"""Table-structure pipeline: pubtab JSONL -> decoded structure rows.

    read_pubtab_jsonl ──mb-actor──> TableStage (encode stub -> probs ->
        TableLabelDecode with bbox denorm) ──> (filename, structure,
        n_cells, bbox_sum)

The recognition MODEL is the documented deterministic stub (one-hot probs
over the GT tokens, normalized GT bboxes as loc_preds — the same contract
a trained structure head emits, ref table_postprocess.py:38-46); the
decode + coordinate-restore path it drives is the real reference
functionality under test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.table import (
    TD_TOKENS,
    TableLabelDecode,
    resize_table_shape,
    table_bbox_encode,
)


class TableStage:
    """Actor-pool stage: decode built once per actor, vectorized-ish per
    row (each row is one table — model-call granularity, not scalar work)."""

    def __init__(self, merge_no_span_structure: bool = False):
        self.dec = TableLabelDecode(merge_no_span_structure=merge_no_span_structure)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names, structs, ncells, bsums = [], [], [], []
        for name, tokens, flat, h, w in zip(
            batch["img_path"].to_pylist(),
            batch["structure_tokens"].to_pylist(),
            batch["cell_bboxes"].to_pylist(),
            batch["imgh"].to_pylist(),
            batch["imgw"].to_pylist(),
        ):
            if not tokens:
                continue
            shape = resize_table_shape(int(h), int(w))
            T = len(tokens) + 1
            probs = self.dec.encode(tokens, T)
            bbox_preds = np.zeros((T, 4), dtype=np.float64)
            if flat:
                norm = table_bbox_encode(
                    np.asarray(flat, dtype=np.float64), shape, width=4
                )
                ci = 0
                for t, tok in enumerate(tokens):
                    if tok in TD_TOKENS and ci < len(norm):
                        bbox_preds[t] = norm[ci]
                        ci += 1
            structure, boxes, _score = self.dec.decode(probs, bbox_preds, shape)
            names.append(name)
            structs.append("".join(structure))
            ncells.append(len(boxes))
            bsums.append(int(np.floor(boxes + 0.5).sum()) if boxes.size else 0)
        return pa.table(
            {
                "filename": pa.array(names, pa.string()),
                "structure": pa.array(structs, pa.string()),
                "n_cells": pa.array(ncells, pa.int64()),
                "bbox_sum": pa.array(bsums, pa.int64()),
            }
        )


def table_structure_ds(jsonl_path: str, concurrency: int = 4, **params):
    from ..sources.label_files import read_pubtab_jsonl

    ds = read_pubtab_jsonl(jsonl_path)
    return ds.map_batches(
        TableStage,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs=params,
    )
