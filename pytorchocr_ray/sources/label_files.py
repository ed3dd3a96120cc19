"""Label-file sources — the reference's TSV/JSONL dataset formats as
``ray.data`` readers (SURVEY.md §2.1).

Formats (tools/data/gen_json_label.py:78-126, pytocr/data/pubtab_dataset.py:82-99):
  det:  ``img_path \t json([{"transcription": str, "points": [[x,y]x4..N]}])``
  rec:  ``img_path \t text``
  cls:  ``img_path \t label`` with label in a fixed label list
  table: JSON-lines ``{"filename"|"img_path", "html": {...}}``

Malformed rows are dropped (the reference substitutes another record on
parse error, simple_dataset.py:110-119; in a streaming engine dropping +
counting is the equivalent tolerance). Each reader returns a Dataset with an
explicit Arrow schema.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _read_lines(paths):
    import ray.data as rd

    return rd.read_text(paths)


def read_det_labels(paths):
    """-> Dataset(img_path, regions: list<struct<points: list<int32> flat
    x1,y1,..., transcription: string>>)."""

    def parse(batch: pa.Table) -> pa.Table:
        img_paths, regions = [], []
        for line in batch["text"].to_pylist():
            try:
                path, payload = line.split("\t", 1)
                items = json.loads(payload)
                regs = [
                    {
                        "points": [int(v) for xy in it["points"] for v in xy],
                        "transcription": str(it["transcription"]),
                    }
                    for it in items
                ]
            except (ValueError, KeyError, TypeError, json.JSONDecodeError):
                continue  # drop malformed rows
            img_paths.append(path)
            regions.append(regs)
        return pa.table(
            {
                "img_path": pa.array(img_paths, pa.string()),
                "regions": pa.array(
                    regions,
                    pa.list_(
                        pa.struct(
                            [
                                ("points", pa.list_(pa.int32())),
                                ("transcription", pa.string()),
                            ]
                        )
                    ),
                ),
            }
        )

    return _read_lines(paths).map_batches(parse, batch_format="pyarrow")


def read_rec_labels(paths):
    """-> Dataset(img_path, text)."""

    def parse(batch: pa.Table) -> pa.Table:
        img_paths, texts = [], []
        for line in batch["text"].to_pylist():
            parts = line.split("\t", 1)
            if len(parts) != 2 or not parts[0]:
                continue
            img_paths.append(parts[0])
            texts.append(parts[1])
        return pa.table(
            {
                "img_path": pa.array(img_paths, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return _read_lines(paths).map_batches(parse, batch_format="pyarrow")


def read_cls_labels(paths, label_list=("0", "180")):
    """-> Dataset(img_path, label, label_idx); rows with labels outside
    ``label_list`` are dropped (reference ClsLabelEncode, label_ops.py:6-16)."""
    labels = list(label_list)

    def parse(batch: pa.Table) -> pa.Table:
        img_paths, labs, idxs = [], [], []
        for line in batch["text"].to_pylist():
            parts = line.split("\t", 1)
            if len(parts) != 2 or parts[1] not in labels:
                continue
            img_paths.append(parts[0])
            labs.append(parts[1])
            idxs.append(labels.index(parts[1]))
        return pa.table(
            {
                "img_path": pa.array(img_paths, pa.string()),
                "label": pa.array(labs, pa.string()),
                "label_idx": pa.array(idxs, pa.int32()),
            }
        )

    return _read_lines(paths).map_batches(parse, batch_format="pyarrow")


def read_pubtab_jsonl(paths):
    """-> Dataset(img_path, structure_tokens: list<string>, n_cells: int32).

    Table-recognition label rows (pytocr/data/pubtab_dataset.py:82-99); only
    the structural payload is surfaced — the table-branch models are out of
    v1 scope (SURVEY.md §2.2).
    """

    def parse(batch: pa.Table) -> pa.Table:
        img_paths, tokens, n_cells = [], [], []
        bboxes, imghs, imgws = [], [], []
        for line in batch["text"].to_pylist():
            try:
                obj = json.loads(line)
                path = obj.get("filename") or obj["img_path"]
                html = obj["html"]
                toks = [str(t) for t in html["structure"]["tokens"]]
                cells = html.get("cells", [])
                flat: list[int] = []
                for c in cells:
                    bb = c.get("bbox") if isinstance(c, dict) else None
                    if bb is not None:
                        flat.extend(int(v) for v in bb)
            except (KeyError, TypeError, ValueError, json.JSONDecodeError):
                continue
            img_paths.append(path)
            tokens.append(toks)
            n_cells.append(len(cells))
            bboxes.append(flat)
            # image dims when the label line carries them (synthetic fixtures
            # do; PubTabNet proper reads them from the image file)
            imghs.append(int(obj.get("imgh", 0)))
            imgws.append(int(obj.get("imgw", 0)))
        return pa.table(
            {
                "img_path": pa.array(img_paths, pa.string()),
                "structure_tokens": pa.array(tokens, pa.list_(pa.string())),
                "n_cells": pa.array(n_cells, pa.int32()),
                "cell_bboxes": pa.array(bboxes, pa.list_(pa.int32())),
                "imgh": pa.array(imghs, pa.int32()),
                "imgw": pa.array(imgws, pa.int32()),
            }
        )

    return _read_lines(paths).map_batches(parse, batch_format="pyarrow")
