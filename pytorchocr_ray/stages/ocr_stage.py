"""Stateful OCR stages (actor pools) — the map_batches callable classes.

Two physical plans over the same logical stages:

* **Fused** (:class:`OcrStage`, default on CPU clusters): decode -> det
  forward -> DB postprocess -> sort -> crop -> cls -> rec -> decode all in
  one actor pool. Avoids shipping decoded images / prob maps through the
  object store; right when every stage runs on the same resource type.
* **Split** (:class:`DetStage` + :class:`RecStage`): det actors emit raw
  crop rows (binary + dims), rec actors consume them — the reference's
  GPU-pool split (det pool and rec pool scale independently,
  SURVEY.md §2.4). Use when det runs on a different resource
  (num_gpus) than rec, at the cost of crop traffic between pools.

Weights arrive as a ``ray.put`` ObjectRef broadcast once from the driver
(zero-copy object-store read per node) — mirroring the reference's
load-once-per-process ``OCRer.__init__`` (deploy/pytorch/run_ocr.py:51-165).
Media payload lookup is pluggable: a broadcast dict at sandbox scale; at
100 TB the same callsite reads a hash-partitioned payload store instead.

Per-batch recognition loops over media rows on purpose: each iteration is a
full model inference (FFT conv over an image), not a row-wise scalar op —
this is the batched-model-call pattern, not a hot Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.ctc import ctc_greedy_decode
from ..functions.ocr import OcrConfig, OcrEngine
from ..functions.png import decode_gray
from ..state.weights import build_weights

OCR_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("region_idx", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("prob", pa.float32()),
        ("box", pa.list_(pa.int16())),
        ("span_idx", pa.int32()),
        ("n_spans", pa.int32()),
    ]
)

# a dropped media span (undecodable / missing payload) emits ONE tombstone
# row with this region_idx so the doc's span lineage stays complete for the
# reassembly guard; reassembly filters tombstones after the check
TOMBSTONE_REGION = -1


def _get(maybe_ref):
    import ray

    if isinstance(maybe_ref, ray.ObjectRef):
        return ray.get(maybe_ref)
    return maybe_ref


class ShardedMediaStore:
    """Actor-side lazy payload store over a sharded parquet directory.

    ``media_ref`` encodes its shard ("img-<docidx>-<k>", shard = docidx
    rounded down to shard_size) — the same contract as object storage where
    the key embeds the partition. Each actor reads only the shards its doc
    rows touch (blocks are contiguous doc ranges, so the small LRU hits
    almost always), instead of the driver broadcasting every payload. This
    is the 100 TB-safe path; the broadcast dict remains for small sidecars.
    """

    def __init__(
        self,
        media_dir: str,
        shard_size: int,
        cache_shards: int = 4,
        value_col: str = "data",
    ):
        self.dir = media_dir
        self.shard_size = shard_size
        self.cache_shards = cache_shards
        self.value_col = value_col  # "data" for payloads, "regions" for GT
        self._cache: "dict[str, dict[str, bytes]]" = {}
        self._order: list[str] = []

    def get(self, ref: str) -> bytes | None:
        import os

        import pyarrow.parquet as pq

        try:
            di = int(ref.split("-")[1])
        except (IndexError, ValueError):
            return None
        lo = di - di % self.shard_size
        path = os.path.join(self.dir, f"part-{lo:08d}.parquet")
        d = self._cache.get(path)
        if d is None:
            if not os.path.exists(path):
                return None
            t = pq.read_table(path, columns=["media_ref", self.value_col])
            d = dict(zip(t["media_ref"].to_pylist(), t[self.value_col].to_pylist()))
            self._cache[path] = d
            self._order.append(path)
            while len(self._order) > self.cache_shards:
                self._cache.pop(self._order.pop(0), None)
        return d.get(ref)


def make_media_lookup(media_ref):
    """media_ref may be: None, a dict, a ray.ObjectRef of a dict, or a
    sharded-store descriptor {"dir": ..., "shard_size": ...}."""
    if media_ref is None:
        empty: dict[str, bytes] = {}
        return empty.get
    if isinstance(media_ref, dict) and "dir" in media_ref:
        return ShardedMediaStore(
            media_ref["dir"], int(media_ref["shard_size"])
        ).get
    return _get(media_ref).get


class _Collector:
    """Accumulates output rows and renders one Arrow table per batch."""

    def __init__(self):
        self.doc_id: list[str] = []
        self.offset: list[int] = []
        self.region_idx: list[int] = []
        self.kind: list[str] = []
        self.text: list[str] = []
        self.media_ref: list[str] = []
        self.prob: list[float | None] = []
        self.box: list[list[int] | None] = []
        self.span_idx: list[int] = []
        self.n_spans: list[int] = []

    def add(self, doc_id, offset, region_idx, kind, text, media_ref, prob, box,
            span_idx=0, n_spans=0):
        self.doc_id.append(doc_id)
        self.offset.append(offset)
        self.region_idx.append(region_idx)
        self.kind.append(kind)
        self.text.append(text)
        self.media_ref.append(media_ref)
        self.prob.append(prob)
        self.box.append(box)
        self.span_idx.append(span_idx)
        self.n_spans.append(n_spans)

    def table(self) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(self.doc_id, pa.string()),
                "offset": pa.array(self.offset, pa.int32()),
                "region_idx": pa.array(self.region_idx, pa.int32()),
                "kind": pa.array(self.kind, pa.string()),
                "text": pa.array(self.text, pa.string()),
                "media_ref": pa.array(self.media_ref, pa.string()),
                "prob": pa.array(self.prob, pa.float32()),
                "box": pa.array(self.box, pa.list_(pa.int16())),
                "span_idx": pa.array(self.span_idx, pa.int32()),
                "n_spans": pa.array(self.n_spans, pa.int32()),
            },
            schema=OCR_OUT_SCHEMA,
        )


class OcrStage:
    """Fused decode+det+post+crop+cls+rec actor. Input: exploded span rows;
    output: text rows passed through + one row per OCR'd region."""

    def __init__(self, weights_ref=None, media_ref=None, config: OcrConfig | None = None):
        from ..state.bench_counter import counter_enabled, try_get

        w = _get(weights_ref) if weights_ref is not None else build_weights()
        self.engine = OcrEngine(w, config)
        self.lookup = make_media_lookup(media_ref)
        # bench-only per-image CPU accounting (None in production runs)
        self._counter = try_get() if counter_enabled() else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time

        cpu0 = time.process_time() if self._counter is not None else 0.0
        n_images = 0
        out = _Collector()
        kinds = batch["kind"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        offsets = batch["offset"].to_pylist()
        has_lineage = "span_idx" in batch.column_names
        sidx = batch["span_idx"].to_pylist() if has_lineage else [0] * len(kinds)
        nsp = batch["n_spans"].to_pylist() if has_lineage else [0] * len(kinds)
        # media_mode="join" delivers payloads inline as a "data" column
        inline = (
            batch["data"].to_pylist() if "data" in batch.column_names else None
        )
        for i, kind in enumerate(kinds):
            if kind != "media":
                out.add(doc_ids[i], offsets[i], 0, kind, texts[i], "", None, None,
                        sidx[i], nsp[i])
                continue
            data = inline[i] if inline is not None else self.lookup(refs[i])
            gray = decode_gray(data) if data is not None else None
            if gray is None:
                # DecodeImage contract: undecodable -> drop; a tombstone row
                # keeps the doc's span lineage complete for the reassembly
                # guard (filtered out after the check)
                out.add(doc_ids[i], offsets[i], TOMBSTONE_REGION, "media", "",
                        refs[i], None, None, sidx[i], nsp[i])
                continue
            n_images += 1
            regions = self.engine.ocr_image(gray)
            if not regions:
                # a decodable image where the detector finds NO text emits
                # zero real rows — without a tombstone the doc's span-index
                # set is incomplete and the reassembly lineage guard would
                # false-positive on legitimate text-free images (ADVICE r2)
                out.add(doc_ids[i], offsets[i], TOMBSTONE_REGION, "media", "",
                        refs[i], None, None, sidx[i], nsp[i])
                continue
            for ridx, (box, text, prob) in enumerate(regions):
                out.add(
                    doc_ids[i],
                    offsets[i],
                    ridx,
                    "media",
                    text,
                    refs[i],
                    prob,
                    box.reshape(-1).tolist(),
                    sidx[i],
                    nsp[i],
                )
        if self._counter is not None and n_images:
            # awaited (r5, ADVICE r4): a fire-and-forget add could land
            # after the bench's read_and_reset (or be lost at actor-pool
            # teardown), mis-attributing up to one batch per actor.  The
            # ray.get makes every add visible before this batch completes
            # — so before the dataset (and the timed run) finishes.  Cost:
            # one ~0.2 ms actor RPC per ~100 ms batch, bench-mode only.
            import ray

            ray.get(self._counter.add.remote(time.process_time() - cpu0, n_images))
        return out.table()


class DetStage:
    """Split plan, stage 1: media rows -> crop rows; text rows pass through
    with crop fields null. Output adds (crop: binary PNG, crop_h, crop_w).

    Crops are PNG-compressed before leaving the actor (round 3, VERDICT r2
    #5: raw uint8 shipped ~26x more bytes through the object store and the
    det->rec exchange than needed; encode+decode costs ~0.1 ms/crop vs
    ~10 ms of model compute)."""

    def __init__(self, weights_ref=None, media_ref=None, config: OcrConfig | None = None):
        w = _get(weights_ref) if weights_ref is not None else build_weights()
        cfg = config or OcrConfig()
        # cls runs in RecStage; detection itself never rotates
        self.engine = OcrEngine(w, cfg)
        self.lookup = make_media_lookup(media_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {
            "doc_id": [],
            "offset": [],
            "region_idx": [],
            "kind": [],
            "text": [],
            "media_ref": [],
            "box": [],
            "crop": [],
            "crop_h": [],
            "crop_w": [],
            "span_idx": [],
            "n_spans": [],
        }

        def add(doc, off, ridx, kind, text, ref, box, crop, si=0, ns=0):
            rows["span_idx"].append(si)
            rows["n_spans"].append(ns)
            rows["doc_id"].append(doc)
            rows["offset"].append(off)
            rows["region_idx"].append(ridx)
            rows["kind"].append(kind)
            rows["text"].append(text)
            rows["media_ref"].append(ref)
            rows["box"].append(box)
            if crop is None:
                rows["crop"].append(None)
                rows["crop_h"].append(0)
                rows["crop_w"].append(0)
            else:
                from ..functions.png import encode_gray

                rows["crop"].append(encode_gray(crop))
                rows["crop_h"].append(crop.shape[0])
                rows["crop_w"].append(crop.shape[1])

        kinds = batch["kind"].to_pylist()
        docs = batch["doc_id"].to_pylist()
        offs = batch["offset"].to_pylist()
        texts = batch["text"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        has_lineage = "span_idx" in batch.column_names
        sidx = batch["span_idx"].to_pylist() if has_lineage else [0] * len(kinds)
        nsp = batch["n_spans"].to_pylist() if has_lineage else [0] * len(kinds)
        for i, kind in enumerate(kinds):
            doc = docs[i]
            off = offs[i]
            if kind != "media":
                add(doc, off, 0, kind, texts[i], "", None, None, sidx[i], nsp[i])
                continue
            ref = refs[i]
            data = self.lookup(ref)
            gray = decode_gray(data) if data is not None else None
            if gray is None:
                add(doc, off, TOMBSTONE_REGION, "media", "", ref, None, None,
                    sidx[i], nsp[i])
                continue
            from ..functions.geometry import get_part_img, maybe_rot90

            boxes = self.engine.detect(gray)
            if not len(boxes):
                # zero-detection tombstone: keeps span lineage complete for
                # the reassembly guard on text-free images (ADVICE r2)
                add(doc, off, TOMBSTONE_REGION, "media", "", ref, None, None,
                    sidx[i], nsp[i])
                continue
            for ridx, box in enumerate(boxes):
                crop = maybe_rot90(get_part_img(gray, box.astype(np.float64)))
                add(doc, off, ridx, "media", "", ref, box.reshape(-1).tolist(), crop,
                    sidx[i], nsp[i])

        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "offset": pa.array(rows["offset"], pa.int32()),
                "region_idx": pa.array(rows["region_idx"], pa.int32()),
                "kind": pa.array(rows["kind"], pa.string()),
                "text": pa.array(rows["text"], pa.string()),
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "box": pa.array(rows["box"], pa.list_(pa.int16())),
                "crop": pa.array(rows["crop"], pa.binary()),
                "crop_h": pa.array(rows["crop_h"], pa.int32()),
                "crop_w": pa.array(rows["crop_w"], pa.int32()),
                "span_idx": pa.array(rows["span_idx"], pa.int32()),
                "n_spans": pa.array(rows["n_spans"], pa.int32()),
            }
        )


class RecStage:
    """Split plan, stage 2: crop rows -> recognized rows (OCR_OUT_SCHEMA)."""

    def __init__(self, weights_ref=None, config: OcrConfig | None = None):
        w = _get(weights_ref) if weights_ref is not None else build_weights()
        self.engine = OcrEngine(w, config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _Collector()
        kinds = batch["kind"].to_pylist()
        docs = batch["doc_id"].to_pylist()
        offs = batch["offset"].to_pylist()
        texts = batch["text"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        ridxs = batch["region_idx"].to_pylist()
        boxes = batch["box"].to_pylist()
        crops = batch["crop"].to_pylist()
        hs = batch["crop_h"].to_pylist()
        ws = batch["crop_w"].to_pylist()
        has_lineage = "span_idx" in batch.column_names
        sidx = batch["span_idx"].to_pylist() if has_lineage else [0] * len(kinds)
        nsp = batch["n_spans"].to_pylist() if has_lineage else [0] * len(kinds)
        for i, kind in enumerate(kinds):
            if kind != "media":
                out.add(docs[i], offs[i], 0, kind, texts[i], "", None, None,
                        sidx[i], nsp[i])
                continue
            if ridxs[i] == TOMBSTONE_REGION:
                out.add(docs[i], offs[i], TOMBSTONE_REGION, "media", "", refs[i],
                        None, None, sidx[i], nsp[i])
                continue
            crop = decode_gray(crops[i])
            assert crop is not None and crop.shape == (hs[i], ws[i])
            if self.engine.cfg.use_cls:
                label, _p = self.engine.cls(crop)
                if label == "180":
                    crop = np.ascontiguousarray(crop[::-1, ::-1])
            text, prob = ctc_greedy_decode(self.engine.rec(crop))
            out.add(
                docs[i], offs[i], ridxs[i], "media", text, refs[i], prob, boxes[i],
                sidx[i], nsp[i]
            )
        return out.table()
