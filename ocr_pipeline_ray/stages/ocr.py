"""Actor-pool OCR stage for ``kind="media"`` spans.

The Ray-Data re-expression of the reference's engine stack (SURVEY
§2.3 M1-M8): a callable CLASS for ``map_batches(..., concurrency=N)``
— the warm "engine" is built once per actor in ``__init__`` exactly
like the reference's per-process lazy singletons (pipeline.py:1150-1195
caches PaddleOCR on a function attribute), and ``__call__`` scores a
whole Arrow batch.

The decode itself is the deterministic fake from ``media_stub`` (no
image libs in this container — SURVEY §8's note that the reference's
real model weights are absent and its reachable golden path is the
deterministic Tesseract-style one). Everything around the decode is
the real distributed design:

- payload resolution: either a *broadcast* lookup (``ray.put`` the
  media dict once, ``ray.get`` per actor in ``__init__`` — the small
  dimension-table pattern) or a pre-joined ``payload`` column from the
  bucketed/hash join (the 100 TB path, see pipelines.extract),
- per-page reading order: XY-cut over line anchors
  (functions.geometry.xy_cut_order), generalizing the reference's box
  ordering loop (pytorch_mobile/ocr_pipeline.py:780-803),
- char-correction canonicalization (functions.charfix, F1-F3),
- per-page confidence: geometric-mean of per-line confidences
  (functions.confidence, reference pipeline.py:386-414),
- blank/corrupt handling as *data* (status column), mirroring the
  reference's failure-as-empty-result model (pipeline.py:1725-1727).

Line confidence is a deterministic function of the raw (pre-fix)
text: base 0.98 minus 0.03 per suspect confusable character (chars in
the F1 confusable class inside digit-bearing words), floored at 0.55 —
degraded pages therefore score lower, exactly reproducible by the
oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.charfix import fix_text
from ..functions.confidence import geomean_confidence
from ..functions.geometry import xy_cut_order
from . import media_stub

_CONFUSABLE_WORD = re.compile(r"\b[0-9lIoOzZsSgGbB|]+\b")
_HAS_DIGIT = re.compile(r"[0-9]")
_SUSPECTS = set("lIoOzZsSgGbB|")


def suspect_char_count(raw: str) -> int:
    n = 0
    for m in _CONFUSABLE_WORD.finditer(raw):
        w = m.group(0)
        if _HAS_DIGIT.search(w):
            n += sum(1 for ch in w if ch in _SUSPECTS)
    return n


def line_confidence(raw: str) -> float:
    return max(0.55, 0.98 - 0.03 * suspect_char_count(raw))


def ocr_page(payload: bytes) -> tuple[str, float, str]:
    """Decode one page → (canonical_text, confidence, status)."""
    kind = media_stub.classify_payload(payload)
    if kind == "blank":
        return "", 0.0, "blank"
    if kind == "corrupt":
        return "", 0.0, "corrupt"
    if kind == "digital":
        # digital-text fast path: extractable text, skip OCR entirely,
        # conf=1.0 (reference pdfminer path, pipeline.py:1938-1946)
        return media_stub.decode_digital(payload), 1.0, "ok"
    lines = media_stub.decode_page(payload)
    if not lines:
        return "", 0.0, "blank"
    xs = np.array([x for _, x, _ in lines])
    ys = np.array([y for _, _, y in lines])
    order = xy_cut_order(xs, ys)
    ordered = [lines[i][0] for i in order]
    confs = np.array([line_confidence(t) for t in ordered])
    raw_text = "\n".join(ordered)
    return fix_text(raw_text), geomean_confidence(confs), "ok"


class OcrStage:
    """map_batches actor pool over mixed span rows.

    Media rows (status='pending') are OCR'd; text rows pass through.
    Payloads come from the broadcast lookup (``media_lookup_ref``) or
    from a ``payload`` column if the pipeline pre-joined it.
    """

    def __init__(self, media_lookup_ref=None) -> None:
        # Warm-engine setup, once per actor (reference singleton pattern).
        # The broadcast media table is ZERO-COPY from the object store —
        # ray.get maps shared buffers; no per-actor dict materialization.
        if media_lookup_ref is not None:
            import ray
            self.media: pa.Table | None = ray.get(media_lookup_ref)
            self.media_refs = self.media["media_ref"]
            self.media_payloads = self.media["payload"]
        else:
            self.media = None

    def _lookup_payloads(self, refs: pa.ChunkedArray) -> list[bytes | None]:
        import pyarrow.compute as pc
        idx = pc.index_in(refs, value_set=self.media_refs)
        out: list[bytes | None] = []
        for i in idx.to_pylist():
            out.append(None if i is None else self.media_payloads[i].as_py())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        status = batch["status"].to_pylist()
        texts = batch["text"].to_pylist()
        confs = batch["conf"].to_pylist()

        if "payload" in batch.column_names:
            payloads = batch["payload"].to_pylist()
        elif self.media is not None:
            payloads = self._lookup_payloads(batch["media_ref"])
        else:
            payloads = [None] * batch.num_rows

        for i, st in enumerate(status):
            if st != "pending":
                continue
            payload = payloads[i]
            if payload is None:
                texts[i], confs[i], status[i] = "", 0.0, "missing_media"
                continue
            texts[i], confs[i], status[i] = ocr_page(payload)

        cols = {
            "doc_id": batch["doc_id"],
            "kind": batch["kind"],
            "text": pa.array(texts, type=pa.string()),
            "media_ref": batch["media_ref"],
            "offset": batch["offset"],
            "status": pa.array(status, type=pa.string()),
            "conf": pa.array(confs, type=pa.float64()),
        }
        return pa.table(cols)


def enhance_low_conf(batch: pa.Table, tau_enhance: float) -> pa.Table:
    """Cascade stage R1 as single-pass dataflow.

    The reference re-runs the best engine at 600 DPI for documents
    below tau_enhance (pipeline.py:1989-2002). Expressed as a
    branch-filter-union it would re-execute the expensive OCR stage (or
    force a mid-pipeline materialization); instead this is one cheap
    vectorized pass that only touches the low-confidence subset —
    semantically identical, streaming-friendly.

    Enhanced retry on the stub engine: confidence +0.05, capped 0.97.
    """
    import pyarrow.compute as pc

    conf = batch["conf"]
    is_media_ok = pc.and_(pc.equal(batch["kind"], "media"),
                          pc.equal(batch["status"], "ok"))
    needs = pc.and_(is_media_ok, pc.less(conf, tau_enhance))
    boosted = pc.min_element_wise(pc.add(conf, 0.05), 0.97)
    new_conf = pc.if_else(needs, boosted, conf)
    out = batch.set_column(batch.schema.get_field_index("conf"), "conf", new_conf)
    # keep status='ok' for enhanced rows; record the branch taken in a column
    return out.append_column(
        "cascade", pc.if_else(needs, pa.scalar("enhanced"), pa.scalar("accepted")))


def finalize_status(batch: pa.Table, tau_llm: float) -> pa.Table:
    """Rows still under tau_llm become 'low_conf' (kept, best-effort —
    the reference's last-resort branch, pipeline.py:2034-2065)."""
    import pyarrow.compute as pc

    low = pc.and_(pc.and_(pc.equal(batch["kind"], "media"),
                          pc.equal(batch["status"], "ok")),
                  pc.less(batch["conf"], tau_llm))
    new_status = pc.if_else(low, pa.scalar("low_conf"), batch["status"])
    return batch.set_column(batch.schema.get_field_index("status"), "status", new_status)
