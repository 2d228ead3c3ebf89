"""Slow, single-process, obviously-correct oracle (FIXTURES.md §3).

Plays the role of the reference's reachable golden path (SURVEY §8):
sequential per-document processing, plain Python sorts, no Ray, no
vectorization. The engine's distributed output must equal this exactly
on (kind, text, media_ref, order) — the reference's exact-equality gate
(run_comprehensive_tests.py:58-66) lifted to span sequences.

Pipeline *logic* is re-implemented here independently (simple loops,
``sorted`` with explicit keys); only the deterministic *definitions*
shared with the engine are imported: the FPG1 payload format
(format spec, not logic) and the char-correction rule table (whose
truth table has its own unit tests).
"""

from __future__ import annotations

import math
import re

from ocr_pipeline_ray.config import (LINK_DENSITY_DROP, MIN_TEXT_CHARS,
                                     TAU_ENHANCE, TAU_LLM)
from ocr_pipeline_ray.functions.charfix import fix_text
from ocr_pipeline_ray.sources.synth import gen_doc
from ocr_pipeline_ray.stages import media_stub

_TAG = re.compile(r"<[^>]+>")
_LINK = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S | re.I)
_WS = re.compile(r"\s+")
_CONFUSABLE_WORD = re.compile(r"\b[0-9lIoOzZsSgGbB|]+\b")
_SUSPECTS = set("lIoOzZsSgGbB|")


def _classify_text(raw: str) -> tuple[bool, str]:
    link_chars = sum(len(m) for m in _LINK.findall(raw))
    visible = _WS.sub(" ", _TAG.sub(" ", raw)).strip()
    if len(visible) < MIN_TEXT_CHARS:
        return False, ""
    if link_chars / len(visible) > LINK_DENSITY_DROP:
        return False, ""
    return True, fix_text(visible)


def _line_conf(raw: str) -> float:
    n = 0
    for m in _CONFUSABLE_WORD.finditer(raw):
        w = m.group(0)
        if any(c.isdigit() for c in w):
            n += sum(1 for ch in w if ch in _SUSPECTS)
    return max(0.55, 0.98 - 0.03 * n)


def _geomean(confs: list[float]) -> float:
    c = [max(x, 1e-3) for x in confs]
    if not c:
        return 0.0
    if len(c) > 20:
        keep = max(5, int(len(c) * 0.8))
        c = sorted(c)[-keep:]
    return math.exp(sum(math.log(x) for x in c) / len(c))


def _ocr_page(payload: bytes) -> tuple[str, float, str]:
    kind = media_stub.classify_payload(payload)
    if kind == "digital":  # S2 fast path: text as-is, conf 1.0, no OCR
        return media_stub.decode_digital(payload), 1.0, "ok"
    if kind != "page":
        return "", 0.0, kind
    lines = media_stub.decode_page(payload)
    if not lines:
        return "", 0.0, "blank"
    # XY-cut: band of 24px top-to-bottom, then left-to-right; stable ties.
    indexed = list(enumerate(lines))
    indexed.sort(key=lambda it: (it[1][2] // 24, it[1][1], it[1][2], it[0]))
    ordered = [t for _, (t, _, _) in indexed]
    conf = _geomean([_line_conf(t) for t in ordered])
    return fix_text("\n".join(ordered)), conf, "ok"


def golden_spans(seed: int, n_docs: int, skew_upper: int = 120) -> list[dict]:
    """Expected ordered span rows for the generated corpus."""
    rows: list[dict] = []
    for i in range(n_docs):
        doc, media_rows = gen_doc(seed, i, skew_upper)
        payloads = {m["media_ref"]: m["payload"] for m in media_rows}
        order = 0
        for span in doc["spans"]:  # generator emits offset order already
            if span["kind"] == "text":
                kept, clean = _classify_text(span["text"])
                if not kept:
                    continue
                rows.append({"doc_id": doc["doc_id"], "order": order,
                             "kind": "text", "text": clean, "media_ref": "",
                             "conf": 1.0, "status": "ok"})
                order += 1
            else:
                text, conf, st = _ocr_page(payloads[span["media_ref"]])
                if st != "ok":
                    continue  # blank/corrupt pages dropped from the sequence
                if conf < TAU_ENHANCE:  # cascade: enhanced retry boost
                    conf = min(0.97, conf + 0.05)
                status = "low_conf" if conf < TAU_LLM else "ok"
                rows.append({"doc_id": doc["doc_id"], "order": order,
                             "kind": "media", "text": text,
                             "media_ref": span["media_ref"],
                             "conf": conf, "status": status})
                order += 1
    return rows
