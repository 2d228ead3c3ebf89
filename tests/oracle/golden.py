"""Slow, single-process, obviously-correct oracle (FIXTURES.md §3).

Plays the role of the reference's reachable golden path (SURVEY §8):
sequential per-document processing, plain Python sorts, no Ray, no
vectorization. The engine's distributed output must equal this exactly
on (kind, text, media_ref, order) — the reference's exact-equality gate
(run_comprehensive_tests.py:58-66) lifted to span sequences.

Pipeline *logic* is re-implemented here independently (simple loops,
``sorted`` with explicit keys); only the deterministic *definitions*
shared with the engine are imported: the FPG1 payload format (format
spec, not logic), the char-correction rule table, the engine parameter
table (base confidences / penalties / variants per DPI) and the
unit-tested isotonic-calibration kernels. The vote-merge, cascade,
page assembly and threshold application are all re-derived here.
"""

from __future__ import annotations

import math
import re

from ocr_pipeline_ray.config import (LINK_DENSITY_DROP, MIN_TEXT_CHARS,
                                     TAU_ENHANCE, TAU_LLM)
from ocr_pipeline_ray.functions.calibration import (fit_isotonic,
                                                    threshold_for_accuracy)
from ocr_pipeline_ray.functions.charfix import fix_text
from ocr_pipeline_ray.sources.synth import gen_doc
from ocr_pipeline_ray.stages import media_stub
from ocr_pipeline_ray.stages.ocr import (ACC_TARGET_ENHANCE, ACC_TARGET_LLM,
                                         CONF_FLOOR, DISAGREE_PENALTY,
                                         ENGINE_PARAMS, TAU_LINE_ENHANCE,
                                         TRUNC_CHARS_300, TRUNC_PENALTY,
                                         aggressive_digit_fix)

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


def _suspects(raw: str) -> int:
    n = 0
    for m in _CONFUSABLE_WORD.finditer(raw):
        w = m.group(0)
        if any(c.isdigit() for c in w) or len(w) >= 2:
            n += sum(1 for ch in w if ch in _SUSPECTS)
    return n


def _read_line(raw: str, dpi: int) -> tuple[str, float]:
    """Independent re-derivation of the 3-engine vote-merge."""
    if dpi < 600 and len(raw) > TRUNC_CHARS_300:
        seen, pen = raw[:TRUNC_CHARS_300], TRUNC_PENALTY
    else:
        seen, pen = raw, 0.0
    fixw = aggressive_digit_fix(seen)
    readings = []
    for _name, base, weight, variant in ENGINE_PARAMS[dpi]:
        text = seen if variant == "raw" else fixw
        conf = base - weight * _suspects(text) - pen
        readings.append((text, max(CONF_FLOOR, conf)))
    # vote: weight(v) = sum(conf) * votes / 9; ties → smallest variant
    weights: dict[str, float] = {}
    counts: dict[str, int] = {}
    for text, conf in readings:
        weights[text] = weights.get(text, 0.0) + conf
        counts[text] = counts.get(text, 0) + 1
    best, best_w = "", -1.0
    for text in sorted(weights):
        w = weights[text] * counts[text] / 9.0
        if w > best_w:
            best, best_w = text, w
    conf = max(c for t, c in readings if t == best)
    conf -= DISAGREE_PENALTY * (3 - counts[best])
    return best, max(CONF_FLOOR, conf)


def _geomean(confs: list[float]) -> float:
    c = [max(x, 1e-3) for x in confs]
    if not c:
        return 0.0
    if len(c) > 20:
        keep = max(5, int(len(c) * 0.8))
        c = sorted(c)[-keep:]
    return math.exp(sum(math.log(x) for x in c) / len(c))


def _page_lines_ordered(payload: bytes) -> list[str] | None:
    lines = media_stub.decode_page(payload)
    if not lines:
        return None
    # XY-cut: band of 24px top-to-bottom, then left-to-right; stable ties.
    indexed = list(enumerate(lines))
    indexed.sort(key=lambda it: (it[1][2] // 24, it[1][1], it[1][2], it[0]))
    return [t for _, (t, _, _) in indexed]


def _decode(payload: bytes, dpi: int) -> tuple[str, float, float, str]:
    kind = media_stub.classify_payload(payload)
    if kind == "digital":  # S2 fast path: text as-is, conf 1.0, no OCR
        return media_stub.decode_digital(payload), 1.0, 1.0, "ok"
    if kind != "page":
        return "", 0.0, 0.0, kind
    ordered = _page_lines_ordered(payload)
    if ordered is None:
        return "", 0.0, 0.0, "blank"
    merged, confs = [], []
    for raw in ordered:
        text, conf = _read_line(raw, dpi)
        merged.append(text)
        confs.append(conf)
    return fix_text("\n".join(merged)), _geomean(confs), min(confs), "ok"


def _ocr_page(payload: bytes, dpi: int) -> tuple[str, float, str]:
    text, conf, _m, st = _decode(payload, dpi)
    return text, conf, st


def _cascade(payload: bytes, tau_enhance: float) -> tuple[str, float, str, str]:
    kind = media_stub.classify_payload(payload)
    if kind == "digital":
        return media_stub.decode_digital(payload), 1.0, "ok", "digital"
    text, conf, min_conf, st = _decode(payload, 300)
    if st != "ok":
        return text, conf, st, "none"
    if conf >= tau_enhance and min_conf >= TAU_LINE_ENHANCE:
        return text, conf, st, "accepted"
    t6, c6, _m6, s6 = _decode(payload, 600)
    if s6 == "ok" and c6 > conf:
        return t6, c6, "ok", "enhanced"
    return text, conf, "ok", "retry_kept"


def _interp(x: float, kx: list[float], ky: list[float]) -> float:
    """Plain piecewise-linear interpolation, clipped at the ends."""
    if x <= kx[0]:
        return ky[0]
    if x >= kx[-1]:
        return ky[-1]
    for i in range(1, len(kx)):
        if x <= kx[i]:
            if kx[i] == kx[i - 1]:
                return ky[i]
            f = (x - kx[i - 1]) / (kx[i] - kx[i - 1])
            return ky[i - 1] + f * (ky[i] - ky[i - 1])
    return ky[-1]


def golden_calibrator(seed: int, n_docs: int, skew_upper: int = 120,
                      sample_n: int = 512):
    """Independent construction of the calibration sample: all page_png
    media rows sorted by media_ref, first sample_n, 300-DPI decode vs
    construction truth (truth lines ordered by the same XY-cut)."""
    rows = []
    for i in range(n_docs):
        _, media_rows = gen_doc(seed, i, skew_upper)
        for m in media_rows:
            if m["media_kind"] == "page_png":
                rows.append(m)
    rows.sort(key=lambda m: m["media_ref"])
    confs, correct = [], []
    for m in rows[:sample_n]:
        text, conf, st = _ocr_page(m["payload"], 300)
        truth = m["truth_lines"]
        if st != "ok" or not truth:
            continue
        ordered = sorted(enumerate(truth),
                         key=lambda it: (it[1]["y"] // 24, it[1]["x"],
                                         it[1]["y"], it[0]))
        truth_text = fix_text("\n".join(t["text"] for _, t in ordered))
        confs.append(conf)
        correct.append(1.0 if text == truth_text else 0.0)
    if len(confs) < 10:
        return None
    import numpy as np
    kx, ky = fit_isotonic(np.array(confs), np.array(correct))
    return kx.tolist(), ky.tolist()


def golden_spans(seed: int, n_docs: int, skew_upper: int = 120,
                 calib=None) -> list[dict]:
    """Expected ordered span rows for the generated corpus (optionally
    with the calibrated cascade thresholds active)."""
    if calib is None:
        tau_enhance, tau_llm = TAU_ENHANCE, TAU_LLM
    else:
        kx, ky = calib
        te = threshold_for_accuracy(kx, ky, ACC_TARGET_ENHANCE)
        tl = threshold_for_accuracy(kx, ky, ACC_TARGET_LLM)
        tau_enhance = te if te is not None else TAU_ENHANCE
        tau_llm = tl if tl is not None else TAU_LLM

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
                             "conf": 1.0, "conf_calibrated": 1.0,
                             "status": "ok", "cascade": "accepted"})
                order += 1
            else:
                text, conf, st, casc = _cascade(payloads[span["media_ref"]],
                                                tau_enhance)
                if st != "ok":
                    continue  # blank/corrupt pages dropped from the sequence
                if calib is None or casc == "digital":
                    cal = conf
                else:
                    cal = _interp(conf, calib[0], calib[1])
                status = "low_conf" if (casc != "digital" and cal < tau_llm) \
                    else "ok"
                rows.append({"doc_id": doc["doc_id"], "order": order,
                             "kind": "media", "text": text,
                             "media_ref": span["media_ref"],
                             "conf": conf, "conf_calibrated": cal,
                             "status": status, "cascade": casc})
                order += 1
    return rows
