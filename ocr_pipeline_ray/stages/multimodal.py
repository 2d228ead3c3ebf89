"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video content is carried as plain ``binary`` columns with
a ``media_kind`` string and struct metadata — decode / resize /
feature-extract / frame-sample are actor-pool ``map_batches`` stages.
The container ships no codec libraries, so the *codec* call is stubbed
(real formats raise ``NotImplementedError`` behind an import-try; the
deterministic FPG1 fake format decodes for real) while everything
Ray-side — schema, batch sizing, actor signature, output layout — is
real and tested.

Reference parity: the preprocessing family P1-P11 (SURVEY §2.2,
pipeline.py:458-644) is the same stage shape — per-row binary→tensor
kernels behind an actor pool; the degradation bank
(synthetic_degradation.py:60-76) is mirrored by the generator's
corruption ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from . import media_stub

# Payload caps kept from the reference (pipeline.py:458-491 size guard).
MAX_PAYLOAD_BYTES = 64 * 1024 * 1024


def _decode_real_image(payload: bytes):  # pragma: no cover - env-gated
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs unavailable in this container; only the FPG1 "
            "fake page format decodes here") from exc
    raise NotImplementedError("real decode path not wired in this build")


class DecodeMedia:
    """binary payload → decoded struct (kind, n_lines, ok flag).

    Actor pool: ``map_batches(DecodeMedia, concurrency=N,
    batch_size=small)`` — payloads are heavy, so batches stay small and
    the decoded output drops the raw bytes immediately (never carry
    payloads further than needed).
    """

    def __init__(self) -> None:
        self.decoded = 0  # per-actor counter → lineage-style metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds, n_lines, ok = [], [], []
        for payload in batch["payload"].to_pylist():
            if payload is None or len(payload) > MAX_PAYLOAD_BYTES:
                kinds.append("oversize")
                n_lines.append(0)
                ok.append(False)
                continue
            kind = media_stub.classify_payload(payload)
            kinds.append(kind)
            if kind == "page":
                n_lines.append(len(media_stub.decode_page(payload)))
                ok.append(True)
            elif kind == "digital":
                n_lines.append(media_stub.decode_digital(payload).count("\n") + 1)
                ok.append(True)
            else:
                n_lines.append(0)
                ok.append(kind == "blank")
            self.decoded += 1
        out = batch.drop_columns(["payload"])
        return out.append_column("decoded_kind", pa.array(kinds, type=pa.string())) \
            .append_column("n_lines", pa.array(n_lines, type=pa.int32())) \
            .append_column("decode_ok", pa.array(ok, type=pa.bool_()))


class MediaFeatures:
    """binary payload → fixed-size numeric feature vector.

    The feature extractor analog of the reference's image-quality
    scorer (adaptive_ocr_pipeline.py:76-148): cheap scalar statistics
    of the payload bytes (size, entropy estimate, magic class) emitted
    as a ``list<float>`` column ready for the similarity operators.
    """

    FEATURE_DIM = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            if not payload:
                feats.append([0.0] * self.FEATURE_DIM)
                continue
            arr = np.frombuffer(payload[:4096], dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=4, range=(0, 256))
            p = hist / max(1, arr.size)
            ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
            kind = media_stub.classify_payload(payload)
            feats.append([
                float(len(payload)),
                float(arr.mean()),
                float(arr.std()),
                ent,
                1.0 if kind == "page" else 0.0,
                1.0 if kind == "blank" else 0.0,
                1.0 if kind == "corrupt" else 0.0,
                float(int(hashlib.md5(payload).hexdigest()[:8], 16) % 997) / 997.0,
            ])
        return batch.drop_columns(["payload"]).append_column(
            "features",
            pa.array(feats, type=pa.list_(pa.float32(), self.FEATURE_DIM)))


_TIER_STRATEGY = {
    "high": "direct",
    "medium": "bilateral+qat",
    "low": "denoise+qat",
    "very_low": "full_preprocess+tesseract",
}


def quality_route(batch: pa.Table) -> pa.Table:
    """Quality-tier strategy routing (reference R3/F15,
    adaptive_ocr_pipeline.py:76-148, 349-407): cheap payload statistics
    → weighted quality score → 4-tier → per-row strategy column. The
    downstream pipeline branches on the strategy column (per-row
    routing as data, the cascade pattern), not on control flow."""
    scores, tiers, strategies = [], [], []
    for payload in batch["payload"].to_pylist():
        kind = media_stub.classify_payload(payload or b"")
        if kind in ("blank", "corrupt") or not payload:
            score = 0.0
        else:
            arr = np.frombuffer(payload[:4096], dtype=np.uint8)
            contrast = float(arr.std()) / 128.0
            fill = float((arr > 32).mean())
            size_ok = min(1.0, len(payload) / 512.0)
            score = 0.4 * min(1.0, contrast) + 0.3 * fill + 0.3 * size_ok
        tier = ("high" if score >= 0.75 else
                "medium" if score >= 0.5 else
                "low" if score >= 0.25 else "very_low")
        scores.append(score)
        tiers.append(tier)
        strategies.append(_TIER_STRATEGY[tier])
    return batch.append_column(
        "quality_score", pa.array(scores, type=pa.float64())) \
        .append_column("quality_tier", pa.array(tiers, type=pa.string())) \
        .append_column("strategy", pa.array(strategies, type=pa.string()))


class FrameSample:
    """'Video' payloads → every k-th 'frame' (line record) as new rows —
    the flat_map-shaped explode (one input row → many output rows) used
    for frame sampling; on the fake format a frame is a page line."""

    def __init__(self, every_k: int = 2) -> None:
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, texts = [], [], []
        for ref, payload in zip(batch["media_ref"].to_pylist(),
                                batch["payload"].to_pylist()):
            if media_stub.classify_payload(payload) != "page":
                continue
            for i, (text, _, _) in enumerate(media_stub.decode_page(payload)):
                if i % self.every_k == 0:
                    refs.append(ref)
                    idxs.append(i)
                    texts.append(text)
        return pa.table({
            "media_ref": pa.array(refs, type=pa.string()),
            "frame_index": pa.array(idxs, type=pa.int32()),
            "frame_text": pa.array(texts, type=pa.string()),
        })
