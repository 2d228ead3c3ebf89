"""Confidence aggregation kernels (SURVEY §2.5 A2-A6), vectorized.

- geomean_confidence: reference pipeline.py:386-414 — floor 1e-3, if
  more than 20 tokens keep the top-80% (min 5), geometric mean.
- logmean_confidence: pipeline.py:416-423 — exp(mean(log c)).
- calibrated_confidence: pytorch_mobile/ocr_pipeline.py:1142-1173 —
  0.4*raw + 0.35*field_acc + 0.25*completeness.

All operate on numpy arrays / Arrow list columns so a whole batch of
documents is reduced with one vectorized pass.
"""

from __future__ import annotations

import numpy as np

_FLOOR = 1e-3


def geomean_confidence(confs: np.ndarray) -> float:
    """Reference A2 semantics for one token-confidence vector.

    The log-sum runs SEQUENTIALLY (math.fsum-free, fixed left-to-right
    order) so any independent reimplementation with a plain loop is
    bit-identical — page confidences feed the calibrator fit, whose
    knots must match the oracle's exactly (float-determinism policy,
    see pipelines/relational.py)."""
    import math

    c = np.maximum(np.asarray(confs, dtype=np.float64), _FLOOR)
    if c.size == 0:
        return 0.0
    if c.size > 20:
        keep = max(5, int(c.size * 0.8))
        c = np.sort(c)[-keep:]
    total = 0.0
    for x in c.tolist():
        total += math.log(x)
    return math.exp(total / c.size)


def logmean_confidence(confs: np.ndarray) -> float:
    c = np.maximum(np.asarray(confs, dtype=np.float64), _FLOOR)
    if c.size == 0:
        return 0.0
    return float(np.exp(np.mean(np.log(c))))


def geomean_confidence_batch(list_of_confs: list[np.ndarray]) -> np.ndarray:
    """Batch reduction used inside map_batches over a list<float> column."""
    return np.fromiter(
        (geomean_confidence(c) for c in list_of_confs), dtype=np.float64, count=len(list_of_confs)
    )


def calibrated_confidence(raw: float, field_acc: float, completeness: float,
                          elapsed_s: float = 0.0) -> float:
    """A6: weighted blend x (1 - time penalty), clipped to [0, 1]."""
    penalty = min(0.2, 0.02 * max(0.0, elapsed_s - 5.0))
    score = (0.4 * raw + 0.35 * field_acc + 0.25 * completeness) * (1.0 - penalty)
    return float(min(1.0, max(0.0, score)))
