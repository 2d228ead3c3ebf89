"""Accuracy metrics (SURVEY §2.6 F14; reference
run_comprehensive_tests.py:40-70): character-level similarity ratio,
word-hit rate over critical words, exact field match — used by the
robustness harness to grade extraction against construction-time truth.
"""

from __future__ import annotations

from difflib import SequenceMatcher


def char_accuracy(expected: str, actual: str) -> float:
    """SequenceMatcher ratio in [0, 1] (1.0 = identical)."""
    if not expected and not actual:
        return 1.0
    return SequenceMatcher(None, expected, actual).ratio()


def word_hit_rate(expected: str, actual: str,
                  critical: tuple[str, ...] = ()) -> float:
    """Fraction of (critical or all expected) words present in actual."""
    words = list(critical) if critical else expected.split()
    if not words:
        return 1.0
    actual_set = set(actual.split())
    return sum(1 for w in words if w in actual_set) / len(words)


def field_exact_match(expected: dict, actual: dict) -> float:
    """Fraction of expected (non-None) fields matched exactly."""
    keys = [k for k, v in expected.items() if v is not None]
    if not keys:
        return 1.0
    return sum(1 for k in keys if actual.get(k) == expected[k]) / len(keys)
