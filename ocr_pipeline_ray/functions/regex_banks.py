"""Field-extraction regex banks + context/range validation.

Capability parity with the reference's extractors (SURVEY §2.6):

- F5 electricity bank (reference pipeline.py:2071-2077, 2388-2394;
  pytorch_mobile/ocr_pipeline.py:888-897)
- F6 carbon bank (pipeline.py:2079-2090, 2412-2419)
- F7 aux fields: account number, bill date, meter readings, water
  (pytorch_mobile/ocr_pipeline.py:926-1050)
- F8 context validator: +/-50-char window must contain a unit keyword
  (pipeline.py:2115-2143)
- F9 range + cross-field validator: electricity in [50, 50000], carbon
  in [10, 20000], carbon/kWh in [0.1, 1.0] (pipeline.py:2200-2221)

Banks are compiled once at import; extraction runs per string inside a
``map_batches`` kernel (regex evaluation is inherently per-string, the
batching amortizes everything else).
"""

from __future__ import annotations

import re
from typing import Any

from .charfix import normalize_number

# F5 — electricity (kWh): context-first patterns, then OCR-tolerant fallbacks.
ELECTRICITY_PATTERNS: list[re.Pattern[str]] = [
    re.compile(r"(?:Total\s+)?Consumption[^0-9]{0,30}([0-9][0-9,\.]{0,10})\s*kWh", re.I),
    re.compile(r"Electricity[^0-9]{0,40}([0-9][0-9,\.]{0,10})\s*kWh", re.I),
    re.compile(r"([0-9][0-9,\.]{0,10})\s*kWh", re.I),
    re.compile(r"kWh[^0-9]{0,15}([0-9][0-9,\.]{0,10})", re.I),
]

# F6 — carbon (kg CO2e), incl. OCR-error forms handled upstream by F3.
CARBON_PATTERNS: list[re.Pattern[str]] = [
    re.compile(r"(?:Kg|kg)\s*CO2e[^0-9]{0,20}([0-9][0-9,\.]{0,10})", re.I),
    re.compile(r"([0-9][0-9,\.]{0,10})\s*(?:Kg|kg)\s*CO2e", re.I),
    re.compile(r"Carbon[^0-9]{0,40}([0-9][0-9,\.]{0,10})", re.I),
]

# F7 — aux fields.
ACCOUNT_PATTERN = re.compile(r"Account(?:\s+(?:No|Number|#))?\.?\s*:?\s*([0-9]{8,12})", re.I)
DATE_PATTERN = re.compile(r"\b([0-3][0-9]/[0-1][0-9]/[12][0-9]{3})\b")
METER_PATTERN = re.compile(r"Meter\s+Reading[^0-9]{0,20}([0-9][0-9,]{0,10})", re.I)
WATER_PATTERN = re.compile(r"([0-9][0-9,\.]{0,10})\s*m3|Water[^0-9]{0,30}([0-9][0-9,\.]{0,10})", re.I)

_CONTEXT_KEYWORDS = {
    "electricity_kwh": ("kwh", "electricity", "consumption"),
    "carbon_kgco2e": ("co2", "carbon", "kg"),
    "water_m3": ("m3", "water"),
}

RANGES = {
    "electricity_kwh": (50, 50_000),
    "carbon_kgco2e": (10, 20_000),
}
CARBON_PER_KWH = (0.1, 1.0)


def context_valid(text: str, start: int, end: int, field: str, window: int = 50) -> bool:
    """F8: the +/-``window`` chars around a match must mention a unit keyword."""
    ctx = text[max(0, start - window): end + window].lower()
    return any(k in ctx for k in _CONTEXT_KEYWORDS.get(field, ()))


def _first_match(text: str, patterns: list[re.Pattern[str]], field: str) -> int | None:
    for pat in patterns:
        for m in pat.finditer(text):
            if context_valid(text, m.start(), m.end(), field):
                val = normalize_number(m.group(1))
                if val is not None:
                    return val
    return None


def extract_fields(text: str) -> dict[str, Any]:
    """Run the full bank over one document text (post char-correction).

    Returns a flat dict with None for absent fields — columnar-friendly
    (the reference's ``_``-prefixed magic keys become plain columns).
    """
    elec = _first_match(text, ELECTRICITY_PATTERNS, "electricity_kwh")
    carbon = _first_match(text, CARBON_PATTERNS, "carbon_kgco2e")
    acct = ACCOUNT_PATTERN.search(text)
    date = DATE_PATTERN.search(text)
    meter = METER_PATTERN.search(text)
    return {
        "electricity_kwh": elec,
        "carbon_kgco2e": carbon,
        "account_number": acct.group(1) if acct else None,
        "bill_date": date.group(1) if date else None,
        "meter_reading": normalize_number(meter.group(1)) if meter else None,
    }


def validate_fields(fields: dict[str, Any]) -> tuple[str, list[str]]:
    """F9: range + cross-field checks → (status, warnings)."""
    warnings: list[str] = []
    for name, (lo, hi) in RANGES.items():
        v = fields.get(name)
        if v is not None and not (lo <= v <= hi):
            warnings.append(f"{name}_out_of_range")
    e, c = fields.get("electricity_kwh"), fields.get("carbon_kgco2e")
    if e and c:
        ratio = c / e
        if not (CARBON_PER_KWH[0] <= ratio <= CARBON_PER_KWH[1]):
            warnings.append("carbon_per_kwh_out_of_range")
    extracted = sum(v is not None for v in fields.values())
    if extracted == 0:
        return "failed", warnings
    if e is not None and c is not None and not warnings:
        return "success", warnings
    return "partial", warnings
