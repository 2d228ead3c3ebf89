"""Stage registry: the engine's user-extension surface (SURVEY §2.8).

The reference's extension points are an implicit string-keyed if/elif
engine chain (pipeline.py:1636-1722) and an explicit degradation
plugin dict (synthetic_degradation.py:60-76). Here both become one
explicit registry: a stage is registered under (kind, name) with its
declared Arrow input/output schema, and pipelines resolve stages by
name — so a deployment can swap the OCR engine, add a new span kind,
or insert a preprocessing stage without touching pipeline code.

Schemas are declared, and ``validate_stage_io`` checks a stage's
actual output against its declaration (the schema-checked stage
boundary promised in SURVEY §1.3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import pyarrow as pa

SPAN_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("offset", pa.int32()),
])
SPAN_STATUS_SCHEMA = pa.schema(
    list(SPAN_SCHEMA) + [("status", pa.string()), ("conf", pa.float64())])
SPAN_ENSEMBLE_SCHEMA = pa.schema(
    list(SPAN_STATUS_SCHEMA) + [("conf_calibrated", pa.float64()),
                                ("cascade", pa.string())])
ORDERED_SPAN_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("order", pa.int32()), ("kind", pa.string()),
    ("text", pa.string()), ("media_ref", pa.string()),
    ("conf", pa.float64()), ("conf_calibrated", pa.float64()),
    ("status", pa.string()), ("cascade", pa.string()),
])


@dataclass(frozen=True)
class StageSpec:
    name: str
    kind: str                      # span kind it processes ('text'|'media'|'*')
    fn: Callable[..., Any]         # map_batches function or actor class
    in_schema: pa.Schema
    out_schema: pa.Schema
    stateful: bool = False         # True → actor pool


_REGISTRY: dict[tuple[str, str], StageSpec] = {}


def register(spec: StageSpec) -> StageSpec:
    key = (spec.kind, spec.name)
    if key in _REGISTRY:
        raise ValueError(f"stage already registered: {key}")
    _REGISTRY[key] = spec
    return spec


def get(kind: str, name: str) -> StageSpec:
    try:
        return _REGISTRY[(kind, name)]
    except KeyError:
        raise KeyError(
            f"no stage ({kind!r}, {name!r}); registered: {sorted(_REGISTRY)}"
        ) from None


def stages_for(kind: str) -> list[StageSpec]:
    return [s for (k, _), s in sorted(_REGISTRY.items())
            if k in (kind, "*")]


def validate_stage_io(spec: StageSpec, out: pa.Table) -> None:
    """Check a stage's actual output table against its declared schema:
    every declared column must be present with the declared type
    (declared ⊆ actual, order-insensitive — stages may append columns).
    An EMPTY declared schema means "dynamic output" (e.g. the decode /
    feature stages whose columns depend on the media kind) and skips
    validation entirely."""
    declared = {f.name: f.type for f in spec.out_schema}
    if not declared:
        return  # dynamic output schema
    actual = {f.name: f.type for f in out.schema}
    missing = {n: t for n, t in declared.items() if actual.get(n) != t}
    if missing:
        raise TypeError(
            f"stage {spec.name!r} output schema mismatch:\n"
            f"  declared-but-absent/mistyped: {missing}\n"
            f"  actual: {actual}")


def _register_builtins() -> None:
    from .classify import classify_spans
    from .doclocal import DocLocalExtract
    from .explode import explode_spans
    from .multimodal import DecodeMedia, FrameSample, MediaFeatures, quality_route
    from .ocr import OcrStage

    register(StageSpec("explode", "*", explode_spans,
                       pa.schema([("doc_id", pa.string())]), SPAN_SCHEMA))
    register(StageSpec("classify", "text", classify_spans,
                       SPAN_SCHEMA, SPAN_STATUS_SCHEMA))
    register(StageSpec("ocr", "media", OcrStage,
                       SPAN_STATUS_SCHEMA, SPAN_ENSEMBLE_SCHEMA, stateful=True))
    register(StageSpec("doc_local_extract", "*", DocLocalExtract,
                       pa.schema([("doc_id", pa.string())]),
                       ORDERED_SPAN_SCHEMA, stateful=True))
    register(StageSpec("decode", "media", DecodeMedia,
                       pa.schema([("payload", pa.binary())]),
                       pa.schema([]), stateful=True))
    register(StageSpec("features", "media", MediaFeatures,
                       pa.schema([("payload", pa.binary())]),
                       pa.schema([]), stateful=True))
    register(StageSpec("frame_sample", "media", FrameSample,
                       pa.schema([("payload", pa.binary())]),
                       pa.schema([]), stateful=True))
    register(StageSpec("quality_route", "media", quality_route,
                       pa.schema([("payload", pa.binary())]),
                       pa.schema([])))


_register_builtins()
