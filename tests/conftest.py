"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Seeded span corpus written once per session (FIXTURES.md profile,
    scaled down for test speed)."""
    from ocr_pipeline_ray.sources.synth import write_corpus

    out = tmp_path_factory.mktemp("corpus")
    write_corpus(str(out), n_docs=60, seed=42, skew_upper=120, num_files=3)
    return str(out)
