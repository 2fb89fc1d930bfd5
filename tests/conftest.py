"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # the suite creates thousands of datasets in this one session; Ray's
    # _StatsActor accumulates per-dataset stats and was observed burning a
    # full core by mid-suite -- stop feeding it what nobody reads
    ctx.enable_auto_log_stats = False
    ctx.verbose_stats_logs = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """Deterministic 60-doc corpus + media store (driver-side Arrow tables)."""
    from distributed_system___ocr_ray import corpus

    docs = corpus.build_documents(n_docs=60, n_img=40, n_pdf=20, seed=42)
    store = corpus.build_media_store(n_img=40, n_pdf=20, seed=42)
    return docs, store
