"""sift_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
chriscorrea/sift (reference: /root/reference, snapshot 2025-08-24) expressed as
``ray.data.Dataset`` pipelines over Parquet tables of Common-Crawl-style pages:

    read_parquet(pages) -> map_batches(ExtractStage actor pool)
                        -> map_batches(SiftStage actor pool)
                        -> write_parquet (per-partition, resumable)

The per-document semantics (readability-style main-content extraction,
HTML->Markdown rendering, hierarchical chunking, boilerplate classification,
field-aware BM25 search, unit-budget selection/formatting) live in pure-Python
modules under ``textproc``/``dom``/``extract`` and are exercised row-locally
inside Arrow batches — sift's "corpus" is always the chunks of one document
(reference: internal/app/sift.go:269-281), so no stage shuffles.
"""

__version__ = "0.1.0"

__all__ = [
    "SiftConfig", "default_config",
    "to_markdown",
    "build_extract_pipeline", "build_bucketed_extract_pipeline",
    "run_extract_job",
    "read_pages", "write_pages_corpus",
]


def __getattr__(name):  # lazy: keep `import sift_ray` light for actors
    if name in ("SiftConfig", "default_config"):
        from . import config
        return getattr(config, name)
    if name == "to_markdown":
        from .extract.api import to_markdown
        return to_markdown
    if name in ("build_extract_pipeline", "build_bucketed_extract_pipeline",
                "run_extract_job"):
        from .pipelines import extract_job
        return getattr(extract_job, name)
    if name in ("read_pages", "write_pages_corpus"):
        from .sources import pages
        return getattr(pages, name)
    raise AttributeError(name)
