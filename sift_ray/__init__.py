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


def _install_empty_schema_warning_filter() -> None:
    """Drop Ray 2.49's schema-divergence warning ONLY for the empty-new-schema
    case: Ray's sort-based shuffle emits schema-less empty blocks for empty
    partitions (upstream streaming_executor_state.py warns unless the OLD
    schema is the empty one), which floods every small-scale groupby run with
    false positives. Real schema drift (non-empty vs non-empty) still warns.
    """
    import logging

    class _EmptyNewSchemaFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not ("a RefBundle with a different schema" in msg
                        and "new schema: ." in msg)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyNewSchemaFilter())


_install_empty_schema_warning_filter()

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
