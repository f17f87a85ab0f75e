from .extract_job import build_extract_pipeline, run_extract_job

__all__ = ["build_extract_pipeline", "run_extract_job"]
