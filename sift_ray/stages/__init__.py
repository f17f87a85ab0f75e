from .extract import ExtractStage, SiftPipelineStage, SiftStage
from .bucket import add_size_bucket, split_by_bucket

__all__ = ["ExtractStage", "SiftStage", "SiftPipelineStage",
           "add_size_bucket", "split_by_bucket"]
