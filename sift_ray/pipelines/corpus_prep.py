"""Flagship training-corpus preparation pipeline — the end-to-end
composition a 100 TB data pipeline actually runs:

    quality filter  ->  near-dedup  ->  token-budget shard packing

Every stage is the already-oracle-checked operator (textstats
quality rules, dedup.near_dedup_docs greedy keep-lowest over exact n-gram
Jaccard pairs, sharding.token_shards distributed prefix sum), chained
lazily so the corpus streams: the quality filter is a map-side predicate
(no shuffle), near-dedup's only exchange moves int gram rows, and sharding
adds the two-pass ordered scan. The whole composition is expressible in
SQL, so the driver checks it value-exact end to end.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..functions.dedup import near_dedup_docs
from ..functions.sharding import token_shards
from ..functions.textstats import quality_filter_batch


def prepare_corpus(ds, shard_tokens: int = 5000, k: int = 3,
                   threshold: float = 0.5, text_col: str = "text",
                   id_col: str = "doc_id",
                   num_parts: Optional[int] = None):
    """documents Dataset -> (doc_id, n_tokens, start_offset, shard_id) for
    the quality-kept, near-deduplicated corpus, packed into
    ``shard_tokens``-sized shards in doc_id order."""
    def keep_rows(batch: pa.Table) -> pa.Table:
        metrics = quality_filter_batch(batch, text_col=text_col)
        return batch.filter(metrics.column("keep"))

    # materialize the filtered corpus ONCE: near-dedup consumes it three
    # times (gram explode, candidate-count semi-join, final anti-join) and
    # sharding once more — lazily each pass would re-run the read + filter.
    # The object store spills as needed; a petabyte run would checkpoint
    # this stage to parquet instead (run_extract_job's manifest pattern).
    kept = ds.map_batches(keep_rows, batch_format="pyarrow").materialize()
    deduped = near_dedup_docs(kept, k=k, threshold=threshold,
                              text_col=text_col, id_col=id_col,
                              num_parts=num_parts)
    return token_shards(deduped, shard_tokens=shard_tokens,
                        text_col=text_col, id_col=id_col,
                        num_parts=num_parts)
