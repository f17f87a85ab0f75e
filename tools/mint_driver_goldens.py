"""Mint frozen golden-parquet outputs for the driver queries that are not
SQL-expressible (readability/markdown extraction, PDF parse, image/audio
decode). The driver's correctness gate runs each Ray query AND its
``oracle_sql()`` side by side at sf0.01 and compares rows+schema+values;
for these queries the oracle is ``SELECT * FROM read_parquet(golden)`` —
a regression pin with exactly the same teeth as the byte-exact extraction
goldens in tests/test_goldens.py (the inputs are deterministic synthetic
corpora, so a value drift means the operator changed behavior).

Run:  python tools/mint_driver_goldens.py        (all golden queries)
      python tools/mint_driver_goldens.py NAME…  (a subset)

Overwrites tests/goldens/driver/<name>.parquet. tests/test_oracle.py then
re-runs every one of these at sf0.01 against the frozen file on every
pytest run, so `pytest` green implies the driver's oracle rows stay green.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(REPO, "tests", "goldens", "driver")

# The queries whose oracle is a frozen golden parquet (everything in the
# driver's checked set that DuckDB cannot recompute from the input tables).
GOLDEN_QUERIES = [
    "extract_readability",
    "extract_include_all",
    "extract_selector_p",
    "extract_default_budget",
    "extract_search",
    "extract_search_smart",
    "extract_word_limit_middle",
    "extract_output_text",
    "extract_output_json",
    "extract_bucketed",
    "extract_pdf",
    "extract_pdf_layout",
    "extract_selector_search",
    "decode_bmp",
    "decode_png",
    "decode_wav",
    "decode_gif",
    "resize_images",
    "sample_frames",
    "audio_features",
    # Parallelism-stable rows-only queries (verified bit-stable across
    # 4-cpu vs 8-cpu sessions by tools/check_query_determinism.py —
    # sketches with fixed seeds, fixed-point graph ranks, deterministic
    # map kernels). NOT pinned: ONLY price_quantiles_gk{,_by_priority} —
    # the GK-style summary is order-dependent by construction (its
    # compression points vary with partition merge order; rank error is
    # bounded by tests instead). Everything else in queries() has either
    # a SQL-recomputed oracle or a pin here: price_quantiles{,_by_
    # priority} moved to deterministic DDSketch with full SQL oracles;
    # web_pipeline_shards became stable once line_dedup's in-batch
    # combiner kept the lexicographic-min occurrence; url_dedup /
    # embedding_quantize expose canonical encodings (sha256 hex, int8
    # hex-pack); kmeans_clusters was already scalar and stable.
    "approx_distinct_users",
    "approx_distinct_by_priority",
    "quality_classifier",
    "image_phash_pairs",
    "robots_filter",
    "charset_stats",
    "anchor_topk",
    "warc_extract",
    "html_stats",
    "bpe_merges",
    "assign_splits",
    "decode_jpeg",
    "bpe_token_counts",
    "compression_ratio",
    "page_outlinks",
    "host_graph",
    "url_rank",
    "token_counts",
    "lang_id",
    "doc_fingerprints",
    "page_metadata",
    "embedding_pca",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "chunk_stats",
    "embedding_near_dup_lsh",
    "semdedup_keep",
    "cosine_topk_ivf",
    "tfidf_best_chunk",
    "duplicate_spans",
    "strip_duplicate_spans",
    "cdc_chunks",
    "cdc_dedup_stats",
    "cdc_dedup_docs",
    "url_dedup",
    "kmeans_clusters",
    "embedding_quantize",
    "web_pipeline_shards",
    "pq_codes",
    "pq_topk",
    "ivfpq_topk",
]


def _to_arrow(result):
    import pandas as pd
    import pyarrow as pa
    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    # ray.data.Dataset — concat the block tables to preserve exact types
    # (a block may be a pandas DataFrame when the last stage ran in
    # pandas batch format)
    import ray
    blocks = ray.get(result.to_arrow_refs())
    tables = []
    for b in blocks:
        if isinstance(b, pd.DataFrame):
            if len(b):
                tables.append(pa.Table.from_pandas(b, preserve_index=False))
        elif b.num_rows:
            tables.append(b)
    return pa.concat_tables(tables, promote_options="default")


def _canonical(table):
    """Deterministic row order for stable file bytes (compare is
    order-insensitive; sorting just keeps git diffs readable)."""
    keys = [(c, "ascending") for c in sorted(table.column_names)
            if not any(t(table.schema.field(c).type)
                       for t in (_is_nested,))]
    try:
        return table.sort_by(keys) if keys else table
    except Exception:
        return table


def _is_nested(typ):
    import pyarrow as pa
    return (pa.types.is_list(typ) or pa.types.is_large_list(typ)
            or pa.types.is_struct(typ) or pa.types.is_map(typ))


def main(names):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        table = _canonical(_to_arrow(qs[name](SF_DIR)))
        # drop pandas metadata so the file carries only the logical schema
        table = table.replace_schema_metadata(None)
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="zstd")
        print(f"minted {name}: {table.num_rows} rows, "
              f"{os.path.getsize(path)} bytes, "
              f"schema={[f.name for f in table.schema]}")
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:] or GOLDEN_QUERIES)
