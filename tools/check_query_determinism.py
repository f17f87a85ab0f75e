"""Decide which rows-only queries are safe to pin with golden-parquet
oracles: run each candidate twice — in SEPARATE Ray sessions at different
parallelism (4 and 8 cpus) — and compare the results value-exactly with the
driver's own order-insensitive compare (sorted columns, sorted rows). Only
queries that are bit-stable across parallelism can be frozen; anything whose
output depends on partition count/arrival order (e.g. sketch merge order)
must stay rows-only.

Run:  python tools/check_query_determinism.py [NAME...]
Prints STABLE/UNSTABLE per query; exit code 0 either way.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SIFT_DET_SF", "/root/testdata/sf0.01")

CANDIDATES = [
    "approx_distinct_users", "approx_distinct_by_priority",
    "quality_classifier", "kmeans_clusters", "image_phash_pairs",
    "robots_filter", "charset_stats", "anchor_topk", "price_quantiles",
    "price_quantiles_by_priority", "url_dedup", "warc_extract",
    "html_stats", "web_pipeline_shards", "embedding_quantize",
    "bpe_merges", "assign_splits", "decode_jpeg", "bpe_token_counts",
    "compression_ratio", "page_outlinks", "host_graph", "url_rank",
    "token_counts", "lang_id", "doc_fingerprints", "page_metadata",
    "embedding_pca", "minhash_lsh_pairs", "simhash_pairs", "chunk_stats",
    "embedding_near_dup_lsh", "semdedup_keep", "cosine_topk_ivf",
    "tfidf_best_chunk",
]

_CHILD = r"""
import sys, os, json, hashlib
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
import importlib.util
spec = importlib.util.spec_from_file_location(
    "entry", os.path.join(%(repo)r, "__ray_entry__.py"))
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
qs = m.queries()
import pandas as pd
import pyarrow as pa

def canon(result):
    if isinstance(result, pa.Table):
        df = result.to_pandas()
    elif isinstance(result, pd.DataFrame):
        df = result
    else:
        df = result.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        ignore_index=True)
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%%.12g").encode()).hexdigest()

out = {}
for name in sys.argv[2:]:
    try:
        out[name] = canon(qs[name](%(sf)r))
    except Exception as exc:
        out[name] = f"ERROR: {type(exc).__name__}: {exc}"
print(json.dumps(out))
ray.shutdown()
"""


def run_leg(ncpus: int, names: list) -> dict:
    code = _CHILD % {"repo": REPO, "sf": SF_DIR}
    out = subprocess.run([sys.executable, "-c", code, str(ncpus)] + names,
                         capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(f"leg ncpus={ncpus} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main(names):
    a = run_leg(4, names)
    b = run_leg(8, names)
    stable = []
    for n in names:
        if str(a[n]).startswith("ERROR") or str(b[n]).startswith("ERROR"):
            print(f"ERROR    {n}: {a[n]} / {b[n]}")
        elif a[n] == b[n]:
            stable.append(n)
            print(f"STABLE   {n}")
        else:
            print(f"UNSTABLE {n}")
    print("\nstable:", json.dumps(stable))


if __name__ == "__main__":
    main(sys.argv[1:] or CANDIDATES)
