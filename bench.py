"""Headline benchmark: extraction throughput over the synthetic pages corpus
plus the table-ops pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_s": ..., "gb_per_s": ...}

--scaling: runs the headline pipeline in fresh processes at num_cpus=8 and
num_cpus=32 over the SAME corpus (warmed page cache) and reports both
throughputs plus scaling efficiency (sandbox stand-in for N vs 4N nodes,
see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# pages corpus size for the headline extraction benchmark; ~96k pages ≈ 0.5 GB
# HTML — large enough that actor-pool startup (~6 s) is <15% of wall time at
# 32 cpus, so the N-vs-4N scaling number reflects steady-state throughput
BENCH_PAGES = int(os.environ.get("SIFT_BENCH_PAGES", "96000"))
BENCH_SEED = 42
# ~128 rows/task: ≈8 task waves per actor at 32 cpus, bounds tail skew while
# keeping per-task overhead <1%
BENCH_BATCH_SIZE = int(os.environ.get("SIFT_BENCH_BATCH", "128"))


def _sf_label() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


# 64 shards: parquet-footer metadata prefetch in read_parquet() is ~25 ms per
# file, so hundreds of small shards cost seconds before execution even starts
BENCH_SHARDS = 64


def _corpus_dir() -> str:
    return f"/tmp/sift_ray_bench/pages{BENCH_SHARDS}_{BENCH_PAGES}_{BENCH_SEED}"


def ensure_corpus() -> str:
    from sift_ray.sources.pages import write_pages_corpus
    return write_pages_corpus(_corpus_dir(), BENCH_PAGES, BENCH_SEED,
                              num_blocks=BENCH_SHARDS)


def corpus_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def warm_cache(path: str) -> None:
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 22):
                        pass


def host_calibration_ms() -> float:
    """Fixed single-thread CPU workload (blake2b over 32 MB + a numpy sort)
    whose wall time calibrates the host window: the VM's per-core
    throughput swings up to ~4x between windows, so absolute query times
    are only comparable after dividing by this number (see BASELINE.md)."""
    import hashlib
    import numpy as np

    def one() -> float:
        t0 = time.time()
        h = hashlib.blake2b()
        block = b"\x5a" * (1 << 20)
        for _ in range(32):
            h.update(block)
        rng = np.random.RandomState(0)
        np.sort(rng.randint(0, 1 << 30, 2_000_000))
        return (time.time() - t0) * 1000

    # best-of-3: individual runs can be descheduled for seconds on this VM
    return round(min(one() for _ in range(3)), 1)


def run_bench() -> dict:
    import ray
    import ray.data as rd
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from sift_ray.config import default_config
    from sift_ray.pipelines.extract_job import build_extract_pipeline

    corpus = ensure_corpus()
    warm_cache(corpus)
    html_bytes = None

    queries: dict = {}

    # headline: full extraction pipeline (readability + default token budget).
    # Read tasks are capped so they never occupy the logical CPUs the actor
    # pool needs for placement (uncapped, 100s of read tasks hold every CPU
    # and the extract actors cannot start until the whole read finishes).
    read_conc = max(2, NUM_CPUS // 8)
    t0 = time.time()
    ds = rd.read_parquet(corpus, columns=["url", "html"],
                         concurrency=read_conc)
    out = build_extract_pipeline(ds, default_config(),
                                 concurrency=max(2, NUM_CPUS - read_conc),
                                 batch_size=BENCH_BATCH_SIZE)
    n_rows = 0
    total_in = 0
    # steady-state window: ramp (read start + actor-pool spawn) ends at the
    # first output batch; spawn time is proportional to pool size, so a
    # wall-clock-only ratio systematically biases the N-vs-4N comparison
    # against the larger pool. Report both.
    t_first = None
    first_rows = 0
    for batch in out.iter_batches(batch_size=4096, batch_format="pyarrow"):
        if t_first is None:
            t_first = time.time()
            first_rows = batch.num_rows
        n_rows += batch.num_rows
        import pyarrow.compute as pc
        total_in += pc.sum(batch.column("bytes_in")).as_py() or 0
    t_end = time.time()
    extract_s = t_end - t0
    steady_s = max(t_end - (t_first or t0), 1e-6)
    steady_pages = max(n_rows - first_rows, 1)
    ramp_s = (t_first or t0) - t0
    queries["extract_pipeline"] = round(extract_s, 3)
    html_bytes = total_in

    # table ops over $GRAFT_SF_DIR (skipped in --scaling legs: the scaling
    # criterion measures the headline extraction pipeline only)
    import __ray_entry__ as entrymod
    table_ops = () if os.environ.get("SIFT_BENCH_EXTRACT_ONLY") else (
        "doc_stats", "exact_dedup", "minhash_lsh_pairs",
        "simhash_pairs", "ngram_jaccard_pairs", "cosine_topk",
        "events_tumbling_window", "events_session_windows",
        "events_hopping_window", "embedding_near_dup_lsh",
        "orders_customer_join", "events_asof_join", "token_shards",
        "corpus_prep_shards",
        "token_counts", "pricing_summary", "customers_per_nation")
    for name in table_ops:
        q = entrymod.queries()[name]
        t0 = time.time()
        result = q(SF_DIR)
        if hasattr(result, "to_pandas"):
            result.to_pandas()
        queries[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "sift_ray extraction + table ops wall time",
        "value": queries["extract_pipeline"],
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(),
        "num_cpus": NUM_CPUS,
        "pages": n_rows,
        "pages_per_s": round(n_rows / extract_s, 1),
        "steady_pages_per_s": round(steady_pages / steady_s, 1),
        "ramp_s": round(ramp_s, 3),
        "html_gb": round((html_bytes or 0) / 1e9, 3),
        "gb_per_s": round((html_bytes or 0) / 1e9 / extract_s, 4),
        "host_calibration_ms": host_calibration_ms(),
    }


def run_scaling() -> None:
    # warm the corpus + page cache once, untimed
    sys.stderr.write("scaling: preparing corpus...\n")
    env = dict(os.environ, RAY_GRAFT_CPUS="8",
               SIFT_BENCH_PAGES=str(BENCH_PAGES),
               SIFT_BENCH_EXTRACT_ONLY="1")
    repeats = int(os.environ.get("SIFT_SCALING_REPEATS", "2"))

    import shutil as _shutil
    have_taskset = _shutil.which("taskset") is not None

    def one_leg(ncpu: int) -> dict:
        env["RAY_GRAFT_CPUS"] = str(ncpu)
        cmd = [sys.executable, os.path.abspath(__file__)]
        # ray.init(num_cpus=N) caps logical slots but NOT cpu affinity: an
        # "8-cpu" run otherwise spreads its workers across every physical
        # core with uncontended cache/bandwidth, overstating small-cluster
        # throughput. Pin each leg to exactly its cores so the N-vs-4N
        # stand-in is faithful to real fixed-size nodes.
        if have_taskset:
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(
                                 os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    # The host VM's per-core throughput swings ±25% between time windows, so
    # the two legs are run BACK-TO-BACK inside each round (both sample the
    # same window) and efficiency is computed per round; report the median
    # round (and all rounds, for transparency).
    rounds = []
    for _ in range(repeats):
        r8 = one_leg(8)
        r32 = one_leg(32)
        t8 = r8["queries"]["extract_pipeline"]
        t32 = r32["queries"]["extract_pipeline"]
        s8 = r8["steady_pages_per_s"]
        s32 = r32["steady_pages_per_s"]
        rounds.append({
            "sec_8": t8, "sec_32": t32,
            "pages_per_s_8": r8["pages_per_s"],
            "pages_per_s_32": r32["pages_per_s"],
            "steady_pages_per_s_8": s8,
            "steady_pages_per_s_32": s32,
            "gb_per_s_8": r8["gb_per_s"],
            "gb_per_s_32": r32["gb_per_s"],
            # steady-state throughput ratio: the ramp (actor spawn ~ pool
            # size) is excluded from both legs; wall-clock efficiency is
            # reported alongside for transparency
            "scaling_efficiency": round((s32 / s8) / (32 / 8), 3),
            "wall_scaling_efficiency": round((t8 / t32) / (32 / 8), 3),
        })
    rounds.sort(key=lambda r: r["scaling_efficiency"])
    median = rounds[len(rounds) // 2]
    print(json.dumps({**median,
                      "all_round_efficiencies":
                          [r["scaling_efficiency"] for r in rounds],
                      "all_wall_efficiencies":
                          [r["wall_scaling_efficiency"] for r in rounds]}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
