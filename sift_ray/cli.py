"""Command-line entry point — the ``ray job submit`` surface.

Mirrors the reference CLI's flag surface (cmd/sift/main.go:17-127) mapped
onto the batch engine: instead of URL/file/stdin sources the input is a
Parquet pages table, and stdout becomes a partitioned Parquet sink with a
checkpoint manifest (resume = rerun the same command).

Usage (local or via `ray job submit -- python -m sift_ray ...`):

    python -m sift_ray extract --input /data/pages --output /data/out \
        [--selector .post] [--include-all] [--search "query"] \
        [--tokens N | --words N | --chars N] [--beginning|--middle|--end] \
        [--context-tokens N] [--format markdown|text|json] \
        [--group-size 64] [--concurrency N] [--batch-size N]

    python -m sift_ray gen-corpus --output /tmp/pages --pages 10000 [--seed 42]

Owns its Ray session (guarded init), unlike the driver-facing
``__ray_entry__`` module which must never call ray.init().
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sift_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    # the sift flag surface, shared by `extract` (batch) and `sift` (one doc)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--selector", default="",
                        help="CSS selector (overrides --include-all; sift -s)")
    common.add_argument("--include-all", action="store_true",
                        help="convert whole document, skip readability (sift -i)")
    common.add_argument("--search", default="", help="BM25 chunk search query")
    lim = common.add_mutually_exclusive_group()
    lim.add_argument("--tokens", type=int, default=0, help="token budget (sift -t)")
    lim.add_argument("--words", type=int, default=0, help="word budget (sift -w)")
    lim.add_argument("--chars", type=int, default=0, help="char budget (sift -c)")
    strat = common.add_mutually_exclusive_group()
    strat.add_argument("--beginning", action="store_true")
    strat.add_argument("--middle", action="store_true")
    strat.add_argument("--end", action="store_true")
    common.add_argument("--context-tokens", type=int, default=0,
                        help="smart-context unit budget (sift --context-tokens)")
    common.add_argument("--format", default="markdown",
                        choices=("markdown", "text", "json"))

    ex = sub.add_parser("extract", parents=[common],
                        help="run (or resume) the extraction job")
    ex.add_argument("--input", required=True,
                    help="parquet file or directory of the pages table")
    ex.add_argument("--output", required=True,
                    help="output directory (partitioned parquet + manifest)")
    ex.add_argument("--bucketed", action="store_true",
                    help="size-bucketed routing for heavy-tail corpora")
    ex.add_argument("--group-size", type=int, default=64,
                    help="input files per checkpoint partition")
    ex.add_argument("--concurrency", type=int, default=None,
                    help="extract actor pool size (default: cpus - cpus//8)")
    ex.add_argument("--batch-size", type=int, default=None)

    wj = sub.add_parser("web-job",
                        help="run (or resume) the end-to-end web corpus "
                             "job: pages -> extract -> clean -> shard "
                             "table (and optional physical shard files)")
    wj.add_argument("--input", required=True,
                    help="parquet file or directory of the pages table")
    wj.add_argument("--output", required=True,
                    help="output dir (docs/, shards/ + manifests)")
    wj.add_argument("--group-size", type=int, default=64)
    wj.add_argument("--shard-tokens", type=int, default=2000)
    wj.add_argument("--strip-boilerplate", action="store_true",
                    help="CCNet per-host template-line removal")
    wj.add_argument("--write-files", action="store_true",
                    help="materialize one parquet file per shard "
                         "(resumable at shard-group granularity)")
    wj.add_argument("--shard-groups", type=int, default=16)

    bk = sub.add_parser("bucketize",
                        help="write a parquet table as key-bucketed "
                             "co-partitioned storage (pay the key "
                             "exchange once; later joins/aggs on the key "
                             "are exchange-free; resumable per bucket)")
    bk.add_argument("--input", default=None,
                    help="parquet file or directory (not needed with "
                         "--compact)")
    bk.add_argument("--output", required=True)
    bk.add_argument("--key", required=True)
    bk.add_argument("--buckets", type=int, default=32)
    bk.add_argument("--append", metavar="INGEST_ID", default=None,
                    help="exactly-once delta ingest into an existing "
                         "store under this ingest id")
    bk.add_argument("--upsert", metavar="INGEST_ID", default=None,
                    help="exactly-once MERGE: delta rows REPLACE "
                         "same-key rows, new keys insert")
    bk.add_argument("--delete", metavar="INGEST_ID", default=None,
                    help="exactly-once keyed delete: --input is a "
                         "parquet of keys to remove (tombstones in "
                         "delta mode)")
    bk.add_argument("--mode", choices=["merge", "delta"], default="merge",
                    help="ingest mode: rewrite touched buckets (merge) "
                         "or O(delta) listed files (delta)")
    bk.add_argument("--compact", action="store_true",
                    help="fold delta files back to one sorted file per "
                         "bucket (no --input needed)")
    bk.add_argument("--vacuum", action="store_true",
                    help="remove files no manifest record references "
                         "(crash leftovers; no --input needed)")

    ej = sub.add_parser("export-jsonl",
                        help="export a parquet table as gzip JSONL shards "
                             "(manifest resume, byte-deterministic)")
    ej.add_argument("--input", required=True)
    ej.add_argument("--output", required=True)
    ej.add_argument("--id-col", default="doc_id")
    ej.add_argument("--groups", type=int, default=16)

    zm = sub.add_parser("zonemap",
                        help="range-partitioned key-sorted storage with "
                             "manifest zonemaps: write, O(delta) append, "
                             "compact, pruned range read")
    zm.add_argument("action", choices=["write", "append", "compact",
                                       "vacuum", "read"])
    zm.add_argument("--store", required=True)
    zm.add_argument("--input", default=None)
    zm.add_argument("--key", default=None)
    zm.add_argument("--files", type=int, default=32)
    zm.add_argument("--ingest-id", default=None)
    zm.add_argument("--mode", choices=["merge", "delta"], default="merge")
    zm.add_argument("--lo", type=int, default=None)
    zm.add_argument("--hi", type=int, default=None)
    zm.add_argument("--limit", type=int, default=20,
                    help="rows printed by read")
    zm.add_argument("--as-of", default=None, dest="as_of",
                    help="time-travel read: ingest id (or __base__) whose "
                         "snapshot to reconstruct from the manifest ledger")

    ib = sub.add_parser("index-build",
                        help="build (or resume) the persistent "
                             "term-partitioned inverted index over a "
                             "docs parquet table")
    ib.add_argument("--input", required=True,
                    help="parquet file or directory with doc_id/text")
    ib.add_argument("--output", required=True)
    ib.add_argument("--buckets", type=int, default=64)
    ib.add_argument("--text-col", default="text")
    ib.add_argument("--id-col", default="doc_id")

    iq = sub.add_parser("index-query",
                        help="BM25 top-k from the persistent index "
                             "(reads only the buckets the terms hash to)")
    iq.add_argument("--index", required=True)
    iq.add_argument("--terms", required=True,
                    help="space-separated query terms")
    iq.add_argument("--k", type=int, default=20)
    iq.add_argument("--mode", choices=["or", "and"], default="or")
    iq.add_argument("--phrase", action="store_true",
                    help="exact consecutive-token phrase match (needs an "
                         "index built with --positional)")
    ib.add_argument("--positional", action="store_true",
                    help="store token positions (enables phrase queries)")

    dsp = sub.add_parser("dedup-spans",
                         help="exact duplicate-span detection/removal "
                              "(Lee et al. 2021 substring dedup via "
                              "winnowing anchors)")
    dsp.add_argument("action", choices=["detect", "strip"])
    dsp.add_argument("--input", required=True,
                     help="parquet table with id/text columns")
    dsp.add_argument("--output", required=True,
                     help="output parquet directory")
    dsp.add_argument("--id-col", default="doc_id")
    dsp.add_argument("--text-col", default="text")
    dsp.add_argument("--min-len", type=int, default=100,
                     help="minimum duplicated span length (chars)")
    dsp.add_argument("--k", type=int, default=16,
                     help="anchor k-gram size")
    dsp.add_argument("--max-df", type=int, default=50,
                     help="hot-anchor bucket cap (boilerplate)")
    dsp.add_argument("--within-doc", action="store_true",
                     help="also detect/cut same-document repeats")

    cdc = sub.add_parser("cdc",
                         help="content-defined chunking (FastCDC) family: "
                              "chunk table, corpus dedup stats, or the "
                              "chunk-store dedup materializer")
    cdc.add_argument("action", choices=["chunks", "stats", "dedup"])
    cdc.add_argument("--input", required=True,
                     help="parquet table with id + payload columns")
    cdc.add_argument("--output", required=True,
                     help="output parquet directory")
    cdc.add_argument("--id-col", default="doc_id")
    cdc.add_argument("--data-col", default="text",
                     help="payload column (string or binary)")
    cdc.add_argument("--min-size", type=int, default=2048)
    cdc.add_argument("--avg-size", type=int, default=8192)
    cdc.add_argument("--max-size", type=int, default=65536)

    ann = sub.add_parser("ann",
                         help="product-quantization ANN: encode a vector "
                              "table to PQ codes or search top-k by "
                              "asymmetric distance (plain PQ or IVF-PQ)")
    ann.add_argument("action", choices=["encode", "topk", "ivfpq-topk"])
    ann.add_argument("--input", required=True,
                     help="parquet table with id + vector columns")
    ann.add_argument("--output", required=True,
                     help="output parquet directory")
    ann.add_argument("--id-col", default="vec_id")
    ann.add_argument("--vec-col", default="embedding")
    ann.add_argument("--m", type=int, default=4,
                     help="subspace count (bytes per code)")
    ann.add_argument("--clusters", type=int, default=16,
                     help="codewords per subspace (and coarse cells "
                          "for ivfpq-topk)")
    ann.add_argument("--k", type=int, default=10, help="neighbors")
    ann.add_argument("--n-probe", type=int, default=4)
    ann.add_argument("--queries", default="",
                     help="comma-separated query ids (topk modes)")

    gen = sub.add_parser("gen-corpus", help="write a deterministic synthetic "
                                            "pages corpus")
    gen.add_argument("--output", required=True)
    gen.add_argument("--pages", type=int, default=10000)
    gen.add_argument("--seed", type=int, default=42)
    gen.add_argument("--shards", type=int, default=64)

    # single-document mode: the reference CLI's exact UX (sift FILE -> stdout)
    sd = sub.add_parser("sift", parents=[common],
                        help="sift one source (URL, HTML file, or '-' for "
                             "stdin) to stdout — the reference CLI surface")
    sd.add_argument("source", help="http(s) URL, HTML file path, or '-' "
                                   "for stdin")
    return p


def _config_from_args(args) -> "object":
    from .config import BEGINNING, END, MIDDLE, default_config
    strategy = MIDDLE if args.middle else END if args.end else BEGINNING
    kw = dict(selector=args.selector, include_all=args.include_all,
              sizing_strategy=strategy, output_format=args.format,
              context_units=args.context_tokens,
              use_smart_context=args.context_tokens > 0)
    return default_config(search=args.search, token_limit=args.tokens,
                          word_limit=args.words, char_limit=args.chars, **kw)


def _run_sift_one(args) -> int:
    """Single-document path (reference: sift URL/file/- -> stdout). Pure
    function, no Ray session. Source dispatch mirrors fetch.go:76-91:
    '-' -> stdin, http(s):// -> live fetch, else file. Same failure
    discipline as the batch stage: any per-document error becomes a clean
    stderr line + exit 1."""
    from .stages.extract import SiftPipelineStage

    if args.source == "-":
        html = sys.stdin.read()
    elif args.source.startswith(("http://", "https://")):
        from .sources.fetch import fetch_url
        body, status, err, _code = fetch_url(args.source)
        if status != "ok":
            print(f"error: {err or status}", file=sys.stderr)
            return 1
        html = body.decode("utf-8", errors="replace")
    else:
        with open(args.source, "r", encoding="utf-8", errors="replace") as f:
            html = f.read()
    cfg = _config_from_args(args)
    stage = SiftPipelineStage(cfg)  # sets recursion limit, quarantines errors
    md, status, err = stage.extract.extract_row("", html.encode("utf-8"))
    if status not in ("ok", "empty"):
        print(f"error: {err}", file=sys.stderr)
        return 1
    try:
        out = stage.sift.sift_row(md) if md else ""
    except Exception as exc:
        print(f"error: {type(exc).__name__}: {exc}", file=sys.stderr)
        return 1
    print(out, end="")
    return 0


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    if args.cmd == "sift":
        return _run_sift_one(args)
    import ray
    started_here = not ray.is_initialized()
    if started_here:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        if args.cmd == "extract":
            from .pipelines.extract_job import run_extract_job
            summary = run_extract_job(
                args.input, args.output, _config_from_args(args),
                group_size=args.group_size, concurrency=args.concurrency,
                batch_size=args.batch_size, bucketed=args.bucketed)
            print(json.dumps(summary, default=str))
        elif args.cmd == "web-job":
            from .pipelines.web_pipeline import run_web_corpus_job
            summary = run_web_corpus_job(
                args.input, args.output, group_size=args.group_size,
                shard_tokens=args.shard_tokens,
                strip_boilerplate=args.strip_boilerplate,
                write_files=args.write_files,
                shard_groups=args.shard_groups)
            print(json.dumps(summary, default=str))
        elif args.cmd == "bucketize":
            import ray.data as rd

            from .sources.bucketed import (append_bucketed,
                                           compact_bucketed,
                                           delete_bucketed,
                                           upsert_bucketed, vacuum,
                                           write_bucketed)
            if args.vacuum:
                summary = vacuum(args.output)
            elif args.compact:
                summary = compact_bucketed(args.output, key=args.key)
            elif args.input is None:
                raise SystemExit("bucketize: --input is required unless "
                                 "--compact")
            elif args.append:
                summary = append_bucketed(rd.read_parquet(args.input),
                                          args.output, key=args.key,
                                          ingest_id=args.append,
                                          mode=args.mode)
            elif args.upsert:
                summary = upsert_bucketed(rd.read_parquet(args.input),
                                          args.output, key=args.key,
                                          ingest_id=args.upsert,
                                          mode=args.mode)
            elif args.delete:
                summary = delete_bucketed(rd.read_parquet(args.input),
                                          args.output, key=args.key,
                                          ingest_id=args.delete,
                                          mode=args.mode)
            else:
                summary = write_bucketed(rd.read_parquet(args.input),
                                         args.output, key=args.key,
                                         buckets=args.buckets)
            print(json.dumps(summary, default=str))
        elif args.cmd == "export-jsonl":
            import ray.data as rd

            from .sources.jsonl import write_jsonl_shards
            summary = write_jsonl_shards(rd.read_parquet(args.input),
                                         args.output, groups=args.groups,
                                         id_col=args.id_col)
            print(json.dumps(summary, default=str))
        elif args.cmd == "zonemap":
            import ray.data as rd

            from .sources.zonemap import (append_sorted, compact_sorted,
                                          read_key_range, write_sorted)
            if args.action == "write":
                assert args.input and args.key, "write needs --input --key"
                summary = write_sorted(rd.read_parquet(args.input),
                                       args.store, key=args.key,
                                       files=args.files)
            elif args.action == "append":
                assert args.input and args.ingest_id, \
                    "append needs --input --ingest-id"
                summary = append_sorted(rd.read_parquet(args.input),
                                        args.store,
                                        ingest_id=args.ingest_id,
                                        mode=args.mode)
            elif args.action == "compact":
                summary = compact_sorted(args.store)
            elif args.action == "vacuum":
                from .sources.bucketed import vacuum
                summary = vacuum(args.store)
            else:
                rows = (read_key_range(args.store, args.lo, args.hi,
                                       as_of=args.as_of)
                        .limit(args.limit).to_pandas())
                for _, r in rows.iterrows():
                    print(json.dumps(
                        {c: (int(v) if hasattr(v, "item") else v)
                         for c, v in r.items()}, default=str))
                summary = {"rows_printed": len(rows)}
            print(json.dumps(summary, default=str))
        elif args.cmd == "index-build":
            import ray.data as rd

            from .sources.text_index import build_text_index
            meta = build_text_index(
                rd.read_parquet(args.input,
                                columns=[args.id_col, args.text_col]),
                args.output, text_col=args.text_col, id_col=args.id_col,
                buckets=args.buckets, positional=args.positional)
            print(json.dumps(meta, default=str))
        elif args.cmd == "index-query":
            if args.phrase:
                from .sources.text_index import phrase_query
                res = phrase_query(args.index,
                                   args.terms.split()).to_pandas()
                for _, r in res.iterrows():
                    print(json.dumps({"doc_id": int(r["doc_id"]),
                                      "n_matches": int(r["n_matches"])}))
            else:
                from .sources.text_index import query_text_index
                res = query_text_index(args.index, args.terms.split(),
                                       k=args.k, mode=args.mode).to_pandas()
                for _, r in res.iterrows():
                    print(json.dumps({"doc_id": int(r["doc_id"]),
                                      "score_micro": int(r["score_micro"])}))
        elif args.cmd == "dedup-spans":
            import ray.data as rd

            from .functions.spandedup import (duplicate_spans,
                                              strip_duplicate_spans)
            docs = rd.read_parquet(args.input,
                                   columns=[args.id_col, args.text_col])
            kw = dict(min_len=args.min_len, k=args.k, max_df=args.max_df,
                      text_col=args.text_col, id_col=args.id_col,
                      within_doc=args.within_doc)
            if args.action == "detect":
                out = duplicate_spans(docs, **kw)
            else:
                out = strip_duplicate_spans(docs, **kw)
            out.write_parquet(args.output)
            print(json.dumps({"action": args.action, "rows": out.count(),
                              "output": args.output}))
        elif args.cmd == "cdc":
            import ray.data as rd

            from .functions.cdc import (cdc_chunks, cdc_dedup_docs,
                                        cdc_dedup_stats)
            docs = rd.read_parquet(args.input,
                                   columns=[args.id_col, args.data_col])
            kw = dict(data_col=args.data_col, id_col=args.id_col,
                      min_size=args.min_size, avg_size=args.avg_size,
                      max_size=args.max_size)
            fn = {"chunks": cdc_chunks, "stats": cdc_dedup_stats,
                  "dedup": cdc_dedup_docs}[args.action]
            out = fn(docs, **kw)
            out.write_parquet(args.output)
            print(json.dumps({"action": args.action, "rows": out.count(),
                              "output": args.output}))
        elif args.cmd == "ann":
            import ray.data as rd

            from .functions.pq import (ivfpq_topk, pq_encode, pq_topk,
                                       pq_train)
            ds = rd.read_parquet(args.input,
                                 columns=[args.id_col, args.vec_col])
            kw = dict(vec_col=args.vec_col, id_col=args.id_col)
            if args.action == "encode":
                books = pq_train(ds, m=args.m, n_clusters=args.clusters,
                                 **kw)
                out = pq_encode(ds, books, **kw)
            else:
                qids = [int(x) for x in args.queries.split(",") if x]
                if not qids:
                    raise SystemExit("--queries required for topk modes")
                if args.action == "topk":
                    out = pq_topk(ds, qids, k=args.k, m=args.m,
                                  n_clusters=args.clusters, **kw)
                else:
                    out = ivfpq_topk(ds, qids, k=args.k, m=args.m,
                                     n_clusters=args.clusters,
                                     pq_clusters=args.clusters,
                                     n_probe=args.n_probe, **kw)
            out.write_parquet(args.output)
            print(json.dumps({"action": args.action, "rows": out.count(),
                              "output": args.output}))
        elif args.cmd == "gen-corpus":
            from .sources.pages import write_pages_corpus
            out = write_pages_corpus(args.output, args.pages, args.seed,
                                     num_blocks=args.shards)
            print(json.dumps({"corpus": out, "pages": args.pages}))
    finally:
        if started_here:  # never tear down a caller's Ray session
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
