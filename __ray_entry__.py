"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().

Queries fall into two families:
* extraction family (the sift parity surface, SURVEY.md §2.1-2.7) — runs over
  the deterministic synthetic pages corpus (BASELINE.json input_hint shape;
  generated on demand under /tmp, seed-fixed). Not SQL-expressible
  (readability/markdown/BM25), so these are rows-only checks; byte-level
  correctness is enforced by the frozen goldens in tests/test_goldens.py.
* table ops family (dedup / similarity / text analysis / windows /
  multimodal) — runs over the driver's testdata tables with DuckDB oracle
  SQL computing identical values (ASCII-explicit regexes, order-independent
  exact aggregates, integer ranks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_PAGES_BY_SF = {"sf0.001": 150, "sf0.01": 400, "sf0.1": 1500}


def _pages_corpus_for(sf_dir: str) -> str:
    """Deterministic pages corpus sized by scale factor, cached in /tmp."""
    from sift_ray.sources.pages import write_pages_corpus
    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = _PAGES_BY_SF.get(sf, 400)
    out = f"/tmp/sift_ray_pages/{sf}_{n}"
    return write_pages_corpus(out, n)


def _docs(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def _extract_query(cfg_kwargs: dict):
    def run(sf_dir: str):
        import ray.data as rd
        from sift_ray.config import SiftConfig, default_config
        from sift_ray.pipelines.extract_job import build_extract_pipeline
        corpus = _pages_corpus_for(sf_dir)
        ds = rd.read_parquet(corpus, columns=["url", "html"])
        if cfg_kwargs.get("_default"):
            cfg = default_config(search=cfg_kwargs.get("search", ""))
        else:
            cfg = SiftConfig(**{k: v for k, v in cfg_kwargs.items()
                                if not k.startswith("_")})
        out = build_extract_pipeline(ds, cfg)  # default: task-based stage
        return out.select_columns(["url", "status", "extracted_md"])
    return run


def entry() -> Any:
    """Flagship pipeline on the sf0.001-sized corpus: read pages ->
    readability extract -> default 2500-token sizing -> (url, status,
    extracted_md)."""
    return _extract_query({"_default": True})("/root/testdata/sf0.001")


# --- table-ops queries ------------------------------------------------------

def _q_doc_stats(sf_dir: str):
    from sift_ray.functions.textstats import doc_stats
    return doc_stats(_docs(sf_dir, ["doc_id", "text"]))


def _q_char_entropy(sf_dir: str):
    """Per-doc Shannon character entropy in exact integer micro-nats (the
    'unigram entropy' gibberish signal): per-char terms quantized before
    the order-free integer sum. Zero shuffle, one vectorized kernel."""
    from sift_ray.functions.textstats import char_entropy
    return char_entropy(_docs(sf_dir, ["doc_id", "text"]))


def _q_doc_digest(sf_dir: str):
    from sift_ray.functions.textstats import digest_batch
    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda t: digest_batch(t).select(["doc_id", "digest"]),
        batch_format="pyarrow")


def _q_quality_filter(sf_dir: str):
    from sift_ray.functions.textstats import quality_filter
    return quality_filter(_docs(sf_dir, ["doc_id", "text"]))


def _q_exact_dedup(sf_dir: str):
    from sift_ray.functions.dedup import exact_dedup
    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def _q_size_limit_words(sf_dir: str):
    from sift_ray.textproc.selection import apply_simple_size_limit
    import pyarrow as pa

    def limit(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = [apply_simple_size_limit(t or "", 20, "words") for t in texts]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "limited": pa.array(out, pa.string())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        limit, batch_format="pyarrow")


def _q_token_counts(sf_dir: str):
    from sift_ray.functions.textstats import token_counts
    return token_counts(_docs(sf_dir, ["doc_id", "text"]))


def _q_lang_id(sf_dir: str):
    from sift_ray.functions.textstats import lang_id
    return lang_id(_docs(sf_dir, ["doc_id", "text"]))


def _q_fingerprints(sf_dir: str):
    from sift_ray.functions.textstats import fingerprints
    return fingerprints(_docs(sf_dir, ["doc_id", "text"]))


def _q_dedup_docs(sf_dir: str):
    from sift_ray.functions.dedup import dedup_docs
    out = dedup_docs(_docs(sf_dir, ["doc_id", "text"]))
    return out.select_columns(["doc_id", "digest"])


def _q_near_dedup_docs(sf_dir: str):
    from sift_ray.functions.dedup import near_dedup_docs
    out = near_dedup_docs(_docs(sf_dir, ["doc_id", "text"]),
                          k=3, threshold=0.5)
    return out.select_columns(["doc_id"])


def _q_cdc_chunks(sf_dir: str):
    """FastCDC content-defined chunk table (cdc.py; small-size params so
    KB-scale synthetic docs still split into multiple chunks)."""
    from sift_ray.functions.cdc import cdc_chunks
    return cdc_chunks(_docs(sf_dir, ["doc_id", "text"]),
                      min_size=64, avg_size=256, max_size=1024)


def _q_cdc_dedup_stats(sf_dir: str):
    """Corpus-wide chunk-level dedup statistics per document."""
    from sift_ray.functions.cdc import cdc_dedup_stats
    return cdc_dedup_stats(_docs(sf_dir, ["doc_id", "text"]),
                           min_size=64, avg_size=256, max_size=1024)


def _q_cdc_dedup_docs(sf_dir: str):
    """Chunk-level dedup materializer (cdc.cdc_dedup_docs): payloads
    rewritten with globally-duplicate CDC chunks removed — the chunk
    store's write path. Projected to (doc_id, n_bytes, digest) so the
    binary payload stays hashable in the driver compare."""
    import hashlib

    import pyarrow as pa

    from sift_ray.functions.cdc import cdc_dedup_docs

    out = cdc_dedup_docs(_docs(sf_dir, ["doc_id", "text"]),
                         min_size=64, avg_size=256, max_size=1024)

    def project(t: pa.Table) -> pa.Table:
        data = t.column("data").to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bytes": pa.array([len(b) for b in data], pa.int64()),
            "digest": pa.array(
                [hashlib.sha256(b).hexdigest() for b in data],
                pa.string())})

    return out.map_batches(project, batch_format="pyarrow")


def _q_duplicate_spans(sf_dir: str):
    """Exact maximal duplicated spans (Lee et al. 2021 substring dedup,
    winnowing-anchored distributed formulation, spandedup.py)."""
    from sift_ray.functions.spandedup import duplicate_spans
    return duplicate_spans(_docs(sf_dir, ["doc_id", "text"]),
                           min_len=40, k=12)


def _q_strip_duplicate_spans(sf_dir: str):
    """Corpus with later-occurrence duplicated spans removed; projected to
    (doc_id, n_chars, digest) so the result stays compact and hashable."""
    import hashlib

    import pyarrow as pa

    from sift_ray.functions.spandedup import strip_duplicate_spans
    out = strip_duplicate_spans(_docs(sf_dir, ["doc_id", "text"]),
                                min_len=40, k=12)

    def project(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            "digest": pa.array(
                [hashlib.sha256(x.encode()).hexdigest() for x in texts],
                pa.string())})

    return out.map_batches(project, batch_format="pyarrow")


def _q_ngram_jaccard(sf_dir: str):
    from sift_ray.functions.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               k=3, threshold=0.5)


def _q_ngram_jaccard_prefix(sf_dir: str):
    """PPJoin-style prefix-filtered EXACT Jaccard pairs: same answer as
    ngram_jaccard_pairs (same oracle), but only each doc's prefix grams
    are exchanged and the hot-last sampled token order keeps stop-grams
    out of every prefix — the scale path for threshold >= 0.5
    (dedup.py::ngram_jaccard_pairs_prefix)."""
    from sift_ray.functions.dedup import ngram_jaccard_pairs_prefix
    return ngram_jaccard_pairs_prefix(_docs(sf_dir, ["doc_id", "text"]),
                                      k=3, threshold=0.5)


def _q_ngram_containment(sf_dir: str):
    """Max-containment near-dup pairs (isect / min set size): the
    subset-quote signal Jaccard dilutes — dedup.py metric="containment"."""
    from sift_ray.functions.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               k=3, threshold=0.6, metric="containment")


def _q_cosine_topk_ivf(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.similarity import cosine_topk_ivf
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk_ivf(ds, query_ids=[0, 1, 2, 3, 4], k=10,
                           n_clusters=16, n_probe=6)


def _q_minhash_pairs(sf_dir: str):
    from sift_ray.functions.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                             jaccard_threshold=0.5)


def _q_simhash_pairs(sf_dir: str):
    from sift_ray.functions.dedup import simhash_pairs
    return simhash_pairs(_docs(sf_dir, ["doc_id", "text"]))


def _q_fuzzy_name_pairs(sf_dir: str):
    """Exact Levenshtein<=1 pairs over customer names via the FastSS
    deletion-neighborhood exchange (functions/fuzzy.py)."""
    import ray.data as rd
    from sift_ray.functions.fuzzy import fuzzy_pairs
    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"])
    return fuzzy_pairs(ds, id_col="c_custkey", text_col="c_name", k=1)


def _q_fuzzy_part_match(sf_dir: str):
    """Entity-resolution shape: distinct part names on each side of a
    size split, fuzzily matched across sides at Levenshtein<=2
    (functions/fuzzy.py::fuzzy_join over the variant-hash exchange)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.fuzzy import _h64, fuzzy_join
    from sift_ray.functions.shuffle import partitioned_group_agg

    import pyarrow as pa

    ds = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name", "p_size"])

    # both sides' per-name distinct (min partkey as id) in ONE
    # (name, side) group exchange instead of one exchange per side;
    # the sides split map-side from the materialized aggregate
    def tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_name": t.column("p_name"),
            "p_partkey": t.column("p_partkey"),
            "side": pc.cast(pc.greater(t.column("p_size"), 25),
                            pa.int64())})

    def name_keys(batch):
        import numpy as np
        return [np.fromiter((_h64(s) for s in
                             batch.column("p_name").to_pylist()),
                            dtype=np.int64, count=batch.num_rows),
                batch.column("side").to_numpy(zero_copy_only=False)]

    both = partitioned_group_agg(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["p_name", "side"], [("p_partkey", "min", "id")],
        key_arrays_fn=name_keys).materialize()

    def pick(side_val):
        return both.map_batches(
            lambda t, sv=side_val: t.filter(
                pc.equal(t.column("side"), sv)).select(["p_name", "id"]),
            batch_format="pyarrow")

    return fuzzy_join(pick(0), pick(1), id_col="id",
                      text_col="p_name", k=2)


def _q_extract_pdf(sf_dir: str):
    """PDF text extraction (north-rule 'PDF/layout parse' axis) over a
    deterministic synthetic PDF corpus, incl. quarantine rows."""
    import hashlib
    import pandas as pd
    import ray.data as rd
    from sift_ray.extract.pdf import extract_pdfs, make_simple_pdf

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 40, "sf0.01": 120, "sf0.1": 400}.get(sf, 120)
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"sift-ray-pdf-{i}".encode()).hexdigest()
        if i % 17 == 5:
            payload = b"%PDF-1.4\ngarbage without streams\n%%EOF"  # unsupported
        elif i % 23 == 7:
            payload = b"not a pdf at all"
        else:
            lines = [f"Document {i} page text {h[:12]}",
                     f"Second line {h[12:24]}",
                     f"Third line with numbers {i * 7}"]
            payload = make_simple_pdf(lines, compress=(i % 2 == 0))
        rows.append({"url": f"pdf://corpus/{i:06d}", "payload": payload})
    ds = rd.from_pandas(pd.DataFrame(rows))
    return extract_pdfs(ds, concurrency=2)


def _q_extract_pdf_layout(sf_dir: str):
    """Positional PDF layout parse (extract_pdf_text(layout=True)): runs
    carry their Tm/Td text-space origin; baselines cluster into lines,
    lines sort top-to-bottom, runs left-to-right — PDFs whose content
    stream draws out of reading order still extract correctly. Corpus
    plants scrambled-order pages (every draw order is a seeded shuffle);
    exact reading-order recovery is pinned in tests/test_pdf.py."""
    import hashlib
    import random
    import pandas as pd
    import ray.data as rd
    from sift_ray.extract.pdf import extract_pdfs, make_positioned_pdf

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 40, "sf0.01": 120, "sf0.1": 400}.get(sf, 120)
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"sift-ray-pdf-layout-{i}".encode()).hexdigest()
        runs = [(72, 720 - 14 * j, f"line {j} of doc {i} {h[:8]}")
                for j in range(6)]
        random.Random(i).shuffle(runs)  # draw order != reading order
        rows.append({"url": f"pdf://layout/{i:06d}",
                     "payload": make_positioned_pdf(runs,
                                                    compress=(i % 2 == 0))})
    ds = rd.from_pandas(pd.DataFrame(rows))
    return extract_pdfs(ds, concurrency=2, layout=True)


def _q_extract_bucketed(sf_dir: str):
    """Size-bucketed extraction — byte-identical to extract_default_budget
    (asserted in tests/test_ray_pipeline.py); evidences the heavy-tail
    routing path."""
    import ray.data as rd
    from sift_ray.config import default_config
    from sift_ray.pipelines.extract_job import build_bucketed_extract_pipeline
    corpus = _pages_corpus_for(sf_dir)
    ds = rd.read_parquet(corpus, columns=["url", "html"])
    out = build_bucketed_extract_pipeline(ds, default_config())
    return out.select_columns(["url", "status", "extracted_md"])


def _q_tfidf_best_chunk(sf_dir: str):
    """Optional TF-IDF scorer (reference tfidf.go — dead code there,
    implemented here as a working operator): per document, the best-scoring
    chunk index for a fixed query, over the reference chunker's output."""
    import pyarrow as pa
    from sift_ray.textproc.selection import ChunkSelector
    from sift_ray.textproc.tfidf import Corpus

    query = "carrot cake recipe"

    class TfidfStage:
        def __init__(self):
            self.selector = ChunkSelector("words", 0, "beginning")

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            best_idx, best_score = [], []
            for t in texts:
                chunks = self.selector.prepare_chunks(t or "")
                if not chunks:
                    best_idx.append(-1)
                    best_score.append(0.0)
                    continue
                corpus = Corpus(chunks)
                scores = [corpus.score(query, i) for i in range(len(chunks))]
                bi = max(range(len(scores)),
                         key=lambda i: (scores[i], -i))  # stable tiebreak
                best_idx.append(bi)
                best_score.append(float(scores[bi]))
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "best_chunk_index": pa.array(best_idx, pa.int32()),
                "best_score": pa.array(best_score, pa.float64()),
            })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TfidfStage, batch_format="pyarrow", concurrency=2)


def _q_chunk_stats(sf_dir: str):
    """Reference chunker (C1-C5) applied per document."""
    import pyarrow as pa
    from sift_ray.textproc.selection import ChunkSelector

    class ChunkStats:
        def __init__(self):
            self.selector = ChunkSelector("words", 0, "beginning")

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            n_chunks, max_bytes = [], []
            for t in texts:
                chunks = self.selector.prepare_chunks(t or "")
                n_chunks.append(len(chunks))
                max_bytes.append(max((len(c.encode()) for c in chunks),
                                     default=0))
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_chunks": pa.array(n_chunks, pa.int64()),
                "max_chunk_bytes": pa.array(max_bytes, pa.int64()),
            })
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ChunkStats, batch_format="pyarrow", concurrency=2)


def _q_cosine_topk(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.similarity import cosine_topk
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk(ds, query_ids=[0, 1, 2, 3, 4], k=10)


def _q_embedding_near_dup(sf_dir: str):
    # threshold 0.4 (not 0.8): the synthetic embeddings are near-uniform
    # (max pairwise cosine ~0.5 at sf0.01), so 0.4 yields a NON-EMPTY pair
    # set at every sf — the oracle check has teeth instead of matching 0=0
    import ray.data as rd
    from sift_ray.functions.similarity import embedding_near_dup_exact
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_dup_exact(ds, threshold=0.4)


def _q_embedding_near_dup_lsh(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.similarity import embedding_near_dup
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # 16 tables x 4 planes: per-pair recall 1-(1-p^4)^16 ~ 0.94 at cos 0.4
    return embedding_near_dup(ds, threshold=0.4, n_planes=4, n_tables=16)


def _q_decode_bmp(sf_dir: str):
    """Real BMP decode (stdlib struct + numpy) over a deterministic
    synthetic image corpus with quarantine rows mixed in."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.multimodal import decode_bmps, make_bmp

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 40, "sf0.01": 120, "sf0.1": 400}.get(sf, 120)
    rows = []
    for i in range(n):
        if i % 19 == 4:
            payload = b"\x89PNG not a bmp"
        else:
            payload = make_bmp(4 + i % 32, 3 + i % 21,
                               rgb=(i % 256, (i * 7) % 256, (i * 13) % 256))
        rows.append({"doc_id": i, "payload": payload})
    return decode_bmps(rd.from_pandas(pd.DataFrame(rows)))


def _q_decode_wav(sf_dir: str):
    """Real PCM WAV decode (stdlib struct + numpy) over a deterministic
    synthetic audio corpus with quarantine rows mixed in."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.multimodal import decode_wavs, make_wav

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 40, "sf0.01": 120, "sf0.1": 400}.get(sf, 120)
    rows = []
    for i in range(n):
        if i % 17 == 5:
            payload = b"ID3 not a wav"
        else:
            payload = make_wav(110.0 * (1 + i % 8), 0.01 + (i % 4) * 0.01,
                               8000 if i % 2 else 16000,
                               channels=1 + i % 2, bits=8 if i % 5 == 0
                               else 16)
        rows.append({"doc_id": i, "payload": payload})
    return decode_wavs(rd.from_pandas(pd.DataFrame(rows)))


def _q_decode_gif(sf_dir: str):
    """Real GIF decode (own LZW) over a deterministic synthetic animated
    corpus — frame counting is the frame-sample path for video-like
    payloads; quarantine rows mixed in."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.multimodal import decode_gifs, make_gif

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 30, "sf0.01": 80, "sf0.1": 250}.get(sf, 80)
    pal = [(i, 255 - i, (i * 3) % 256) for i in range(0, 256, 32)]
    rows = []
    for i in range(n):
        if i % 23 == 7:
            payload = b"\x89PNG not a gif"
        else:
            frames = [np.full((2 + i % 5, 3 + i % 4), (i + f) % len(pal),
                              dtype=np.uint8)
                      for f in range(1 + i % 4)]
            payload = make_gif(frames, pal)
        rows.append({"doc_id": i, "payload": payload})
    return decode_gifs(rd.from_pandas(pd.DataFrame(rows)))


def _digest_payload(batch):
    """Replace a binary ``payload`` column with its sha256 hex digest —
    an exact pin on the bytes that stays hashable/sortable through the
    driver's DuckDB-side oracle compare (BLOB -> bytearray is unhashable)."""
    import hashlib
    import pyarrow as pa
    payloads = batch.column("payload").to_pylist()
    sha = [hashlib.sha256(p).hexdigest() if p is not None else None
           for p in payloads]
    return batch.drop_columns(["payload"]).append_column(
        "payload_sha", pa.array(sha, pa.string()))


def _q_resize_images(sf_dir: str):
    """Real image resize (area-average resample via phash overlap
    matrices, BMP re-encode) over a mixed synthetic BMP/PNG corpus with
    quarantine rows — the thumbnail/normalize stage of an image training
    pipeline (functions/multimodal.py ResizeStage)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.multimodal import (make_bmp, make_png,
                                               resize_images)

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 40, "sf0.01": 120, "sf0.1": 400}.get(sf, 120)
    rows = []
    for i in range(n):
        if i % 19 == 4:
            payload = b"GIF8 not an image"
        elif i % 2:
            payload = make_bmp(8 + i % 40, 6 + i % 25,
                               rgb=(i % 256, (i * 7) % 256, (i * 13) % 256))
        else:
            h, w = 5 + i % 23, 7 + i % 31
            px = ((np.arange(h * w * 3, dtype=np.int64) * (i + 3)) % 256) \
                .astype(np.uint8).reshape(h, w, 3)
            payload = make_png(px)
        rows.append({"doc_id": i, "payload": payload})
    out = resize_images(rd.from_pandas(pd.DataFrame(rows)),
                        out_w=16, out_h=16)
    # driver-facing projection: digest the thumbnail bytes (exact pin on
    # the full payload) — raw BLOB columns are unhashable bytearrays on
    # the DuckDB side of the oracle compare
    return out.map_batches(_digest_payload, batch_format="pyarrow")


def _q_sample_frames(sf_dir: str):
    """Video-style frame sampling: every-2nd frame of each synthetic
    animated GIF as its own row (per-frame channel means + BMP payload) —
    the frame-sample plumbing a video pipeline plugs a codec into
    (functions/multimodal.py FrameSampleStage)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.multimodal import make_gif, sample_frames

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 30, "sf0.01": 80, "sf0.1": 250}.get(sf, 80)
    pal = [(i, 255 - i, (i * 3) % 256) for i in range(0, 256, 32)]
    rows = []
    for i in range(n):
        if i % 23 == 7:
            payload = b"\x89PNG not a gif"
        else:
            frames = [np.full((2 + i % 5, 3 + i % 4), (i + f) % len(pal),
                              dtype=np.uint8)
                      for f in range(1 + i % 6)]
            payload = make_gif(frames, pal)
        rows.append({"doc_id": i, "payload": payload})
    out = sample_frames(rd.from_pandas(pd.DataFrame(rows)), every_n=2)
    return out.map_batches(_digest_payload, batch_format="pyarrow")


def _q_audio_features(sf_dir: str):
    """Real audio feature extraction (Hann-windowed rfft: RMS energy,
    zero-crossing rate, spectral centroid per window) over a synthetic
    PCM tone corpus with quarantine rows (functions/multimodal.py
    AudioFeatureStage)."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.multimodal import audio_features, make_wav

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 40, "sf0.01": 120, "sf0.1": 400}.get(sf, 120)
    rows = []
    for i in range(n):
        if i % 17 == 5:
            payload = b"OggS not a wav"
        else:
            payload = make_wav(110.0 * (1 + i % 8), 0.05 + (i % 4) * 0.02,
                               8000 if i % 2 else 16000,
                               channels=1 + i % 2,
                               bits=8 if i % 5 == 0 else 16)
        rows.append({"doc_id": i, "payload": payload})
    return audio_features(rd.from_pandas(pd.DataFrame(rows)))


def _q_decode_png(sf_dir: str):
    """Real PNG decode (stdlib zlib + numpy, all five scanline filters)
    over a deterministic synthetic image corpus with quarantine rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.multimodal import decode_pngs, make_png

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 40, "sf0.01": 120, "sf0.1": 400}.get(sf, 120)
    rows = []
    for i in range(n):
        if i % 19 == 4:
            payload = b"BM not a png"
        else:
            rng = np.random.RandomState(i)
            px = rng.randint(0, 256, (3 + i % 21, 4 + i % 32, 3),
                             dtype=np.uint8)
            payload = make_png(px, color_type=2, filter_type=i % 5)
        rows.append({"doc_id": i, "payload": payload})
    return decode_pngs(rd.from_pandas(pd.DataFrame(rows)))


def _q_multimodal(sf_dir: str):
    from sift_ray.functions.multimodal import multimodal_features
    return multimodal_features(_docs(sf_dir, ["doc_id", "text"]))


def _q_pricing_summary(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.relational import pricing_summary
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"])
    return pricing_summary(ds)


def _q_customers_per_nation(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.relational import customers_per_nation
    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_nationkey", "c_acctbal"])
    return customers_per_nation(ds, os.path.join(sf_dir, "nation.parquet"))


def _q_topk_customers(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.relational import topk_per_group
    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_mktsegment", "c_acctbal", "c_custkey"])
    return topk_per_group(ds, "c_mktsegment", "c_acctbal", "c_custkey", k=3)


def _q_approx_distinct_by_priority(sf_dir: str):
    """Per-group HLL (sketch.approx_distinct_by) vs the exact per-group
    distinct — 5 rows with rel_err columns (rows-only: estimates)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum
    from sift_ray.functions.sketch import approx_distinct_by

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderpriority", "o_custkey"])
    approx = approx_distinct_by(ds, "o_orderpriority", "o_custkey",
                                precision=12).to_pandas()

    # exact: per-batch distinct-pair combiner -> distinct over (priority,
    # custkey) via the partitioned groupby -> tiny bounded-key count
    from sift_ray.functions.shuffle import partitioned_group_agg
    from sift_ray.functions.sketch import _hash64_route

    ds2 = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                          columns=["o_orderpriority", "o_custkey"])

    def keyfn(batch: pa.Table):
        return [_hash64_route(batch.column("o_orderpriority")).astype(np.int64),
                batch.column("o_custkey").to_numpy(zero_copy_only=False)]

    pairs = partitioned_group_agg(
        ds2, ["o_orderpriority", "o_custkey"], [(None, "count", "_n")],
        key_arrays_fn=keyfn)
    exact = (pairs.map_batches(
        lambda t: t.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
                   .rename_columns(["o_orderpriority", "n"]),
        batch_format="pyarrow")
        .groupby("o_orderpriority").aggregate(Sum("n", alias_name="exact"))
        .to_pandas())
    out = approx.merge(exact, on="o_orderpriority")
    out["rel_err"] = ((out["approx_distinct"] - out["exact"]).abs()
                      / out["exact"]).round(4)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def _q_corpus_prep(sf_dir: str):
    """Flagship end-to-end training-corpus prep: quality filter ->
    near-dedup -> token-budget shard packing (pipelines/corpus_prep.py),
    value-exact against the fully composed SQL."""
    from sift_ray.pipelines.corpus_prep import prepare_corpus
    return prepare_corpus(_docs(sf_dir, ["doc_id", "text"]),
                          shard_tokens=5000, k=3, threshold=0.5)


def _q_corpus_prep_ckpt(sf_dir: str):
    """Checkpointed flagship pipeline: the quality-filtered corpus is pinned
    through the resumable parquet-manifest protocol instead of the object
    store (pipelines/corpus_prep.py prepare_corpus_from_path) — the shape a
    run at 100 TB uses. Same oracle SQL as corpus_prep_shards: the
    checkpoint must not change a single value."""
    import os
    import tempfile
    from sift_ray.pipelines.corpus_prep import prepare_corpus_from_path
    ckpt = tempfile.mkdtemp(prefix="sift_corpus_ckpt_q_")
    return prepare_corpus_from_path(
        os.path.join(sf_dir, "documents.parquet"), ckpt,
        shard_tokens=5000, k=3, threshold=0.5)


def _q_export_jsonl(sf_dir: str):
    """Gzip-JSONL sink round-trip (sources/jsonl.py): documents ride one
    id-keyed exchange into per-group rows.jsonl.gz files (manifest resume,
    byte-identical reruns), then stream back through Ray's parallel JSON
    reader — checked value-exact against the identity SQL, so the sink AND
    source are both oracle-gated."""
    import tempfile

    import ray.data as rd
    from sift_ray.sources.jsonl import read_jsonl_shards, write_jsonl_shards

    out = tempfile.mkdtemp(prefix="sift_jsonl_q_")
    write_jsonl_shards(_docs(sf_dir, ["doc_id", "text"]), out, groups=8)
    return read_jsonl_shards(out)


def _q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct (functions/sketch.py) vs the exact
    distinct computed distributed — one row with both and the rel error
    (rows-only check; the estimate is approximate by construction)."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.shuffle import partitioned_group_agg
    from sift_ray.functions.sketch import approx_distinct

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    est = approx_distinct(ds, "user_id", precision=12)
    ds2 = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                          columns=["user_id"])
    exact = partitioned_group_agg(
        ds2, ["user_id"], [(None, "count", "_n")]).count()
    return pd.DataFrame({
        "approx_distinct": [float(round(est, 1))],
        "exact_distinct": [int(exact)],
        "rel_err": [round(abs(est - exact) / max(exact, 1), 4)],
    })


def _q_token_shards(sf_dir: str):
    """Distributed ordered prefix sum: pack documents into ~5k-token
    training shards in doc_id order (functions/sharding.py)."""
    from sift_ray.functions.sharding import token_shards
    return token_shards(_docs(sf_dir, ["doc_id", "text"]), shard_tokens=5000)


def _q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing: concatenate whitespace tokens + EOS per
    doc in doc_id order and emit exact 256-token training sequences
    (functions/sharding.py pack_sequences — two exchanges, zero driver
    data)."""
    from sift_ray.functions.sharding import pack_sequences
    return pack_sequences(_docs(sf_dir, ["doc_id", "text"]), seq_len=256)


def _q_orders_customer_join(sf_dir: str):
    """Distributed hash join (general two-big-sides join; Ray Data has no
    join API — see shuffle.hash_join): every order row joined with its
    customer's market segment, checked value-exact against SQL."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "custkey", "o_totalprice"]),
        batch_format="pyarrow")
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["custkey", "c_mktsegment"]),
        batch_format="pyarrow")
    return hash_join(orders, cust, on="custkey", how="inner")


def _q_orders_join_bucketed(sf_dir: str):
    """EXCHANGE-FREE join over co-partitioned storage (sources/
    bucketed.py): orders and customers are each written ONCE as
    key-bucketed parquet (hash(custkey) % B, manifest-committed), then
    the join is per-bucket-pair map tasks with zero shuffle — the
    pay-the-exchange-once pattern a 100 TB fact pipeline lives on. Same
    oracle as orders_customer_join: co-partitioning must not change a
    value."""
    import tempfile

    import pyarrow as pa
    import ray.data as rd
    from sift_ray.sources.bucketed import join_bucketed, write_bucketed

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "custkey",
                                    "o_totalprice"]),
        batch_format="pyarrow")
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["custkey", "c_mktsegment"]),
        batch_format="pyarrow")
    od = tempfile.mkdtemp(prefix="sift_bkt_o_")
    cd = tempfile.mkdtemp(prefix="sift_bkt_c_")
    write_bucketed(orders, od, key="custkey", buckets=16)
    write_bucketed(cust, cd, key="custkey", buckets=16)
    return join_bucketed(od, cd, on="custkey").map_batches(
        lambda t: t.select(["custkey", "o_orderkey", "o_totalprice",
                            "c_mktsegment"]),
        batch_format="pyarrow")


def _q_corpus_diff(sf_dir: str):
    """Snapshot diff between two crawl-dump versions (functions/corpus.py
    corpus_diff): old = docs with id%5!=0, new = docs with id%3!=0 where
    every id%7==0 doc's text changed — both snapshots derived
    deterministically from the documents table so the SQL oracle can
    reproduce them; classification (added/removed/changed) rides ONE
    FULL OUTER digest join, change-proportional output."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from sift_ray.functions.corpus import corpus_diff

    docs = _docs(sf_dir, ["doc_id", "text"])

    def mod_mask(t, m, want_nonzero=True):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        mask = (ids % m) != 0 if want_nonzero else (ids % m) == 0
        return pa.array(mask)

    old = docs.map_batches(
        lambda t: t.filter(mod_mask(t, 5)), batch_format="pyarrow")

    def mk_new(t: "pa.Table") -> "pa.Table":
        t = t.filter(mod_mask(t, 3))
        tweak = pa.array(
            (t.column("doc_id").to_numpy(zero_copy_only=False) % 7) == 0)
        text = pc.if_else(tweak,
                          pc.binary_join_element_wise(
                              t.column("text"), "x", ""),
                          t.column("text"))
        return pa.table({"doc_id": t.column("doc_id"), "text": text})

    new = docs.map_batches(mk_new, batch_format="pyarrow")
    return corpus_diff(old, new)


def _q_bucketed_ingest(sf_dir: str):
    """Exactly-once incremental ingest into co-partitioned storage
    (sources/bucketed.py append_bucketed): two-thirds of the documents
    table is written as the base bucketed table, the rest merges in as a
    delta dump under an ingest id (replays are manifest no-ops — pinned
    in tests); read-back must equal the whole table, value-exact vs
    identity SQL."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.sources.bucketed import (append_bucketed, read_bucketed,
                                           write_bucketed)

    docs = _docs(sf_dir, ["doc_id", "text"])
    base = docs.map_batches(
        lambda t: t.filter(pc.not_equal(
            pc.bit_wise_and(t.column("doc_id"), 3), 0)),
        batch_format="pyarrow")
    delta = docs.map_batches(
        lambda t: t.filter(pc.equal(
            pc.bit_wise_and(t.column("doc_id"), 3), 0)),
        batch_format="pyarrow")
    d = tempfile.mkdtemp(prefix="sift_bkt_i_")
    write_bucketed(base, d, key="doc_id", buckets=8)
    append_bucketed(delta, d, key="doc_id", ingest_id="delta-1")
    return read_bucketed(d)


def _q_bucketed_time_travel(sf_dir: str):
    """Snapshot (time-travel) read over the LSM ingest ledger
    (sources/bucketed.py read_bucketed(as_of=...)): thirds of the
    documents table land as base + two delta ingests; reading AS OF the
    first delta must reproduce exactly base+delta1 — the manifest's
    ordered ledger plus per-ingest delta files reconstruct history, and
    a compacted store refuses (SnapshotUnavailable) instead of answering
    wrong (pinned in tests)."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.sources.bucketed import (append_bucketed, read_bucketed,
                                           write_bucketed)

    docs = _docs(sf_dir, ["doc_id", "text"])

    def third(r):
        return lambda t: t.filter(pc.equal(
            pc.subtract(t.column("doc_id"),
                        pc.multiply(pc.divide(t.column("doc_id"), 3), 3)),
            r))

    d = tempfile.mkdtemp(prefix="sift_bkt_tt_")
    write_bucketed(docs.map_batches(third(0), batch_format="pyarrow"),
                   d, key="doc_id", buckets=8)
    append_bucketed(docs.map_batches(third(1), batch_format="pyarrow"),
                    d, key="doc_id", ingest_id="d1", mode="delta")
    append_bucketed(docs.map_batches(third(2), batch_format="pyarrow"),
                    d, key="doc_id", ingest_id="d2", mode="delta")
    return read_bucketed(d, as_of="d1")


def _q_zorder_multi_scan(sf_dir: str):
    """Z-ORDER clustered storage scan (sources/zonemap.py
    write_zordered/read_multi_range): lineitem lays out on a Morton
    interleave of (l_partkey, l_suppkey), so BOTH dimension predicates
    prune files from the manifest zones alone — the multi-dimension
    layout lever a 1-D sort can't give (pruning ratios pinned in
    tests); results value-exact vs the plain SQL conjunction."""
    import tempfile

    import ray.data as rd
    from sift_ray.sources.zonemap import read_multi_range, write_zordered

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"])
    d = tempfile.mkdtemp(prefix="sift_zo_")
    write_zordered(li, d, cols=["l_partkey", "l_suppkey"], files=16)
    return read_multi_range(
        d, {"l_partkey": (100, 500), "l_suppkey": (10, 40)},
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"])


def _q_bloom_point_lookup(sf_dir: str):
    """Per-file BLOOM skip-index point lookup
    (sources/bloomindex.py): orders lays out by o_custkey (the range
    dimension), then a point lookup on the UNINDEXED-dimension column
    o_orderkey reads only bloom-passing files — the secondary-index
    shape zonemaps and buckets don't cover; exact is_in confirmation
    makes false positives invisible (pruning ratios pinned in tests)."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.sources.bloomindex import build_bloom_index, read_point
    from sift_ray.sources.zonemap import write_sorted

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    d = tempfile.mkdtemp(prefix="sift_blm_")
    write_sorted(orders, d, key="o_custkey", files=16)
    build_bloom_index(d, ["o_orderkey"])
    # bounded probe set, derived deterministically from the data
    keys = (orders.map_batches(
        lambda t: t.filter(pc.equal(
            pc.subtract(t.column("o_orderkey"),
                        pc.multiply(pc.divide(t.column("o_orderkey"),
                                              997), 997)), 0))
        .select(["o_orderkey"]), batch_format="pyarrow").take_all())
    return read_point(d, "o_orderkey", [r["o_orderkey"] for r in keys],
                      columns=["o_orderkey", "o_custkey", "o_totalprice"])


def _q_bucketed_upsert_delete(sf_dir: str):
    """MERGE/upsert + keyed delete on the LSM bucketed store
    (sources/bucketed.py upsert_bucketed/delete_bucketed): the documents
    table is the base; an upsert delta REPLACES every doc_id%4==0 row
    (re-fetched pages) and INSERTS doc_id%16==0 under shifted ids (new
    pages); a tombstone delta then deletes doc_id%6==0 (takedowns). Both
    land in O(delta) LSM mode — the read resolves
    later-file-shadows-earlier per bucket, value-exact vs the SQL MERGE
    mirror (replays and compaction pinned in tests)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    from sift_ray.sources.bucketed import (delete_bucketed, read_bucketed,
                                           upsert_bucketed, write_bucketed)

    docs = _docs(sf_dir, ["doc_id", "text"])

    def mk_upsert(t: "pa.Table") -> "pa.Table":
        ids = t.column("doc_id")
        rep = t.filter(pc.equal(pc.bit_wise_and(ids, 3), 0))
        rep = rep.set_column(
            1, "text", pc.binary_join_element_wise(
                rep.column("text"), "!u", ""))
        ins = t.filter(pc.equal(pc.bit_wise_and(ids, 15), 0))
        ins = pa.table({
            "doc_id": pc.add(ins.column("doc_id"), 1000000000),
            "text": pc.binary_join_element_wise(
                ins.column("text"), "!n", "")})
        return pa.concat_tables([rep, ins])

    def mk_delete(t: "pa.Table") -> "pa.Table":
        ids = t.column("doc_id")
        keep = pc.equal(pc.subtract(
            ids, pc.multiply(pc.divide(ids, 6), 6)), 0)
        return t.filter(keep).select(["doc_id"])

    d = tempfile.mkdtemp(prefix="sift_bkt_ud_")
    write_bucketed(docs, d, key="doc_id", buckets=8)
    upsert_bucketed(docs.map_batches(mk_upsert, batch_format="pyarrow"),
                    d, key="doc_id", ingest_id="u1", mode="delta")
    delete_bucketed(docs.map_batches(mk_delete, batch_format="pyarrow"),
                    d, key="doc_id", ingest_id="x1", mode="delta")
    return read_bucketed(d)


def _q_bucketed_cdc(sf_dir: str):
    """Change-data-capture feed over the LSM ingest ledger
    (sources/bucketed.py read_changes): after an upsert and a delete
    land as O(delta) deposits, the feed since base carries exactly
    those changes (upsert rows + null-padded delete tombstones) reading
    ONLY the delta files — the downstream-sync shape; value-exact vs
    the SQL mirror of both deltas (compaction refusal pinned in
    tests)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    from sift_ray.sources.bucketed import (delete_bucketed, read_changes,
                                           upsert_bucketed, write_bucketed)
    from sift_ray.state.manifest import SNAPSHOT_BASE

    docs = _docs(sf_dir, ["doc_id", "text"])

    def mk_upsert(t: "pa.Table") -> "pa.Table":
        t = t.filter(pc.equal(pc.bit_wise_and(t.column("doc_id"), 3), 0))
        return t.set_column(1, "text", pc.binary_join_element_wise(
            t.column("text"), "!u", ""))

    def mk_delete(t: "pa.Table") -> "pa.Table":
        ids = t.column("doc_id")
        keep = pc.equal(pc.subtract(
            ids, pc.multiply(pc.divide(ids, 6), 6)), 0)
        return t.filter(keep).select(["doc_id"])

    d = tempfile.mkdtemp(prefix="sift_cdc_")
    write_bucketed(docs, d, key="doc_id", buckets=8)
    upsert_bucketed(docs.map_batches(mk_upsert, batch_format="pyarrow"),
                    d, key="doc_id", ingest_id="u1", mode="delta")
    delete_bucketed(docs.map_batches(mk_delete, batch_format="pyarrow"),
                    d, key="doc_id", ingest_id="x1", mode="delta")
    return read_changes(d, SNAPSHOT_BASE)


def _q_orders_join_sorted(sf_dir: str):
    """ZERO-SHUFFLE sort-merge join of two range-partitioned sorted
    stores (sources/zonemap.py join_sorted): orders and customer each
    pay their range exchange once at write time; the join is one task
    per left range reading only zonemap-overlapping right files."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.sources.zonemap import join_sorted, write_sorted

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["custkey", "o_orderkey",
                                    "o_totalprice"]),
        batch_format="pyarrow")
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    dl = tempfile.mkdtemp(prefix="sift_js_l_")
    dr = tempfile.mkdtemp(prefix="sift_js_r_")
    write_sorted(orders, dl, key="custkey", files=8)
    write_sorted(cust, dr, key="c_custkey", files=5)
    return join_sorted(dl, dr)


def _q_events_window_store(sf_dir: str):
    """Incrementally-maintained tumbling-window aggregate (the streaming
    window-state shape): build the partial-agg store from even event_ids,
    ingest odd ones O(delta) via the LSM path, fold per bucket
    exchange-free — count/min/max are associative, so the read equals a
    full recompute over ALL events, value-exact vs the plain window SQL."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.windows import (append_window_delta,
                                            build_window_store,
                                            read_window_agg)

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts", "value"])
    base = ev.map_batches(
        lambda t: t.filter(pc.equal(
            pc.bit_wise_and(t.column("event_id"), 1), 0)),
        batch_format="pyarrow")
    delta = ev.map_batches(
        lambda t: t.filter(pc.equal(
            pc.bit_wise_and(t.column("event_id"), 1), 1)),
        batch_format="pyarrow")
    d = tempfile.mkdtemp(prefix="sift_winstore_")
    build_window_store(base, d, window_s=300, num_buckets=8)
    append_window_delta(delta, d, ingest_id="delta-1", window_s=300)
    return read_window_agg(d)


def _q_nation_counts_bucketed(sf_dir: str):
    """EXCHANGE-FREE group-aggregate over co-partitioned storage
    (sources/bucketed.py agg_bucketed): customers bucketed once on
    c_nationkey, then a full GROUP BY is one Arrow hash-aggregate per
    bucket file — keys are co-located by construction, so no shuffle and
    no combiner pass. Oracle-exact vs plain GROUP BY."""
    import tempfile

    import pyarrow as pa
    import ray.data as rd
    from sift_ray.sources.bucketed import agg_bucketed, write_bucketed

    import pyarrow.compute as pc

    def to_cents(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"), 100.0)),
                        pa.int64())
        return pa.table({"c_nationkey": t.column("c_nationkey"),
                         "acct_cents": cents})

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_nationkey", "c_acctbal"]).map_batches(
        to_cents, batch_format="pyarrow")
    d = tempfile.mkdtemp(prefix="sift_bkt_n_")
    write_bucketed(cust, d, key="c_nationkey", buckets=8)
    out = agg_bucketed(d, key="c_nationkey",
                       aggs=[(None, "count_all"), ("acct_cents", "sum")])
    return out.map_batches(
        lambda t: t.rename_columns(["c_nationkey", "n_customers",
                                    "sum_acct_cents"]),
        batch_format="pyarrow")


def _q_events_asof_join(sf_dir: str):
    """Distributed backward AS-OF join (shuffle.asof_join): every event is
    enriched with the value of the user's most recent HIGH event (value >=
    0.9) at or before it — checked value-exact against DuckDB's native
    ASOF JOIN."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join

    def to_us(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({"user_id": batch.column("user_id"),
                         "t": pc.cast(ts, pa.int64()),
                         "value": batch.column("value")})

    left = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "value"]).map_batches(
        to_us, batch_format="pyarrow")
    right = (rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])
             .map_batches(to_us, batch_format="pyarrow")
             .map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("value"), 0.9))
                   .rename_columns(["user_id", "t", "last_high_value"]),
        batch_format="pyarrow"))
    return asof_join(left, right, key="user_id", ts="t",
                     value_col="last_high_value")


def _q_events_asof_tolerance(sf_dir: str):
    """AS-OF join with a staleness bound (pandas merge_asof tolerance):
    the most recent HIGH event only enriches events within 1 hour —
    farther matches go null. Same one-exchange kernel plus a vectorized
    distance check; oracle = a bounded correlated subquery."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join

    def to_us(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({"user_id": batch.column("user_id"),
                         "t": pc.cast(ts, pa.int64()),
                         "value": batch.column("value")})

    left = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "value"]).map_batches(
        to_us, batch_format="pyarrow")
    right = (rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])
             .map_batches(to_us, batch_format="pyarrow")
             .map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("value"), 0.9))
                   .rename_columns(["user_id", "t", "last_high_value"]),
        batch_format="pyarrow"))
    return asof_join(left, right, key="user_id", ts="t",
                     value_col="last_high_value",
                     tolerance=3_600_000_000)


def _q_clicks_minus_purchases_all(sf_dir: str):
    """EXCEPT ALL (bag semantics): click user occurrences minus purchase
    user occurrences — multiplicity preserved, so a user with 5 clicks
    and 2 purchases appears 3 times. Per-batch count combiner, ONE
    tuple-hash exchange, count-difference replication in the kernel."""
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.relational import set_op

    ev = lambda t: rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), t))
                   .select(["user_id"]), batch_format="pyarrow")
    return set_op(ev("click"), ev("purchase"), ["user_id"], "except",
                  all_rows=True)


def _q_user_event_concat(sf_dir: str):
    """Distributed string_agg: each user's event-type sequence in
    event_id order — ONE group-key exchange, partition-local lexsort +
    per-group join; oracle-exact vs string_agg(... ORDER BY)."""
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_string_agg
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "event_id"])
    return grouped_string_agg(ev, "user_id", "event_type", "event_id",
                              sep="|")


def _q_events_ohlc(sf_dir: str):
    """OHLC resample bars per (user, 5-min window): open/close picked by
    (ts, event_id) order, low/high/n exact. Per-batch lexsort combiner,
    one (user, win) exchange merging carried order keys."""
    import ray.data as rd
    from sift_ray.functions.windows import ohlc_window
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id", "value"])
    return ohlc_window(ev, window_s=300)


def _q_hash_sample(sf_dir: str):
    """Deterministic 1/16 content-hash sample (md5 hex starts with '0') —
    the reproducible sampling primitive for eval-split carving."""
    import pyarrow.compute as pc
    from sift_ray.functions.textstats import digest_batch

    def sample(batch):
        t = digest_batch(batch)
        keep = pc.starts_with(t.column("digest"), "0")
        return t.filter(keep).select(["doc_id", "digest"])
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sample, batch_format="pyarrow")


def _q_vocab_topk(sf_dir: str):
    """Global top-100 words by corpus frequency — distributed word count
    (per-batch combiner -> ONE word-hash exchange -> local-topk merge)."""
    from sift_ray.functions.corpus import vocab_topk
    return vocab_topk(_docs(sf_dir, ["doc_id", "text"]), k=100)


def _q_stratified_sample(sf_dir: str):
    """Per-language deterministic downsample: keep 4/16 of 'en', 1/16 of
    every other language, by md5(text) hex threshold — the reproducible
    language-rebalancing primitive (zero shuffle)."""
    from sift_ray.functions.corpus import stratified_sample
    return stratified_sample(_docs(sf_dir, ["doc_id", "text", "lang"]),
                             rates={"en": "4"}, default_rate="1")


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs sharing any word 4-gram with the
    deterministic 'benchmark' slice (doc_id % 37 == 0) are dropped; the
    tiny benchmark gram set is computed once and matched map-side."""
    import numpy as np
    import pyarrow as pa

    from sift_ray.functions.corpus import decontaminate

    def bench_slice(t):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 37 == 0))

    bench = []
    for b in (_docs(sf_dir, ["doc_id", "text"])
              .map_batches(bench_slice, batch_format="pyarrow")
              .iter_batches(batch_size=4096, batch_format="pyarrow")):
        bench.extend(zip(b.column("doc_id").to_pylist(),
                         b.column("text").to_pylist()))
    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
    return decontaminate(ds, bench, k=4,
                         out_cols=["doc_id", "lang", "source", "n_chars"])


def _q_decontaminate_grams(sf_dir: str):
    """Scale path of decontaminate: WORD-ALIGNED 4-gram leakage (the
    published GPT-3/Gopher-style rule) via per-doc vectorized gram
    extraction + broadcast bloom-prefiltered hash membership — cost is
    O(corpus words) regardless of benchmark size, vs the per-gram
    substring passes of the small-bench path."""
    import pyarrow as pa

    from sift_ray.functions.corpus import decontaminate_grams

    def bench_slice(t):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 37 == 0))

    bench = []
    for b in (_docs(sf_dir, ["doc_id", "text"])
              .map_batches(bench_slice, batch_format="pyarrow")
              .iter_batches(batch_size=4096, batch_format="pyarrow")):
        bench.extend(zip(b.column("doc_id").to_pylist(),
                         b.column("text").to_pylist()))
    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
    return decontaminate_grams(ds, bench, k=4,
                               out_cols=["doc_id", "lang", "source",
                                         "n_chars"])


def _q_global_rank(sf_dir: str):
    """Exact global row numbers (ORDER BY n_chars DESC, doc_id) via
    value-range partitioning + driver prefix of P row counts — the
    distributed ranking primitive behind deterministic top-N% curation
    cuts."""
    import ray.data as rd
    from sift_ray.functions.sharding import global_rank
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars"])
    return global_rank(ds, "n_chars")


def _q_bm25_corpus_topk(sf_dir: str):
    """Corpus-scale BM25 retrieval (top-20 docs for 'hash join dup') —
    the web-scale extension of the reference's in-document BM25: stats
    pass is a distributed tree aggregate of a handful of ints, score
    pass is vectorized bincount BM25 with integer-micro quantization and
    a per-batch local top-k combiner."""
    from sift_ray.functions.corpus import bm25_topk
    return bm25_topk(_docs(sf_dir, ["doc_id", "text"]),
                     ["hash", "join", "dup"], k=20)


def _q_bm25_index_and(sf_dir: str):
    """Conjunctive retrieval from the persistent index: BM25 top-20 among
    docs containing EVERY query term — the matched-term count rides the
    same doc-keyed exchange that sums scores (no extra pass)."""
    import shutil
    import tempfile

    from sift_ray.sources.text_index import (build_text_index,
                                             query_text_index)
    idx_dir = tempfile.mkdtemp(prefix="sift_text_index_", dir="/tmp")
    try:
        build_text_index(_docs(sf_dir, ["doc_id", "text"]), idx_dir,
                         buckets=16)
        return query_text_index(idx_dir, ["hash", "join", "dup"],
                                k=20, mode="and").to_pandas()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def _q_phrase_search(sf_dir: str):
    """Exact phrase search ("table hash" as consecutive tokens) over the
    POSITIONAL inverted index: bucket-pruned read of the phrase terms'
    buckets, one doc-keyed exchange, vectorized position-chain
    intersection per partition. Returns (doc_id, n_matches)."""
    import shutil
    import tempfile

    from sift_ray.sources.text_index import build_text_index, phrase_query
    idx_dir = tempfile.mkdtemp(prefix="sift_text_index_", dir="/tmp")
    try:
        build_text_index(_docs(sf_dir, ["doc_id", "text"]), idx_dir,
                         buckets=16, positional=True)
        return phrase_query(idx_dir, ["table", "hash"]).to_pandas()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def _q_zonemap_range_scan(sf_dir: str):
    """Range predicate answered from range-partitioned SORTED storage:
    the write pays one value-range exchange and records per-file
    key_min/key_max zonemaps in the manifest; the scan skips files from
    the manifest alone (no footer reads) and pushes the predicate into
    parquet row-group stats. Returns docs with 400 <= n_chars <= 700."""
    import shutil
    import tempfile

    from sift_ray.sources.zonemap import read_key_range, write_sorted
    d = tempfile.mkdtemp(prefix="sift_zonemap_", dir="/tmp")
    try:
        write_sorted(_docs(sf_dir, ["doc_id", "n_chars"]), d,
                     key="n_chars", files=16)
        return read_key_range(d, 400, 700,
                              columns=["doc_id", "n_chars"]).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_events_time_range(sf_dir: str):
    """Time-range scan from zonemap storage — the crawl-log shape: events
    land in epoch-keyed sorted ranges once, every later time-window query
    prunes files from the manifest zonemaps then parquet row-group stats.
    Returns events of 2024-01-10 (UTC day), keyed by epoch seconds."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from sift_ray.sources.zonemap import read_key_range, write_sorted

    d = tempfile.mkdtemp(prefix="sift_zonemap_ts_", dir="/tmp")
    try:
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_id", "ts", "user_id"])

        def add_epoch(t: pa.Table) -> pa.Table:
            # integer microseconds // 1e6 (positive epochs: trunc==floor)
            s = pc.divide(pc.cast(t.column("ts"), pa.int64()), 1_000_000)
            return pa.table({"event_id": t.column("event_id"),
                             "user_id": t.column("user_id"),
                             "ts_s": s})

        write_sorted(ev.map_batches(add_epoch, batch_format="pyarrow"),
                     d, key="ts_s", files=16)
        lo = 1704844800                    # 2024-01-10T00:00:00Z
        return read_key_range(d, lo, lo + 86400 - 1).to_pandas()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q_bm25_index_topk(sf_dir: str):
    """Same BM25 top-20 as bm25_corpus_topk, answered from the PERSISTENT
    term-partitioned inverted index: build pays the term exchange once
    (bucketed manifest-committed parquet), the query reads only the <=3
    buckets its terms hash to — sublinear query-time reads. Must equal
    the streaming bm25_topk (same oracle SQL)."""
    import shutil
    import tempfile

    from sift_ray.sources.text_index import (build_text_index,
                                             query_text_index)
    idx_dir = tempfile.mkdtemp(prefix="sift_text_index_", dir="/tmp")
    try:
        build_text_index(_docs(sf_dir, ["doc_id", "text"]), idx_dir,
                         buckets=16)
        return query_text_index(idx_dir, ["hash", "join", "dup"],
                                k=20).to_pandas()
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


def _q_unigram_logprob(sf_dir: str):
    """Perplexity-filter scores: per-doc unigram-LM log-prob in integer
    micro-nats (order-independent exact sums -> oracle-comparable).
    Train pass = the vocab exchange materialized once; score pass =
    broadcast sorted-hash logprob table, vectorized segment-sum."""
    from sift_ray.functions.corpus import unigram_logprob
    return unigram_logprob(_docs(sf_dir, ["doc_id", "text"]),
                           top_n=50000)


def _q_bigram_logprob(sf_dir: str):
    """Stupid-backoff bigram-LM scores (Brants et al. 2007) — the rung
    above the unigram perplexity filter: S(w|prev) = c(prev w)/c(prev)
    when the pruned model knows the bigram, else alpha * S_uni(w).
    Unigram + bigram counts ride ONE gram-hash exchange (bigram keys are
    "w1 w2" strings — unigrams never contain a space); the pruned model
    broadcasts as sorted-hash micro-nat tables; scoring is one adjacent
    pair-hash combine + two binary searches per batch. Integer micro-nat
    sums -> oracle-exact vs a DuckDB lag()-window mirror."""
    from sift_ray.functions.corpus import bigram_logprob
    return bigram_logprob(_docs(sf_dir, ["doc_id", "text"]),
                          top_uni=50000, top_bi=100000)


def _target_texts(sf_dir: str) -> list:
    """The DSIR 'target domain' sample: documents with doc_id % 53 == 0
    (a deterministic stand-in for a benchmark/domain corpus; target sets
    are small by definition, so a driver-side collect is bounded)."""
    import numpy as np

    def pick(t):
        import pyarrow as _pa
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(_pa.array(ids % 53 == 0))

    t = (_docs(sf_dir, ["doc_id", "text"])
         .map_batches(pick, batch_format="pyarrow").to_pandas())
    return t.sort_values("doc_id")["text"].tolist()


def _q_ppl_terciles(sf_dir: str):
    """CCNet head/middle/tail perplexity bucketing: per-token stupid-
    backoff bigram-LM score per document (functions/corpus.py
    bigram_logprob), then an exact distributed NTILE(3) ordered by score
    descending (functions/sharding.py ntile_assign — global_rank's
    two-pass range-partitioned prefix count; driver holds P ints).
    tercile 1 = head (least perplex)."""
    import numpy as np
    import pyarrow as pa
    from sift_ray.functions.corpus import bigram_logprob
    from sift_ray.functions.sharding import ntile_assign

    scores = bigram_logprob(_docs(sf_dir, ["doc_id", "text"]))

    def per_tok(t: "pa.Table") -> "pa.Table":
        lp = t.column("logprob_micro").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        a = lp * 1000
        # truncating division (SQL // truncates toward zero; numpy floors)
        q = np.sign(a) * (np.abs(a) // n)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lp_nano_per_tok": pa.array(q.astype(np.int64), pa.int64()),
        })

    per = scores.map_batches(per_tok, batch_format="pyarrow")
    out = ntile_assign(per, "lp_nano_per_tok", n_tiles=3)
    return out.map_batches(
        lambda t: t.rename_columns(["doc_id", "lp_nano_per_tok",
                                    "tercile"]),
        batch_format="pyarrow")


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): per-doc log ratio of
    target vs source hashed-ngram (uni+bi, md5-bucketed) distributions
    with add-one smoothing, in integer micro-nats. Source distribution =
    one corpus scan of per-batch bincounts over ONE bounded (<= B
    groups) exchange; the B-int delta table broadcasts; the score pass
    is zero-shuffle. Oracle-exact vs the same recurrence in SQL."""
    from sift_ray.functions.corpus import dsir_logratio
    return dsir_logratio(_docs(sf_dir, ["doc_id", "text"]),
                         _target_texts(sf_dir), buckets=8192)


def _q_dsir_sample(sf_dir: str):
    """DSIR importance resampling via Gumbel-top-k: key = logratio +
    Gumbel(md5-uniform(doc_id)); the k largest keys are an exact sample
    without replacement proportional to exp(logratio). Deterministic,
    engine-reproducible, zero shuffle (per-batch top-k combiner)."""
    from sift_ray.functions.corpus import dsir_logratio, dsir_sample
    w = dsir_logratio(_docs(sf_dir, ["doc_id", "text"]),
                      _target_texts(sf_dir), buckets=8192)
    return dsir_sample(w, k=50)


def _q_mixture_sample(sf_dir: str):
    """Rebalance languages to a 40/30/30 en/zh/es target mixture:
    per-group counts (one tiny exchange) -> data-derived md5-prefix
    thresholds -> zero-shuffle map-side filter. Reproducible on any
    engine that computes md5 (the oracle recomputes the same doubles)."""
    from sift_ray.functions.corpus import mixture_sample
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    return mixture_sample(ds, {"en": 0.4, "zh": 0.3, "es": 0.3})


def _q_per_source_cap(sf_dir: str):
    """Per-domain document cap (keep the 10 lowest doc_ids per source) —
    the standard web-pipeline guard against a single host dominating the
    corpus. Distributed local-topk combiner, bounded driver merge."""
    from sift_ray.functions.relational import topk_per_group
    ds = _docs(sf_dir, ["doc_id", "source"])
    return topk_per_group(ds, "source", "doc_id", "doc_id", k=10,
                          ascending=True)


def _q_in_doc_line_dedup(sf_dir: str):
    """IN-document exact line dedup (RefinedWeb in-doc repetition rule):
    within each document, a line with >= 3 words keeps only its first
    occurrence; docs reassembled in order. ZERO shuffle — the dedup scope
    is one document, so the whole operator is a single map_batches kernel
    (lines minted by turning ' the ' into newlines in BOTH engines)."""
    import pyarrow.compute as pc
    from sift_ray.functions.corpus import in_doc_line_dedup

    def to_lines(batch):
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pc.replace_substring(batch.column("text"), " the ", "\n"))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_lines, batch_format="pyarrow")
    return in_doc_line_dedup(ds, delimiter="\n", min_words=3)


def _q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means clustering (distributed
    fixed-point kmeans_fit) + intra-cluster pairwise cosine pruning
    — one cluster-keyed exchange, tiled integer-exact matmuls per
    cluster. Returns kept (vec_id, cluster). Threshold 0.45 sits at the
    synthetic table's p99 neighbor cosine, so the check is non-vacuous
    (a real corpus would use ~0.95 with its genuinely duplicated
    embeddings)."""
    import ray.data as rd
    from sift_ray.functions.similarity import semdedup
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return semdedup(ds, n_clusters=8, threshold=0.45, n_iter=3)


def _q_knn_join(sf_dir: str):
    """Exact 3-NN cosine self-join over the embeddings table (tiled
    broadcast right side, integer rank output)."""
    import ray.data as rd
    from sift_ray.functions.similarity import knn_join
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return knn_join(ds, k=3)


def _q_label_centroids(sf_dir: str):
    """Per-label mean embedding (class prototypes): per-batch (sum, count)
    partials, one label-keyed exchange, rounded for engine-exact compare."""
    import ray.data as rd
    from sift_ray.functions.similarity import label_centroids
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["label", "embedding"])
    return label_centroids(ds)


def _q_dup_clusters(sf_dir: str):
    """Transitive near-dup clustering: every doc with the min doc_id of
    its connected component under n-gram Jaccard >= 0.5 (distributed
    min-label propagation over the pair graph; singletons own cluster)."""
    from sift_ray.functions.dedup import dup_clusters
    return dup_clusters(_docs(sf_dir, ["doc_id", "text"]), k=3,
                        threshold=0.5)


def _q_dedup_keep_best(sf_dir: str):
    """Best-quality keeper per near-dup cluster (RefinedWeb policy: keep
    the longest member, min-id tiebreak). Clusters via distributed label
    propagation; per-cluster argmax via grouped_topk(k=1) — one id join
    + one cluster exchange."""
    from sift_ray.functions.dedup import dedup_keep_best
    return dedup_keep_best(_docs(sf_dir, ["doc_id", "text"]), k=3,
                           threshold=0.5)


def _q_word_count_quantiles(sf_dir: str):
    """Exact corpus quantiles of per-document word count (distributed
    histogram; driver folds only the distinct-value histogram)."""
    from sift_ray.functions.corpus import word_count_quantiles
    return word_count_quantiles(_docs(sf_dir, ["doc_id", "text"]))


def _q_span_dedup(sf_dir: str):
    """C4-style corpus-wide exact span dedup: 8-word spans survive only at
    their first (doc_id, span_no) occurrence; docs reassembled from kept
    spans (two exchanges: span-hash, then doc_id; in-batch combiner)."""
    from sift_ray.functions.corpus import span_dedup
    return span_dedup(_docs(sf_dir, ["doc_id", "text"]), span_words=8)


def _q_line_dedup(sf_dir: str):
    """Corpus-wide exact line dedup over a line-structured view of the
    documents table (lines minted deterministically by turning the word
    ' table ' into a newline in BOTH engines); lines with >= 3 words keep
    only their first (doc_id, line_no) occurrence."""
    import pyarrow.compute as pc
    from sift_ray.functions.corpus import line_dedup

    def to_lines(batch):
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pc.replace_substring(batch.column("text"), " table ", "\n"))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_lines, batch_format="pyarrow")
    return line_dedup(ds, delimiter="\n", min_words=3)


def _q_ccnet_line_dedup(sf_dir: str):
    """CCNet-style normalized-key line dedup (Wenzek et al. 2020): lines
    dedup on their case/digit/punctuation-insensitive normalized form,
    while the ORIGINAL line text survives. Structure minted in BOTH
    engines: ' table ' -> newline, and docs with doc_id % 3 == 0 are
    uppercased so duplicates differ in case but normalize equal."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from sift_ray.functions.corpus import line_dedup

    def mint(batch):
        t = pc.replace_substring(batch.column("text"), " table ", "\n")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        is3 = pa.array(ids % 3 == 0)
        t = pc.if_else(is3, pc.utf8_upper(t), t)
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", t)

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        mint, batch_format="pyarrow")
    return line_dedup(ds, delimiter="\n", min_words=3, normalize="ccnet")


def _q_c4_filters(sf_dir: str):
    """C4 heuristic cleaning rules (Raffel et al. 2020 §2.2) over a
    line-structured view of the documents table (structure minted
    deterministically in BOTH engines: ' row ' -> '.\\n' mints terminal
    punctuation + line breaks, ' spark ' -> ' javascript ' and two rare
    bigrams -> '{' / 'Lorem Ipsum' exercise the drop rules). Zero
    shuffle: every rule is per-document."""
    import pyarrow.compute as pc
    from sift_ray.functions.corpus import c4_filters

    def mint(batch):
        t = batch.column("text")
        t = pc.replace_substring(t, " row ", ".\n")
        t = pc.replace_substring(t, " spark ", " javascript ")
        t = pc.replace_substring(t, "hash merge", "{")
        t = pc.replace_substring(t, "merge batch", "Lorem Ipsum dolor")
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", t)

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        mint, batch_format="pyarrow")
    return c4_filters(ds, min_words=5, min_lines=2)


def _q_exactsubstr_dedup(sf_dir: str):
    """ExactSubstr dedup (Lee et al. 2021): every 50-char window occurring
    more than once corpus-wide is cut from all but its first (doc_id, pos)
    occurrence; overlapping cuts merge. Two exchanges: 128-bit rolling-hash
    window keys, then doc_id reassembly."""
    from sift_ray.functions.corpus import exactsubstr_dedup
    return exactsubstr_dedup(_docs(sf_dir, ["doc_id", "text"]), min_len=50)


def _q_doc_freq_topk(sf_dir: str):
    """Top-100 words by DOCUMENT frequency (IDF building block): per-batch
    per-doc-distinct combiner -> one word-hash exchange -> local-topk."""
    from sift_ray.functions.corpus import doc_freq_topk
    return doc_freq_topk(_docs(sf_dir, ["doc_id", "text"]), k=100)


def _q_price_quantiles(sf_dir: str):
    """Approximate quantiles of o_totalprice via DDSketch (Masson et al.,
    VLDB 2019): deterministic log-spaced buckets with exact integer
    counts, so the result is bit-identical at any parallelism AND the
    oracle recomputes it in SQL (ln-bucket + window cumsum) —
    value-exact, not just rank-bounded. Returns (q_pct, bucket); bucket
    -> value via sketch.dd_bucket_value (relative error <= 1%)."""
    import ray.data as rd
    from sift_ray.functions.sketch import ddsketch_quantiles
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_totalprice"])
    return ddsketch_quantiles(ds, "o_totalprice")


def _q_price_quantiles_by_priority(sf_dir: str):
    """Per-group DDSketch quantiles (o_totalprice by o_orderpriority):
    per-batch (key, bucket) count combiner, one (key, bucket)-keyed
    exchange, per-key quantile kernel in a key-keyed exchange — no
    driver state, deterministic, SQL-oracle-exact."""
    import ray.data as rd
    from sift_ray.functions.sketch import ddsketch_quantiles_by
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderpriority", "o_totalprice"])
    return ddsketch_quantiles_by(ds, "o_orderpriority", "o_totalprice")


def _q_price_quantiles_gk(sf_dir: str):
    """Approximate quantiles via the two-level mergeable GK-style
    weighted-quantile summary (rank error ~1/m per level) — kept as the
    order-dependent companion to the deterministic DDSketch variant
    above. Rows-only BY CONSTRUCTION: the summary's compression points
    depend on partition merge order, so no exact oracle can exist; the
    test suite bounds the rank error vs the exact quantile at <2%."""
    import ray.data as rd
    from sift_ray.functions.sketch import quantile_sketch
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_totalprice"])
    return quantile_sketch(ds, "o_totalprice")


def _q_price_quantiles_gk_by_priority(sf_dir: str):
    """Per-group GK-style approximate quantiles (order-dependent,
    rows-only by construction — see _q_price_quantiles_gk); per-group
    rank error bounded at <3% by tests."""
    import ray.data as rd
    from sift_ray.functions.sketch import quantile_sketch_by
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderpriority", "o_totalprice"])
    return quantile_sketch_by(ds, "o_orderpriority", "o_totalprice")


def _q_orders_customer_full_join(sf_dir: str):
    """Distributed FULL OUTER join: per-customer order counts x
    high-balance customers. Left-only keys (low-balance customers with
    orders) null the right columns; right-only keys (high-balance
    customers without orders) null the left columns; integer columns
    stay exact int64 through the nullable-dtype merge."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join, partitioned_group_agg

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey"])
    o = partitioned_group_agg(orders, ["o_custkey"],
                              [(None, "count", "n_orders")])
    o = o.map_batches(
        lambda t: (pa.schema([("custkey", pa.int64()),
                              ("n_orders", pa.int64())]).empty_table()
                   if t.num_rows == 0 and "o_custkey" not in t.column_names
                   else t.rename_columns(["custkey", "n_orders"])),
        batch_format="pyarrow")

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_acctbal"])
    import pyarrow.compute as pc
    c = cust.map_batches(
        lambda t: t.filter(pc.greater(t.column("c_acctbal"), 5000.0))
                   .rename_columns(["custkey", "c_acctbal"]),
        batch_format="pyarrow")

    return hash_join(o, c, on="custkey", how="full",
                     left_types={"custkey": pa.int64(),
                                 "n_orders": pa.int64()},
                     right_types={"custkey": pa.int64(),
                                  "c_acctbal": pa.float64()})


_BLOCKLIST = ("spark", "quantum")


def _q_blocklist_filter(sf_dir: str):
    """C4-style blocklist drop: documents containing any listed phrase
    as a whole word are removed. One RE2 alternation, zero shuffle,
    value-exact vs DuckDB regexp_matches."""
    from sift_ray.functions.textstats import blocklist_filter
    return blocklist_filter(_docs(sf_dir, ["doc_id", "text"]),
                            list(_BLOCKLIST))


def _q_bpe_merges(sf_dir: str):
    """Train 200 BPE merges over documents: ONE word-count exchange
    distills the corpus to a (word, n) table; the merge loop runs on
    that vocabulary (sublinear in corpus size, capped at max_words).
    Rows-only (iterative merge training is not SQL-expressible);
    determinism and the classic toy merges are unit-tested."""
    from sift_ray.functions.bpe import bpe_train
    return bpe_train(_docs(sf_dir, ["doc_id", "text"]), num_merges=200)


def _q_bpe_token_counts(sf_dir: str):
    """Apply the trained merges corpus-wide: per-document BPE token
    counts (the sizing signal shard packing consumes). Zero-shuffle map
    with a per-process merge table + LRU word cache."""
    from sift_ray.functions.bpe import bpe_encode_counts, bpe_train
    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=200)
    return bpe_encode_counts(_docs(sf_dir, ["doc_id", "text"]), merges)


def _q_pmi_topk(sf_dir: str):
    """Top-50 word-bigram collocations by PMI in exact integer
    micro-nats (one fixed double association order both engines):
    bigram + unigram count exchanges materialized once, two string-key
    hash joins, local-topk merge."""
    from sift_ray.functions.corpus import pmi_topk
    return pmi_topk(_docs(sf_dir, ["doc_id", "text"]), k=50, min_count=5)


def _q_embedding_quantize(sf_dir: str):
    """Int8 scalar quantization of the embeddings table (the 4x
    storage/bandwidth cut before ANN at scale): per-dim range via tree
    aggregate, zero-shuffle quantize map. Rows-only; reconstruction
    error is bounded in tests at span/510 per dimension."""
    import ray.data as rd
    from sift_ray.functions.similarity import embedding_quantize
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    out, _ = embedding_quantize(ds)

    def hex_pack(t: "pa.Table") -> "pa.Table":
        # canonical encoding for the driver compare: the int8 vector as
        # a hex string (2's-complement bytes) — order-insensitive,
        # hashable, lossless
        import numpy as np
        import pyarrow as pa
        qs = [np.asarray(v, np.int8).tobytes().hex()
              for v in t.column("q").to_pylist()]
        return pa.table({"vec_id": t.column("vec_id"),
                         "q_hex": pa.array(qs, pa.string())})

    return out.map_batches(hex_pack, batch_format="pyarrow")


def _q_pq_codes(sf_dir: str):
    """Product-quantization encode (pq.pq_encode, Jégou et al. 2011):
    m=4 one-byte codes per embedding — the 16x-memory ANN path beyond
    int8 scalar quantization. Codebooks from the deterministic
    fixed-point per-subspace kmeans_fit; code hex-packed for the driver
    compare."""
    import pyarrow as pa
    import ray.data as rd

    from sift_ray.functions.pq import pq_encode, pq_train

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    books = pq_train(ds, m=4, n_clusters=16, n_iter=3)
    out = pq_encode(ds, books)

    def hex_code(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t.column("vec_id"),
            "code_hex": pa.array(
                [c.hex() for c in t.column("code").to_pylist()],
                pa.string())})

    return out.map_batches(hex_code, batch_format="pyarrow")


def _q_pq_topk(sf_dir: str):
    """Product-quantization ANN search (pq.pq_topk): per-query top-10 by
    asymmetric integer distance over the encoded table — broadcast LUTs,
    per-batch local top-k under the exact global (adist, id) order, one
    query-keyed exchange. Deterministic end to end (fixed-point
    codebooks, integer ADC, tie -> lowest id)."""
    import ray.data as rd

    from sift_ray.functions.pq import pq_topk

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    # fixed query ids (vec_id is a dense 0..n-1 domain) — a limit()-based
    # pick would depend on block layout and break parallelism stability
    return pq_topk(ds, list(range(8)), k=10, m=4, n_clusters=16,
                   n_iter=3)


def _q_ivfpq_topk(sf_dir: str):
    """IVF-PQ ANN search (pq.ivfpq_build/ivfpq_topk): coarse k-means
    cells + residual product-quantization codes, probed search — the
    FAISS-style billion-scale index shape, integer-deterministic end to
    end (coarse assign, residual codes, ADC, tie rules)."""
    import ray.data as rd

    from sift_ray.functions.pq import ivfpq_topk

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return ivfpq_topk(ds, list(range(8)), k=10, n_clusters=16,
                      n_probe=4, m=4, pq_clusters=16, n_iter=3)


def _q_web_pipeline(sf_dir: str):
    """THE end-to-end composition: raw pages -> byte-level triage ->
    readability extract (byte-identical per url) -> unicode normalize ->
    C4-style corpus-wide line dedup -> token-budget shard packing.
    Stages 1-3 are zero-shuffle maps; dedup is the two-exchange unit
    pipeline; packing is the distributed ordered prefix sum. Rows-only
    (the extract stage has no SQL analog); determinism under
    repartitioning and dedup behavior are pinned by
    tests/test_ray_pipeline.py."""
    import ray.data as rd
    from sift_ray.pipelines.web_pipeline import web_corpus_pipeline
    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "html"])
    return web_corpus_pipeline(pages, shard_tokens=2000)


def _q_html_stats(sf_dir: str):
    """Byte-level page triage signals over the RAW html column (tag /
    script / anchor counts, visible-byte ratio) — the pre-extraction
    drop pass at crawl scale; all RE2 kernels run on binary directly,
    no decode, no DOM. Rows-only (byte-regex semantics over binary are
    not SQL-expressible); signal direction is unit-tested."""
    import ray.data as rd
    from sift_ray.functions.textstats import html_stats
    corpus = _pages_corpus_for(sf_dir)
    return html_stats(rd.read_parquet(corpus, columns=["url", "html"]))


def _q_split_sentences(sf_dir: str):
    """Sentence segmentation explode (doc_id, sent_idx, sentence) —
    map-only, vectorized list offsets; the RE2 split pattern is shared
    with the DuckDB oracle so the rows are value-exact."""
    from sift_ray.functions.corpus import split_sentences
    return split_sentences(_docs(sf_dir, ["doc_id", "text"]))


def _q_ngram_counts(sf_dir: str):
    """Corpus-wide word-3-gram count table with a min-count threshold:
    per-batch value_counts combiner, one gram-hash exchange, exact
    HAVING filter partition-local."""
    from sift_ray.functions.corpus import ngram_counts
    return ngram_counts(_docs(sf_dir, ["doc_id", "text"]), n=3,
                        min_count=3)


def _q_incremental_ingest(sf_dir: str):
    """Incremental ingest: which documents of the NEW snapshot carry
    content absent from the OLD snapshot (old = doc_id % 7 != 0)? A
    content-digest ANTI join on a STRING key with the bloom
    runtime-filter: definite-new digests bypass the exchange entirely —
    at a real crawl's ~90% overlap only the overlapping tail pays for
    the shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join
    from sift_ray.functions.textstats import digest_batch

    docs = _docs(sf_dir, ["doc_id", "text"])
    new = docs.map_batches(
        lambda t: digest_batch(t).select(["digest", "doc_id"]),
        batch_format="pyarrow")
    import numpy as np

    def old_side(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return digest_batch(t.filter(pa.array(ids % 7 != 0))) \
            .select(["digest"])

    old = docs.map_batches(old_side, batch_format="pyarrow")
    return hash_join(new, old, on="digest", how="anti",
                     left_types={"digest": pa.string(),
                                 "doc_id": pa.int64()},
                     right_types={"digest": pa.string()},
                     bloom_prefilter=1 << 20)


def _q_orders_join_bloom(sf_dir: str):
    """Bloom runtime-filter pushdown on the distributed join: orders x
    AUTOMOBILE-segment customers (a selective dimension). The bloom of
    right keys drops ~80% of order rows map-side BEFORE the exchange;
    results are value-exact vs plain SQL because blooms have no false
    negatives."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "custkey",
                                    "o_totalprice"]),
        batch_format="pyarrow")
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"),
                                    "AUTOMOBILE"))
                   .rename_columns(["custkey", "c_mktsegment"]),
        batch_format="pyarrow")
    return hash_join(orders, cust, on="custkey", how="inner",
                     bloom_prefilter=1 << 20)


def _q_price_histogram(sf_dir: str):
    """Exact fixed-width histogram of o_totalprice (60 buckets over
    [0, 600000)): per-batch bincount combiner, one bucket-keyed exchange
    of at most 60 rows per batch. The bucket expression is evaluated in
    the same float64 association order in both engines, so the counts
    are value-exact."""
    import ray.data as rd
    from sift_ray.functions.sketch import histogram
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_totalprice"])
    return histogram(ds, "o_totalprice", lo=0.0, hi=600000.0, bins=60)


def _q_compression_ratio(sf_dir: str):
    """Per-document zlib compression ratio (Gopher-style redundancy
    signal). Rows-only: zlib output length is not SQL-expressible."""
    from sift_ray.functions.textstats import compression_ratio
    return compression_ratio(_docs(sf_dir, ["doc_id", "text"]))


def _q_decode_jpeg(sf_dir: str):
    """Real baseline JPEG decode (own Huffman + IDCT from the T.81 spec)
    over a deterministic synthetic corpus: solid colors and gradients in
    both 4:4:4 and 4:2:0, with quarantine rows mixed in. Channel means
    must sit within quantization error of the encoded content (pinned in
    tests/test_functions.py)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.jpeg import decode_jpegs, make_jpeg

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 20, "sf0.01": 60, "sf0.1": 150}.get(sf, 60)
    rows = []
    for i in range(n):
        if i % 19 == 5:
            payload = b"GIF89a not a jpeg"
        else:
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            img = np.zeros((h, w, 3), np.uint8)
            img[:, :] = ((i * 37) % 256, (i * 89) % 256, (i * 151) % 256)
            payload = make_jpeg(img, quality=85, subsample=(i % 2 == 0))
        rows.append({"doc_id": i, "payload": payload})
    return decode_jpegs(rd.from_pandas(pd.DataFrame(rows)))


def _q_assign_splits(sf_dir: str):
    """Leakage-safe train/val/test assignment over pages: split is a
    pure function of md5(host), so a domain's template near-duplicates
    can never straddle the train/eval boundary. Zero shuffle; host
    grouping, balance and repartition-invariance are unit-tested."""
    import ray.data as rd
    from sift_ray.functions.urls import assign_splits
    corpus = _pages_corpus_for(sf_dir)
    return assign_splits(rd.read_parquet(corpus, columns=["url"]))


def _q_warc_extract(sf_dir: str):
    """The full source-to-markdown path from a Common-Crawl-style WARC
    archive instead of parquet: fixture pages are written as
    gzip-member-per-record WARC files (idempotent, cached in /tmp), read
    back through the from-scratch WARC parser, and extracted. Byte
    identity with the parquet path is pinned by
    tests/test_warc.py; rows-only here (WARC framing is not
    SQL-expressible)."""
    import ray.data as rd
    from sift_ray.config import default_config
    from sift_ray.pipelines.extract_job import build_extract_pipeline
    from sift_ray.sources.pages import gen_page
    from sift_ray.sources.warc import write_warc

    n = min(_PAGES_BY_SF.get(os.path.basename(sf_dir.rstrip("/")), 400),
            200)
    out_dir = f"/tmp/sift_ray_warc/{n}"
    marker = os.path.join(out_dir, f"_SUCCESS_{n}")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        per_file = 50
        for f in range(0, n, per_file):
            import datetime
            epoch = datetime.datetime(1970, 1, 1)
            recs = []
            for i in range(f, min(f + per_file, n)):
                p = gen_page(i)
                html = p["html"]
                if isinstance(html, str):
                    html = html.encode()
                ts = epoch + datetime.timedelta(
                    microseconds=int(p["warc_ts"]))
                recs.append((p["url"], ts, html))
            write_warc(os.path.join(out_dir, f"part-{f:05d}.warc.gz"),
                       recs)
        open(marker, "w").close()
    from sift_ray.sources.warc import read_warc
    paths = sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                   if f.endswith(".warc.gz"))
    pages = read_warc(paths)
    out = build_extract_pipeline(pages, default_config())
    return out.select_columns(["url", "status", "extracted_md"])


def _q_url_dedup(sf_dir: str):
    """Canonical-URL dedup over the pages corpus with planted URL-level
    duplicates (each url also appears utm-decorated with a later fetch
    ts): the output must collapse back to one row per page, keeping the
    earliest fetch. Exact-dedup exchange shape — full rows move once
    through a canonical-key exchange. Rows-only (URL parsing is not
    SQL-expressible); the canonicalization rules are unit-tested in
    tests/test_urls.py."""
    import datetime

    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.urls import url_dedup

    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "warc_ts", "html"])

    def plant_dups(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup_url = pc.binary_join_element_wise(
            t.column("url"), pa.scalar("?utm_source=feed&gclid=1"), "")
        later = pc.add(t.column("warc_ts"),
                       pa.scalar(datetime.timedelta(days=30)))
        dup = pa.table({"url": dup_url, "warc_ts": later,
                        "html": t.column("html")})
        return pa.concat_tables([t.select(["url", "warc_ts", "html"]), dup])

    doubled = pages.map_batches(plant_dups, batch_format="pyarrow")
    deduped = url_dedup(doubled, ts_col="warc_ts")

    def digest_html(t: pa.Table) -> pa.Table:
        # canonical encoding for the driver compare: the binary html
        # column as a sha256 hex digest (BLOBs are unhashable in the
        # DuckDB-side value compare); the payload survives losslessly
        # in the real pipeline — this projection is query-surface only
        import hashlib
        hx = [hashlib.sha256(b).hexdigest() if b is not None else None
              for b in t.column("html").to_pylist()]
        return pa.table({"url": t.column("url"),
                         "warc_ts": t.column("warc_ts"),
                         "html_sha": pa.array(hx, pa.string())})

    return deduped.map_batches(digest_html, batch_format="pyarrow")


def _q_normalize_text(sf_dir: str):
    """Unicode (NFC) + whitespace normalization pass over documents —
    map-only, zero shuffle; every rule is mirrored verbatim in the
    DuckDB oracle so the output is value-exact."""
    from sift_ray.functions.textstats import normalize_text
    return normalize_text(_docs(sf_dir, ["doc_id", "text"]))


_PAGERANK_ITERS = 3
_PAGERANK_SCALE = 10 ** 12


def _q_pagerank_customers(sf_dir: str):
    """Distributed PageRank in exact int64 fixed-point over a
    deterministic graph derived from orders (src = o_custkey, dst = a
    multiplicative hash of o_orderkey folded into custkey space — both
    engines derive the identical edge list, so the oracle is value-exact
    including the floor divisions). Two exchanges per iteration (edges
    ride ONE src-keyed join exchange; per-partition partials ride the
    node-keyed state join), driver traffic = 2 ints/iteration."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.linkgraph import pagerank

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    C = orders.max("o_custkey")

    def mk_edges(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        dst = 1 + (ok * 26544357) % C
        return pa.table({"src": pa.array(ck, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = orders.map_batches(mk_edges, batch_format="pyarrow")
    return pagerank(edges, iters=_PAGERANK_ITERS, scale=_PAGERANK_SCALE)


_BFS_SEEDS = [1, 2, 3]
_BFS_HOPS = 4


def _q_bfs_orders(sf_dir: str):
    """Multi-source BFS hop distance (functions/linkgraph.py
    bfs_distances) over the same deterministic orders-derived edge list
    as pagerank_customers, seeds = custkeys {1,2,3}, 4 hops. Hop
    distance is the unique shortest walk length, so the result is
    partition-invariant and the oracle is a bounded recursive CTE
    taking min(dist) over all walk rows."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.linkgraph import bfs_distances

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    C = orders.max("o_custkey")

    def mk_edges(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        dst = 1 + (ok * 26544357) % C
        return pa.table({"src": pa.array(ck, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = orders.map_batches(mk_edges, batch_format="pyarrow")
    return bfs_distances(edges, _BFS_SEEDS, max_hops=_BFS_HOPS)


_TRI_NODES = 500


def _q_triangle_count(sf_dir: str):
    """Exact triangle count (functions/linkgraph.py triangle_count,
    degree-oriented wedge counting) over a deterministic dense graph
    derived from orders by folding orderkeys into a {1..500} node space
    — both engines derive the identical edge list, so the single count
    is value-exact vs DuckDB's canonical u<v<w three-way self-join."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.linkgraph import triangle_count

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey"])

    def mk_edges(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        src = 1 + (ok * 2654435761) % _TRI_NODES
        dst = 1 + (ok * 40503) % _TRI_NODES
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    edges = orders.map_batches(mk_edges, batch_format="pyarrow")
    return triangle_count(edges)


def _pagerank_oracle_sql(iters: int, scale: int) -> str:
    """The identical integer recurrence as an unrolled chain of CTEs —
    one (dang, contrib, state) triple per iteration."""
    parts = [f"""
            WITH edges AS (
                SELECT o_custkey AS src,
                       1 + (o_orderkey * 26544357)
                           % (SELECT max(o_custkey) FROM orders) AS dst
                FROM orders
            ),
            nodes AS (SELECT src AS node FROM edges
                      UNION SELECT dst FROM edges),
            nn AS (SELECT count(*) AS n FROM nodes),
            deg AS (SELECT src AS node, count(*) AS deg
                    FROM edges GROUP BY src),
            state0 AS (
                SELECT n.node, COALESCE(d.deg, 0) AS deg,
                       CAST({scale} AS BIGINT) AS r
                FROM nodes n LEFT JOIN deg d USING (node)
            )"""]
    for i in range(iters):
        parts.append(f""",
            dang{i} AS (SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dsum
                        FROM state{i} WHERE deg = 0),
            contrib{i} AS (
                SELECT e.dst AS node, CAST(SUM(s.r // s.deg) AS BIGINT) AS a
                FROM edges e JOIN state{i} s ON e.src = s.node
                GROUP BY e.dst
            ),
            state{i + 1} AS (
                SELECT s.node, s.deg,
                       CAST((15 * {scale}
                             + 85 * (COALESCE(c.a, 0)
                                     + (SELECT dsum FROM dang{i})
                                       // (SELECT n FROM nn))) // 100
                            AS BIGINT) AS r
                FROM state{i} s LEFT JOIN contrib{i} c USING (node)
            )""")
    parts.append(f"""
            SELECT node, r AS "rank" FROM state{iters}""")
    return "".join(parts)


def _q_page_outlinks(sf_dir: str):
    """Hyperlink edge extraction (src, dst, anchor) from raw HTML over
    the fixture pages corpus: DOM parse per page, <base href> honored,
    relative hrefs resolved, fragments/non-navigational schemes dropped.
    Zero shuffle. Rows-only (DOM semantics are not SQL-expressible);
    resolution rules are unit-tested in tests/test_linkgraph.py."""
    import ray.data as rd
    from sift_ray.functions.linkgraph import extract_outlinks
    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "html"])
    return extract_outlinks(pages)


def _q_host_graph(sf_dir: str):
    """Host-level link graph (src_host, dst_host, n) aggregated from the
    page-level edges via one host-pair-keyed exchange."""
    import ray.data as rd
    from sift_ray.functions.linkgraph import extract_outlinks, host_edges
    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "html"])
    return host_edges(extract_outlinks(pages))


def _q_url_rank(sf_dir: str):
    """Page-reputation PageRank over the REAL extracted link graph:
    outlinks from the pages corpus -> distinct url edges -> string-keyed
    PageRank (functions/linkgraph.py pagerank_hosts — keys dictionary-
    encode to int63 hashes map-side, exchanges move 16-byte rows, ranks
    join names back through one exchange). The fixture corpus is
    single-host, so the url-level graph (~corpus-sized, genuinely
    multi-node) is the non-vacuous variant; the host-level rollup is the
    same call over host_edges. Rows-only (HTML link extraction is not
    SQL-expressible); the integer recurrence is pinned exactly in
    tests/test_linkgraph.py."""
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.linkgraph import extract_outlinks, pagerank_hosts
    from sift_ray.functions.shuffle import partitioned_group_agg
    from sift_ray.functions.sketch import _hash64_route

    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "html"])

    def as_host_cols(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"src_host": pa.array([], pa.string()),
                             "dst_host": pa.array([], pa.string())})
        return pa.table({"src_host": t.column("src"),
                         "dst_host": t.column("dst")})

    def key_hash(batch: "pa.Table"):
        import numpy as np
        return [_hash64_route(batch.column("src_host")).astype("int64"),
                _hash64_route(batch.column("dst_host")).astype("int64")]

    edges = partitioned_group_agg(
        extract_outlinks(pages).map_batches(as_host_cols,
                                            batch_format="pyarrow"),
        ["src_host", "dst_host"], [(None, "count", "n")],
        key_arrays_fn=key_hash)
    return pagerank_hosts(edges, iters=4).map_batches(
        lambda t: t.rename_columns(["url", "rank"]),
        batch_format="pyarrow")


def _q_events_interval_join(sf_dir: str):
    """Distributed RANGE join (no equi-key): every event paired with
    every 1-hour incident window it falls in (windows = every 50th
    event's start time). Time-binned bucket exchange + hash_join with a
    partition-local range post-filter; each candidate pair meets in
    exactly one bucket, so no dedup pass."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import interval_join

    events = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_id", "ts"])

    def mk_windows(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 50 == 0))
        ws = pc.cast(t.column("ts"), pa.int64())
        we = pc.add(ws, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"window_id": t.column("event_id"),
                         "ws": ws, "we": we})

    wins = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=["event_id", "ts"]).map_batches(
        mk_windows, batch_format="pyarrow")
    return interval_join(events, wins, "ts", "ws", "we",
                         ["event_id"], ["window_id"],
                         granularity_s=3600,
                         event_types={"event_id": "int64"},
                         ival_types={"window_id": "int64"})


def _q_heavy_hitter_users(sf_dir: str):
    """Frequent-items operator: all user_ids with > 0.8% of events, EXACT
    counts via two-pass distributed Misra-Gries (mergeable candidate
    sketch + broadcast exact recount). Oracle-exact: the sketch only
    decides WHICH values get recounted (a guaranteed superset)."""
    import ray.data as rd
    from sift_ray.functions.sketch import heavy_hitters
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    return heavy_hitters(ds, "user_id", phi=0.008)


def _q_shipping_priority(sf_dir: str):
    """TPC-H-Q3 shape: two chained distributed hash joins (customer
    semi-join keys-only, then orders->lineitem), integer-cents revenue
    group-agg partitioned on l_orderkey, local-topk merge."""
    import ray.data as rd
    from sift_ray.functions.relational import shipping_priority
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])
    cu = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    return shipping_priority(li, od, cu)


def _q_events_gap_fill(sf_dir: str):
    """Per-user regularized time grid: every 300 s window between a
    user's first and last event, empty windows n_events = 0 — the
    tumbling combiner + ONE user exchange + vectorized span expansion."""
    import ray.data as rd
    from sift_ray.functions.windows import gap_fill
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "value"])
    # 1h grid: the output is span-bounded (users x span/window) BY
    # DESIGN — a 300 s grid over this corpus's 30-day span is 13M rows,
    # which is a deliberate resample-density choice, not a scale issue
    return gap_fill(ds, window_s=3600)


def _q_retention_cohorts(sf_dir: str):
    """Retention cohort matrix over events: distinct (user, week) rows
    through ONE user exchange, cohort = min week per co-located user,
    weeks^2-bounded output."""
    import ray.data as rd
    from sift_ray.functions.windows import retention_cohorts
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return retention_cohorts(ds)


def _q_regional_revenue(sf_dir: str):
    """TPC-H-Q5 shape: three chained distributed hash joins over the
    fact path (orders -> customer -> lineitem -> supplier) with the tiny
    nation x region dimensions broadcast, same-nation filter map-side,
    integer 1e-4-dollar revenue, <= 25-key final exchange."""
    import ray.data as rd
    from sift_ray.functions.relational import regional_revenue
    rp = lambda t, cols: rd.read_parquet(  # noqa: E731
        os.path.join(sf_dir, f"{t}.parquet"), columns=cols)
    return regional_revenue(
        rp("lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]),
        rp("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        rp("customer", ["c_custkey", "c_nationkey"]),
        rp("supplier", ["s_suppkey", "s_nationkey"]),
        rp("nation", ["n_nationkey", "n_name", "n_regionkey"]),
        rp("region", ["r_regionkey", "r_name"]))


def _q_oov_rate(sf_dir: str):
    """Per-doc OOV token counts vs the corpus top-20 vocabulary (count
    DESC, word ASC): vocab_topk's one word exchange to train, broadcast
    vocab + zero-shuffle segment sums to score. k=20 < the corpus's
    distinct-word count, so OOV counts are non-vacuous."""
    from sift_ray.functions.corpus import oov_rate
    return oov_rate(_docs(sf_dir, ["doc_id", "text"]), vocab_k=20)


def _q_politeness_schedule(sf_dir: str):
    """Crawl-frontier politeness scheduling over the documents table's
    source column as the host: per-host fetch ranks + 1s-spaced slots,
    one host exchange, partition-local segment arithmetic."""
    from sift_ray.functions.urls import politeness_schedule
    return politeness_schedule(_docs(sf_dir, ["doc_id", "source"]),
                               host_col="source", id_col="doc_id",
                               interval_us=1_000_000)


def _q_brand_revenue(sf_dir: str):
    """TPC-H-Q14/Q15 star shape: revenue per part brand with the part
    dimension BROADCAST (factorized key->label arrays via ray.put); the
    lineitem fact streams in one map-only pass emitting <= |brands|
    partial rows per batch, so the only exchange is the final label sum."""
    import ray.data as rd
    from sift_ray.functions.relational import dim_revenue
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])
    return dim_revenue(li, os.path.join(sf_dir, "part.parquet"),
                       "l_partkey", "p_partkey", "p_brand")


def _q_supplier_revenue(sf_dir: str):
    """Same broadcast-dimension rollup at supplier grain (Q15 shape):
    revenue per supplier name, dimension shipped once via ray.put."""
    import ray.data as rd
    from sift_ray.functions.relational import dim_revenue
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    return dim_revenue(li, os.path.join(sf_dir, "supplier.parquet"),
                       "l_suppkey", "s_suppkey", "s_name")


def _q_pii_scrub(sf_dir: str):
    """PII redaction (emails / IPv4s / phone-like numbers -> placeholders,
    with per-doc counts). The fixture corpus carries no PII, so the query
    decorates each doc with deterministic doc_id-derived PII in BOTH
    engines — the scrub itself (RE2 patterns, replacement order) is what is
    being checked byte-exact. Map-only, zero shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from sift_ray.functions.textstats import pii_scrub

    def decorate(b: "pa.Table") -> "pa.Table":
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        s = pc.cast(b.column("doc_id"), pa.string())
        octet = pa.array((ids % 200).astype("U"), pa.string())
        phone = pa.array((100 + ids % 900).astype("U"), pa.string())
        text = pc.binary_join_element_wise(
            b.column("text"), " contact user", s, "@example.com from ",
            octet, ".0.0.1 call 555-0", phone, "")
        return b.set_column(b.schema.get_field_index("text"), "text", text)

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        decorate, batch_format="pyarrow")
    return pii_scrub(ds)


def _q_repetition_stats(sf_dir: str):
    """Gopher-style per-doc repetition signals (distinct-word count, most
    frequent word 2-gram count) as exact integers; map-only."""
    from sift_ray.functions.textstats import repetition_stats
    return repetition_stats(_docs(sf_dir, ["doc_id", "text"]))


def _q_gopher_repetition(sf_dir: str):
    """The full Gopher repetition-signal family (Rae et al. 2021 Table A1)
    as exact integers — duplicate line counts/chars and top 2/3/4-gram
    character mass — over a line-structured view (lines minted in BOTH
    engines via ' table ' -> newline). Map-only, zero shuffle."""
    import pyarrow.compute as pc
    from sift_ray.functions.textstats import gopher_repetition

    def mint(batch):
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            pc.replace_substring(batch.column("text"), " table ", "\n"))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        mint, batch_format="pyarrow")
    return gopher_repetition(ds)


def _q_events_window(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.windows import tumbling_window
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "value"])
    return tumbling_window(ds, window_s=300)


def _q_hopping_windows(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.windows import hopping_window
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "value"])
    return hopping_window(ds, window_s=300, hop_s=60)


def _q_session_windows(sf_dir: str):
    import ray.data as rd
    from sift_ray.functions.windows import session_windows
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    return session_windows(ds, gap_s=1800)


def _q_orders_rrf(sf_dir: str):
    """Reciprocal-rank fusion (relational.rrf_fuse, Cormack et al. 2009)
    of two exact global rankings of orders — by price (desc) and by
    recency (desc) — the hybrid-retrieval combiner shape. Rankings via
    sharding.global_rank (two-pass ordered scan), fusion via one FULL
    OUTER id exchange + fixed-order IEEE float map the SQL oracle
    mirrors bit-for-bit. Only the top half by price is ranked in list A
    so the outer join's missing-side zero is exercised."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.relational import rrf_fuse
    from sift_ray.functions.sharding import global_rank

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_totalprice",
                                  "o_orderdate"])

    def pre(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             100.0)), pa.int64())
        return pa.table({"doc_id": t.column("o_orderkey"),
                         "cents": cents,
                         "ep": pc.cast(t.column("o_orderdate"),
                                       pa.int64())})

    base = ds.map_batches(pre, batch_format="pyarrow").materialize()
    half = base.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(
            t.column("doc_id"), pa.scalar(1, pa.int64())),
            pa.scalar(0, pa.int64()))),
        batch_format="pyarrow")
    rank_price = global_rank(half, "cents", id_col="doc_id",
                             descending=True)
    rank_fresh = global_rank(base, "ep", id_col="doc_id",
                             descending=True)
    return rrf_fuse(rank_price, rank_fresh, id_col="doc_id", k=60)


def _q_events_merge_intervals(sf_dir: str):
    """Gaps-and-islands interval coalescing (analytic.merge_intervals):
    per-user event intervals [ts, ts + 10*value seconds] merged through
    overlaps into islands — one exchange, vectorized running-max island
    detection. Oracle: the classic MAX-OVER ... SUM(CASE) islands SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import merge_intervals

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "value"])

    def pre(t: "pa.Table") -> "pa.Table":
        s = pc.cast(t.column("ts"), pa.int64())
        # DuckDB round() is half-away-from-zero; match it explicitly
        dur = pc.max_element_wise(
            pc.cast(pc.round(pc.multiply(t.column("value"), 10.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()),
            pa.scalar(0, pa.int64()))
        e = pc.add(s, pc.multiply(dur, pa.scalar(1_000_000, pa.int64())))
        return pa.table({"user_id": t.column("user_id"), "s": s, "e": e})

    return merge_intervals(ds.map_batches(pre, batch_format="pyarrow"),
                           "user_id", "s", "e")


def _q_price_zscore(sf_dir: str):
    """Per-nation standardization of customer balances
    (analytic.group_zscore): exact integer cents moments, fixed float
    expression order mirrored in the SQL oracle — feature engineering's
    groupwise z-score at one exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import group_zscore

    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def pre(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"), 100.0)),
                        pa.int64())
        return pa.table({"c_custkey": t.column("c_custkey"),
                         "c_nationkey": t.column("c_nationkey"),
                         "bal_cents": cents})

    out = group_zscore(ds.map_batches(pre, batch_format="pyarrow"),
                       "c_nationkey", "bal_cents")
    return out.map_batches(lambda t: t.select(["c_custkey", "z"]),
                           batch_format="pyarrow")


def _q_events_range_window(sf_dir: str):
    """Time-RANGE window frame (analytic.range_window_agg): per event,
    SUM/COUNT of value-cents over the same user's trailing hour — the
    value-based frame SQL writes as RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW. One user exchange, per-segment prefix
    sums + searchsorted boundaries."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import range_window_agg

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts", "value"])

    def pre(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)),
                        pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts": t.column("ts"), "v_cents": cents})

    out = range_window_agg(ds.map_batches(pre, batch_format="pyarrow"),
                           "user_id", "ts", "v_cents",
                           range_us=3_600_000_000)
    return out.map_batches(
        lambda t: t.select(["event_id", "w_sum", "w_cnt"]),
        batch_format="pyarrow")


def _q_events_rank_features(sf_dir: str):
    """Per-user ranking window functions (rank / dense_rank / percent_rank
    / ntile(4) / first_value / last_value) on integer cents with real
    ties — ONE user_id exchange, vectorized tie-run segment arithmetic."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import keyed_rank_calcs

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "value"])

    def pre(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            t.column("value"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "value_cents": cents,
        })

    return keyed_rank_calcs(ds.map_batches(pre, batch_format="pyarrow"),
                            "user_id", "value_cents", "event_id", q=4)


def _q_orders_window_features(sf_dir: str):
    """Per-customer ordered window functions (row_number / lag / running
    sum / 3-row moving sum) over integer cents — ONE custkey exchange,
    partition-local lexsort + vectorized segment arithmetic (the
    distributed OVER (PARTITION BY ... ORDER BY ...))."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import keyed_window_calcs

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_orderkey", "o_orderdate",
                                  "o_totalprice"])

    def pre(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            t.column("o_totalprice"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate_us": pc.cast(t.column("o_orderdate"), pa.int64()),
            "price_cents": cents})

    base = ds.map_batches(pre, batch_format="pyarrow")
    return keyed_window_calcs(base, "o_custkey",
                              ["o_orderdate_us", "o_orderkey"],
                              "price_cents", moving_rows=3)


def _q_pricing_rollup(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): the corpus crosses the
    exchange once (finest group-by); coarser levels re-fold the finest
    aggregate (distributive rollup), grand total folded on the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import rollup

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity"])

    def pre(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": pc.cast(t.column("l_quantity"), pa.int64())})

    base = ds.map_batches(pre, batch_format="pyarrow")
    return rollup(base, ["l_returnflag", "l_linestatus"],
                  [("qty", "sum", "sum_qty"), (None, "count_all", "n_rows")])


def _q_pricing_cube(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus): the full data-cube
    lattice through grouping_sets — corpus crosses the exchange once at
    the finest level; every other subset re-folds that aggregate."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import cube

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity"])

    def pre(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": pc.cast(t.column("l_quantity"), pa.int64())})

    base = ds.map_batches(pre, batch_format="pyarrow")
    return cube(base, ["l_returnflag", "l_linestatus"],
                [("qty", "sum", "sum_qty"), (None, "count_all", "n_rows")])


def _q_customers_f_only(sf_dir: str):
    """Distributed SQL EXCEPT (DISTINCT): customers whose orders are all
    finished — keys with an 'F'-status order and no 'O'-status order.
    Per-batch distinct combiner, ONE tuple-hash exchange, no driver
    state — the anti-join expressed as a set operation."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.relational import set_op

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_orderstatus"])

    def of_status(status: str):
        def pre(t: "pa.Table") -> "pa.Table":
            m = pc.equal(t.column("o_orderstatus"), status)
            return pa.table({"custkey": t.filter(m).column("o_custkey")})
        return pre

    return set_op(orders.map_batches(of_status("F"),
                                     batch_format="pyarrow"),
                  orders.map_batches(of_status("O"),
                                     batch_format="pyarrow"),
                  ["custkey"], "except")


def _q_purchase_click_users(sf_dir: str):
    """Distributed SQL INTERSECT (DISTINCT): users that both clicked and
    purchased — the cross-behavior cohort. Map-side distinct per batch,
    one exchange, presence-flag kernel."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.relational import set_op

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"])

    def of_type(etype: str):
        def pre(t: "pa.Table") -> "pa.Table":
            m = pc.equal(t.column("event_type"), etype)
            return pa.table({"user_id": t.filter(m).column("user_id")})
        return pre

    return set_op(ds.map_batches(of_type("purchase"),
                                 batch_format="pyarrow"),
                  ds.map_batches(of_type("click"), batch_format="pyarrow"),
                  ["user_id"], "intersect")


def _q_doc_keywords(sf_dir: str):
    """Per-document TF-IDF keyword extraction with corpus DF: one
    term-keyed exchange computes df and scores in place, one doc-keyed
    grouped_topk picks each document's top terms; integer micro-unit
    scores make the ln() doubles value-exact cross-engine."""
    import ray.data as rd
    from sift_ray.functions.corpus import keywords_tfidf
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    n = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"]).count()
    return keywords_tfidf(ds, k=5, n_docs=n)


def _q_event_funnel(sf_dir: str):
    """Ordered funnel (view -> click -> purchase) with strict min-ts
    chaining: map-side type filter, ONE user exchange, vectorized
    per-partition chaining, k-row partial fold."""
    import ray.data as rd
    from sift_ray.functions.windows import funnel_counts
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "ts"])
    return funnel_counts(ds, ["view", "click", "purchase"])


def _q_orders_profile(sf_dir: str):
    """Distributed table profiler (ANALYZE/describe): per column — row
    count, null count, EXACT distinct count, typed min/max. One corpus
    scan with a map-side distinct combiner; everything rides ONE
    (col, value)-hash exchange; the driver merges num_parts x C partial
    rows. Oracle-exact vs per-column UNION ALL SQL."""
    import ray.data as rd
    from sift_ray.functions.analytic import profile_table
    return profile_table(
        rd.read_parquet(os.path.join(sf_dir, "orders.parquet")))


def _q_qty_price_corr(sf_dir: str):
    """Pearson correlation of lineitem quantity and price cents from
    EXACT distributed integer moments (overflow-safe hi/lo split sums,
    arbitrary-precision driver reconstruction, the same double ops
    DuckDB performs on its HUGEINT sums)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import exact_corr

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_quantity", "l_extendedprice"])

    def pre(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "qty": pc.cast(t.column("l_quantity"), pa.int64()),
            "cents": pc.cast(pc.floor(pc.add(pc.multiply(
                t.column("l_extendedprice"), pa.scalar(100.0)),
                pa.scalar(0.5))), pa.int64())})

    return exact_corr(ds.map_batches(pre, batch_format="pyarrow"),
                      "qty", "cents")


def _q_qty_price_regression(sf_dir: str):
    """Simple OLS (the SQL regr_slope/regr_intercept/regr_r2 family) of
    price cents on quantity, from the same exact distributed integer
    moments as `qty_price_corr` — every division happens on exact
    integer numerators/denominators cast to double, mirrored term for
    term in the oracle SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import linear_fit

    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_quantity", "l_extendedprice"])

    def pre(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "qty": pc.cast(t.column("l_quantity"), pa.int64()),
            "cents": pc.cast(pc.floor(pc.add(pc.multiply(
                t.column("l_extendedprice"), pa.scalar(100.0)),
                pa.scalar(0.5))), pa.int64())})

    return linear_fit(ds.map_batches(pre, batch_format="pyarrow"),
                      "qty", "cents")


def _q_source_quality_gate(sf_dir: str):
    """Group-level quality gate (CCNet host-filter shape): keep documents
    whose SOURCE's mean length clears the bar — integer sum >= bar *
    count decision per group, broadcast keep-set below a cardinality
    gate, distributed semi-join above it."""
    import ray.data as rd
    from sift_ray.functions.corpus import group_mean_gate
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "source", "n_chars"])
    return group_mean_gate(ds, "source", "n_chars", min_avg=300)


def _q_length_lang_auc(sf_dir: str):
    """Exact distributed ROC-AUC (Mann-Whitney with tie-averaged ranks)
    of document length predicting lang == 'en': distinct-score histogram
    exchange + two-pass prefix ranks; integer until one final division."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import auc_exact

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["lang", "n_chars"])

    def pre(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "score": pc.cast(t.column("n_chars"), pa.int64()),
            "label": pc.cast(pc.equal(t.column("lang"), "en"),
                             pa.int64())})

    return auc_exact(ds.map_batches(pre, batch_format="pyarrow"),
                     "label", "score")


def _q_quality_classifier(sf_dir: str):
    """Distributed hashed bag-of-words logistic regression (the
    CCNet/WebText quality-filter trainer): label = (lang == 'en'),
    full-batch GD with integer-micro gradient exchanges — weights
    bit-identical under any partitioning (tests pin an exact local
    replica) — then a zero-shuffle scoring pass over the corpus.
    Rows-only (iterative learned model, not SQL-expressible)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.classifier import logreg_fit, logreg_predict

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])

    def pre(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": t.column("text"),
            "label": pc.cast(pc.equal(t.column("lang"), "en"),
                             pa.int64())})

    labeled = ds.map_batches(pre, batch_format="pyarrow")
    _, model = logreg_fit(labeled, hash_bits=14, n_iter=5)
    return logreg_predict(labeled, model)


def _q_source_fields(sf_dir: str):
    """RE2 named-group field extraction from the docs source column —
    vectorized pc.extract_regex (the same regex engine as DuckDB's
    regexp_extract), zero shuffle, nulls for non-matches."""
    import ray.data as rd
    from sift_ray.functions.textstats import regex_extract_cols
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "source"])
    return regex_extract_cols(ds, "source",
                              r"(?P<src_prefix>[a-z]+)(?P<src_num>\d+)")


def _q_exact_distinct_users(sf_dir: str):
    """EXACT global COUNT(DISTINCT user_id): per-batch distinct combiner,
    ONE tuple-hash exchange, per-partition counts summed (each distinct
    value lives in exactly one partition) — the exact complement to
    approx_distinct_users' HLL."""
    import ray.data as rd
    from sift_ray.functions.sketch import exact_distinct
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    return exact_distinct(ds, ["user_id"])


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (A-Res order
    by ln(md5-uniform)/weight): zero shuffle — per-batch top-k combiner,
    bounded driver merge; identical rows on any md5-capable engine."""
    from sift_ray.functions.corpus import weighted_sample
    return weighted_sample(_docs(sf_dir, ["doc_id", "n_chars"]), k=50)


def _q_orders_semi_join(sf_dir: str):
    """Distributed SEMI join (SQL EXISTS): orders containing at least one
    high-quantity lineitem — each left row emitted at most once, right
    non-key columns never move past the map-side projection."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join

    od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey",
                                  "o_totalprice"])
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])

    def keys(t: "pa.Table") -> "pa.Table":
        hot = t.filter(pc.greater(t.column("l_quantity"), pa.scalar(45.0)))
        return pa.table({"o_orderkey": hot.column("l_orderkey")})

    right = li.map_batches(keys, batch_format="pyarrow")
    return hash_join(od, right, on="o_orderkey", how="semi",
                     left_types={"o_orderkey": pa.int64(),
                                 "o_custkey": pa.int64(),
                                 "o_totalprice": pa.float64()},
                     right_types={"o_orderkey": pa.int64()})


def _q_lineitem_topk_per_order(sf_dir: str):
    """Distributed per-group top-k at UNBOUNDED group cardinality (one
    group per order): per-batch local-topk combiner, ONE group-key
    exchange, partition-local head — exact row_number() semantics with
    zero driver state (topk_per_group's driver merge only suits bounded
    keys like segments)."""
    import ray.data as rd
    from sift_ray.functions.relational import grouped_topk
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_linenumber",
                                  "l_extendedprice"])
    return grouped_topk(li, "l_orderkey", "l_extendedprice",
                        "l_linenumber", k=2)


def _q_robots_filter(sf_dir: str):
    """RFC 9309 robots.txt compliance filter over the pages corpus: a
    synthetic per-host robots table (disallow the /large and
    /pathological sections, allow everything else for UA sift) joins to
    pages on host — ONE host exchange — and rules evaluate map-side with
    a per-process parse cache. Rows-only (robots evaluation is not
    SQL-expressible); parser rules are unit-tested against the RFC
    examples in tests/test_robots.py."""
    import ray.data as rd
    from sift_ray.functions.robots import robots_filter
    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url"])
    robots = rd.from_items([{
        "host": "fixtures.test",
        "robots": ("User-agent: sift\n"
                   "Disallow: /large\n"
                   "Disallow: /pathological\n"
                   "Allow: /large/000000100$\n"),
    }])
    out = robots_filter(pages, robots, user_agent="sift/0.1")
    return out.select_columns(["url", "host"])


def _q_page_metadata(sf_dir: str):
    """Head-metadata extraction (title / descriptions / canonical / lang /
    published) over the raw pages — map-only, zero shuffle, quarantine
    statuses. Rows-only (DOM field rules are not SQL-expressible; each
    rule is unit-tested in tests/test_metadata.py)."""
    import ray.data as rd
    from sift_ray.functions.metadata import page_metadata
    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "html"])
    return page_metadata(pages)


def _q_html_table_cells(sf_dir: str):
    """HTML <table> grid extraction (webstruct.html_tables): one synthetic
    page per nation holding a table of its customers, built DISTRIBUTED
    (groupby nation -> map_groups renders HTML), then the zero-shuffle
    cell-grid stage. Oracle: DuckDB reconstructs the long-form cell rows
    relationally (header VALUES cross join + row_number per nation)."""
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.webstruct import html_tables

    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_nationkey"])

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("c_custkey")
        nk = int(pdf["c_nationkey"].iloc[0])
        rows = "".join(
            f"<tr><td>{k}</td><td>{n}</td></tr>"
            for k, n in zip(pdf["c_custkey"], pdf["c_name"]))
        html = ("<html><body><table><tr><th>custkey</th><th>name</th></tr>"
                + rows + "</table></body></html>")
        return pd.DataFrame({
            "url": [f"http://tables.example/nation/{nk}"],
            "html": [html.encode()]})

    pages = ds.groupby("c_nationkey").map_groups(render,
                                                 batch_format="pandas")
    return html_tables(pages)


def _q_jsonld_product_fields(sf_dir: str):
    """JSON-LD (schema.org) field mining (webstruct.jsonld_fields): one
    synthetic product page per part with an application/ld+json block,
    rendered map-side, then the zero-shuffle JSON-LD stage emits
    long-form (key, value) rows. Oracle: DuckDB reconstructs the rows
    from the part table (keys VALUES cross join)."""
    import json as _json
    import pyarrow as _pa
    import ray.data as rd
    from sift_ray.functions.webstruct import jsonld_fields

    ds = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name", "p_brand"])

    def render(batch: _pa.Table) -> _pa.Table:
        urls, htmls = [], []
        for pk, nm, br in zip(batch.column("p_partkey").to_pylist(),
                              batch.column("p_name").to_pylist(),
                              batch.column("p_brand").to_pylist()):
            ld = _json.dumps({"@type": "Product", "name": nm,
                              "sku": pk, "brand": br})
            urls.append(f"http://shop.example/part/{pk}")
            htmls.append((
                "<html><head><script type=\"application/ld+json\">"
                + ld + "</script></head><body>p</body></html>").encode())
        return _pa.table({"url": _pa.array(urls, _pa.string()),
                          "html": _pa.array(htmls, _pa.binary())})

    pages = ds.map_batches(render, batch_format="pyarrow")
    return jsonld_fields(pages)


def _q_sitemap_entries(sf_dir: str):
    """Sitemap parsing (webstruct.sitemap_entries): one synthetic
    sitemap.xml per customer listing its orders (loc + ISO lastmod +
    changefreq/priority), rendered distributed, then the zero-shuffle
    entry parser. Oracle: DuckDB reconstructs entries from orders."""
    import pyarrow as _pa
    import ray.data as rd
    from sift_ray.functions.webstruct import sitemap_entries

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey", "o_orderdate"])

    # vectorized partition-kernel render (see _q_crawl_frontier)
    def render_part(t: _pa.Table) -> _pa.Table:
        df = t.to_pandas().sort_values(["o_custkey", "o_orderkey"])
        ent = ("<url><loc>http://sm.example/order/"
               + df["o_orderkey"].astype(str) + "</loc><lastmod>"
               + df["o_orderdate"].dt.strftime("%Y-%m-%d")
               + "</lastmod><changefreq>weekly</changefreq>"
               + "<priority>0.5</priority></url>")
        g = ent.groupby(df["o_custkey"].to_numpy(), sort=True).agg("".join)
        urls = ("http://sm.example/customer/" + g.index.astype(str)
                + "/sitemap.xml")
        html = ('<?xml version="1.0" encoding="UTF-8"?><urlset>' + g
                + "</urlset>").str.encode("utf-8")
        return _pa.table({"url": _pa.array(urls, _pa.string()),
                          "html": _pa.array(html.to_numpy(), _pa.binary())})

    from sift_ray.functions.shuffle import add_hash_partition
    pages = add_hash_partition(ds, ["o_custkey"], 64).groupby(
        "part").map_groups(render_part, batch_format="pyarrow")
    return sitemap_entries(pages)


def _q_robots_sitemaps(sf_dir: str):
    """Sitemap discovery from robots.txt (robots.robots_sitemaps):
    synthesized per-supplier robots files (mixed-case directives, a
    relative URL, suppliers without any), zero shuffle. Oracle: DuckDB
    reconstructs the discovered rows from supplier."""
    import pyarrow as _pa
    import ray.data as rd
    from sift_ray.functions.robots import robots_sitemaps

    ds = rd.read_parquet(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey"])

    def render(batch: _pa.Table) -> _pa.Table:
        hosts, txts = [], []
        for sk in batch.column("s_suppkey").to_pylist():
            host = f"s{sk}.example.com"
            if sk % 4 == 0:
                txt = "User-agent: *\nDisallow: /tmp\n"  # none declared
            else:
                txt = (f"User-agent: *\nAllow: /\n"
                       f"Sitemap: https://{host}/sitemap-{sk}.xml\n")
                if sk % 3 == 0:
                    txt += "sitemap: /extra.xml\n"  # relative + lowercase
            hosts.append(host)
            txts.append(txt)
        return _pa.table({"host": _pa.array(hosts, _pa.string()),
                          "robots_txt": _pa.array(txts, _pa.string())})

    return robots_sitemaps(ds.map_batches(render, batch_format="pyarrow"))


def _sitemap_fixture_for(sf_dir: str) -> str:
    """Per-customer sitemap pages for the crawl_frontier query, rendered
    ONCE per scale factor and cached as parquet under /tmp — the render
    is fixture synthesis, not pipeline work, and caching keeps the query
    timing the frontier's exchanges rather than the fixture (it was the
    majority of crawl_frontier's bench wall). Render: one custkey
    exchange + vectorized partition kernel — NOT per-group map_groups
    (15k python calls) and NOT zero-shuffle per-batch rendering
    (customers scatter across input blocks -> ~10x one-entry sitemaps
    and ~10x parse_html calls downstream; measured slower)."""
    import shutil

    import pyarrow as _pa
    import ray.data as rd

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    out = f"/tmp/sift_ray_sitemaps/{sf}"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey"])

    def render_part(t: _pa.Table) -> _pa.Table:
        df = t.to_pandas().sort_values(["o_custkey", "o_orderkey"])
        ck = df["o_custkey"].astype(str)
        ent = ("<url><loc>http://c" + ck + ".shop.example/order/"
               + df["o_orderkey"].astype(str) + "</loc></url>")
        g = ent.groupby(df["o_custkey"].to_numpy(), sort=True).agg("".join)
        urls = ("http://c" + g.index.astype(str)
                + ".shop.example/sitemap.xml")
        html = ("<urlset>" + g + "</urlset>").str.encode("utf-8")
        return _pa.table({"url": _pa.array(urls, _pa.string()),
                          "html": _pa.array(html.to_numpy(), _pa.binary())})

    from sift_ray.functions.shuffle import add_hash_partition
    pages = add_hash_partition(ds, ["o_custkey"], 64).groupby(
        "part").map_groups(render_part, batch_format="pyarrow")
    tmp = f"{out}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    pages.write_parquet(tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    os.rename(tmp, out)
    return out


def _q_crawl_frontier(sf_dir: str):
    """FLAGSHIP crawl-frontier composition (pipelines/frontier.py):
    per-customer sitemap fixture (cached parquet, _sitemap_fixture_for)
    -> sitemap_entries -> canonical_url -> distributed anti-join against
    the already-fetched url set (every o_orderkey % 3 == 0) -> per-host
    politeness schedule. Two exchanges end to end. Oracle: the full
    composition re-expressed relationally (filter + row_number per
    host)."""
    import pyarrow as _pa
    import ray.data as rd
    from sift_ray.pipelines.frontier import build_frontier

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_orderkey", "o_custkey"])
    pages = rd.read_parquet(_sitemap_fixture_for(sf_dir))

    def seen_rows(batch: _pa.Table) -> _pa.Table:
        import numpy as np
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        m = ok % 3 == 0
        urls = np.char.add(
            np.char.add(np.char.add("http://c", ck[m].astype("U")),
                        ".shop.example/order/"),
            ok[m].astype("U"))
        return _pa.table({"url": _pa.array(urls.tolist(), _pa.string())})

    seen = ds.map_batches(seen_rows, batch_format="pyarrow")
    return build_frontier(pages, seen)


def _q_robots_meta_flags(sf_dir: str):
    """Robots-meta indexability flags (webstruct.robots_meta_flags): one
    synthetic page per customer, noindex/nofollow planted from key
    residues, one output row per page. Oracle: DuckDB derives the same
    booleans from c_custkey."""
    import pyarrow as _pa
    import ray.data as rd
    from sift_ray.functions.webstruct import robots_meta_flags

    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"])

    def render(batch: _pa.Table) -> _pa.Table:
        urls, htmls = [], []
        for ck in batch.column("c_custkey").to_pylist():
            toks = []
            if ck % 7 == 0:
                toks.append("noindex")
            if ck % 5 == 0:
                toks.append("nofollow")
            meta = (f'<meta name="robots" content="{", ".join(toks)}">'
                    if toks else "")
            urls.append(f"http://pages.example/c/{ck}")
            htmls.append((f"<html><head>{meta}</head>"
                          f"<body>c{ck}</body></html>").encode())
        return _pa.table({"url": _pa.array(urls, _pa.string()),
                          "html": _pa.array(htmls, _pa.binary())})

    return robots_meta_flags(ds.map_batches(render, batch_format="pyarrow"))


def _q_seeded_shuffle(sf_dir: str):
    """Deterministic seeded global shuffle (sharding.seeded_shuffle):
    md5-rank permutation over the documents table — reproducible
    training order under any partitioning; one exchange, driver holds
    P integers. Oracle: SQL row_number over md5 order."""
    from sift_ray.functions.sharding import seeded_shuffle
    return seeded_shuffle(_docs(sf_dir, ["doc_id"]), seed=42)


def _q_explode_embeddings(sf_dir: str):
    """UNNEST WITH ORDINALITY (relational.explode_list): flatten the
    embedding list column to (vec_id, dim, x) long form — zero-copy
    pc.list_flatten / list_parent_indices, vectorized ordinality, zero
    shuffle. Oracle: DuckDB generate_subscripts + unnest."""
    import ray.data as rd
    from sift_ray.functions.relational import explode_list
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    return explode_list(ds, "embedding", ["vec_id"],
                        ordinal_col="dim", value_col="x")


def _q_embedding_pca(sf_dir: str):
    """Distributed PCA over the embeddings table: one corpus pass of
    second-moment partials, ONE idx-keyed exchange, driver receives
    d(d+3)/2 + 1 floats, eigh on the d x d covariance. Rows-only
    (eigendecomposition is not SQL-expressible; checked against numpy
    on the full matrix in tests/test_metadata.py)."""
    import os as _os
    import ray.data as rd
    from sift_ray.functions.similarity import pca_fit
    ds = rd.read_parquet(_os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["embedding"])
    loadings, _ = pca_fit(ds, k=4)
    return loadings


def _q_charset_stats(sf_dir: str):
    """Charset sniffing ladder (BOM > meta declaration > UTF-8 validation
    > windows-1252 fallback) over the raw binary pages — the decode audit
    a CC-scale ingest runs before extraction. Map-only, zero shuffle.
    Rows-only; the ladder is unit-tested per rung in
    tests/test_charset.py."""
    import ray.data as rd
    from sift_ray.functions.charset import charset_stats
    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "html"])
    return charset_stats(pages)


def _q_anchor_topk(sf_dir: str):
    """Anchor-text aggregation per link target (the classic web-search /
    pretraining signal): outlink edges -> per-(dst, anchor) counts via
    one gram-style exchange -> distributed per-dst top-k. Group count is
    corpus-sized, so this must be grouped_topk (zero driver state), not
    a driver merge. Rows-only (edges come from DOM extraction)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.linkgraph import extract_outlinks
    from sift_ray.functions.relational import grouped_topk
    from sift_ray.functions.shuffle import partitioned_group_agg

    corpus = _pages_corpus_for(sf_dir)
    pages = rd.read_parquet(corpus, columns=["url", "html"])
    edges = extract_outlinks(pages)

    def pre(t: "pa.Table") -> "pa.Table":
        keep = pc.not_equal(t.column("anchor"), "")
        return t.filter(keep).select(["dst", "anchor"])

    pairs = edges.map_batches(pre, batch_format="pyarrow")

    def key_fn(batch: "pa.Table"):
        from sift_ray.functions.sketch import _hash64_route
        import numpy as np
        return [_hash64_route(batch.column("dst")).astype(np.int64)]

    counts = partitioned_group_agg(
        pairs, ["dst", "anchor"], [(None, "count_all", "n")],
        key_arrays_fn=key_fn)
    return grouped_topk(counts, "dst", "n", "anchor", k=3)


_EVENTS_HALF_US = 1705363200000000  # 2024-01-16T00:00:00Z in epoch micros


def _q_events_user_type_join(sf_dir: str):
    """MULTI-KEY distributed join: per-(user_id, event_type) event counts
    from the month's first half FULL-OUTER-joined to the second half's on
    the composite key — one exchange keyed on both columns, groups seen
    in only one half survive with exact nullable-int counts."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import hash_join, partitioned_group_agg

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "ts"])

    def half(early: bool, out_name: str):
        def pre(t: "pa.Table") -> "pa.Table":
            us = pc.cast(t.column("ts"), pa.int64())
            m = (pc.less(us, _EVENTS_HALF_US) if early
                 else pc.greater_equal(us, _EVENTS_HALF_US))
            t = t.filter(m)
            return pa.table({"user_id": t.column("user_id"),
                             "event_type": t.column("event_type")})
        rows = ds.map_batches(pre, batch_format="pyarrow")

        def key_fn(batch: "pa.Table"):
            import numpy as np
            from sift_ray.functions.sketch import _hash64_route
            return [batch.column("user_id").to_numpy(zero_copy_only=False),
                    _hash64_route(batch.column("event_type"))
                    .astype(np.int64)]

        return partitioned_group_agg(rows, ["user_id", "event_type"],
                                     [(None, "count_all", out_name)],
                                     key_arrays_fn=key_fn)

    early = half(True, "n_early")
    late = half(False, "n_late")
    return hash_join(early, late, on=["user_id", "event_type"], how="full",
                     left_types={"user_id": pa.int64(),
                                 "event_type": pa.string(),
                                 "n_early": pa.int64()},
                     right_types={"user_id": pa.int64(),
                                  "event_type": pa.string(),
                                  "n_late": pa.int64()})


def _q_price_quantiles_per_customer(sf_dir: str):
    """EXACT per-group quantiles at unbounded group cardinality (one
    group per customer): (group, value) count combiner, ONE group-keyed
    exchange, vectorized segmented-cumsum readoff — the exact complement
    to the mergeable-sketch `price_quantiles_by_priority`."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_quantiles_exact

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])

    def pre(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            t.column("o_totalprice"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "price_cents": cents})

    base = ds.map_batches(pre, batch_format="pyarrow")
    return grouped_quantiles_exact(base, "o_custkey", "price_cents",
                                   qs=(0.25, 0.5, 0.75))


def _q_price_quantiles_cont(sf_dir: str):
    """SQL PERCENTILE_CONT per group (interpolated) — the continuous
    complement to `price_quantiles_per_customer`'s discrete rule. Same
    scale shape (count combiner, ONE group exchange, segmented-cumsum
    readoff of the two bracketing order statistics); dyadic quantiles
    over integer cents make the interpolation doubles exact in both
    engines, so the oracle compare is value-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.analytic import grouped_quantiles_cont

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_totalprice"])

    def pre(t: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            t.column("o_totalprice"), pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "price_cents": cents})

    base = ds.map_batches(pre, batch_format="pyarrow")
    return grouped_quantiles_cont(base, "o_custkey", "price_cents",
                                  qs=(0.25, 0.5, 0.75))


def _q_events_json_extract(sf_dir: str):
    """Semi-structured extraction: parse the events props JSON column and
    project a typed field (stdlib json, map-only, zero shuffle);
    malformed rows yield nulls. Oracle: DuckDB json_extract."""
    import ray.data as rd
    from sift_ray.functions.textstats import json_extract_cols
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "props"])
    return json_extract_cols(ds, "props", [("k", "k_val", "int")])


def _q_image_phash_pairs(sf_dir: str):
    """Image near-dup pairs by DCT perceptual hash over a deterministic
    synthetic PNG corpus with planted duplicate families (exact re-encode
    + light noise) and corrupt payloads mixed in — decode (own PNG/BMP
    codecs) -> pHash map-side, then the shared SimHash banding exchange.
    Rows-only (DCT hashing is not SQL-expressible); invariance and
    planted-pair recovery are pinned in tests/test_phash.py."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.functions.multimodal import make_png
    from sift_ray.functions.phash import phash_pairs

    sf = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    n = {"sf0.001": 30, "sf0.01": 90, "sf0.1": 300}.get(sf, 90)

    def photo(seed: int) -> "np.ndarray":
        rng = np.random.RandomState(seed)
        coarse = rng.randint(0, 256, (5, 7, 3)).astype(np.float64)
        img = np.zeros((40, 56, 3))
        for c in range(3):
            tmp = np.array([np.interp(np.linspace(0, 6, 56), np.arange(7),
                                      coarse[i, :, c]) for i in range(5)])
            img[:, :, c] = np.array(
                [np.interp(np.linspace(0, 4, 40), np.arange(5), tmp[:, j])
                 for j in range(56)]).T
        return np.clip(img, 0, 255).astype(np.uint8)

    rows = []
    for i in range(n):
        if i % 17 == 5:
            rows.append((i, b"corrupt image payload"))
            continue
        fam = i // 3            # three variants per family
        base = photo(fam)
        if i % 3 == 1:          # exact content, fresh encode
            img = base
        elif i % 3 == 2:        # light noise
            rng = np.random.RandomState(1000 + i)
            img = np.clip(base.astype(np.int16)
                          + rng.randint(-2, 3, base.shape),
                          0, 255).astype(np.uint8)
        else:
            img = base
        rows.append((i, make_png(img)))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "payload": pa.array([r[1] for r in rows], pa.binary())})
    return phash_pairs(rd.from_arrow(t).repartition(4), max_hamming=3)


def _q_events_asof_forward(sf_dir: str):
    """FORWARD AS-OF join (next-scheduled-event enrichment): each event
    picks the value of the user's EARLIEST purchase at-or-after it —
    the backward kernel on negated timestamps, one key exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sift_ray.functions.shuffle import asof_join

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])
    ev = ev.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts_us": pc.cast(t.column("ts"), pa.int64())}),
        batch_format="pyarrow")

    def purchases(t: "pa.Table") -> "pa.Table":
        p = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table({"user_id": p.column("user_id"),
                         "ts_us": pc.cast(p.column("ts"), pa.int64()),
                         "val": p.column("value")})

    rt = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "value", "event_type"]
                         ).map_batches(purchases, batch_format="pyarrow")
    return asof_join(ev, rt, key="user_id", ts="ts_us", value_col="val",
                     direction="forward")


def _q_customer_status_pivot(sf_dir: str):
    """Crosstab / PIVOT at unbounded row cardinality (per-customer
    order-status counts): (row, col) count combiner, ONE row-keyed
    exchange, partition-local vectorized unstack — SQL
    count(*) FILTER (WHERE status = v) per declared column."""
    import ray.data as rd
    from sift_ray.functions.analytic import pivot_counts
    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey", "o_orderstatus"])
    return pivot_counts(ds, "o_custkey", "o_orderstatus", ["O", "F", "P"])


def _q_docs_per_source_sample(sf_dir: str):
    """Deterministic uniform k-per-group sample (md5-ranked, reproducible
    on any engine) via the zero-driver-state grouped_topk."""
    from sift_ray.functions.corpus import grouped_sample
    return grouped_sample(_docs(sf_dir, ["doc_id", "source"]),
                          "source", k=3)


def _q_boilerplate_strip(sf_dir: str):
    """CCNet-style per-host template-line removal. The fixture corpus has
    no shared site chrome, so the query plants a per-source footer line on
    every doc in BOTH engines (the pii_scrub pattern) — the frequency
    decision, bloom-prefiltered anti-join strip, and reassembly are what
    is checked byte-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from sift_ray.functions.corpus import boilerplate_strip

    def decorate(b: "pa.Table") -> "pa.Table":
        text = pc.binary_join_element_wise(
            b.column("text"), "\ncopyright footer of ", b.column("source"),
            "")
        return b.set_column(b.schema.get_field_index("text"), "text", text)

    ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        decorate, batch_format="pyarrow")
    return boilerplate_strip(ds, min_docs=3, max_frac=0.5)


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means over the full embedding table in exact
    fixed-point integers — bit-identical under any partitioning. Returns
    the final per-cluster (size, quantized inertia). Iterative, so no SQL
    oracle; exactness is pinned by tests (partition invariance + a local
    integer reference replica)."""
    import ray.data as rd
    from sift_ray.functions.similarity import kmeans_fit
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    _, stats = kmeans_fit(ds, n_clusters=8, n_iter=4)
    return stats


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # extraction family (sift parity; rows-only — see module docstring)
        "extract_readability": _extract_query({"max_units": 0}),
        "extract_include_all": _extract_query({"max_units": 0,
                                               "include_all": True}),
        "extract_selector_p": _extract_query({"max_units": 0,
                                              "selector": "p"}),
        "extract_default_budget": _extract_query({"_default": True}),
        "extract_search": _extract_query({"_default": True,
                                          "search": "sifting flour texture"}),
        "extract_search_smart": _extract_query({
            "search_query": "carrot cake recipe", "max_units": 0,
            "context_units": 200, "use_smart_context": True}),
        "extract_word_limit_middle": _extract_query({
            "max_units": 100, "counting_method": "words",
            "sizing_strategy": "middle"}),
        "extract_output_text": _extract_query({
            "max_units": 0, "output_format": "text"}),
        "extract_output_json": _extract_query({
            "max_units": 0, "output_format": "json"}),
        "extract_bucketed": _q_extract_bucketed,
        "extract_pdf": _q_extract_pdf,
        "extract_pdf_layout": _q_extract_pdf_layout,
        "extract_selector_search": _extract_query({
            "selector": "article", "search_query": "carrot cake",
            "max_units": 0, "counting_method": "words"}),
        # table ops (DuckDB oracles)
        "doc_stats": _q_doc_stats,
        "char_entropy": _q_char_entropy,
        "quality_filter": _q_quality_filter,
        "doc_digest": _q_doc_digest,
        "exact_dedup": _q_exact_dedup,
        "dedup_docs": _q_dedup_docs,
        "near_dedup_docs": _q_near_dedup_docs,
        "duplicate_spans": _q_duplicate_spans,
        "strip_duplicate_spans": _q_strip_duplicate_spans,
        "cdc_chunks": _q_cdc_chunks,
        "cdc_dedup_stats": _q_cdc_dedup_stats,
        "cdc_dedup_docs": _q_cdc_dedup_docs,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "ngram_jaccard_prefix": _q_ngram_jaccard_prefix,
        "ngram_containment_pairs": _q_ngram_containment,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "fuzzy_part_match": _q_fuzzy_part_match,
        "html_table_cells": _q_html_table_cells,
        "jsonld_product_fields": _q_jsonld_product_fields,
        "explode_embeddings": _q_explode_embeddings,
        "seeded_shuffle": _q_seeded_shuffle,
        "sitemap_entries": _q_sitemap_entries,
        "robots_meta_flags": _q_robots_meta_flags,
        "crawl_frontier": _q_crawl_frontier,
        "robots_sitemaps": _q_robots_sitemaps,
        "simple_size_limit_words20": _q_size_limit_words,
        "multimodal_features": _q_multimodal,
        "decode_bmp": _q_decode_bmp,
        "decode_png": _q_decode_png,
        "decode_wav": _q_decode_wav,
        "decode_gif": _q_decode_gif,
        "resize_images": _q_resize_images,
        "sample_frames": _q_sample_frames,
        "audio_features": _q_audio_features,
        "events_tumbling_window": _q_events_window,
        "events_session_windows": _q_session_windows,
        "events_hopping_window": _q_hopping_windows,
        "pricing_summary": _q_pricing_summary,
        "customers_per_nation": _q_customers_per_nation,
        "topk_customers_per_segment": _q_topk_customers,
        "orders_customer_join": _q_orders_customer_join,
        "orders_join_bucketed": _q_orders_join_bucketed,
        "nation_counts_bucketed": _q_nation_counts_bucketed,
        "bucketed_ingest": _q_bucketed_ingest,
        "bucketed_time_travel": _q_bucketed_time_travel,
        "bucketed_upsert_delete": _q_bucketed_upsert_delete,
        "bucketed_cdc": _q_bucketed_cdc,
        "zorder_multi_scan": _q_zorder_multi_scan,
        "bloom_point_lookup": _q_bloom_point_lookup,
        "corpus_diff": _q_corpus_diff,
        "events_asof_join": _q_events_asof_join,
        "events_asof_tolerance": _q_events_asof_tolerance,
        "events_interval_join": _q_events_interval_join,
        "clicks_minus_purchases_all": _q_clicks_minus_purchases_all,
        "user_event_concat": _q_user_event_concat,
        "events_ohlc": _q_events_ohlc,
        "token_shards": _q_token_shards,
        "pack_sequences": _q_pack_sequences,
        "approx_distinct_users": _q_approx_distinct_users,
        "export_jsonl": _q_export_jsonl,
        "corpus_prep_shards": _q_corpus_prep,
        "corpus_prep_shards_ckpt": _q_corpus_prep_ckpt,
        "approx_distinct_by_priority": _q_approx_distinct_by_priority,
        "hash_sample": _q_hash_sample,
        "vocab_topk": _q_vocab_topk,
        "stratified_sample": _q_stratified_sample,
        "decontaminate": _q_decontaminate,
        "decontaminate_grams": _q_decontaminate_grams,
        "per_source_cap": _q_per_source_cap,
        "mixture_sample": _q_mixture_sample,
        "unigram_logprob": _q_unigram_logprob,
        "bigram_logprob": _q_bigram_logprob,
        "ppl_terciles": _q_ppl_terciles,
        "dsir_weights": _q_dsir_weights,
        "dsir_sample": _q_dsir_sample,
        "bm25_corpus_topk": _q_bm25_corpus_topk,
        "bm25_index_topk": _q_bm25_index_topk,
        "bm25_index_and": _q_bm25_index_and,
        "phrase_search": _q_phrase_search,
        "zonemap_range_scan": _q_zonemap_range_scan,
        "events_time_range": _q_events_time_range,
        "global_rank_by_length": _q_global_rank,
        "word_count_quantiles": _q_word_count_quantiles,
        "span_dedup": _q_span_dedup,
        "line_dedup": _q_line_dedup,
        "ccnet_line_dedup": _q_ccnet_line_dedup,
        "c4_filters": _q_c4_filters,
        "exactsubstr_dedup": _q_exactsubstr_dedup,
        "pii_scrub": _q_pii_scrub,
        "repetition_stats": _q_repetition_stats,
        "gopher_repetition": _q_gopher_repetition,
        "events_window_store": _q_events_window_store,
        "orders_join_sorted": _q_orders_join_sorted,
        "shipping_priority": _q_shipping_priority,
        "regional_revenue": _q_regional_revenue,
        "brand_revenue": _q_brand_revenue,
        "supplier_revenue": _q_supplier_revenue,
        "oov_rate": _q_oov_rate,
        "politeness_schedule": _q_politeness_schedule,
        "retention_cohorts": _q_retention_cohorts,
        "events_gap_fill": _q_events_gap_fill,
        "orders_window_features": _q_orders_window_features,
        "events_range_window": _q_events_range_window,
        "orders_rrf": _q_orders_rrf,
        "events_merge_intervals": _q_events_merge_intervals,
        "price_zscore": _q_price_zscore,
        "events_rank_features": _q_events_rank_features,
        "pricing_rollup": _q_pricing_rollup,
        "pricing_cube": _q_pricing_cube,
        "doc_keywords": _q_doc_keywords,
        "event_funnel": _q_event_funnel,
        "qty_price_corr": _q_qty_price_corr,
        "qty_price_regression": _q_qty_price_regression,
        "orders_profile": _q_orders_profile,
        "source_fields": _q_source_fields,
        "source_quality_gate": _q_source_quality_gate,
        "length_lang_auc": _q_length_lang_auc,
        "quality_classifier": _q_quality_classifier,
        "exact_distinct_users": _q_exact_distinct_users,
        "customers_f_only": _q_customers_f_only,
        "purchase_click_users": _q_purchase_click_users,
        "weighted_sample_docs": _q_weighted_sample,
        "orders_semi_join": _q_orders_semi_join,
        "kmeans_clusters": _q_kmeans_clusters,
        "boilerplate_strip": _q_boilerplate_strip,
        "lineitem_topk_per_order": _q_lineitem_topk_per_order,
        "events_user_type_join": _q_events_user_type_join,
        "price_quantiles_per_customer": _q_price_quantiles_per_customer,
        "price_quantiles_cont": _q_price_quantiles_cont,
        "customer_status_pivot": _q_customer_status_pivot,
        "events_asof_forward": _q_events_asof_forward,
        "image_phash_pairs": _q_image_phash_pairs,
        "events_json_extract": _q_events_json_extract,
        "docs_per_source_sample": _q_docs_per_source_sample,
        "robots_filter": _q_robots_filter,
        "charset_stats": _q_charset_stats,
        "anchor_topk": _q_anchor_topk,
        "price_quantiles": _q_price_quantiles,
        "price_quantiles_by_priority": _q_price_quantiles_by_priority,
        "price_quantiles_gk": _q_price_quantiles_gk,
        "price_quantiles_gk_by_priority": _q_price_quantiles_gk_by_priority,
        "pagerank_customers": _q_pagerank_customers,
        "bfs_orders": _q_bfs_orders,
        "triangle_count_orders": _q_triangle_count,
        "normalize_text": _q_normalize_text,
        "orders_customer_full_join": _q_orders_customer_full_join,
        "url_dedup": _q_url_dedup,
        "warc_extract": _q_warc_extract,
        "price_histogram": _q_price_histogram,
        "orders_join_bloom": _q_orders_join_bloom,
        "split_sentences": _q_split_sentences,
        "html_stats": _q_html_stats,
        "web_pipeline_shards": _q_web_pipeline,
        "pq_codes": _q_pq_codes,
        "pq_topk": _q_pq_topk,
        "ivfpq_topk": _q_ivfpq_topk,
        "embedding_quantize": _q_embedding_quantize,
        "pmi_topk": _q_pmi_topk,
        "bpe_merges": _q_bpe_merges,
        "blocklist_filter": _q_blocklist_filter,
        "assign_splits": _q_assign_splits,
        "decode_jpeg": _q_decode_jpeg,
        "bpe_token_counts": _q_bpe_token_counts,
        "ngram_counts": _q_ngram_counts,
        "incremental_ingest": _q_incremental_ingest,
        "compression_ratio": _q_compression_ratio,
        "page_outlinks": _q_page_outlinks,
        "host_graph": _q_host_graph,
        "url_rank": _q_url_rank,
        "heavy_hitter_users": _q_heavy_hitter_users,
        "doc_freq_topk": _q_doc_freq_topk,
        "dup_clusters": _q_dup_clusters,
        "dedup_keep_best": _q_dedup_keep_best,
        "in_doc_line_dedup": _q_in_doc_line_dedup,
        "knn_join": _q_knn_join,
        "label_centroids": _q_label_centroids,
        "cosine_topk": _q_cosine_topk,
        "embedding_near_dup": _q_embedding_near_dup,
        # table ops (rows-only: heuristic / sketch / not SQL-expressible)
        "token_counts": _q_token_counts,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_fingerprints,
        "page_metadata": _q_page_metadata,
        "embedding_pca": _q_embedding_pca,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "chunk_stats": _q_chunk_stats,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        "semdedup_keep": _q_semdedup,
        "cosine_topk_ivf": _q_cosine_topk_ivf,
        "tfidf_best_chunk": _q_tfidf_best_chunk,
    }


_BIGRAM_CTE = """
            WITH words AS (
                SELECT doc_id, unnest(ws) AS w,
                       unnest(range(1, len(ws) + 1)) AS pos
                FROM (SELECT doc_id,
                             list_filter(string_split(text, ' '),
                                         x -> x <> '') AS ws
                      FROM documents)
            ),
            c AS (SELECT w, count(*) AS n FROM words GROUP BY w),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
            utop AS (SELECT w, n FROM c
                     QUALIFY row_number()
                         OVER (ORDER BY n DESC, w ASC) <= 50000),
            pairs AS (SELECT doc_id, pos, w,
                             lag(w) OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS pw
                      FROM words),
            bc AS (SELECT pw AS w1, w AS w2, count(*) AS n12 FROM pairs
                   WHERE pw IS NOT NULL GROUP BY 1, 2),
            btop AS (SELECT w1, w2, n12
                     FROM bc JOIN utop u1 ON u1.w = bc.w1
                     QUALIFY row_number()
                         OVER (ORDER BY n12 DESC,
                               w1 || ' ' || w2 ASC) <= 100000),
            scored AS (
                SELECT p.doc_id,
                       CASE
                           WHEN p.pw IS NULL THEN
                               CAST(round(ln(coalesce(u.n, 0.5) / t.total)
                                          * 1000000) AS BIGINT)
                           WHEN b.n12 IS NOT NULL THEN
                               CAST(round(ln(b.n12 / u1.n)
                                          * 1000000) AS BIGINT)
                           ELSE
                               CAST(round(ln(0.4 * coalesce(u.n, 0.5)
                                             / t.total)
                                          * 1000000) AS BIGINT)
                       END AS lp
                FROM pairs p CROSS JOIN t
                LEFT JOIN utop u ON u.w = p.w
                LEFT JOIN btop b ON b.w1 = p.pw AND b.w2 = p.w
                LEFT JOIN utop u1 ON u1.w = p.pw)
"""

_NGRAM_CTE = """
            WITH words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
                FROM words WHERE len(w) >= 3
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
                FROM pos
            ),
            counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS isect
                FROM grams a JOIN grams b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
"""

# near-dup connected components (transitive closure of Jaccard >= 0.5
# pairs by recursive label walk) — shared by dup_clusters / dedup_keep_best
_CLUSTER_CTES = _NGRAM_CTE.replace("WITH", "WITH RECURSIVE", 1) + """
            ,
            jpairs AS (
                SELECT i.doc_a, i.doc_b
                FROM inter i
                JOIN counts ca ON ca.doc_id = i.doc_a
                JOIN counts cb ON cb.doc_id = i.doc_b
                WHERE CAST(i.isect AS DOUBLE)
                      / (ca.n + cb.n - i.isect) >= 0.5
            ),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM jpairs
                UNION
                SELECT doc_b, doc_a FROM jpairs
            ),
            walk(a, lbl) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM edges)
                UNION
                SELECT e.a, w.lbl FROM edges e JOIN walk w ON e.b = w.a
            ),
            comp AS (
                SELECT a AS doc_id, min(lbl) AS cluster_id
                FROM walk GROUP BY a
            )
"""


def oracle_sql() -> dict[str, str]:
    word_pat = r"'[^ \t\n\r\f\v]+'"
    punct_pat = r"'[!-/:-@\[-`{-~]'"
    d = {
        "doc_stats": f"""
            SELECT doc_id,
                   length(text) AS char_count,
                   len(regexp_extract_all(text, {word_pat})) AS word_count,
                   len(regexp_extract_all(text, {punct_pat})) AS punct_count,
                   CAST(len(regexp_extract_all(text, {word_pat})) AS DOUBLE)
                     / (CAST(len(regexp_extract_all(text, {word_pat})) AS DOUBLE)
                        + CAST(len(regexp_extract_all(text, {punct_pat})) AS DOUBLE)
                        + 10.0) AS quality_score
            FROM documents
        """,
        "char_entropy": """
            WITH chars AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '(?s).')) AS ch
                FROM documents
            ),
            counts AS (
                SELECT doc_id, ch, count(*) AS n
                FROM chars GROUP BY doc_id, ch
            ),
            tot AS (
                SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars
                FROM counts GROUP BY doc_id
            )
            SELECT c.doc_id, t.n_chars,
                   CAST(sum(c.n * CAST(round(ln(CAST(t.n_chars AS DOUBLE)
                                                 / c.n) * 1000000)
                                       AS BIGINT)) AS BIGINT)
                       AS entropy_micro
            FROM counts c JOIN tot t USING (doc_id)
            GROUP BY c.doc_id, t.n_chars
        """,
        "quality_filter": r"""
            WITH m AS (
                SELECT doc_id,
                       length(text) AS char_count,
                       len(regexp_extract_all(text,
                           '[^ \t\n\r\f\v]+')) AS word_count,
                       length(regexp_replace(text,
                           '[ \t\n\r\f\v]', '', 'g')) AS word_chars,
                       (length(text) - length(replace(text, '#', '')))
                           AS hash_count,
                       (length(text) - length(replace(text, '...', ''))) // 3
                           AS dots_count,
                       (contains(text, ' the ') OR contains(text, ' and ')
                        OR contains(text, ' to ')) AS has_stopword
                FROM documents)
            SELECT doc_id, word_count,
                   CASE WHEN word_count = 0 THEN 0.0
                        ELSE CAST(word_chars AS DOUBLE) / word_count
                   END AS mean_word_len,
                   CAST(hash_count + 3 * dots_count AS DOUBLE)
                       / (CASE WHEN char_count = 0 THEN 1 ELSE char_count END)
                       AS symbol_ratio,
                   has_stopword,
                   (word_count BETWEEN 50 AND 100000
                    AND (CASE WHEN word_count = 0 THEN 0.0
                              ELSE CAST(word_chars AS DOUBLE) / word_count
                         END) BETWEEN 3.0 AND 10.0
                    AND CAST(hash_count + 3 * dots_count AS DOUBLE)
                        / (CASE WHEN char_count = 0 THEN 1
                                ELSE char_count END) < 0.1
                    AND has_stopword) AS keep
            FROM m
        """,
        "doc_digest": "SELECT doc_id, md5(text) AS digest FROM documents",
        "exact_dedup": """
            SELECT md5(text) AS digest,
                   min(doc_id) AS keep_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "simple_size_limit_words20": r"""
            SELECT doc_id,
                   rtrim(regexp_extract(text,
                         '^(?:[ \t\n\r]*[^ \t\n\r]+){0,20}'),
                         ' ' || chr(9) || chr(10) || chr(13)) AS limited
            FROM documents
        """,
        "ngram_jaccard_pairs": _NGRAM_CTE + """
            SELECT i.doc_a, i.doc_b,
                   CAST(i.isect AS DOUBLE) / (ca.n + cb.n - i.isect) AS jaccard
            FROM inter i
            JOIN counts ca ON ca.doc_id = i.doc_a
            JOIN counts cb ON cb.doc_id = i.doc_b
            WHERE CAST(i.isect AS DOUBLE) / (ca.n + cb.n - i.isect) >= 0.5
        """,
        "ngram_jaccard_prefix": _NGRAM_CTE + """
            SELECT i.doc_a, i.doc_b,
                   CAST(i.isect AS DOUBLE) / (ca.n + cb.n - i.isect) AS jaccard
            FROM inter i
            JOIN counts ca ON ca.doc_id = i.doc_a
            JOIN counts cb ON cb.doc_id = i.doc_b
            WHERE CAST(i.isect AS DOUBLE) / (ca.n + cb.n - i.isect) >= 0.5
        """,
        "dedup_docs": """
            SELECT doc_id, md5(text) AS digest FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents
                             GROUP BY md5(text))
        """,
        "near_dedup_docs": _NGRAM_CTE + """
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (
                SELECT i.doc_b
                FROM inter i
                JOIN counts ca ON ca.doc_id = i.doc_a
                JOIN counts cb ON cb.doc_id = i.doc_b
                WHERE CAST(i.isect AS DOUBLE)
                      / (ca.n + cb.n - i.isect) >= 0.5)
        """,
        "multimodal_features": """
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   octet_length(encode(text)) % 640 + 1 AS width,
                   (octet_length(encode(text)) // 640) % 480 + 1 AS height,
                   octet_length(encode(text)) % 7 + 1 AS n_frames,
                   'ok' AS status
            FROM documents
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "customers_per_nation": """
            SELECT n.n_name,
                   count(*) AS n_customers,
                   min(c.c_acctbal) AS min_acctbal,
                   max(c.c_acctbal) AS max_acctbal
            FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_name
        """,
        "topk_customers_per_segment": """
            SELECT c_mktsegment, c_acctbal, c_custkey, rank FROM (
                SELECT c_mktsegment, c_acctbal, c_custkey,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal DESC,
                                                   c_custkey) AS rank
                FROM customer) WHERE rank <= 3
        """,
        "corpus_prep_shards": r"""
            WITH m AS (
                SELECT doc_id,
                       length(text) AS char_count,
                       len(regexp_extract_all(text,
                           '[^ \t\n\r\f\v]+')) AS word_count,
                       length(regexp_replace(text,
                           '[ \t\n\r\f\v]', '', 'g')) AS word_chars,
                       (length(text) - length(replace(text, '#', '')))
                           AS hash_count,
                       (length(text) - length(replace(text, '...', ''))) // 3
                           AS dots_count,
                       (contains(text, ' the ') OR contains(text, ' and ')
                        OR contains(text, ' to ')) AS has_stopword
                FROM documents),
            kept AS (
                SELECT d.doc_id, d.text
                FROM documents d JOIN m ON m.doc_id = d.doc_id
                WHERE m.word_count BETWEEN 50 AND 100000
                  AND (CASE WHEN m.word_count = 0 THEN 0.0
                            ELSE CAST(m.word_chars AS DOUBLE) / m.word_count
                       END) BETWEEN 3.0 AND 10.0
                  AND CAST(m.hash_count + 3 * m.dots_count AS DOUBLE)
                      / (CASE WHEN m.char_count = 0 THEN 1
                              ELSE m.char_count END) < 0.1
                  AND m.has_stopword),
            words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM kept),
            pos AS (
                SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
                FROM words WHERE len(w) >= 3),
            grams AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
                FROM pos),
            counts AS (SELECT doc_id, count(*) AS n FROM grams
                       GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS isect
                FROM grams a JOIN grams b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            dropped AS (
                SELECT DISTINCT i.doc_b
                FROM inter i
                JOIN counts ca ON ca.doc_id = i.doc_a
                JOIN counts cb ON cb.doc_id = i.doc_b
                WHERE CAST(i.isect AS DOUBLE)
                      / (ca.n + cb.n - i.isect) >= 0.5),
            ded AS (
                SELECT doc_id, text FROM kept
                WHERE doc_id NOT IN (SELECT doc_b FROM dropped)),
            t AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[^ \t\n\r\f\v]+')) AS n_tokens
                FROM ded)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_tokens
                        AS BIGINT) AS start_offset,
                   CAST((sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_tokens) // 5000
                        AS BIGINT) AS shard_id
            FROM t
        """,
        "token_shards": """
            WITH t AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[^ ' || chr(9) || chr(10) || chr(13) || chr(12)
                           || chr(11) || ']+')) AS n_tokens
                FROM documents)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_tokens
                        AS BIGINT) AS start_offset,
                   CAST((sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - n_tokens) // 5000
                        AS BIGINT) AS shard_id
            FROM t
        """,
        "export_jsonl": """
            SELECT doc_id, text FROM documents
        """,
        "pack_sequences": """
            WITH docs AS (
                SELECT doc_id,
                       regexp_extract_all(text,
                           '[^ ' || chr(9) || chr(10) || chr(13) || chr(12)
                           || chr(11) || ']+') AS w
                FROM documents),
            pos AS (SELECT doc_id, w,
                           unnest(generate_series(1, len(w))) AS i
                    FROM docs WHERE len(w) >= 1),
            toks AS (SELECT doc_id, i, w[i] AS tok FROM pos),
            eos AS (SELECT doc_id, len(w) + 1 AS i, '</s>' AS tok
                    FROM docs),
            allt AS (SELECT * FROM toks UNION ALL SELECT * FROM eos),
            numbered AS (SELECT tok,
                                row_number() OVER (ORDER BY doc_id, i) - 1
                                    AS gpos
                         FROM allt)
            SELECT CAST(gpos // 256 AS BIGINT) AS seq_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   string_agg(tok, ' ' ORDER BY gpos) AS text
            FROM numbered GROUP BY 1 HAVING count(*) = 256
        """,
        "events_asof_join": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
            hi AS (SELECT user_id, t, value AS last_high_value
                   FROM e WHERE value >= 0.9)
            SELECT e.user_id, e.t, e.value, hi.last_high_value
            FROM e ASOF LEFT JOIN hi
              ON e.user_id = hi.user_id AND e.t >= hi.t
        """,
        "events_asof_tolerance": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS t, value
                       FROM events)
            SELECT e.user_id, e.t, e.value,
                   (SELECT hi.value FROM e hi
                    WHERE hi.user_id = e.user_id AND hi.value >= 0.9
                      AND hi.t <= e.t AND e.t - hi.t <= 3600000000
                    ORDER BY hi.t DESC LIMIT 1) AS last_high_value
            FROM e
        """,
        "clicks_minus_purchases_all": """
            SELECT user_id FROM events WHERE event_type = 'click'
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "user_event_concat": """
            SELECT user_id,
                   string_agg(event_type, '|' ORDER BY event_id) AS agg
            FROM events GROUP BY user_id
        """,
        "events_ohlc": """
            WITH e AS (SELECT user_id, epoch_us(ts) // 300000000 AS win,
                              value, epoch_us(ts) AS tus, event_id
                       FROM events),
            w AS (SELECT user_id, win, value,
                  first_value(value) OVER
                      (PARTITION BY user_id, win
                       ORDER BY tus, event_id) AS open,
                  last_value(value) OVER
                      (PARTITION BY user_id, win
                       ORDER BY tus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS close
                  FROM e)
            SELECT user_id, win, any_value(open) AS open,
                   any_value(close) AS close, min(value) AS low,
                   max(value) AS high, count(*) AS n_events
            FROM w GROUP BY user_id, win
        """,
        "orders_customer_join": """
            SELECT o.o_custkey AS custkey, o.o_orderkey, o.o_totalprice,
                   c.c_mktsegment
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "orders_join_bucketed": """
            SELECT o.o_custkey AS custkey, o.o_orderkey, o.o_totalprice,
                   c.c_mktsegment
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "orders_join_sorted": """
            SELECT o.o_custkey AS custkey, o.o_orderkey, o.o_totalprice,
                   c.c_mktsegment
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "bucketed_ingest": """
            SELECT doc_id, text FROM documents
        """,
        "bucketed_time_travel": """
            SELECT doc_id, text FROM documents WHERE doc_id % 3 < 2
        """,
        "bloom_point_lookup": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders WHERE o_orderkey % 997 = 0
        """,
        "bucketed_cdc": """
            SELECT doc_id, text || '!u' AS text, 'upsert' AS _op
            FROM documents WHERE doc_id % 4 = 0
            UNION ALL
            SELECT doc_id, CAST(NULL AS VARCHAR) AS text, 'delete' AS _op
            FROM documents WHERE doc_id % 6 = 0
        """,
        "zorder_multi_scan": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
            FROM lineitem
            WHERE l_partkey BETWEEN 100 AND 500
              AND l_suppkey BETWEEN 10 AND 40
        """,
        "bucketed_upsert_delete": """
            WITH merged AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 4 = 0 THEN text || '!u'
                            ELSE text END AS text
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000000, text || '!n'
                FROM documents WHERE doc_id % 16 = 0
            )
            SELECT doc_id, text FROM merged
            WHERE doc_id NOT IN (
                SELECT doc_id FROM documents WHERE doc_id % 6 = 0)
        """,
        "corpus_diff": """
            WITH old AS (
                SELECT doc_id, md5(text) AS d FROM documents
                WHERE doc_id % 5 <> 0),
            new AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN md5(text || 'x')
                            ELSE md5(text) END AS d
                FROM documents WHERE doc_id % 3 <> 0)
            SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
                   CASE WHEN old.d IS NULL THEN 'added'
                        WHEN new.d IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
            WHERE old.d IS NULL OR new.d IS NULL OR old.d <> new.d
        """,
        "nation_counts_bucketed": """
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS sum_acct_cents
            FROM customer GROUP BY c_nationkey
        """,
        "hash_sample": """
            SELECT doc_id, md5(text) AS digest FROM documents
            WHERE md5(text) LIKE '0%'
        """,
        "fuzzy_name_pairs": """
            SELECT a.c_custkey AS doc_a, b.c_custkey AS doc_b,
                   CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
            FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
            WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
              AND levenshtein(a.c_name, b.c_name) <= 1
        """,
        "ngram_containment_pairs": _NGRAM_CTE + """
            SELECT i.doc_a, i.doc_b,
                   CAST(i.isect AS DOUBLE) / least(ca.n, cb.n)
                       AS containment
            FROM inter i
            JOIN counts ca ON ca.doc_id = i.doc_a
            JOIN counts cb ON cb.doc_id = i.doc_b
            WHERE CAST(i.isect AS DOUBLE) / least(ca.n, cb.n) >= 0.6
        """,
        "html_table_cells": """
            WITH hdr AS (
                SELECT 'http://tables.example/nation/'
                           || CAST(c_nationkey AS VARCHAR) AS url,
                       CAST(0 AS INTEGER) AS table_idx,
                       CAST(0 AS INTEGER) AS row_idx,
                       CAST(h.col_idx AS INTEGER) AS col_idx,
                       TRUE AS is_header, h.cell, 'ok' AS status
                FROM (SELECT DISTINCT c_nationkey FROM customer),
                     (VALUES (0, 'custkey'), (1, 'name')) AS h(col_idx, cell)
            ), dat AS (
                SELECT 'http://tables.example/nation/'
                           || CAST(c_nationkey AS VARCHAR) AS url,
                       CAST(0 AS INTEGER) AS table_idx,
                       CAST(rn AS INTEGER) AS row_idx,
                       CAST(v.col_idx AS INTEGER) AS col_idx,
                       FALSE AS is_header,
                       CASE v.col_idx WHEN 0 THEN CAST(c_custkey AS VARCHAR)
                            ELSE c_name END AS cell,
                       'ok' AS status
                FROM (SELECT c_nationkey, c_custkey, c_name,
                             row_number() OVER (PARTITION BY c_nationkey
                                                ORDER BY c_custkey) AS rn
                      FROM customer),
                     (VALUES (0), (1)) AS v(col_idx)
            )
            SELECT * FROM hdr UNION ALL SELECT * FROM dat
        """,
        "sitemap_entries": """
            SELECT 'http://sm.example/customer/'
                       || CAST(o_custkey AS VARCHAR) || '/sitemap.xml'
                       AS url,
                   'url' AS kind,
                   'http://sm.example/order/'
                       || CAST(o_orderkey AS VARCHAR) AS loc,
                   strftime(o_orderdate, '%Y-%m-%d') AS lastmod,
                   'weekly' AS changefreq, '0.5' AS priority
            FROM orders
        """,
        "robots_sitemaps": """
            WITH s AS (SELECT s_suppkey AS k,
                              's' || CAST(s_suppkey AS VARCHAR)
                                  || '.example.com' AS host
                       FROM supplier WHERE s_suppkey % 4 <> 0)
            SELECT host, 'https://' || host || '/sitemap-'
                       || CAST(k AS VARCHAR) || '.xml' AS sitemap_url
            FROM s
            UNION ALL
            SELECT host, 'http://' || host || '/extra.xml' AS sitemap_url
            FROM s WHERE k % 3 = 0
        """,
        "crawl_frontier": """
            WITH f AS (
                SELECT 'http://c' || CAST(o_custkey AS VARCHAR)
                           || '.shop.example/order/'
                           || CAST(o_orderkey AS VARCHAR) AS url,
                       'c' || CAST(o_custkey AS VARCHAR)
                           || '.shop.example' AS host
                FROM orders WHERE o_orderkey % 3 <> 0
            )
            SELECT url, host,
                   row_number() OVER (PARTITION BY host ORDER BY url)
                       AS fetch_rank,
                   (row_number() OVER (PARTITION BY host ORDER BY url) - 1)
                       * 1000000 AS slot_us
            FROM f
        """,
        "robots_meta_flags": """
            SELECT 'http://pages.example/c/'
                       || CAST(c_custkey AS VARCHAR) AS url,
                   c_custkey % 7 = 0 AS noindex,
                   c_custkey % 5 = 0 AS nofollow,
                   'ok' AS status
            FROM customer
        """,
        "seeded_shuffle": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                        ORDER BY md5('42:' || CAST(doc_id AS VARCHAR))) - 1
                        AS BIGINT) AS shuffle_pos
            FROM documents
        """,
        "explode_embeddings": """
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                       AS dim,
                   unnest(embedding) AS x
            FROM embeddings
        """,
        "jsonld_product_fields": """
            SELECT 'http://shop.example/part/'
                       || CAST(p_partkey AS VARCHAR) AS url,
                   CAST(0 AS INTEGER) AS block_idx,
                   CAST(0 AS INTEGER) AS item_idx,
                   'Product' AS jsonld_type, k.key,
                   CASE k.key WHEN 'name' THEN p_name
                        WHEN 'brand' THEN p_brand
                        ELSE CAST(p_partkey AS VARCHAR) END AS value
            FROM part, (VALUES ('brand'), ('name'), ('sku')) AS k(key)
        """,
        "fuzzy_part_match": """
            WITH l AS (SELECT p_name, min(p_partkey) AS id FROM part
                       WHERE p_size <= 25 GROUP BY p_name),
                 r AS (SELECT p_name, min(p_partkey) AS id FROM part
                       WHERE p_size > 25 GROUP BY p_name)
            SELECT l.id AS doc_a, r.id AS doc_b,
                   CAST(levenshtein(l.p_name, r.p_name) AS BIGINT) AS dist
            FROM l JOIN r ON abs(length(l.p_name) - length(r.p_name)) <= 2
                         AND levenshtein(l.p_name, r.p_name) <= 2
        """,
        "label_centroids": """
            WITH e AS (
                SELECT label, generate_subscripts(embedding, 1) AS dim,
                       unnest(embedding) AS v
                FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label, dim,
                   round(sum(CAST(v AS DOUBLE)) / count(*), 6) AS centroid
            FROM e GROUP BY label, dim
        """,
        "knn_join": """
            SELECT vec_id, nn_id, rank FROM (
                SELECT a.vec_id, b.vec_id AS nn_id,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) DESC,
                           b.vec_id) AS rank
                FROM embeddings a CROSS JOIN embeddings b
                WHERE b.vec_id <> a.vec_id
            ) WHERE rank <= 3
        """,
        "dup_clusters": _CLUSTER_CTES + """
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        """,
        "dedup_keep_best": _CLUSTER_CTES + r"""
            SELECT doc_id, cluster_id, n_words FROM (
                SELECT s.*, row_number() OVER (
                           PARTITION BY cluster_id
                           ORDER BY n_words DESC, doc_id) AS rn
                FROM (
                    SELECT d.doc_id,
                           coalesce(c.cluster_id, d.doc_id) AS cluster_id,
                           len(regexp_extract_all(d.text,
                               '[^ \t\n\r\f\v]+')) AS n_words
                    FROM documents d
                    LEFT JOIN comp c ON c.doc_id = d.doc_id
                ) s
            ) WHERE rn = 1
        """,
        "events_interval_join": """
            WITH w AS (
                SELECT event_id AS window_id, ts AS ws,
                       ts + INTERVAL 1 HOUR AS we
                FROM events WHERE event_id % 50 = 0
            )
            SELECT e.event_id, w.window_id
            FROM events e JOIN w
              ON e.ts >= w.ws AND e.ts < w.we
        """,
        "heavy_hitter_users": """
            SELECT user_id AS value, count(*) AS n
            FROM events
            GROUP BY user_id
            HAVING count(*) > 0.008 * (SELECT count(*) FROM events)
            ORDER BY n DESC, value ASC
        """,
        "word_count_quantiles": r"""
            WITH s AS (
                SELECT len(regexp_extract_all(text,
                    '[^ \t\n\r\f\v]+')) AS v
                FROM documents
            ),
            c AS (SELECT v, count(*) AS n FROM s GROUP BY v),
            w AS (SELECT v, sum(n) OVER (ORDER BY v) AS cn FROM c),
            t AS (SELECT count(*) AS total FROM s)
            SELECT CAST(q.q AS DOUBLE) AS q, min(w.v) AS value
            FROM w, t, (VALUES (0.25), (0.50), (0.75), (0.90)) q(q)
            WHERE w.cn >= ceil(q.q * t.total)
            GROUP BY q.q
        """,
        "per_source_cap": """
            SELECT doc_id, source, rank FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY doc_id) AS rank
                FROM documents
            ) WHERE rank <= 10
        """,
        "vocab_topk": """
            WITH words AS (
                SELECT unnest(string_split(text, ' ')) AS word
                FROM documents
            ),
            counted AS (
                SELECT word, count(*) AS n FROM words
                WHERE word <> '' GROUP BY word
            )
            SELECT word, n FROM counted ORDER BY n DESC, word LIMIT 100
        """,
        "doc_freq_topk": """
            WITH w AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS word
                FROM documents
            ),
            pairs AS (
                SELECT DISTINCT doc_id, word FROM w WHERE word <> ''
            ),
            counted AS (
                SELECT word, count(*) AS df FROM pairs GROUP BY word
            )
            SELECT word, df FROM counted ORDER BY df DESC, word LIMIT 100
        """,
        "stratified_sample": """
            SELECT doc_id, lang, md5(text) AS digest FROM documents
            WHERE md5(text) < CASE WHEN lang = 'en' THEN '4' ELSE '1' END
        """,
        "decontaminate": """
            WITH bench AS (
                SELECT doc_id, string_split(text, ' ') AS w
                FROM documents WHERE doc_id % 37 = 0
            ),
            grams AS (
                SELECT b.doc_id,
                       array_to_string(b.w[i.i : i.i + 3], ' ') AS gram
                FROM bench b, LATERAL (
                    SELECT unnest(generate_series(1, len(b.w) - 3)) AS i
                ) i
            )
            SELECT d.doc_id, d.lang, d.source, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM grams g
                WHERE g.doc_id <> d.doc_id AND instr(d.text, g.gram) > 0
            )
        """,
        "global_rank_by_length": """
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id ASC)
                       AS global_rank
            FROM documents
        """,
        "bm25_corpus_topk": """
            WITH q(term) AS (VALUES ('hash'), ('join'), ('dup')),
            words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                      FROM documents),
            wf AS (SELECT doc_id, w FROM words WHERE w <> ''),
            dl AS (SELECT doc_id, count(*) AS dl FROM wf GROUP BY doc_id),
            st AS (SELECT (SELECT count(*) FROM documents) AS N,
                          (SELECT CAST(count(*) AS BIGINT) FROM wf)
                              AS toks),
            av AS (SELECT toks / N AS avgdl, N FROM st),
            df AS (SELECT q.term, count(DISTINCT wf.doc_id) AS df
                   FROM q JOIN wf ON wf.w = q.term GROUP BY q.term),
            tf AS (SELECT wf.doc_id, wf.w AS term, count(*) AS tf
                   FROM wf JOIN q ON wf.w = q.term
                   GROUP BY wf.doc_id, wf.w),
            sc AS (SELECT tf.doc_id,
                          CAST(round(
                              ln((av.N - df.df + 0.5) / (df.df + 0.5) + 1)
                              * (tf.tf * (1.2 + 1))
                              / (tf.tf + 1.2 * (1 - 0.75
                                     + 0.75 * dl.dl / av.avgdl))
                              * 1000000) AS BIGINT) AS s
                   FROM tf JOIN df ON tf.term = df.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN av)
            SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micro
            FROM sc GROUP BY doc_id
            QUALIFY row_number()
                OVER (ORDER BY sum(s) DESC, doc_id ASC) <= 20
            ORDER BY score_micro DESC, doc_id ASC
        """,
        "unigram_logprob": """
            WITH words AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ),
            words_f AS (SELECT doc_id, w FROM words WHERE w <> ''),
            c AS (SELECT w, count(*) AS n FROM words_f GROUP BY w),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
            top AS (
                SELECT w, n FROM c
                QUALIFY row_number()
                    OVER (ORDER BY n DESC, w ASC) <= 50000
            ),
            lp AS (SELECT top.w,
                          CAST(round(ln(top.n / t.total) * 1000000)
                               AS BIGINT) AS lp
                   FROM top, t),
            oov AS (SELECT CAST(round(ln(0.5 / t.total) * 1000000)
                                AS BIGINT) AS lp FROM t)
            SELECT wf.doc_id, count(*) AS n_tokens,
                   sum(coalesce(lp.lp, oov.lp)) AS logprob_micro
            FROM words_f wf LEFT JOIN lp ON wf.w = lp.w CROSS JOIN oov
            GROUP BY wf.doc_id
        """,
        "bigram_logprob": _BIGRAM_CTE + """
            SELECT doc_id, count(*) AS n_tokens,
                   sum(lp) AS logprob_micro
            FROM scored GROUP BY doc_id
        """,
        "ppl_terciles": _BIGRAM_CTE + """
            , agg AS (SELECT doc_id, count(*) AS n_tokens,
                           sum(lp) AS logprob_micro
                    FROM scored GROUP BY doc_id),
            per AS (SELECT doc_id,
                           CAST((logprob_micro * 1000) // n_tokens
                                AS BIGINT) AS lp_nano_per_tok
                    FROM agg)
            SELECT doc_id, lp_nano_per_tok,
                   CAST(ntile(3) OVER (ORDER BY lp_nano_per_tok DESC,
                                       doc_id ASC) AS BIGINT) AS tercile
            FROM per
        """,
        "dsir_weights": """
            WITH src_words AS (
                SELECT doc_id, unnest(ws) AS w,
                       unnest(range(1, len(ws) + 1)) AS pos
                FROM (SELECT doc_id,
                             list_filter(string_split(text, ' '),
                                         x -> x <> '') AS ws
                      FROM documents)
            ),
            src_grams AS (
                SELECT doc_id, w AS g FROM src_words
                UNION ALL
                SELECT doc_id, pw || ' ' || w FROM
                    (SELECT doc_id, w,
                            lag(w) OVER (PARTITION BY doc_id
                                         ORDER BY pos) AS pw
                     FROM src_words)
                WHERE pw IS NOT NULL
            ),
            src_b AS (SELECT doc_id,
                             ('0x' || substr(md5(g), 1, 13))::BIGINT
                                 % 8192 AS b
                      FROM src_grams),
            tgt_words AS (
                SELECT doc_id, unnest(ws) AS w,
                       unnest(range(1, len(ws) + 1)) AS pos
                FROM (SELECT doc_id,
                             list_filter(string_split(text, ' '),
                                         x -> x <> '') AS ws
                      FROM documents WHERE doc_id % 53 = 0)
            ),
            tgt_grams AS (
                SELECT w AS g FROM tgt_words
                UNION ALL
                SELECT pw || ' ' || w FROM
                    (SELECT doc_id, w,
                            lag(w) OVER (PARTITION BY doc_id
                                         ORDER BY pos) AS pw
                     FROM tgt_words)
                WHERE pw IS NOT NULL
            ),
            tgt_b AS (SELECT ('0x' || substr(md5(g), 1, 13))::BIGINT
                                 % 8192 AS b
                      FROM tgt_grams),
            r AS (SELECT unnest(range(0, 8192)) AS b),
            sc AS (SELECT b, count(*) AS n FROM src_b GROUP BY b),
            tc AS (SELECT b, count(*) AS n FROM tgt_b GROUP BY b),
            ns AS (SELECT count(*) AS n FROM src_b),
            nt AS (SELECT count(*) AS n FROM tgt_b),
            delta AS (
                SELECT r.b,
                       CAST(round(ln((coalesce(tc.n, 0) + 1)
                                     / (nt.n + 8192)) * 1000000)
                            AS BIGINT)
                     - CAST(round(ln((coalesce(sc.n, 0) + 1)
                                     / (ns.n + 8192)) * 1000000)
                            AS BIGINT) AS d
                FROM r LEFT JOIN sc ON sc.b = r.b
                LEFT JOIN tc ON tc.b = r.b
                CROSS JOIN ns CROSS JOIN nt)
            SELECT doc_id, count(*) AS n_grams,
                   sum(d) AS logratio_micro
            FROM src_b JOIN delta ON delta.b = src_b.b
            GROUP BY doc_id
        """,
        "dsir_sample": """
            WITH src_words AS (
                SELECT doc_id, unnest(ws) AS w,
                       unnest(range(1, len(ws) + 1)) AS pos
                FROM (SELECT doc_id,
                             list_filter(string_split(text, ' '),
                                         x -> x <> '') AS ws
                      FROM documents)
            ),
            src_grams AS (
                SELECT doc_id, w AS g FROM src_words
                UNION ALL
                SELECT doc_id, pw || ' ' || w FROM
                    (SELECT doc_id, w,
                            lag(w) OVER (PARTITION BY doc_id
                                         ORDER BY pos) AS pw
                     FROM src_words)
                WHERE pw IS NOT NULL
            ),
            src_b AS (SELECT doc_id,
                             ('0x' || substr(md5(g), 1, 13))::BIGINT
                                 % 8192 AS b
                      FROM src_grams),
            tgt_words AS (
                SELECT doc_id, unnest(ws) AS w,
                       unnest(range(1, len(ws) + 1)) AS pos
                FROM (SELECT doc_id,
                             list_filter(string_split(text, ' '),
                                         x -> x <> '') AS ws
                      FROM documents WHERE doc_id % 53 = 0)
            ),
            tgt_grams AS (
                SELECT w AS g FROM tgt_words
                UNION ALL
                SELECT pw || ' ' || w FROM
                    (SELECT doc_id, w,
                            lag(w) OVER (PARTITION BY doc_id
                                         ORDER BY pos) AS pw
                     FROM tgt_words)
                WHERE pw IS NOT NULL
            ),
            tgt_b AS (SELECT ('0x' || substr(md5(g), 1, 13))::BIGINT
                                 % 8192 AS b
                      FROM tgt_grams),
            r AS (SELECT unnest(range(0, 8192)) AS b),
            sc AS (SELECT b, count(*) AS n FROM src_b GROUP BY b),
            tc AS (SELECT b, count(*) AS n FROM tgt_b GROUP BY b),
            ns AS (SELECT count(*) AS n FROM src_b),
            nt AS (SELECT count(*) AS n FROM tgt_b),
            delta AS (
                SELECT r.b,
                       CAST(round(ln((coalesce(tc.n, 0) + 1)
                                     / (nt.n + 8192)) * 1000000)
                            AS BIGINT)
                     - CAST(round(ln((coalesce(sc.n, 0) + 1)
                                     / (ns.n + 8192)) * 1000000)
                            AS BIGINT) AS d
                FROM r LEFT JOIN sc ON sc.b = r.b
                LEFT JOIN tc ON tc.b = r.b
                CROSS JOIN ns CROSS JOIN nt),
            weights AS (
                SELECT doc_id, count(*) AS n_grams,
                       sum(d) AS logratio_micro
                FROM src_b JOIN delta ON delta.b = src_b.b
                GROUP BY doc_id)
            SELECT doc_id, logratio_micro,
                   logratio_micro / 1000000.0
                   - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                             1, 13))::BIGINT + 0.5)
                            / 4503599627370496.0)) AS key
            FROM weights
            ORDER BY key DESC, doc_id LIMIT 50
        """,
        "mixture_sample": """
            WITH w(lang, wt) AS (VALUES ('en', 0.4), ('zh', 0.3),
                                        ('es', 0.3)),
            n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            t AS (SELECT min(n.n / w.wt) AS T
                  FROM n JOIN w ON n.lang = w.lang),
            r AS (SELECT w.lang,
                         CASE WHEN w.wt * t.T / n.n >= 1 THEN 'g'
                              ELSE printf('%08x', CAST(floor(
                                  w.wt * t.T / n.n * 4294967296) AS BIGINT))
                         END AS th
                  FROM w JOIN n ON w.lang = n.lang CROSS JOIN t)
            SELECT d.doc_id, d.lang, md5(d.text) AS digest
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE substr(md5(d.text), 1, 8) < r.th
        """,
        "decontaminate_grams": """
            WITH bench AS (
                SELECT doc_id, string_split(text, ' ') AS w
                FROM documents WHERE doc_id % 37 = 0
            ),
            bgrams AS (
                SELECT DISTINCT b.doc_id,
                       array_to_string(b.w[i.i : i.i + 3], ' ') AS gram
                FROM bench b, LATERAL (
                    SELECT unnest(generate_series(1, len(b.w) - 3)) AS i
                ) i
            ),
            docw AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ),
            dgrams AS (
                SELECT DISTINCT d.doc_id,
                       array_to_string(d.w[i.i : i.i + 3], ' ') AS gram
                FROM docw d, LATERAL (
                    SELECT unnest(generate_series(1, len(d.w) - 3)) AS i
                ) i
            )
            SELECT d.doc_id, d.lang, d.source, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM dgrams dg JOIN bgrams bg ON dg.gram = bg.gram
                WHERE dg.doc_id = d.doc_id AND bg.doc_id <> dg.doc_id
            )
        """,
        "span_dedup": """
            WITH words AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS word,
                       unnest(range(len(string_split(text, ' ')))) AS wno
                FROM documents
            ), spans AS (
                SELECT doc_id, wno // 8 AS span_no,
                       string_agg(word, ' ' ORDER BY wno) AS span
                FROM words GROUP BY doc_id, wno // 8
            ), ranked AS (
                SELECT doc_id, span_no, span,
                       row_number() OVER (PARTITION BY span
                                          ORDER BY doc_id, span_no) AS rn
                FROM spans
            )
            SELECT doc_id, string_agg(span, ' ' ORDER BY span_no) AS text,
                   CAST(count(*) AS BIGINT) AS n_units
            FROM ranked WHERE rn = 1 GROUP BY doc_id
        """,
        "line_dedup": """
            WITH lined AS (
                SELECT doc_id, replace(text, ' table ', chr(10)) AS text
                FROM documents
            ), lines AS (
                SELECT doc_id,
                       unnest(string_split(text, chr(10))) AS line,
                       unnest(range(len(string_split(text, chr(10)))))
                           AS line_no
                FROM lined
            ), marked AS (
                SELECT doc_id, line_no, line,
                       length(regexp_extract_all(line, '[^ ]+')) >= 3
                           AS elig
                FROM lines
            ), ranked AS (
                SELECT doc_id, line_no, line, elig,
                       row_number() OVER (PARTITION BY elig, line
                                          ORDER BY doc_id, line_no) AS rn
                FROM marked
            )
            SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no)
                       AS text,
                   CAST(count(*) AS BIGINT) AS n_units
            FROM ranked WHERE NOT elig OR rn = 1 GROUP BY doc_id
        """,
        "in_doc_line_dedup": """
            WITH lined AS (
                SELECT doc_id, replace(text, ' the ', chr(10)) AS text
                FROM documents
            ), lines AS (
                SELECT doc_id,
                       unnest(string_split(text, chr(10))) AS line,
                       unnest(range(len(string_split(text, chr(10)))))
                           AS line_no
                FROM lined
            ), marked AS (
                SELECT doc_id, line_no, line,
                       length(regexp_extract_all(line, '[^ ]+')) >= 3
                           AS elig
                FROM lines
            ), ranked AS (
                SELECT doc_id, line_no, line, elig,
                       row_number() OVER (PARTITION BY doc_id, elig, line
                                          ORDER BY line_no) AS rn
                FROM marked
            )
            SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no)
                       AS text,
                   CAST(count(*) AS BIGINT) AS n_units
            FROM ranked WHERE NOT elig OR rn = 1 GROUP BY doc_id
        """,
        "ccnet_line_dedup": r"""
            WITH lined AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN upper(replace(text, ' table ', chr(10)))
                            ELSE replace(text, ' table ', chr(10))
                       END AS text
                FROM documents
            ), lines AS (
                SELECT doc_id,
                       unnest(string_split(text, chr(10))) AS line,
                       unnest(range(len(string_split(text, chr(10)))))
                           AS line_no
                FROM lined
            ), marked AS (
                SELECT doc_id, line_no, line,
                       trim(regexp_replace(regexp_replace(regexp_replace(
                           lower(line), '[0-9]', '0', 'g'),
                           '[!-/:-@\[-`{-~]', '', 'g'),
                           '[ \t]+', ' ', 'g'), ' ') AS key,
                       length(regexp_extract_all(line, '[^ ]+')) >= 3
                           AS elig
                FROM lines
            ), ranked AS (
                SELECT doc_id, line_no, line, elig,
                       row_number() OVER (PARTITION BY elig, key
                                          ORDER BY doc_id, line_no) AS rn
                FROM marked
            )
            SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no)
                       AS text,
                   CAST(count(*) AS BIGINT) AS n_units
            FROM ranked WHERE NOT elig OR rn = 1 GROUP BY doc_id
        """,
        "c4_filters": """
            WITH minted AS (
                SELECT doc_id,
                       replace(replace(replace(replace(text,
                           ' row ', '.' || chr(10)),
                           ' spark ', ' javascript '),
                           'hash merge', '{'),
                           'merge batch', 'Lorem Ipsum dolor') AS text
                FROM documents
            ),
            docs AS (
                SELECT doc_id, text FROM minted
                WHERE lower(text) NOT LIKE '%lorem ipsum%'
                  AND text NOT LIKE '%{%'
            ),
            lines AS (
                SELECT doc_id,
                       trim(unnest(ls), ' ' || chr(9) || chr(13)) AS line,
                       unnest(range(1, len(ls) + 1)) AS ln
                FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                      FROM docs)
            ),
            kept AS (
                SELECT doc_id, line, ln FROM lines
                WHERE regexp_matches(line, '[.!?"]$')
                  AND len(regexp_extract_all(line, '[^ \t]+')) >= 5
                  AND lower(line) NOT LIKE '%javascript%'
            )
            SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS text,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM kept GROUP BY doc_id HAVING count(*) >= 2
        """,
        "exactsubstr_dedup": """
            WITH pos AS (
                SELECT doc_id,
                       unnest(generate_series(1, length(text) - 49)) AS i,
                       text
                FROM documents WHERE length(text) >= 50
            ),
            grams AS (SELECT doc_id, i, substr(text, i, 50) AS g FROM pos),
            marked AS (
                SELECT doc_id, i FROM (
                    SELECT doc_id, i,
                           row_number() OVER (PARTITION BY g
                                              ORDER BY doc_id, i) AS rn
                    FROM grams) WHERE rn > 1
            ),
            islands AS (
                SELECT doc_id, i AS s, i + 50 AS e,
                       CASE WHEN i > coalesce(max(i + 50) OVER (
                            PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                            THEN 1 ELSE 0 END AS brk
                FROM marked
            ),
            spans AS (
                SELECT doc_id, min(s) AS s, max(e) AS e
                FROM (SELECT *, sum(brk) OVER (PARTITION BY doc_id
                                               ORDER BY s) AS isl
                      FROM islands)
                GROUP BY doc_id, isl
            ),
            keep AS (
                SELECT doc_id,
                       coalesce(lag(e) OVER (PARTITION BY doc_id
                                             ORDER BY s), 1) AS ks,
                       s AS ke
                FROM spans
                UNION ALL
                SELECT sp.doc_id, max(sp.e) AS ks,
                       length(d.text) + 1 AS ke
                FROM spans sp JOIN documents d USING (doc_id)
                GROUP BY sp.doc_id, length(d.text)
            ),
            cleaned AS (
                SELECT k.doc_id,
                       string_agg(substr(d.text, k.ks, k.ke - k.ks),
                                  '' ORDER BY k.ks) AS text
                FROM keep k JOIN documents d USING (doc_id)
                WHERE k.ke > k.ks
                GROUP BY k.doc_id
            )
            SELECT c.doc_id, c.text,
                   CAST(length(d.text) - length(c.text) AS BIGINT)
                       AS n_removed
            FROM cleaned c JOIN documents d USING (doc_id)
            UNION ALL
            SELECT doc_id, text, CAST(0 AS BIGINT) AS n_removed
            FROM documents
            WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM marked)
        """,
        "orders_window_features": """
            WITH t AS (SELECT o_custkey, o_orderkey,
                              epoch_us(o_orderdate) AS o_orderdate_us,
                              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                  AS price_cents
                       FROM orders)
            SELECT o_custkey, o_orderkey, o_orderdate_us, price_cents,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate_us, o_orderkey) AS rn,
                   LAG(price_cents) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate_us, o_orderkey) AS prev,
                   SUM(price_cents) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate_us, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS run,
                   SUM(price_cents) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate_us, o_orderkey
                       ROWS 2 PRECEDING) AS mov
            FROM t
        """,
        "orders_rrf": """
            WITH ra_ AS (
                SELECT o_orderkey AS doc_id,
                       row_number() OVER (
                           ORDER BY CAST(round(o_totalprice * 100)
                                         AS BIGINT) DESC,
                                    o_orderkey) AS ra
                FROM orders WHERE o_orderkey % 2 = 0
            ), rb_ AS (
                SELECT o_orderkey AS doc_id,
                       row_number() OVER (
                           ORDER BY epoch_us(o_orderdate) DESC,
                                    o_orderkey) AS rb
                FROM orders
            )
            SELECT COALESCE(ra_.doc_id, rb_.doc_id) AS doc_id,
                   (CASE WHEN ra IS NULL THEN 0.0
                         ELSE 1.0 / (60 + ra) END)
                   + (CASE WHEN rb IS NULL THEN 0.0
                           ELSE 1.0 / (60 + rb) END) AS rrf
            FROM ra_ FULL OUTER JOIN rb_ ON ra_.doc_id = rb_.doc_id
        """,
        "events_merge_intervals": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + greatest(CAST(round(value * 10) AS BIGINT), 0)
                         * 1000000 AS e
                FROM events
            ), m AS (
                SELECT *, MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
                FROM iv
            ), g AS (
                SELECT *, SUM(CASE WHEN pm IS NULL OR s > pm
                                   THEN 1 ELSE 0 END) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS UNBOUNDED PRECEDING) AS isl
                FROM m
            )
            SELECT user_id, MIN(s) AS island_start, MAX(e) AS island_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM g GROUP BY user_id, isl
        """,
        "price_zscore": """
            WITH m AS (
                SELECT c_custkey,
                       CAST(round(c_acctbal * 100) AS BIGINT) AS v,
                       SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                           OVER w AS gsum,
                       SUM(CAST(round(c_acctbal * 100) AS BIGINT)
                           * CAST(round(c_acctbal * 100) AS BIGINT))
                           OVER w AS gsq,
                       CAST(COUNT(*) OVER w AS DOUBLE) AS cnt
                FROM customer
                WINDOW w AS (PARTITION BY c_nationkey)
            )
            SELECT c_custkey,
                   CASE WHEN sqrt(greatest(
                            CAST(gsq AS DOUBLE) / cnt
                            - (CAST(gsum AS DOUBLE) / cnt)
                              * (CAST(gsum AS DOUBLE) / cnt), 0)) > 0
                        THEN (v - CAST(gsum AS DOUBLE) / cnt)
                             / sqrt(greatest(
                                 CAST(gsq AS DOUBLE) / cnt
                                 - (CAST(gsum AS DOUBLE) / cnt)
                                   * (CAST(gsum AS DOUBLE) / cnt), 0))
                        ELSE 0.0 END AS z
            FROM m
        """,
        "events_range_window": """
            SELECT event_id,
                   SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS w_sum,
                   CAST(COUNT(*) OVER w AS BIGINT) AS w_cnt
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW)
        """,
        "events_rank_features": """
            WITH t AS (SELECT user_id, event_id,
                              CAST(floor(value * 100 + 0.5) AS BIGINT)
                                  AS value_cents
                       FROM events)
            SELECT user_id, event_id, value_cents,
                   RANK() OVER (PARTITION BY user_id
                                ORDER BY value_cents) AS rnk,
                   DENSE_RANK() OVER (PARTITION BY user_id
                                      ORDER BY value_cents) AS drnk,
                   PERCENT_RANK() OVER (PARTITION BY user_id
                                        ORDER BY value_cents) AS prnk,
                   NTILE(4) OVER (PARTITION BY user_id
                                  ORDER BY value_cents, event_id) AS nt,
                   FIRST_VALUE(value_cents) OVER (
                       PARTITION BY user_id
                       ORDER BY value_cents, event_id) AS fv,
                   LAST_VALUE(value_cents) OVER (
                       PARTITION BY user_id
                       ORDER BY value_cents, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS lv
            FROM t
        """,
        "pricing_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "pricing_cube": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "doc_keywords": """
            WITH words AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS term
                FROM documents),
            tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                   FROM words GROUP BY 1, 2),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                       CAST(round(tf.tf * ln(n.n / df.df) * 1000000)
                            AS BIGINT) AS score_micro
                FROM tf JOIN df USING (term), n)
            SELECT doc_id, term, tf, score_micro,
                   CAST(rn AS BIGINT) AS rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY score_micro DESC, term) AS rn
                FROM scored) WHERE rn <= 5
        """,
        "event_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                   GROUP BY 1)
            SELECT * FROM (
                SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                       CAST(count(*) AS BIGINT) AS n_users FROM s1
                UNION ALL
                SELECT CAST(2 AS BIGINT), 'click',
                       CAST(count(*) AS BIGINT) FROM s2
                UNION ALL
                SELECT CAST(3 AS BIGINT), 'purchase',
                       CAST(count(*) AS BIGINT) FROM s3)
        """,
        "events_gap_fill": """
            WITH w AS (SELECT user_id,
                              CAST(floor(epoch_us(ts) / 3600000000)
                                   AS BIGINT) AS win,
                              value
                       FROM events),
            a AS (SELECT user_id, win, CAST(count(*) AS BIGINT) AS n,
                         min(value) AS min_value, max(value) AS max_value
                  FROM w GROUP BY 1, 2),
            s AS (SELECT user_id, min(win) AS lo, max(win) AS hi
                  FROM a GROUP BY 1),
            g AS (SELECT user_id, unnest(generate_series(lo, hi)) AS win
                  FROM s)
            SELECT g.user_id, g.win,
                   CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
                   a.min_value, a.max_value
            FROM g LEFT JOIN a USING (user_id, win)
        """,
        "retention_cohorts": """
            WITH w AS (SELECT DISTINCT user_id,
                              CAST(floor(epoch_us(ts) / 604800000000)
                                   AS BIGINT) AS wk
                       FROM events),
            c AS (SELECT user_id, min(wk) AS cohort_w FROM w GROUP BY 1)
            SELECT c.cohort_w, w.wk AS active_w,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM w JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "oov_rate": """
            WITH words AS (
                SELECT doc_id,
                       unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS w
                FROM documents
            ),
            c AS (SELECT w, count(*) AS n FROM words GROUP BY w),
            vocab AS (
                SELECT w FROM c
                QUALIFY row_number() OVER (ORDER BY n DESC, w ASC) <= 20
            )
            SELECT words.doc_id,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(count(*) FILTER (WHERE v.w IS NULL) AS BIGINT)
                       AS n_oov
            FROM words LEFT JOIN vocab v ON words.w = v.w
            GROUP BY words.doc_id
        """,
        "politeness_schedule": """
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY doc_id) AS fetch_rank,
                   CAST((row_number() OVER (PARTITION BY source
                                            ORDER BY doc_id) - 1)
                        * 1000000 AS BIGINT) AS slot_us
            FROM documents
        """,
        "brand_revenue": """
            SELECT p_brand AS label,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "supplier_revenue": """
            SELECT s_name AS label,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name
        """,
        "regional_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                       AS revenue_e4
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND c_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1997-01-01'
            GROUP BY n_name
        """,
        "length_lang_auc": """
            WITH t AS (SELECT CAST(n_chars AS BIGINT) AS s,
                              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                       FROM documents),
            r AS (SELECT y,
                         RANK() OVER (ORDER BY s) AS rk,
                         count(*) OVER (PARTITION BY s) AS cnt
                  FROM t),
            agg AS (SELECT sum(CASE WHEN y = 1
                                    THEN 2 * rk + cnt - 1 END) AS two_rpos,
                           sum(y) AS npos, count(*) AS n FROM r)
            SELECT round(CAST(two_rpos - npos * (npos + 1) AS DOUBLE)
                         / CAST(2 * npos * (n - npos) AS DOUBLE), 9)
                       AS auc,
                   CAST(npos AS BIGINT) AS n_pos,
                   CAST(n - npos AS BIGINT) AS n_neg
            FROM agg
        """,
        "source_quality_gate": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE source IN (
                SELECT source FROM documents GROUP BY source
                HAVING sum(n_chars) >= 300 * count(*))
        """,
        "source_fields": """
            SELECT doc_id,
                   CASE WHEN regexp_matches(source, '([a-z]+)([0-9]+)')
                        THEN regexp_extract(source,
                                            '([a-z]+)([0-9]+)', 1)
                        END AS src_prefix,
                   CASE WHEN regexp_matches(source, '([a-z]+)([0-9]+)')
                        THEN regexp_extract(source,
                                            '([a-z]+)([0-9]+)', 2)
                        END AS src_num
            FROM documents
        """,
        "exact_distinct_users": """
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events
        """,
        "orders_profile": """
            SELECT 'o_custkey' AS col, count(*) AS n_rows,
                   count(*) - count(o_custkey) AS n_nulls,
                   count(DISTINCT o_custkey) AS n_distinct,
                   CAST(min(o_custkey) AS DOUBLE) AS min_num,
                   CAST(max(o_custkey) AS DOUBLE) AS max_num,
                   NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', count(*),
                   count(*) - count(o_orderdate),
                   count(DISTINCT o_orderdate),
                   CAST(epoch_us(min(o_orderdate)) AS DOUBLE),
                   CAST(epoch_us(max(o_orderdate)) AS DOUBLE),
                   NULL::VARCHAR, NULL::VARCHAR
            FROM orders
            UNION ALL
            SELECT 'o_orderkey', count(*),
                   count(*) - count(o_orderkey),
                   count(DISTINCT o_orderkey),
                   CAST(min(o_orderkey) AS DOUBLE),
                   CAST(max(o_orderkey) AS DOUBLE),
                   NULL::VARCHAR, NULL::VARCHAR
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(*),
                   count(*) - count(o_orderpriority),
                   count(DISTINCT o_orderpriority),
                   NULL::DOUBLE, NULL::DOUBLE,
                   min(o_orderpriority), max(o_orderpriority)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*),
                   count(*) - count(o_orderstatus),
                   count(DISTINCT o_orderstatus),
                   NULL::DOUBLE, NULL::DOUBLE,
                   min(o_orderstatus), max(o_orderstatus)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*),
                   count(*) - count(o_totalprice),
                   count(DISTINCT o_totalprice),
                   CAST(min(o_totalprice) AS DOUBLE),
                   CAST(max(o_totalprice) AS DOUBLE),
                   NULL::VARCHAR, NULL::VARCHAR
            FROM orders
        """,
        "qty_price_corr": """
            WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                              CAST(floor(l_extendedprice * 100 + 0.5)
                                   AS BIGINT) AS y
                       FROM lineitem),
            m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                         sum(CAST(x AS HUGEINT)) AS sx,
                         sum(CAST(y AS HUGEINT)) AS sy,
                         sum(CAST(x AS HUGEINT) * x) AS sxx,
                         sum(CAST(y AS HUGEINT) * y) AS syy,
                         sum(CAST(x AS HUGEINT) * y) AS sxy
                  FROM t)
            SELECT CAST(n AS BIGINT) AS n,
                   round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
                         9) AS corr
            FROM m
        """,
        "qty_price_regression": """
            WITH t AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                              CAST(floor(l_extendedprice * 100 + 0.5)
                                   AS BIGINT) AS y
                       FROM lineitem),
            m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                         sum(CAST(x AS HUGEINT)) AS sx,
                         sum(CAST(y AS HUGEINT)) AS sy,
                         sum(CAST(x AS HUGEINT) * x) AS sxx,
                         sum(CAST(y AS HUGEINT) * y) AS syy,
                         sum(CAST(x AS HUGEINT) * y) AS sxy
                  FROM t),
            s AS (SELECT n, sx, sy,
                         n * sxy - sx * sy AS num,
                         n * sxx - sx * sx AS d1,
                         n * syy - sy * sy AS d2,
                         CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
                  FROM m)
            SELECT CAST(n AS BIGINT) AS n,
                   round(slope, 9) AS slope,
                   round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 9) AS intercept,
                   round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                         / (CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)), 9)
                       AS r2
            FROM s
        """,
        "customers_f_only": """
            SELECT o_custkey AS custkey FROM orders
            WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT o_custkey AS custkey FROM orders
            WHERE o_orderstatus = 'O'
        """,
        "purchase_click_users": """
            SELECT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'click'
        """,
        "weighted_sample_docs": """
            WITH t AS (SELECT doc_id, n_chars,
                ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                        ::BIGINT + 1) / 4503599627370496.0)
                    / n_chars AS key
                FROM documents WHERE n_chars > 0)
            SELECT doc_id, n_chars FROM t
            ORDER BY key DESC, doc_id LIMIT 50
        """,
        "orders_semi_join": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_quantity > 45)
        """,
        "events_json_extract": """
            SELECT event_id,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
            FROM events
        """,
        "events_asof_forward": """
            WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                       FROM events),
            r AS (SELECT user_id, epoch_us(ts) AS ts_us, value AS val
                  FROM events WHERE event_type = 'purchase')
            SELECT l.event_id, l.user_id, l.ts_us,
                   (SELECT r.val FROM r
                    WHERE r.user_id = l.user_id AND r.ts_us >= l.ts_us
                    ORDER BY r.ts_us LIMIT 1) AS val
            FROM l
        """,
        "customer_status_pivot": """
            SELECT o_custkey,
              CAST(count(*) FILTER (o_orderstatus='O') AS BIGINT) AS n_O,
              CAST(count(*) FILTER (o_orderstatus='F') AS BIGINT) AS n_F,
              CAST(count(*) FILTER (o_orderstatus='P') AS BIGINT) AS n_P
            FROM orders GROUP BY o_custkey
        """,
        "docs_per_source_sample": """
            WITH t AS (SELECT doc_id, source,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,13))::BIGINT
                   AS sample_key
               FROM documents)
            SELECT doc_id, source, sample_key, rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY source
                   ORDER BY sample_key, doc_id) AS BIGINT) AS rank FROM t)
            WHERE rank <= 3
        """,
        "price_quantiles_per_customer": """
            WITH t AS (SELECT o_custkey,
                              CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                                  AS v FROM orders),
            h AS (SELECT o_custkey, v, count(*) AS n FROM t
                  GROUP BY o_custkey, v),
            c AS (SELECT o_custkey, v,
                         sum(n) OVER (PARTITION BY o_custkey
                                      ORDER BY v) AS cum,
                         sum(n) OVER (PARTITION BY o_custkey) AS tot
                  FROM h)
            SELECT o_custkey, q, CAST(min(v) AS BIGINT) AS value
            FROM c, (VALUES (0.25),(0.5),(0.75)) qs(q)
            WHERE cum >= ceil(q * tot)
            GROUP BY o_custkey, q
        """,
        "price_quantiles_cont": """
            WITH t AS (SELECT o_custkey,
                              CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                                  AS v FROM orders)
            SELECT o_custkey, q, value FROM (
                SELECT o_custkey, 0.25 AS q,
                       quantile_cont(v, 0.25) AS value
                FROM t GROUP BY o_custkey
                UNION ALL
                SELECT o_custkey, 0.5, quantile_cont(v, 0.5)
                FROM t GROUP BY o_custkey
                UNION ALL
                SELECT o_custkey, 0.75, quantile_cont(v, 0.75)
                FROM t GROUP BY o_custkey)
        """,
        "events_user_type_join": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                       FROM events),
            a AS (SELECT user_id, event_type,
                         CAST(count(*) AS BIGINT) AS n_early
                  FROM e WHERE us < 1705363200000000
                  GROUP BY user_id, event_type),
            b AS (SELECT user_id, event_type,
                         CAST(count(*) AS BIGINT) AS n_late
                  FROM e WHERE us >= 1705363200000000
                  GROUP BY user_id, event_type)
            SELECT user_id, event_type, a.n_early, b.n_late
            FROM a FULL OUTER JOIN b USING (user_id, event_type)
        """,
        "lineitem_topk_per_order": """
            SELECT l_orderkey, l_linenumber, l_extendedprice, rank FROM (
                SELECT l_orderkey, l_linenumber, l_extendedprice,
                       CAST(row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber)
                            AS BIGINT) AS rank
                FROM lineitem) WHERE rank <= 2
        """,
        "boilerplate_strip": """
            WITH d AS (SELECT doc_id, source AS host,
                              text || chr(10) || 'copyright footer of '
                                   || source AS text
                       FROM documents),
            s AS (SELECT doc_id, host,
                         string_split(text, chr(10)) AS arr FROM d),
            pos AS (SELECT doc_id, host, arr,
                           unnest(generate_series(1, len(arr))) AS unit_no
                    FROM s),
            l AS (SELECT doc_id, host, unit_no, arr[unit_no] AS line
                  FROM pos),
            hosts AS (SELECT host, count(*) AS nd FROM d GROUP BY host),
            boiler AS (
                SELECT f.host, f.line
                FROM (SELECT host, line, count(DISTINCT doc_id) AS df
                      FROM l
                      WHERE len(regexp_extract_all(line, '[^ ]+')) >= 1
                      GROUP BY host, line) f
                JOIN hosts h USING (host)
                WHERE h.nd >= 3 AND f.df * 1.0 >= 0.5 * h.nd)
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY unit_no) AS text,
                   CAST(count(*) AS BIGINT) AS n_units
            FROM l
            WHERE NOT EXISTS (SELECT 1 FROM boiler b
                              WHERE b.host = l.host AND b.line = l.line)
            GROUP BY doc_id
        """,
        "shipping_priority": """
            SELECT l_orderkey AS o_orderkey,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100 + 0.5) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                   epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND epoch_us(o_orderdate) < 795225600000000
              AND epoch_us(l_shipdate) > 795225600000000
            GROUP BY l_orderkey, o_orderdate_us, o_orderpriority
            ORDER BY revenue_cents DESC, o_orderdate_us, o_orderkey
            LIMIT 10
        """,
        "pii_scrub": """
            WITH d AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com from '
                       || CAST(doc_id % 200 AS VARCHAR)
                       || '.0.0.1 call 555-0'
                       || CAST(100 + doc_id % 900 AS VARCHAR) AS t0
                FROM documents
            ), s AS (
                SELECT doc_id, t0,
                       regexp_replace(t0,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t1
                FROM d
            ), s2 AS (
                SELECT *, regexp_replace(t1,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                           '<IP>', 'g') AS t2
                FROM s
            ), s3 AS (
                SELECT *, regexp_replace(t2, '\\b\\d{3}-\\d{3,4}\\b',
                                         '<PHONE>', 'g') AS t3
                FROM s2
            )
            SELECT doc_id,
                   CAST(length(regexp_extract_all(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS BIGINT) AS n_email,
                   CAST(length(regexp_extract_all(t1,
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                       AS BIGINT) AS n_ip,
                   CAST(length(regexp_extract_all(t2,
                       '\\b\\d{3}-\\d{3,4}\\b')) AS BIGINT) AS n_phone,
                   t3 AS text
            FROM s3
        """,
        "gopher_repetition": """
            WITH lined AS (
                SELECT doc_id, replace(text, ' table ', chr(10)) AS text
                FROM documents
            ),
            lines AS (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS line
                FROM lined
            ),
            lc AS (
                SELECT doc_id, line, count(*) AS c, length(line) AS ln
                FROM lines GROUP BY doc_id, line
            ),
            lagg AS (
                SELECT doc_id,
                       CAST(sum(c) AS BIGINT) AS n_lines,
                       CAST(sum(c) - count(*) AS BIGINT) AS n_dup_lines,
                       CAST(sum(c * ln) AS BIGINT) AS line_chars,
                       CAST(sum((c - 1) * ln) AS BIGINT) AS dup_line_chars
                FROM lc GROUP BY doc_id
            ),
            words AS (
                SELECT doc_id,
                       list_filter(string_split(
                           replace(text, chr(10), ' '), ' '),
                           x -> x <> '') AS w
                FROM lined
            ),
            g2 AS (
                SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 1)) AS i
                      FROM words WHERE len(w) >= 2)
            ),
            t2 AS (
                SELECT doc_id, CAST(c * length(gram) AS BIGINT) AS chars
                FROM (SELECT doc_id, gram, count(*) AS c
                      FROM g2 GROUP BY doc_id, gram)
                QUALIFY row_number() OVER (PARTITION BY doc_id
                                           ORDER BY c DESC, gram ASC) = 1
            ),
            g3 AS (
                SELECT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 2)) AS i
                      FROM words WHERE len(w) >= 3)
            ),
            t3 AS (
                SELECT doc_id, CAST(c * length(gram) AS BIGINT) AS chars
                FROM (SELECT doc_id, gram, count(*) AS c
                      FROM g3 GROUP BY doc_id, gram)
                QUALIFY row_number() OVER (PARTITION BY doc_id
                                           ORDER BY c DESC, gram ASC) = 1
            ),
            g4 AS (
                SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       || ' ' || w[i+3] AS gram
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 3)) AS i
                      FROM words WHERE len(w) >= 4)
            ),
            t4 AS (
                SELECT doc_id, CAST(c * length(gram) AS BIGINT) AS chars
                FROM (SELECT doc_id, gram, count(*) AS c
                      FROM g4 GROUP BY doc_id, gram)
                QUALIFY row_number() OVER (PARTITION BY doc_id
                                           ORDER BY c DESC, gram ASC) = 1
            )
            SELECT l.doc_id,
                   CAST(length(d.text) AS BIGINT) AS n_chars,
                   l.n_lines, l.n_dup_lines, l.line_chars,
                   l.dup_line_chars,
                   CAST(coalesce(t2.chars, 0) AS BIGINT) AS top2_chars,
                   CAST(coalesce(t3.chars, 0) AS BIGINT) AS top3_chars,
                   CAST(coalesce(t4.chars, 0) AS BIGINT) AS top4_chars
            FROM lagg l
            JOIN lined d USING (doc_id)
            LEFT JOIN t2 USING (doc_id)
            LEFT JOIN t3 USING (doc_id)
            LEFT JOIN t4 USING (doc_id)
        """,
        "repetition_stats": """
            WITH words AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS word,
                       unnest(range(len(string_split(text, ' ')))) AS wno
                FROM documents
            ), base AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                       CAST(count(DISTINCT word) AS BIGINT)
                           AS n_distinct_words
                FROM words GROUP BY doc_id
            ), gc AS (
                SELECT a.doc_id, a.word || ' ' || b.word AS gram,
                       count(*) AS c
                FROM words a
                JOIN words b ON a.doc_id = b.doc_id AND b.wno = a.wno + 1
                GROUP BY a.doc_id, gram
            ), gtop AS (
                SELECT doc_id, CAST(max(c) AS BIGINT) AS top_2gram_n,
                       CAST(sum(c) AS BIGINT) AS n_2grams
                FROM gc GROUP BY doc_id
            )
            SELECT base.doc_id, n_words, n_distinct_words,
                   COALESCE(top_2gram_n, 0) AS top_2gram_n,
                   COALESCE(n_2grams, 0) AS n_2grams
            FROM base LEFT JOIN gtop ON base.doc_id = gtop.doc_id
        """,
        "events_tumbling_window": """
            SELECT user_id,
                   epoch_us(ts) // 300000000 AS win,
                   count(*) AS n_events,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "events_window_store": """
            SELECT user_id,
                   epoch_us(ts) // 300000000 AS win,
                   count(*) AS n_events,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "events_hopping_window": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS t, value FROM events
            ), w AS (
                SELECT user_id, value,
                       unnest(generate_series(
                           CAST(floor((t - 300000000.0) / 60000000.0)
                                AS BIGINT) + 1,
                           CAST(floor(t / 60000000.0) AS BIGINT))) AS win
                FROM e)
            SELECT user_id, win,
                   count(*) AS n_events,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM w GROUP BY user_id, win
        """,
        "events_session_windows": """
            WITH o AS (
                SELECT user_id, epoch_us(ts) AS t FROM events
            ), m AS (
                SELECT user_id, t,
                       CASE WHEN lag(t) OVER w IS NULL
                                 OR t - lag(t) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS boundary
                FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t)
            ), s AS (
                SELECT user_id, t,
                       CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY t
                                                ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS session_id
                FROM m
            )
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   min(t) AS start_us,
                   max(t) AS end_us
            FROM s GROUP BY user_id, session_id
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id IN (0, 1, 2, 3, 4)),
            sims AS (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS cos
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.vec_id)
            SELECT query_id, neighbor_id, rank FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id)
                           AS rank
                FROM sims) WHERE rank <= 10
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a CROSS JOIN embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
    }
    # the checkpointed flagship runs the SAME composition; the oracle
    # is identical by construction
    d["corpus_prep_shards_ckpt"] = d["corpus_prep_shards"]
    # the index-backed BM25 must equal the streaming scan exactly
    d["bm25_index_topk"] = d["bm25_corpus_topk"]
    # conjunctive mode: same scores, restricted to docs matching ALL terms
    d["bm25_index_and"] = d["bm25_corpus_topk"].replace(
        "FROM sc GROUP BY doc_id",
        "FROM sc GROUP BY doc_id HAVING count(*) = 3")
    d["zonemap_range_scan"] = """
            SELECT doc_id, n_chars FROM documents
            WHERE n_chars BETWEEN 400 AND 700
        """
    d["events_time_range"] = """
            SELECT event_id, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
            FROM events
            WHERE epoch(ts) >= 1704844800
              AND floor(epoch(ts)) <= 1704844800 + 86399
        """
    d["phrase_search"] = """
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split(text, ' '),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            p AS (
                SELECT doc_id, unnest(ws) AS w,
                       unnest(range(1, len(ws) + 1)) AS i
                FROM w
            )
            SELECT a.doc_id, count(*) AS n_matches
            FROM p a JOIN p b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            WHERE a.w = 'table' AND b.w = 'hash'
            GROUP BY a.doc_id ORDER BY a.doc_id
        """
    d["pagerank_customers"] = _pagerank_oracle_sql(_PAGERANK_ITERS,
                                                   _PAGERANK_SCALE)
    d["bfs_orders"] = f"""
            WITH RECURSIVE edges AS (
                SELECT o_custkey AS src,
                       1 + (o_orderkey * 26544357)
                           % (SELECT max(o_custkey) FROM orders) AS dst
                FROM orders
            ),
            walk(node, dist) AS (
                SELECT CAST(s.node AS BIGINT), CAST(0 AS BIGINT)
                FROM (VALUES {', '.join(f'({s})' for s in _BFS_SEEDS)})
                     s(node)
                UNION
                SELECT CAST(e.dst AS BIGINT), w.dist + 1
                FROM walk w JOIN edges e ON e.src = w.node
                WHERE w.dist < {_BFS_HOPS}
            )
            SELECT node, min(dist) AS dist FROM walk GROUP BY node
        """
    d["triangle_count_orders"] = f"""
            WITH canon AS (
                SELECT DISTINCT
                       least(1 + (o_orderkey * 2654435761) % {_TRI_NODES},
                             1 + (o_orderkey * 40503) % {_TRI_NODES}) AS u,
                       greatest(1 + (o_orderkey * 2654435761) % {_TRI_NODES},
                                1 + (o_orderkey * 40503) % {_TRI_NODES}) AS v
                FROM orders
                WHERE 1 + (o_orderkey * 2654435761) % {_TRI_NODES}
                      <> 1 + (o_orderkey * 40503) % {_TRI_NODES}
            )
            SELECT CAST(count(*) AS BIGINT) AS triangles
            FROM canon e1
            JOIN canon e2 ON e2.u = e1.v
            JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v
        """
    d["normalize_text"] = r"""
            WITH norm AS (
                SELECT doc_id, text AS orig,
                       trim(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(nfc_normalize(text),
                                            '\r\n?', chr(10), 'g'),
                             '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                           '\n{3,}', chr(10) || chr(10), 'g'),
                         ' ' || chr(9) || chr(10) || chr(13)) AS text
                FROM documents)
            SELECT doc_id, text, (text <> orig) AS changed FROM norm"""
    d["orders_customer_full_join"] = """
            WITH o AS (SELECT o_custkey AS custkey, count(*) AS n_orders
                       FROM orders GROUP BY o_custkey),
                 c AS (SELECT c_custkey AS custkey, c_acctbal
                       FROM customer WHERE c_acctbal > 5000)
            SELECT custkey, n_orders, c_acctbal
            FROM o FULL OUTER JOIN c USING (custkey)"""
    d["price_histogram"] = """
            WITH b AS (
                SELECT CAST(floor((o_totalprice - 0.0) * 60
                                  / (600000.0 - 0.0)) AS BIGINT) AS bucket
                FROM orders)
            SELECT bucket, count(*) AS n FROM b
            WHERE bucket >= 0 AND bucket < 60
            GROUP BY bucket"""
    d["orders_join_bloom"] = """
            SELECT o.o_orderkey, o.o_custkey AS custkey, o.o_totalprice,
                   c.c_mktsegment
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'AUTOMOBILE'"""
    d["split_sentences"] = r"""
            WITH s AS (
                SELECT doc_id,
                       regexp_split_to_array(text,
                                             '[.!?]+[ \t\n]+') AS arr
                FROM documents),
            pos AS (
                SELECT doc_id, arr,
                       unnest(generate_series(1, len(arr))) AS sent_idx
                FROM s)
            SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx,
                   arr[sent_idx] AS sentence
            FROM pos WHERE arr[sent_idx] <> ''"""
    d["ngram_counts"] = r"""
            WITH words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
                FROM words WHERE len(w) >= 3
            ),
            grams AS (
                SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
                FROM pos
            )
            SELECT gram, count(*) AS cnt FROM grams
            GROUP BY gram HAVING count(*) >= 3"""
    d["blocklist_filter"] = r"""
            SELECT doc_id, text FROM documents
            WHERE NOT regexp_matches(lower(text),
                                     '\b(spark|quantum)\b')"""
    d["pmi_topk"] = r"""
            WITH words AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                FROM documents),
            uni AS (SELECT unnest(w) AS word FROM words),
            ucnt AS (SELECT word, count(*) AS c FROM uni GROUP BY word),
            nw AS (SELECT count(*) AS n FROM uni),
            pos AS (SELECT doc_id, w,
                           unnest(generate_series(1, len(w) - 1)) AS i
                    FROM words WHERE len(w) >= 2),
            big AS (SELECT w[i] AS x, w[i+1] AS y FROM pos),
            bcnt AS (SELECT x, y, count(*) AS cnt FROM big GROUP BY x, y),
            nb AS (SELECT count(*) AS n FROM big),
            j AS (SELECT b.x, b.y, b.cnt, ux.c AS cx, uy.c AS cy
                  FROM bcnt b
                  JOIN ucnt ux ON b.x = ux.word
                  JOIN ucnt uy ON b.y = uy.word
                  WHERE b.cnt >= 5),
            p AS (SELECT x || ' ' || y AS gram, cnt,
                         CAST(round(ln(
                             (CAST(cnt AS DOUBLE)
                              * (SELECT n FROM nw) * (SELECT n FROM nw))
                             / (CAST((SELECT n FROM nb) AS DOUBLE)
                                * cx * cy)) * 1000000)
                              AS BIGINT) AS pmi_micro
                  FROM j)
            SELECT gram, cnt, pmi_micro FROM p
            ORDER BY pmi_micro DESC, gram ASC LIMIT 50"""
    d["incremental_ingest"] = """
            SELECT md5(d.text) AS digest, d.doc_id
            FROM documents d
            WHERE md5(d.text) NOT IN (
                SELECT md5(text) FROM documents WHERE doc_id % 7 <> 0)"""
    # DDSketch quantiles: the oracle recomputes the deterministic
    # log-bucket histogram and rank rule in SQL. gamma is embedded as
    # repr() so both engines parse the identical double; the 1e-9
    # epsilon inside ceil() makes boundary values bucket identically
    # under numpy's and DuckDB's ln() (see sketch._dd_bucket).
    from sift_ray.functions.sketch import _dd_gamma
    _g = repr(_dd_gamma(0.01))
    d["price_quantiles"] = f"""
            WITH b AS (SELECT CAST(ceil(ln(o_totalprice)/ln({_g}) - 1e-9)
                                   AS BIGINT) AS bucket,
                              count(*) AS c
                       FROM orders WHERE o_totalprice > 0 GROUP BY 1),
                 s AS (SELECT bucket,
                              sum(c) OVER (ORDER BY bucket) AS cum,
                              sum(c) OVER () AS n FROM b),
                 q(q_pct) AS (VALUES (1),(25),(50),(75),(99))
            SELECT CAST(q.q_pct AS BIGINT) AS q_pct,
                   min(s.bucket) AS bucket
            FROM s CROSS JOIN q
            WHERE s.cum > CAST(q.q_pct AS DOUBLE)/100.0*(s.n-1)
            GROUP BY 1"""
    d["price_quantiles_by_priority"] = f"""
            WITH b AS (SELECT o_orderpriority AS k,
                              CAST(ceil(ln(o_totalprice)/ln({_g}) - 1e-9)
                                   AS BIGINT) AS bucket,
                              count(*) AS c
                       FROM orders WHERE o_totalprice > 0 GROUP BY 1, 2),
                 s AS (SELECT k, bucket,
                              sum(c) OVER (PARTITION BY k
                                           ORDER BY bucket) AS cum,
                              sum(c) OVER (PARTITION BY k) AS n FROM b),
                 q(q_pct) AS (VALUES (1),(25),(50),(75),(99))
            SELECT s.k AS o_orderpriority,
                   CAST(q.q_pct AS BIGINT) AS q_pct,
                   min(s.bucket) AS bucket
            FROM s CROSS JOIN q
            WHERE s.cum > CAST(q.q_pct AS DOUBLE)/100.0*(s.n-1)
            GROUP BY 1, 2"""
    # GOLDEN PINS (not independent oracles) for the non-SQL-expressible
    # queries (readability/markdown extraction, PDF parse, image/audio
    # decode): DuckDB reads the frozen sf0.01 output minted by
    # tools/mint_driver_goldens.py FROM THIS IMPLEMENTATION. Unlike the
    # SQL-recomputed oracles above — which independently derive the
    # answer — a pin freezes the minting-time behavior: it catches any
    # subsequent drift (same rows+schema+hash teeth; inputs are
    # deterministic synthetic corpora, and tests/test_oracle.py
    # re-checks each one per pytest run against a fresh recompute) but
    # cannot catch a bug already present when minted. Those queries'
    # ground truth lives in the ported reference assertions and
    # byte-exact goldens under tests/. When an operator's behavior
    # legitimately changes, re-mint with
    # `python tools/mint_driver_goldens.py NAME...` and commit the new
    # parquet alongside the change that justifies it.
    from tools.mint_driver_goldens import GOLDEN_QUERIES, OUT_DIR
    for name in GOLDEN_QUERIES:
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        d[name] = f"SELECT * FROM read_parquet('{path}')"
    return d
