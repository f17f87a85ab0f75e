"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (100 TB shape):
* exact dedup = vectorized digest -> ONE hash-partitioned groupby (the only
  shuffle), with Min/Count aggregates — never ships document text twice.
* MinHash: signatures are computed per batch (numpy-vectorized), then only
  (band_id, band_hash, doc_id) triples — a few dozen bytes per doc — are
  exploded and shuffled, not the text. Candidate verification re-reads only
  candidate docs' shingle sets.
* Verification at this round uses a broadcast shingle-set lookup via
  ``ray.put`` (read once per actor); the documented scale path replaces it
  with a hash-bucket join of the (small) candidate-pair list against the
  docs table.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .textstats import digest_batch

_MERSENNE = (1 << 61) - 1


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """One row per distinct content digest: (digest, keep_doc_id, n_copies).
    Keeps the minimum doc_id per group (hash-partition + per-group first)."""
    from ray.data.aggregate import Count, Min

    with_digest = ds.map_batches(
        lambda t: digest_batch(t, text_col).select([id_col, "digest"]),
        batch_format="pyarrow")
    return (with_digest.groupby("digest")
            .aggregate(Min(id_col, alias_name="keep_doc_id"),
                       Count(alias_name="n_copies")))


def _word_shingles(text: str, k: int) -> set:
    words = text.split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    sh = _word_shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "big") for s in sh),
        dtype=np.uint64, count=len(sh))
    return out


class MinHashStage:
    """Per-batch MinHash signatures -> exploded (band_id, band_hash, doc_id)
    rows. Permutation coefficients are seed-derived in __init__ (once per
    actor)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 42, text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        hashes = _shingle_hashes(text, self.shingle_k)
        # (num_perm, n_shingles) universal hashing mod Mersenne prime
        vals = (self.a[:, None] * hashes[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text or "")
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_doc.append(doc_id)
                out_band.append(band)
                out_hash.append(int.from_bytes(bh, "big") >> 1)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        })


def _pairs_from_groups(group: "object") -> "object":
    """Emit candidate pairs from one (band_id, band_hash) bucket."""
    import pandas as pd
    ids = sorted(group["doc_id"].tolist())
    if len(ids) < 2 or len(ids) > 200:   # cap pathological buckets (skew)
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    return pd.DataFrame({"doc_a": [p[0] for p in pairs],
                         "doc_b": [p[1] for p in pairs]})


def minhash_lsh_pairs(ds, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 5, jaccard_threshold: float = 0.5,
                      concurrency: int = 2, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Near-duplicate pairs via MinHash banding + exact Jaccard verification.

    Returns a Dataset of (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    import ray
    import ray.data as rd
    import pandas as pd

    triples = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "shingle_k": shingle_k, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)
    candidates = (triples.groupby(["band_id", "band_hash"])
                  .map_groups(_pairs_from_groups, batch_format="pandas"))
    # dedupe candidate pairs (same pair can match in several bands)
    cand_df = candidates.to_pandas()
    if len(cand_df) == 0:
        return rd.from_pandas(pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}))
    cand_df = cand_df.drop_duplicates().reset_index(drop=True)

    # verification: broadcast shingle sets of candidate docs only
    needed = set(cand_df["doc_a"]) | set(cand_df["doc_b"])
    shingle_map: Dict[int, frozenset] = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for doc_id, text in zip(batch.column(id_col).to_pylist(),
                                batch.column(text_col).to_pylist()):
            if doc_id in needed:
                shingle_map[doc_id] = frozenset(
                    _word_shingles(text or "", shingle_k))
    ref = ray.put(shingle_map)

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(ref)
        jac = []
        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            sa, sb = smap.get(a, frozenset()), smap.get(b, frozenset())
            union = len(sa | sb)
            jac.append(len(sa & sb) / union if union else 0.0)
        pdf = pdf.copy()
        pdf["jaccard"] = jac
        return pdf[pdf["jaccard"] >= jaccard_threshold]

    return rd.from_pandas(cand_df).map_batches(verify, batch_format="pandas")


_GRAM_WORD_RE = None


def _gram_words(text: str) -> List[str]:
    """ASCII [a-z0-9]+ tokens of lower(text) — matches the DuckDB oracle's
    ``regexp_extract_all(lower(text), '[a-z0-9]+')`` exactly."""
    global _GRAM_WORD_RE
    if _GRAM_WORD_RE is None:
        import re
        _GRAM_WORD_RE = re.compile(r"[a-z0-9]+")
    return _GRAM_WORD_RE.findall(text.lower())


def _distinct_gram_hashes(text: str, k: int) -> set:
    """Distinct word k-gram hashes; docs with < k words emit none (same rule
    as the SQL oracle)."""
    words = _gram_words(text)
    if len(words) < k:
        return set()
    return {int.from_bytes(
        hashlib.blake2b(" ".join(words[i:i + k]).encode(),
                        digest_size=8).digest(), "big") >> 1
        for i in range(len(words) - k + 1)}


class NgramStage:
    """Per-batch exploded (gram, doc_id) distinct pairs — the inverted-index
    build. Only int64 rows leave this stage, never the text."""

    def __init__(self, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_gram, out_doc = [], []
        for doc_id, text in zip(ids, texts):
            for g in _distinct_gram_hashes(text or "", self.k):
                out_gram.append(g)
                out_doc.append(doc_id)
        return pa.table({
            "gram": pa.array(out_gram, pa.int64()),
            "doc_id": pa.array(out_doc, pa.int64()),
        })


def _gram_bucket_pairs(group):
    """Emit one (doc_a, doc_b) row per co-occurring pair in a gram bucket."""
    import pandas as pd
    ids = sorted(group["doc_id"].tolist())
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    return pd.DataFrame({"doc_a": pd.Series([p[0] for p in pairs], dtype="int64"),
                         "doc_b": pd.Series([p[1] for p in pairs], dtype="int64")})


def ngram_jaccard_pairs(ds, k: int = 3, threshold: float = 0.5,
                        concurrency: int = 2, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard >= t).

    Shape: inverted index (gram -> docs) via ONE groupby over int64 rows,
    pair counts via a second small groupby (Sum combiner pattern), then
    jaccard from per-doc distinct-gram counts broadcast with ``ray.put``
    (at 10^12-doc scale that broadcast becomes a hash-bucket join of the
    pair list against the counts table; hot grams would additionally be
    dropped as stop-grams or salted — they only produce pairs the
    threshold filter kills anyway).
    """
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    grams = ds.map_batches(
        NgramStage,
        fn_constructor_kwargs={"k": k, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)

    # per-doc distinct gram counts (small: one int per doc)
    def count_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_grams": pa.array(
                [len(_distinct_gram_hashes(t or "", k)) for t in texts],
                pa.int64()),
        })
    counts_df = ds.map_batches(count_batch, batch_format="pyarrow").to_pandas()
    counts_ref = ray.put(dict(zip(counts_df[id_col], counts_df["n_grams"])))

    inter = (grams.groupby("gram")
             .map_groups(_gram_bucket_pairs, batch_format="pandas")
             .groupby(["doc_a", "doc_b"])
             .aggregate(Count(alias_name="isect")))

    def add_jaccard(pdf: pd.DataFrame) -> pd.DataFrame:
        nmap = ray.get(counts_ref)
        na = pdf["doc_a"].map(nmap)
        nb = pdf["doc_b"].map(nmap)
        pdf = pdf.copy()
        pdf["jaccard"] = pdf["isect"] / (na + nb - pdf["isect"])
        out = pdf.loc[pdf["jaccard"] >= threshold,
                      ["doc_a", "doc_b", "jaccard"]]
        return out.astype({"doc_a": "int64", "doc_b": "int64",
                           "jaccard": "float64"})

    return inter.map_batches(add_jaccard, batch_format="pandas")


def ngram_jaccard_matrix(texts: List[str], k: int = 5) -> np.ndarray:
    """Exact pairwise n-gram Jaccard for a SMALL list (test/oracle helper)."""
    sets = [_word_shingles(t, k) for t in texts]
    n = len(sets)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(i, n):
            union = len(sets[i] | sets[j])
            out[i, j] = out[j, i] = (len(sets[i] & sets[j]) / union
                                     if union else 0.0)
    return out


class SimHashStage:
    """64-bit SimHash per document over word features (Charikar 2002)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash(text: str) -> int:
        words = text.split()
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w in words:
            h = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= (1 << (63 - i))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit exploded (band_id, band_val, doc_id, simhash) rows — only a
        few ints per doc leave this stage, never the text."""
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_doc, out_band, out_val, out_hash = [], [], [], []
        for doc_id, text in zip(ids, texts):
            h = self.simhash(text or "")
            for b in range(4):
                out_doc.append(doc_id)
                out_band.append(b)
                out_val.append((h >> (16 * b)) & 0xFFFF)
                out_hash.append(h >> 1)  # fit int64
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_val": pa.array(out_val, pa.int32()),
            "simhash": pa.array(out_hash, pa.int64()),
        })


def _simhash_group_pairs(max_hamming: int):
    import pandas as pd

    def fn(group: pd.DataFrame) -> pd.DataFrame:
        rows = (group.drop_duplicates("doc_id").sort_values("doc_id")
                .to_dict("records"))
        out = []
        if 2 <= len(rows) <= 200:  # cap pathological buckets (skew guard)
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    dist = bin(rows[i]["simhash"] ^ rows[j]["simhash"]).count("1")
                    if dist <= max_hamming:
                        out.append((rows[i]["doc_id"], rows[j]["doc_id"], dist))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    return fn


def _dedupe_pairs(group):
    return group.head(1)


def simhash_pairs(ds, max_hamming: int = 3, concurrency: int = 2,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    A pair within distance 3 of a 64-bit hash must collide on at least one of
    four 16-bit bands (pigeonhole), so candidates come from band-collision
    groupbys; only (band, doc_id, simhash) int rows shuffle. Pair dedupe is a
    second (small) groupby, not a driver-side pass."""
    sims = ds.map_batches(
        SimHashStage, fn_constructor_kwargs={"text_col": text_col,
                                             "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency)
    pairs = (sims.groupby(["band_id", "band_val"])
             .map_groups(_simhash_group_pairs(max_hamming),
                         batch_format="pandas"))
    return (pairs.groupby(["doc_a", "doc_b"])
            .map_groups(_dedupe_pairs, batch_format="pandas"))
