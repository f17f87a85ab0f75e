"""Corpus-level selection operators for training-data preparation:
vocabulary building, stratified sampling, and benchmark decontamination.

These are the remaining corpus-shaping steps a web-scale LLM data pipeline
runs between quality filtering and shard packing (alongside the dedup
family in ``dedup.py`` and the packing in ``sharding.py``). Scale shapes:

* ``vocab_topk`` — classic distributed word count: per-batch vectorized
  value_counts (map-side combiner), ONE word-hash exchange of (word, n)
  partial rows, pyarrow hash-agg per partition, then a per-batch local
  top-k combiner whose candidate set (num_parts x k rows) is merged on the
  driver. Full text never moves; only the per-batch distinct vocabulary.
* ``stratified_sample`` — deterministic per-group downsampling by content
  digest threshold (the standard trick for capping dominant languages):
  pure map-side filter, zero shuffle, reproducible across runs/engines
  because the sampling key is md5(text), not an RNG.
* ``decontaminate`` — drop documents sharing any word k-gram with a small
  benchmark set (eval-set leakage removal). The benchmark side is tiny by
  construction (eval suites are thousands of documents), so its gram table
  is broadcast once per actor and matching is map-side substring search —
  zero shuffle of the corpus. At 10^6+ benchmark grams, swap the per-gram
  vectorized pass for a per-actor Aho-Corasick automaton built once in
  ``__init__``; the plumbing (broadcast + map-side filter) is unchanged.

No reference analog: chriscorrea/sift has no corpus-level operators
(SURVEY.md §2.8) — these extend the engine for the 100 TB use case.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from .shuffle import (add_hash_partition, default_num_parts,
                      partitioned_group_agg)
from .textstats import digest_batch


def _word_hash_keys(batch: pa.Table):
    """Deterministic vectorized int64 hash of the ``word`` column for the
    exchange (polars xxhash with a fixed seed — stable across worker
    processes, unlike Python's salted ``hash``)."""
    import polars as pl

    h = pl.from_arrow(batch.column("word")).hash(seed=0)
    return [h.to_numpy().view(np.int64)]


def vocab_topk(ds, k: int = 100, text_col: str = "text",
               num_parts: Optional[int] = None):
    """Global top-k words by corpus frequency: (word, n), ordered by
    n DESC, word ASC (deterministic tiebreak).

    Words are whitespace-split tokens (single-space delimiter, empty
    strings dropped — matching SQL ``string_split(text, ' ')``).
    """
    import pyarrow.compute as pc
    import pandas as pd
    import ray.data as rd

    def partial_counts(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(batch.column(text_col), " "))
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = ds.map_batches(partial_counts, batch_format="pyarrow")
    counts = partitioned_group_agg(rows, ["word"], [("n", "sum", "n")],
                                   num_parts=num_parts,
                                   key_arrays_fn=_word_hash_keys)

    # local top-k combiner: each partition's output batch emits only its
    # own top-k, so the driver merge sees <= num_parts * k candidate rows
    def local_topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pdf.sort_values(["n", "word"],
                               ascending=[False, True]).head(k)

    cands = counts.map_batches(local_topk, batch_format="pandas").to_pandas()
    top = (cands.sort_values(["n", "word"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return rd.from_pandas(top)


def stratified_sample(ds, rates: dict, default_rate: str = "1",
                      group_col: str = "lang", text_col: str = "text",
                      id_col: str = "doc_id"):
    """Deterministic per-group content-hash sample: keep a row iff
    ``md5(text) < threshold`` where the hex threshold depends on the
    group (e.g. ``{"en": "4"}`` keeps 4/16 of English, ``default_rate="1"``
    keeps 1/16 of everything else). Returns (id, group, digest) rows.

    This is the reproducible language-rebalancing primitive: thresholds
    are hex-string prefixes, so rates are multiples of 1/16 per character
    (use two-char thresholds for 1/256 granularity). Zero shuffle; the
    same rows are kept on ANY engine that computes md5, which is what
    makes carved splits auditable."""
    import pyarrow.compute as pc

    def sample(batch: pa.Table) -> pa.Table:
        t = digest_batch(batch, text_col)
        dig = t.column("digest")
        grp = t.column(group_col)
        keep = pc.less(dig, default_rate)
        for g, thresh in rates.items():
            in_g = pc.equal(grp, g)
            keep = pc.if_else(in_g, pc.less(dig, thresh), keep)
        return t.filter(keep).select([id_col, group_col, "digest"])

    return ds.map_batches(sample, batch_format="pyarrow")


def word_count_quantiles(ds, qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
                         text_col: str = "text",
                         num_parts: Optional[int] = None):
    """Exact corpus quantiles of the per-document word count — the
    calibration step behind quality-filter thresholds. Rule (deterministic,
    discrete): the smallest value whose cumulative count >= ceil(q * n).

    Scale shape: per-batch value_counts combiner (ints only), ONE
    value-keyed exchange, pyarrow hash-agg per partition; the driver then
    folds the (value, count) histogram — bounded by DISTINCT word counts
    (<= max document length, ~10^5 rows at any corpus size), never by
    corpus rows. Returns (q, value)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .textstats import _WORD_PATTERN

    def partial_counts(batch: pa.Table) -> pa.Table:
        wc = pc.cast(pc.count_substring_regex(batch.column(text_col),
                                              _WORD_PATTERN), pa.int64())
        vc = wc.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({
            "v": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = ds.map_batches(partial_counts, batch_format="pyarrow")
    hist = (partitioned_group_agg(rows, ["v"], [("n", "sum", "n")],
                                  num_parts=num_parts)
            .to_pandas().sort_values("v").reset_index(drop=True))
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        need = int(np.ceil(q * total))
        idx = int(np.searchsorted(cum, max(need, 1)))
        out_q.append(float(q))
        out_v.append(int(vals[min(idx, len(vals) - 1)]) if total else 0)
    return rd.from_arrow(pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.int64()),
    }))


def _unit_hash_keys(batch: pa.Table):
    """Routing keys for the unit-dedup exchange: eligible units route by a
    stable 64-bit hash of the dedup KEY string (the unit itself, or its
    normalized form when a ``key`` column is present — all copies
    co-locate); ineligible units route by (doc_id, unit_no) so boilerplate
    short lines spread uniformly instead of piling into one partition.
    Hash collisions only co-locate two unit groups — the kernel re-groups
    by the true string."""
    import polars as pl

    key_col = "key" if "key" in batch.schema.names else "unit"
    h = pl.from_arrow(batch.column(key_col)).hash(seed=0).to_numpy() \
        .view(np.int64)
    from .shuffle import mix64
    row_key = mix64([batch.column("doc_id").to_numpy(zero_copy_only=False),
                     batch.column("unit_no").to_numpy(zero_copy_only=False)])
    elig = batch.column("elig").to_numpy(zero_copy_only=False)
    return [np.where(elig, h, row_key)]


def _dedup_units(units, num_parts: Optional[int] = None,
                 join_delim: str = "\n"):
    """Core of line/span dedup: keep, per distinct eligible unit KEY, only
    its lexicographically first occurrence ``(doc_id, unit_no)`` corpus-wide;
    ineligible units always survive. Reassemble documents from the kept
    units. ``units`` rows: (doc_id:int64, unit_no:int64, unit:str, elig:bool
    [, key:str]) — ``key`` defaults to the unit string itself; callers that
    dedup on a NORMALIZED form (CCNet-style) add it as a separate column
    and the original unit text is what survives. Rows arrive already
    locally combined (in-batch duplicate losers dropped map-side, so a
    unit repeated k times in one batch ships once; a corpus-hot unit's
    partition load is bounded by the number of BATCHES containing it, not
    by its occurrence count).

    Two exchanges, each moving a kept unit once: (1) key-hash partition →
    per-partition winner selection (Arrow sort + adjacent compare, exact
    because all copies of a key co-locate); (2) doc_id partition →
    per-partition reassembly (sort by unit_no, group-concat). Returns
    (doc_id, text, n_units) for documents with >= 1 surviving unit."""
    import pyarrow.compute as pc

    P = num_parts or default_num_parts()
    parted = add_hash_partition(units, ["unit"], P,
                                key_arrays_fn=_unit_hash_keys)

    def pick_winners(tbl: pa.Table) -> pa.Table:
        elig = tbl.column("elig")
        key_col = "key" if "key" in tbl.schema.names else "unit"
        keep_cols = ["doc_id", "unit_no", "unit"]
        sel_cols = keep_cols if key_col == "unit" else keep_cols + ["key"]
        passthrough = tbl.filter(pc.invert(elig)).select(keep_cols)
        cand = tbl.filter(elig).select(sel_cols)
        # Arrow sort + adjacent-compare (NOT pandas drop_duplicates: pandas
        # object hashing truncates strings at embedded NUL bytes, which
        # would merge distinct units sharing a pre-NUL prefix — data loss)
        won = _first_per_sorted_unit(cand, key_col).select(keep_cols)
        return pa.concat_tables([won.cast(passthrough.schema),
                                 passthrough])

    kept = parted.groupby("part").map_groups(pick_winners,
                                             batch_format="pyarrow")
    return _reassemble_docs(kept, P, join_delim)


def _first_per_sorted_unit(cand: pa.Table,
                           key_col: str = "unit") -> pa.Table:
    """Per distinct ``key_col`` string, the row with the lexicographically
    smallest ``(doc_id, unit_no)`` — pure Arrow (binary-safe string
    equality), vectorized: one sort, one shifted compare."""
    import pyarrow.compute as pc

    if cand.num_rows <= 1:
        return cand
    idx = pc.sort_indices(cand, sort_keys=[(key_col, "ascending"),
                                           ("doc_id", "ascending"),
                                           ("unit_no", "ascending")])
    srt = cand.take(idx)
    u = srt.column(key_col).combine_chunks()
    n = len(u)
    neq = pc.not_equal(u.slice(1), u.slice(0, n - 1))
    if isinstance(neq, pa.ChunkedArray):
        neq = neq.combine_chunks()
    first = pa.concat_arrays([pa.array([True]), neq])
    return srt.filter(first)


def _reassemble_docs(units, num_parts: int, join_delim: str):
    """Rebuild (doc_id, text, n_units) from surviving (doc_id, unit_no,
    unit) rows: ONE doc_id exchange, partition-local sort + group-concat.
    Documents with zero surviving units disappear (callers that must keep
    them emit a sentinel unit upstream)."""
    parted = add_hash_partition(units, ["doc_id"], num_parts)

    def reassemble(tbl: pa.Table) -> pa.Table:
        df = tbl.select(["doc_id", "unit_no", "unit"]).to_pandas()
        df = df.sort_values(["doc_id", "unit_no"], kind="stable")
        g = df.groupby("doc_id", sort=True)["unit"]
        out = g.agg(join_delim.join).reset_index().rename(
            columns={"unit": "text"})
        out["n_units"] = g.size().to_numpy()
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "n_units": pa.array(out["n_units"].to_numpy(), pa.int64()),
        })

    return parted.groupby("part").map_groups(reassemble,
                                             batch_format="pyarrow")


def _explode_units(batch: pa.Table, splits: pa.ChunkedArray,
                   id_col: str) -> Tuple[np.ndarray, np.ndarray, pa.Array]:
    """Flatten a per-doc list column into (doc_ids, unit_pos, flat_values)
    using Arrow C++ kernels (this host's np.repeat/fancy-index are ~100x
    slow, so parent indices and start offsets stay in Arrow)."""
    import pyarrow.compute as pc

    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = pc.list_flatten(splits)
    parent = pc.list_parent_indices(splits)
    doc_ids = pc.take(batch.column(id_col), parent)
    offsets = splits.offsets
    starts = pc.take(offsets, parent).cast(pa.int64())
    pos = np.arange(len(flat), dtype=np.int64) \
        - starts.to_numpy(zero_copy_only=False)
    return (doc_ids.to_numpy(zero_copy_only=False), pos, flat)


# ASCII punctuation ranges !-/ :-@ [-` {-~ (same RE2 class both engines)
_CCNET_PUNCT = r"[!-/:-@\[-`{-~]"


def ccnet_normalize(arr):
    """CCNet-style dedup-key normalization (Wenzek et al. 2020: the hashes
    CCNet dedups paragraphs on are computed over normalized text):
    lowercase, digits -> ``0``, ASCII punctuation removed, space/tab runs
    collapsed to one space, ends trimmed. Vectorized RE2 kernels identical
    to the DuckDB mirror (``regexp_replace(..., 'g')``)."""
    import pyarrow.compute as pc

    s = pc.utf8_lower(arr)
    s = pc.replace_substring_regex(s, "[0-9]", "0")
    s = pc.replace_substring_regex(s, _CCNET_PUNCT, "")
    s = pc.replace_substring_regex(s, "[ \t]+", " ")
    return pc.utf8_trim(s, " ")


def line_dedup(ds, delimiter: str = "\n", min_words: int = 1,
               id_col: str = "doc_id", text_col: str = "text",
               num_parts: Optional[int] = None,
               normalize: Optional[str] = None):
    """C4-style corpus-wide exact line deduplication: split every document
    on ``delimiter``; any line with >= ``min_words`` words (space-separated
    tokens) survives only at its lexicographically first occurrence
    ``(doc_id, line_no)`` across the whole corpus; shorter lines are always
    kept. Documents are reassembled from surviving lines in order. Returns
    (doc_id, text, n_units).

    ``normalize="ccnet"`` dedups on the CCNet-normalized form of each line
    (``ccnet_normalize``: case/digit/punctuation-insensitive — the
    paragraph-hash normalization of Wenzek et al. 2020) while the ORIGINAL
    line text is what survives; default ``None`` dedups on exact bytes.

    Scale shape: map-side explode + in-batch combiner (a line duplicated
    within a batch ships once), then the two-exchange ``_dedup_units`` core
    — no driver state, partition loads bounded by batch count per hot line.
    No reference analog (SURVEY.md §2.8); this is the C4 "deduplicate at the
    line level" rule from the public pipeline description."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(batch.column(text_col), delimiter)
        doc_ids, pos, flat = _explode_units(batch, splits, id_col)
        wc = pc.count_substring_regex(flat, "[^ ]+")
        elig = pc.greater_equal(wc, min_words)
        cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "unit_no": pa.array(pos, pa.int64()),
            "unit": flat,
            "elig": elig,
        }
        key_col = "unit"
        if normalize == "ccnet":
            cols["key"] = ccnet_normalize(flat)
            key_col = "key"
        elif normalize is not None:
            raise ValueError(f"unknown normalize mode: {normalize!r}")
        t = pa.table(cols)
        # in-batch combiner: keep each key's lexicographically smallest
        # (doc_id, unit_no) IN THIS BATCH — the same rule the global
        # winner pass applies. First-in-table-order is NOT equivalent:
        # doc_ids are url hashes, so batch row order is not doc_id order,
        # and a combiner keeping a non-minimal occurrence would discard
        # the true global winner map-side, making the surviving
        # occurrence depend on batch composition (parallelism-unstable).
        # Arrow throughout (binary-safe — pandas `duplicated` truncates
        # at NUL bytes).
        inelig = t.filter(pc.invert(t.column("elig")))
        won = _first_per_sorted_unit(t.filter(t.column("elig")), key_col)
        return pa.concat_tables([won, inelig])

    units = ds.map_batches(explode, batch_format="pyarrow")
    return _dedup_units(units, num_parts=num_parts, join_delim=delimiter)


def in_doc_line_dedup(ds, delimiter: str = "\n", min_words: int = 1,
                      id_col: str = "doc_id", text_col: str = "text"):
    """IN-document exact line deduplication (the RefinedWeb/MassiveText
    in-doc repetition rule): within EACH document, a line with >=
    ``min_words`` words survives only at its first occurrence; shorter
    lines are always kept; documents are reassembled in original line
    order. Returns (doc_id, text, n_units).

    Scale shape: ZERO shuffle — the dedup scope is a single document, which
    never straddles a batch, so the whole operator is one ``map_batches``
    kernel: Arrow split/explode, one binary-safe group-by for the
    first-occurrence mask, numpy-boundary reassembly. The corpus-wide
    complement is ``line_dedup``. No reference analog (SURVEY.md §2.8)."""
    import pyarrow.compute as pc

    def kernel(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(batch.column(text_col), delimiter)
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        n = len(flat)
        row_no = pa.array(np.arange(n, dtype=np.int64))
        wc = pc.count_substring_regex(flat, "[^ ]+")
        elig = pc.greater_equal(wc, min_words).combine_chunks() \
            if isinstance(wc, pa.ChunkedArray) \
            else pc.greater_equal(wc, min_words)
        # first occurrence per (document, line): Arrow group-by keyed on
        # the in-batch parent row index + the line string (binary-safe)
        firsts = (pa.table({"p": pa.array(parent, pa.int64()),
                            "unit": flat, "_i": row_no})
                  .group_by(["p", "unit"]).aggregate([("_i", "min")])
                  .column("_i_min"))
        keep_mask = pc.or_(pc.invert(elig),
                           pc.is_in(row_no,
                                    value_set=firsts.combine_chunks()))
        keep = keep_mask.to_numpy(zero_copy_only=False)
        lines = flat.to_pylist()
        n_docs = batch.num_rows
        # per-doc reassembly via exploded-row boundaries (rows are in
        # (doc, line_no) order by construction)
        bounds = np.searchsorted(parent, np.arange(n_docs + 1))
        texts, counts = [], np.zeros(n_docs, dtype=np.int64)
        for i in range(n_docs):
            s, e = bounds[i], bounds[i + 1]
            kept = [lines[j] for j in range(s, e) if keep[j]]
            texts.append(delimiter.join(kept))
            counts[i] = len(kept)
        return pa.table({
            "doc_id": pc.cast(batch.column(id_col), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_units": pa.array(counts, pa.int64()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")


def span_dedup(ds, span_words: int = 8, id_col: str = "doc_id",
               text_col: str = "text", num_parts: Optional[int] = None):
    """Corpus-wide exact dedup of fixed-size word spans: each document's
    space-separated words are grouped into consecutive ``span_words``-word
    spans; every distinct span string survives only at its first occurrence
    ``(doc_id, span_no)``; documents are reassembled from surviving spans.
    The span variant of line_dedup for prose without newline structure
    (and the shape of span-level near-dup removal used on web corpora).
    Returns (doc_id, text, n_units)."""
    import pyarrow.compute as pc
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(batch.column(text_col), " ")
        doc_ids, pos, flat = _explode_units(batch, splits, id_col)
        df = pd.DataFrame({
            "doc_id": doc_ids,
            "span_no": pos // span_words,
            "word": flat.to_pandas(),
        })
        spans = (df.groupby(["doc_id", "span_no"], sort=False)["word"]
                 .agg(" ".join).reset_index())
        t = pa.table({
            "doc_id": pa.array(spans["doc_id"].to_numpy(), pa.int64()),
            "unit_no": pa.array(spans["span_no"].to_numpy(), pa.int64()),
            "unit": pa.array(spans["word"], pa.string()),
        })
        # in-batch combiner: per-key lexicographic (doc_id, unit_no)
        # minimum, matching the global winner rule (see line_dedup — a
        # first-in-table-order combiner is batch-composition-dependent)
        t = _first_per_sorted_unit(t)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "unit_no": t.column("unit_no"),
            "unit": t.column("unit"),
            "elig": pa.array(np.ones(t.num_rows, dtype=bool)),
        })

    units = ds.map_batches(explode, batch_format="pyarrow")
    return _dedup_units(units, num_parts=num_parts, join_delim=" ")


# odd 64-bit multipliers (golden-ratio / xxhash constants) and their exact
# modular inverses mod 2**64 — odd, so invertible; wrapping uint64 math
# makes the rolling hash exact and order-free
_ES_B1 = 0x9E3779B97F4A7C15
_ES_B2 = 0xC2B2AE3D27D4EB4F
_ES_B1_INV = pow(_ES_B1, -1, 1 << 64)
_ES_B2_INV = pow(_ES_B2, -1, 1 << 64)


def _rolling_window_hashes(cp: np.ndarray, L: int, base: int,
                           base_inv: int) -> np.ndarray:
    """64-bit polynomial hash of every length-``L`` window of the uint64
    code-point array ``cp``: h[g] = sum_j cp[g+j] * base_inv**j (wrapping
    uint64 arithmetic). Equal windows hash equal; three O(n) vectorized
    scans (two power accumulates + one prefix sum), no per-window loop."""
    n = len(cp)
    m = n - L + 1
    if m <= 0:
        return np.empty(0, np.uint64)
    powi = np.full(n, np.uint64(base_inv), np.uint64)
    powi[0] = np.uint64(1)
    np.multiply.accumulate(powi, out=powi)          # base_inv ** i
    poww = np.full(m, np.uint64(base), np.uint64)
    poww[0] = np.uint64(1)
    np.multiply.accumulate(poww, out=poww)          # base ** g
    s = np.zeros(n + 1, np.uint64)
    np.cumsum(cp * powi, out=s[1:])                 # prefix of cp[i]/B^i
    # (S[g+L] - S[g]) * B^g  ==  sum_j cp[g+j] * B^-j
    return (s[L:L + m] - s[:m]) * poww


def _avalanche64(x: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer: decorrelate rolling-hash low bits before the
    ``% num_parts`` routing (the hash VALUES stay the grouping key; this
    only spreads partition assignment)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x.view(np.int64)


_ES_POS_SCHEMA = pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                            ("doc_id", pa.int64()), ("pos", pa.int64())])


def exactsubstr_dedup(ds, min_len: int = 50, id_col: str = "doc_id",
                      text_col: str = "text",
                      num_parts: Optional[int] = None):
    """ExactSubstr deduplication (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): every length-``min_len`` CHARACTER
    window that occurs more than once corpus-wide is removed from every
    occurrence except the lexicographically first ``(doc_id, pos)``;
    overlapping removed windows merge into spans, and each document is
    re-emitted with its duplicated spans cut out. Documents shorter than
    ``min_len`` pass through; a document whose whole text is duplicated
    disappears. Returns (doc_id, text, n_removed) with ``n_removed`` =
    characters cut.

    Distributed shape (the suffix-array build of the paper re-expressed as
    two exchanges): (1) a map pass emits one (h1, h2, doc_id, pos) row per
    window start — the two independent 64-bit rolling polynomial hashes
    make a 128-bit window key, computed for a whole batch in a handful of
    vectorized scans over the concatenated code-point array (utf-32 view,
    so positions are exact CHARACTER offsets matching SQL substr). The
    rows ride ONE h1-routed exchange; each partition sorts by (h1, h2,
    doc_id, pos) and emits every row that is not its group's first —
    that IS the "duplicated, and not the kept occurrence" set, with hot
    windows costing O(occurrences log) locally, never O(occurrences^2).
    (2) marked (doc_id, pos) rows and the documents tag-union through one
    doc_id exchange (marks are dup-proportional; each doc's text moves
    once); the partition kernel merges each doc's constant-width intervals
    vectorized and slices the text. Index volume is one 32-byte row per
    character — the same ~10-30x-corpus working set the paper's suffix
    array pays, but streamed through the exchange instead of held as one
    array, so it spills instead of OOMing. 128-bit window keys make a
    false merge a ~2^-128-per-pair event (same pragmatics as the repo's
    digest-keyed exact dedup). No reference analog (SURVEY.md §2.8)."""
    import pyarrow.compute as pc

    P = num_parts or default_num_parts()
    L = int(min_len)

    def emit(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        blob = "".join(texts)
        cp = np.frombuffer(blob.encode("utf-32-le"), np.uint32) \
            .astype(np.uint64)
        n = len(cp)
        if n < L:
            return _ES_POS_SCHEMA.empty_table()
        lens = np.fromiter((len(t) for t in texts), np.int64,
                           count=len(texts))
        ends = np.cumsum(lens)
        starts = ends - lens
        h1 = _rolling_window_hashes(cp, L, _ES_B1, _ES_B1_INV)
        h2 = _rolling_window_hashes(cp, L, _ES_B2, _ES_B2_INV)
        g = np.arange(len(h1), dtype=np.int64)
        di = np.searchsorted(ends, g, side="right")
        valid = g + L <= ends[di]          # window stays inside its doc
        g, di = g[valid], di[valid]
        return pa.table({
            "h1": pa.array(h1[valid].view(np.int64), pa.int64()),
            "h2": pa.array(h2[valid].view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[di], pa.int64()),
            "pos": pa.array(g - starts[di], pa.int64()),
        })

    def route(batch: pa.Table):
        return [_avalanche64(
            batch.column("h1").to_numpy(zero_copy_only=False))]

    def mark_kernel(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=[
            ("h1", "ascending"), ("h2", "ascending"),
            ("doc_id", "ascending"), ("pos", "ascending")])
        srt = tbl.take(idx)
        a1 = srt.column("h1").to_numpy(zero_copy_only=False)
        a2 = srt.column("h2").to_numpy(zero_copy_only=False)
        loser = np.zeros(len(a1), bool)
        loser[1:] = (a1[1:] == a1[:-1]) & (a2[1:] == a2[:-1])
        return srt.filter(pa.array(loser)).select(["doc_id", "pos"])

    positions = ds.map_batches(emit, batch_format="pyarrow")
    parted = add_hash_partition(positions, ["h1"], P, key_arrays_fn=route)
    marks = parted.groupby("part").map_groups(mark_kernel,
                                              batch_format="pyarrow")

    # tag-union: doc rows carry pos = -1 (a mark pos is always >= 0)
    def doc_rows(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        return pa.table({
            "doc_id": batch.column(id_col).cast(pa.int64()),
            "pos": pa.array(np.full(nrows, -1, np.int64), pa.int64()),
            "text": batch.column(text_col).cast(pa.string()),
        })

    def mark_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "pos": t.column("pos"),
            "text": pa.nulls(t.num_rows, pa.string()),
        })

    both = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        marks.map_batches(mark_rows, batch_format="pyarrow"))
    parted2 = add_hash_partition(both, ["doc_id"], P)

    def cut_kernel(tbl: pa.Table) -> pa.Table:
        is_doc = pc.equal(tbl.column("pos"), -1)
        docs = tbl.filter(is_doc)
        mk = tbl.filter(pc.invert(is_doc))
        ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
        texts = docs.column("text").to_pylist()
        if mk.num_rows:
            mid = mk.column("doc_id").to_numpy(zero_copy_only=False)
            mpos = mk.column("pos").to_numpy(zero_copy_only=False)
            order = np.lexsort((mpos, mid))
            mid, mpos = mid[order], mpos[order]
        else:
            mid = mpos = np.empty(0, np.int64)
        lo = np.searchsorted(mid, ids, side="left")
        hi = np.searchsorted(mid, ids, side="right")
        out_id: list = []
        out_txt: list = []
        out_rm: list = []
        for j in range(len(ids)):
            txt = texts[j]
            if lo[j] == hi[j]:
                out_id.append(int(ids[j]))
                out_txt.append(txt)
                out_rm.append(0)
                continue
            ps = mpos[lo[j]:hi[j]]
            es = ps + L                       # ascending (constant width)
            starts_i = np.flatnonzero(
                np.concatenate(([True], ps[1:] > es[:-1])))
            ends_i = np.concatenate((starts_i[1:], [len(ps)])) - 1
            kept = []
            prev = 0
            for a, b in zip(ps[starts_i], es[ends_i]):
                if a > prev:
                    kept.append(txt[prev:a])
                prev = b
            if prev < len(txt):
                kept.append(txt[prev:])
            new = "".join(kept)
            if new:
                out_id.append(int(ids[j]))
                out_txt.append(new)
                out_rm.append(len(txt) - len(new))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_txt, pa.string()),
            "n_removed": pa.array(out_rm, pa.int64()),
        })

    return parted2.groupby("part").map_groups(cut_kernel,
                                              batch_format="pyarrow")


def bench_kgrams(bench_rows: Sequence[Tuple[int, str]],
                 k: int = 4) -> List[Tuple[str, List[int]]]:
    """All word k-grams of the benchmark docs as (gram, owner_ids),
    distinct grams with their owning doc ids (an owner's own grams must
    not disqualify the owner)."""
    owners: dict = {}
    for doc_id, text in bench_rows:
        words = [w for w in text.split(" ") if w != ""]
        for i in range(len(words) - k + 1):
            g = " ".join(words[i:i + k])
            owners.setdefault(g, set()).add(doc_id)
    return [(g, sorted(s)) for g, s in owners.items()]


class DecontSubstrStage:
    """Map-side exact-substring decontamination against a broadcast
    gram state (``ray.put`` once, fetched once per worker process via
    TaskStage's instance cache — the gram list is never pickled per
    task). See :func:`decontaminate` for the prefilter contract."""

    def __init__(self, state_ref, kin: int, id_col: str = "doc_id",
                 out_cols: Optional[tuple] = None):
        import ray
        st = ray.get(state_ref)
        self.grams = st["grams"]
        self.iu, self.bloom = st["iu"], st["bloom"]
        self.mbits, self.gmap = st["mbits"], st["gmap"]
        self.kin, self.id_col, self.out_cols = kin, id_col, out_cols

    def _suspects(self, batch: pa.Table) -> dict:
        """row index -> candidate gram indices: the grams whose interior
        word-gram appears word-aligned in that row — a sound superset of
        the row's actual substring matches, so the exact check only ever
        tests candidate grams against candidate rows."""
        import pyarrow.compute as pc
        kin = self.kin
        splits = pc.split_pattern(batch.column("text"), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        keep_w = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep_w)), parent[keep_w]
        out: dict = {}
        if len(parent) >= kin:
            gh = _gram_hashes(_hash_word_array(flat), kin)
            valid = parent[:len(gh)] == parent[kin - 1:kin - 1 + len(gh)]
            gh, gp = gh[valid], parent[:len(valid)][valid]
            cand = np.ones(len(gh), dtype=bool)
            for idx in _bloom_probes(gh, self.mbits):
                cand &= (self.bloom[(idx >> np.uint64(3)).astype(np.int64)]
                         >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
            gh, gp = gh[cand], gp[cand]
            if len(gh):
                pos = np.searchsorted(self.iu, gh)
                pos_c = np.minimum(pos, len(self.iu) - 1)
                okm = self.iu[pos_c] == gh
                for h, p in zip(gh[okm].tolist(), gp[okm].tolist()):
                    out.setdefault(p, set()).update(self.gmap[h])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        cand = self._suspects(batch)
        if cand:
            ids = batch.column(self.id_col).to_numpy(
                zero_copy_only=False)
            rows = sorted(cand)
            texts = batch.column("text").take(
                pa.array(rows, pa.int64())).to_pylist()
            drop_rows = []
            for r, txt in zip(rows, texts):
                if txt is None:
                    continue
                did = ids[r]
                for gi in cand[r]:
                    g, own = self.grams[gi]
                    if g in txt and (len(own) > 1 or own[0] != did):
                        drop_rows.append(r)
                        break
            if drop_rows:
                m = np.ones(batch.num_rows, dtype=bool)
                m[drop_rows] = False
                out = batch.filter(pa.array(m))
        return out.select(list(self.out_cols)) if self.out_cols else out


def decontaminate(ds, bench_rows: Sequence[Tuple[int, str]], k: int = 4,
                  id_col: str = "doc_id",
                  out_cols: Optional[List[str]] = None):
    """Drop documents whose text contains any word k-gram of a benchmark
    document OTHER than itself (eval-leakage removal, the n-gram-overlap
    rule used by web-corpus pipelines; matching is plain substring search,
    byte-exact with SQL ``instr`` — a production rule would additionally
    anchor word boundaries).

    ``bench_rows``: (doc_id, text) of the benchmark set — small by
    construction; its gram state is computed once on the driver,
    ``ray.put`` once, and fetched once per worker process.

    Cost shape: a per-gram substring pass over every row would be
    O(grams x corpus bytes). Instead a SOUND vectorized prefilter marks
    suspicious rows first: a substring occurrence of "w1 .. wk" contains
    literal spaces around its interior words, so the target must contain
    the gram's interior (k-2)-gram WORD-ALIGNED — testable with the
    hashed word-gram membership machinery of ``decontaminate_grams``
    (O(batch words), gram-count independent). The exact per-gram
    substring + ownership check then runs only per (suspect row,
    candidate gram) pair; clean rows (the overwhelming majority of a
    real corpus) never enter it. Byte-identical to the naive loop (the
    prefilter is a superset; the drop rule is re-derived exactly on the
    suspects). k <= 2 has no interior word, so it falls back to the
    full per-gram loop."""
    import pyarrow.compute as pc

    import ray

    from .shuffle import TaskStage

    grams = bench_kgrams(bench_rows, k)
    kin = k - 2
    if grams and kin >= 1:
        ih = np.array([
            _gram_hashes(_hash_word_array(g.split(" ")[1:k - 1]), kin)[0]
            for g, _ in grams], np.uint64)
        iu = np.unique(ih)
        mbits = 1 << max(6, int(np.ceil(np.log2(len(iu) * 16))))
        bloom = np.zeros(mbits >> 3, np.uint8)
        for idx in _bloom_probes(iu, mbits):
            np.bitwise_or.at(
                bloom, (idx >> np.uint64(3)).astype(np.int64),
                np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        gmap: dict = {}
        for gi, h in enumerate(ih.tolist()):
            gmap.setdefault(h, []).append(gi)
        ref = ray.put({"grams": grams, "iu": iu, "bloom": bloom,
                       "mbits": mbits, "gmap": gmap})
        return ds.map_batches(
            TaskStage(DecontSubstrStage, state_ref=ref, kin=kin,
                      id_col=id_col,
                      out_cols=tuple(out_cols) if out_cols else None),
            batch_format="pyarrow")

    def keep(batch: pa.Table) -> pa.Table:
        # k <= 2 (no interior word to prefilter on) or empty benchmark:
        # the full per-gram vectorized substring loop (small-k rarity)
        out = batch
        if grams:
            text = batch.column("text")
            bids = batch.column(id_col)
            drop = None
            for g, gram_owners in grams:
                m = pc.match_substring(text, g)
                if len(gram_owners) == 1:
                    m = pc.and_(m, pc.not_equal(bids, gram_owners[0]))
                drop = m if drop is None else pc.or_(drop, m)
            out = batch.filter(pc.invert(drop))
        return out.select(out_cols) if out_cols else out

    return ds.map_batches(keep, batch_format="pyarrow")


def doc_freq_topk(ds, k: int = 100, text_col: str = "text",
                  id_col: str = "doc_id", num_parts: Optional[int] = None):
    """Top-k words by DOCUMENT frequency (number of documents containing
    the word at least once) — the IDF building block beside ``vocab_topk``'s
    term frequency. Order: df DESC, word ASC.

    Scale shape: identical to vocab_topk except the per-batch combiner
    emits each (doc, word) pair once (per-row unique before counting), so
    the exchange still moves only per-batch distinct vocabulary rows."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    def partial_df(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"row": parent, "word": flat.to_pandas()})
        df = df[df["word"] != ""].drop_duplicates(["row", "word"])
        vc = df["word"].value_counts()
        return pa.table({
            "word": pa.array(vc.index, pa.string()),
            "n": pa.array(vc.to_numpy(), pa.int64()),
        })

    rows = ds.map_batches(partial_df, batch_format="pyarrow")
    counts = partitioned_group_agg(rows, ["word"], [("n", "sum", "df")],
                                   num_parts=num_parts,
                                   key_arrays_fn=_word_hash_keys)

    def local_topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pdf.sort_values(["df", "word"],
                               ascending=[False, True]).head(k)

    cands = counts.map_batches(local_topk, batch_format="pandas").to_pandas()
    top = (cands.sort_values(["df", "word"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return rd.from_pandas(top)


_GRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash_word_array(arr) -> np.ndarray:
    """uint64 xxhash per word (polars, fixed seed — identical on the
    driver's bench side and in worker kernels)."""
    import polars as pl
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(list(arr), pa.string())
    return pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)


def _gram_hashes(wh: np.ndarray, k: int) -> np.ndarray:
    """Order-sensitive combine of k consecutive word hashes into one gram
    hash — vectorized over the whole flat word array; callers mask out
    positions that cross document boundaries."""
    n = len(wh) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    h = wh[:n].copy()
    for j in range(1, k):
        h = h * _GRAM_MIX ^ wh[j:j + n]
    return h


def bench_gram_state(bench_rows: Sequence[Tuple[int, str]], k: int = 4,
                     bits_per_gram: int = 16) -> dict:
    """Broadcast state for ``decontaminate_grams``: sorted uint64 gram
    hashes, per-gram owner (-1 when owned by more than one benchmark doc
    — those disqualify everyone), and a bloom bitmap sized at
    ``bits_per_gram`` bits per distinct gram (2 probes, ~1% fpp at 16
    bits — false positives only cost a binary-search confirm)."""
    hs, owners = [], []
    for doc_id, text in bench_rows:
        words = [w for w in text.split(" ") if w != ""]
        if len(words) < k:
            continue
        gh = _gram_hashes(_hash_word_array(words), k)
        hs.append(gh)
        owners.append(np.full(len(gh), doc_id, np.int64))
    if not hs:
        return {"h": np.empty(0, np.uint64), "owner": np.empty(0, np.int64),
                "bloom": np.zeros(8, np.uint8), "mbits": 64}
    h = np.concatenate(hs)
    o = np.concatenate(owners)
    order = np.lexsort((o, h))
    h, o = h[order], o[order]
    uniq, start = np.unique(h, return_index=True)
    end = np.append(start[1:], len(h))
    owner = o[start].copy()
    owner[o[end - 1] != o[start]] = -1  # >1 distinct owner
    mbits = 1 << max(6, int(np.ceil(np.log2(len(uniq) * bits_per_gram))))
    bloom = np.zeros(mbits >> 3, np.uint8)
    for idx in _bloom_probes(uniq, mbits):
        np.bitwise_or.at(bloom, idx >> np.uint64(3),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return {"h": uniq, "owner": owner, "bloom": bloom, "mbits": mbits}


def _bloom_probes(h: np.ndarray, mbits: int):
    m = np.uint64(mbits - 1)
    yield h & m
    yield ((h >> np.uint64(32)) ^ (h * np.uint64(0xFF51AFD7ED558CCD))) & m


class DecontGramStage:
    """Map-side word-aligned k-gram decontamination against a broadcast
    benchmark gram state (``ray.put`` once, fetched once per worker
    process via TaskStage's instance cache)."""

    def __init__(self, state_ref, k: int, id_col: str = "doc_id",
                 out_cols: Optional[tuple] = None):
        import ray
        st = ray.get(state_ref)
        self.h, self.owner = st["h"], st["owner"]
        self.bloom, self.mbits = st["bloom"], st["mbits"]
        self.k, self.id_col, self.out_cols = k, id_col, out_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        k = self.k
        splits = pc.split_pattern(batch.column("text"), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        keep_w = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep_w)), parent[keep_w]
        drop = np.zeros(batch.num_rows, dtype=bool)
        if len(parent) >= k and len(self.h):
            gh = _gram_hashes(_hash_word_array(flat), k)
            valid = parent[:len(gh)] == parent[k - 1:k - 1 + len(gh)]
            gh, gp = gh[valid], parent[:len(valid)][valid]
            # bloom pre-filter: ~10-16 bits touched per gram instead of an
            # 8-byte binary search — the searchsorted below only sees hits
            cand = np.ones(len(gh), dtype=bool)
            for idx in _bloom_probes(gh, self.mbits):
                cand &= (self.bloom[(idx >> np.uint64(3)).astype(np.int64)]
                         >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
            gh, gp = gh[cand], gp[cand]
            if len(gh):
                pos = np.searchsorted(self.h, gh)
                pos_c = np.minimum(pos, len(self.h) - 1)
                hit = self.h[pos_c] == gh
                own = self.owner[pos_c[hit]]
                rows = gp[hit]
                ids = batch.column(self.id_col).to_numpy(
                    zero_copy_only=False)[rows]
                bad = rows[(own == -1) | (own != ids)]
                drop[bad] = True
        out = batch.filter(pa.array(~drop))
        return out.select(list(self.out_cols)) if self.out_cols else out


def decontaminate_grams(ds, bench_rows: Sequence[Tuple[int, str]],
                        k: int = 4, id_col: str = "doc_id",
                        out_cols: Optional[List[str]] = None):
    """Scale path of ``decontaminate``: WORD-ALIGNED k-gram overlap (the
    published eval-leakage rule — GPT-3/Gopher-style n-gram
    decontamination matches token-aligned grams, not raw substrings).

    Where ``decontaminate`` runs one vectorized substring pass per bench
    gram (O(|grams| x batch bytes) — right shape for a few thousand
    grams), this extracts each document's own k-grams vectorized (flat
    word array + boundary masks, the span_dedup machinery), hashes them,
    and tests membership against a broadcast state: a bloom bitmap
    (~2 bytes/gram) prefilters, a sorted-hash binary search confirms, and
    a per-gram owner array applies the own-document exclusion without any
    per-doc Python loop. Cost is O(batch words) regardless of benchmark
    size; the broadcast is ~10 bytes per DISTINCT bench gram (10^8 grams
    = ~1 GB state, fetched once per worker — beyond that, exchange both
    sides by gram hash instead of broadcasting).

    Matching is exact (64-bit gram hashes; collisions ~n^2/2^65 — the
    same accepted-risk class as the md5 digests in exact_dedup).
    Drop rule matches ``decontaminate``: a doc is dropped iff it shares a
    gram owned by any OTHER benchmark doc (multi-owner grams drop their
    owners too).
    """
    import ray

    from .shuffle import TaskStage

    ref = ray.put(bench_gram_state(bench_rows, k))
    return ds.map_batches(
        TaskStage(DecontGramStage, state_ref=ref, k=k, id_col=id_col,
                  out_cols=tuple(out_cols) if out_cols else None),
        batch_format="pyarrow")


def mixture_thresholds(counts: dict, targets: dict) -> dict:
    """Per-group md5-prefix keep-thresholds that rebalance group sizes to
    the ``targets`` mixture: T = min_g(n_g / w_g) is the largest feasible
    sampled-corpus size, rate_g = w_g * T / n_g, and the threshold is the
    8-hex-char string floor(rate * 16^8) ('g' = keep-all when rate >= 1,
    since 'g' sorts above every hex digit). The float expressions mirror
    the SQL oracle term-for-term so both engines compute bit-identical
    doubles."""
    present = [g for g in targets if counts.get(g)]
    if not present:
        return {}
    T = min(counts[g] / targets[g] for g in present)
    out = {}
    for g in present:
        rate = targets[g] * T / counts[g]
        out[g] = "g" if rate >= 1 else format(int(rate * 16**8), "08x")
    return out


def mixture_sample(ds, targets: dict, group_col: str = "lang",
                   text_col: str = "text", id_col: str = "doc_id",
                   num_parts: Optional[int] = None):
    """Downsample groups so the kept corpus matches a target mixture
    (e.g. rebalance languages to 40/30/30) — the data-dependent companion
    to ``stratified_sample``'s fixed rates.

    Pass 1 counts groups (per-batch value_counts combiner -> one tiny
    group-keyed exchange -> driver folds #groups rows). The driver turns
    counts into per-group hex thresholds (``mixture_thresholds``): the
    group with the scarcest supply relative to its target keeps ~100%,
    everything else is thinned proportionally; groups absent from
    ``targets`` are dropped. Pass 2 is the same zero-shuffle map-side
    md5-prefix filter as stratified_sample, so the kept set is
    reproducible on any engine that computes md5 (expected group sizes
    are w_g * T with binomial noise; exact-count carving would need a
    per-group rank, i.e. one more exchange).

    Returns (id, group, digest) rows.
    """
    import pyarrow.compute as pc

    def group_keys(batch: pa.Table):
        import polars as pl
        h = pl.from_arrow(batch.column(group_col)).hash(seed=0)
        return [h.to_numpy().view(np.int64)]

    counts_df = partitioned_group_agg(
        ds.map_batches(lambda t: t.select([group_col]),
                       batch_format="pyarrow"),
        [group_col], [(None, "count", "n")], num_parts=num_parts,
        key_arrays_fn=group_keys).to_pandas()
    counts = dict(zip(counts_df[group_col], counts_df["n"]))
    thresholds = mixture_thresholds(counts, targets)

    def sample(batch: pa.Table) -> pa.Table:
        t = digest_batch(batch, text_col)
        grp = t.column(group_col)
        pref = pc.utf8_slice_codeunits(t.column("digest"), 0, 8)
        keep = pa.array(np.zeros(t.num_rows, dtype=bool))
        for g, th in thresholds.items():
            keep = pc.if_else(pc.equal(grp, g), pc.less(pref, th), keep)
        return t.filter(keep).select([id_col, group_col, "digest"])

    return ds.map_batches(sample, batch_format="pyarrow")


class _UnigramScoreStage:
    """Per-batch unigram-LM scoring against a broadcast (word-hash ->
    micro-nat logprob) table: split, hash, binary-search, segment-sum —
    no Python loop over tokens."""

    def __init__(self, state_ref, text_col: str, id_col: str):
        import ray
        st = ray.get(state_ref)
        self.h, self.lp, self.lp_oov = st["h"], st["lp"], st["lp_oov"]
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        splits = pc.split_pattern(batch.column(self.text_col), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        n_rows = batch.num_rows
        if len(parent) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "logprob_micro": pa.array([], pa.int64())})
        wh = _hash_word_array(flat)
        lp = np.full(len(wh), self.lp_oov, dtype=np.float64)
        if len(self.h):
            pos = np.searchsorted(self.h, wh)
            pos_c = np.minimum(pos, len(self.h) - 1)
            hit = self.h[pos_c] == wh
            lp[hit] = self.lp[pos_c[hit]]
        # float64 sums of micro-nat ints stay exact far below 2^53
        sums = np.bincount(parent, weights=lp, minlength=n_rows)
        toks = np.bincount(parent, minlength=n_rows)
        nz = toks > 0  # docs with no tokens have no LM score (match SQL)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[nz], pa.int64()),
            "n_tokens": pa.array(toks[nz].astype(np.int64), pa.int64()),
            "logprob_micro": pa.array(sums[nz].astype(np.int64),
                                      pa.int64()),
        })


def unigram_logprob(ds, top_n: int = 50000, text_col: str = "text",
                    id_col: str = "doc_id", oov_count: float = 0.5,
                    num_parts: Optional[int] = None):
    """Per-document unigram language-model score — the corpus-side half
    of perplexity filtering (drop documents whose own-corpus perplexity
    is extreme; CCNet/Gopher-style quality signal).

    Pass 1 trains the LM: distinct-word counts via the vocab_topk
    exchange, materialized once (the model IS the vocabulary — far
    smaller than the corpus); the top ``top_n`` words (count DESC, word
    ASC tiebreak) get probability n/total, everything else the OOV mass
    ``oov_count/total``. Pass 2 scores: the (sorted word-hash ->
    logprob) table is broadcast via ``ray.put`` and every batch is
    split/hashed/binary-searched/segment-summed — no token-level Python.

    Log-probs are quantized to integer MICRO-NATS (round(ln(p) * 1e6))
    before summing, so per-document sums are order-independent exact
    integers and the output is oracle-comparable: the SQL oracle
    computes round(ln(n/total)*1e6) over the same doubles. Returns
    (doc_id, n_tokens, logprob_micro); perplexity =
    exp(-logprob_micro / 1e6 / n_tokens). Docs with zero tokens emit no
    row (SQL group-by semantics).

    ``ds`` is executed twice (train + score) — pass a re-readable
    Dataset (parquet read) or materialize upstream.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from .shuffle import TaskStage

    def partial_counts(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(batch.column(text_col), " "))
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    counts = partitioned_group_agg(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        ["word"], [("n", "sum", "n")], num_parts=num_parts,
        key_arrays_fn=_word_hash_keys).materialize()

    total = counts.sum("n") or 0
    if total == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "logprob_micro": pa.array([], pa.int64())}))

    def local_topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pdf.sort_values(["n", "word"],
                               ascending=[False, True]).head(top_n)

    top = (counts.map_batches(local_topk, batch_format="pandas")
           .to_pandas().sort_values(["n", "word"],
                                    ascending=[False, True])
           .head(top_n).reset_index(drop=True))

    wh = _hash_word_array(pa.array(top["word"].tolist(), pa.string()))
    lp = np.round(np.log(top["n"].to_numpy(np.float64) / float(total))
                  * 1e6).astype(np.int64)
    order = np.argsort(wh, kind="stable")
    state = {
        "h": wh[order], "lp": lp[order],
        "lp_oov": np.int64(round(
            float(np.log(oov_count / float(total))) * 1e6)),
    }
    ref = ray.put(state)
    return ds.map_batches(
        TaskStage(_UnigramScoreStage, state_ref=ref, text_col=text_col,
                  id_col=id_col),
        batch_format="pyarrow")


class _BigramScoreStage:
    """Per-batch stupid-backoff bigram scoring against broadcast sorted
    (hash -> micro-nat) tables: split, hash, one adjacent-pair hash
    combine, two binary searches, segment-sum — no token-level Python."""

    def __init__(self, state_ref, text_col: str, id_col: str):
        import ray
        st = ray.get(state_ref)
        self.uh, self.lp_first, self.lp_back = (st["uh"], st["lp_first"],
                                                st["lp_back"])
        self.bh, self.lp_bi = st["bh"], st["lp_bi"]
        self.lp_oov_first = st["lp_oov_first"]
        self.lp_oov_back = st["lp_oov_back"]
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def _lookup(sorted_h: np.ndarray, vals: np.ndarray,
                h: np.ndarray):
        """(hit_mask, value_at_hit) for each h against the sorted table."""
        if len(sorted_h) == 0 or len(h) == 0:
            return np.zeros(len(h), bool), np.zeros(len(h), np.int64)
        pos = np.searchsorted(sorted_h, h)
        pos_c = np.minimum(pos, len(sorted_h) - 1)
        hit = sorted_h[pos_c] == h
        return hit, vals[pos_c]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "logprob_micro": pa.array([], pa.int64())})
        splits = pc.split_pattern(batch.column(self.text_col), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        n_rows, n = batch.num_rows, len(parent)
        if n == 0:
            return empty
        wh = _hash_word_array(flat)
        uni_hit, uni_val_first = self._lookup(self.uh, self.lp_first, wh)
        _, uni_val_back = self._lookup(self.uh, self.lp_back, wh)
        # token i (i>=1, same doc as i-1) is conditioned on token i-1
        first = np.ones(n, bool)
        first[1:] = parent[1:] != parent[:-1]
        lp = np.where(uni_hit, uni_val_back,
                      self.lp_oov_back).astype(np.float64)
        lp[first] = np.where(uni_hit[first], uni_val_first[first],
                             self.lp_oov_first)
        if n > 1:
            gh = _gram_hashes(wh, 2)          # pair (i, i+1) at index i
            bi_hit, bi_val = self._lookup(self.bh, self.lp_bi, gh)
            tgt = ~first
            tgt_idx = np.nonzero(tgt)[0]
            hit_here = bi_hit[tgt_idx - 1]
            lp[tgt_idx[hit_here]] = bi_val[tgt_idx - 1][hit_here]
        sums = np.bincount(parent, weights=lp, minlength=n_rows)
        toks = np.bincount(parent, minlength=n_rows)
        nz = toks > 0
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[nz], pa.int64()),
            "n_tokens": pa.array(toks[nz].astype(np.int64), pa.int64()),
            "logprob_micro": pa.array(sums[nz].astype(np.int64),
                                      pa.int64()),
        })


def bigram_logprob(ds, top_uni: int = 50000, top_bi: int = 100000,
                   alpha: float = 0.4, oov_count: float = 0.5,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_parts: Optional[int] = None):
    """Per-document bigram language-model score with STUPID BACKOFF —
    the next quality-filter rung above ``unigram_logprob`` (CCNet trains
    a KenLM n-gram model; stupid backoff is the web-scale variant from
    Brants et al. 2007, "Large Language Models in Machine Translation"):

        S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})   if bigram known
                         = alpha * S_uni(w_i)            otherwise
        S_uni(w) = c(w)/total if w in vocab else oov_count/total
        first token of a document scores S_uni without the alpha penalty

    Pass 1 trains in ONE corpus scan: per-batch value_counts of both
    unigrams and adjacent-pair bigram strings ("w1 w2" — unigrams never
    contain a space, so one gram key space holds both kinds) ride ONE
    gram-hash exchange; the model is then pruned exactly as a production
    backoff LM is shipped — the ``top_uni`` unigrams and the ``top_bi``
    bigrams whose left word stayed in vocab (count DESC, gram ASC
    tiebreaks), selected by per-partition local-topk combiners so the
    driver merges <= num_parts * k candidate rows. Pass 2 broadcasts the
    pruned (sorted hash -> micro-nat) tables via ``ray.put`` and scores
    every batch vectorized. Log-probs are quantized to integer
    MICRO-NATS exactly like ``unigram_logprob``, so per-document sums
    are order-free exact integers and the whole operator is
    oracle-comparable against a DuckDB window-SQL mirror. Returns
    (doc_id, n_tokens, logprob_micro).

    ``ds`` is executed twice (train + score) — pass a re-readable
    Dataset or materialize upstream.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from .shuffle import TaskStage

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "logprob_micro": pa.array([], pa.int64())})

    def partial_counts(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parent = flat.filter(pa.array(keep)), parent[keep]
        grams, kinds, ns = [], [], []
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        grams.append(vc.field("values"))
        kinds.append(np.zeros(len(vc), np.int8))
        ns.append(pc.cast(vc.field("counts"), pa.int64()))
        if len(parent) > 1:
            adj = parent[1:] == parent[:-1]
            if adj.any():
                m = pa.array(adj)
                left = flat.slice(0, len(flat) - 1).filter(m)
                right = flat.slice(1).filter(m)
                bi = pc.binary_join_element_wise(left, right, " ")
                bvc = bi.value_counts()
                if isinstance(bvc, pa.ChunkedArray):
                    bvc = bvc.combine_chunks()
                grams.append(bvc.field("values"))
                kinds.append(np.ones(len(bvc), np.int8))
                ns.append(pc.cast(bvc.field("counts"), pa.int64()))
        return pa.table({
            "gram": pa.concat_arrays([g.combine_chunks()
                                      if isinstance(g, pa.ChunkedArray)
                                      else g for g in grams]),
            "kind": pa.array(np.concatenate(kinds), pa.int8()),
            "n": pa.concat_arrays([x.combine_chunks()
                                   if isinstance(x, pa.ChunkedArray)
                                   else x for x in ns]),
        })

    def gram_keys(batch: pa.Table):
        import polars as pl
        h = pl.from_arrow(batch.column("gram")).hash(seed=0)
        return [h.to_numpy().view(np.int64)]

    counts = partitioned_group_agg(
        ds.map_batches(partial_counts, batch_format="pyarrow"),
        ["gram", "kind"], [("n", "sum", "n")], num_parts=num_parts,
        key_arrays_fn=gram_keys).materialize()

    def uni_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), 0))

    total = (counts.map_batches(uni_only, batch_format="pyarrow")
             .sum("n") or 0)
    if total == 0:
        return rd.from_arrow(empty)

    _cand_schema0 = pa.schema([("gram", pa.string()), ("kind", pa.int8()),
                               ("n", pa.int64())])

    def local_topk_uni(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.equal(tbl.column("kind"), 0))
        if tbl.num_rows == 0:
            return _cand_schema0.empty_table()
        pdf = tbl.to_pandas().sort_values(
            ["n", "gram"], ascending=[False, True]).head(top_uni)
        return pa.Table.from_pandas(pdf, schema=_cand_schema0,
                                    preserve_index=False)

    utop = (counts.map_batches(local_topk_uni, batch_format="pyarrow")
            .to_pandas().sort_values(["n", "gram"],
                                     ascending=[False, True])
            .head(top_uni).reset_index(drop=True))
    uh_raw = _hash_word_array(pa.array(utop["gram"].tolist(), pa.string()))
    uh_set = np.sort(uh_raw)

    _cand_schema = pa.schema([("gram", pa.string()), ("kind", pa.int8()),
                              ("n", pa.int64())])

    def local_topk_bi(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.equal(tbl.column("kind"), 1))
        if tbl.num_rows == 0:
            return _cand_schema.empty_table()
        pdf = tbl.to_pandas()
        w1 = pdf["gram"].str.split(" ", n=1).str[0]
        h1 = _hash_word_array(pa.array(w1.tolist(), pa.string()))
        pos = np.searchsorted(uh_set, h1)
        pos_c = np.minimum(pos, max(len(uh_set) - 1, 0))
        in_vocab = (len(uh_set) > 0) & (uh_set[pos_c] == h1)
        pdf = pdf[in_vocab].sort_values(
            ["n", "gram"], ascending=[False, True]).head(top_bi)
        return pa.Table.from_pandas(pdf, schema=_cand_schema,
                                    preserve_index=False)

    btop = (counts.map_batches(local_topk_bi, batch_format="pyarrow")
            .to_pandas().sort_values(["n", "gram"],
                                     ascending=[False, True])
            .head(top_bi).reset_index(drop=True))

    ftotal = float(total)
    un = utop["n"].to_numpy(np.float64)
    lp_first = np.round(np.log(un / ftotal) * 1e6).astype(np.int64)
    lp_back = np.round(np.log(alpha * un / ftotal) * 1e6).astype(np.int64)
    order = np.argsort(uh_raw, kind="stable")
    uni_count = dict(zip(utop["gram"], utop["n"]))

    if len(btop):
        parts = btop["gram"].str.split(" ", n=1)
        w1 = pa.array(parts.str[0].tolist(), pa.string())
        w2 = pa.array(parts.str[1].tolist(), pa.string())
        bh_raw = (_hash_word_array(w1) * _GRAM_MIX) ^ _hash_word_array(w2)
        c1 = np.array([uni_count[g] for g in parts.str[0]], np.float64)
        lp_bi = np.round(np.log(btop["n"].to_numpy(np.float64) / c1)
                         * 1e6).astype(np.int64)
        border = np.argsort(bh_raw, kind="stable")
        bh_sorted, lp_bi_sorted = bh_raw[border], lp_bi[border]
    else:
        bh_sorted = np.empty(0, np.uint64)
        lp_bi_sorted = np.empty(0, np.int64)

    state = {
        "uh": uh_raw[order], "lp_first": lp_first[order],
        "lp_back": lp_back[order],
        "bh": bh_sorted, "lp_bi": lp_bi_sorted,
        "lp_oov_first": np.int64(round(
            float(np.log(oov_count / ftotal)) * 1e6)),
        "lp_oov_back": np.int64(round(
            float(np.log(alpha * oov_count / ftotal)) * 1e6)),
    }
    ref = ray.put(state)
    return ds.map_batches(
        TaskStage(_BigramScoreStage, state_ref=ref, text_col=text_col,
                  id_col=id_col),
        batch_format="pyarrow")


def bm25_topk(ds, query_terms: Sequence[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id"):
    """Corpus-scale BM25 retrieval: the top-k documents for a bag of
    query terms — the web-scale extension of the reference's chunk-level
    BM25 (sift ranks chunks WITHIN one document; this ranks documents
    across the corpus; cf. /root/reference sift.go:255-301 for the
    in-document analog).

    Two streaming passes, no inverted index materialized:

    1. STATS — each batch emits one row (n_docs, n_tokens, per-term
       df partials from a vectorized hash compare); a distributed tree
       aggregate folds them — driver sees a handful of integers.
    2. SCORE — per batch: split/hash once, per-term tf and doc length
       by ``np.bincount`` over the flat word array, BM25 term scores
       quantized to integer MICRO-units (round(term_score * 1e6)) so
       per-doc sums are order-independent exact ints; a per-batch local
       top-k combiner bounds the driver merge at batches x k rows (route
       the candidates through one more exchange if k x batch-count ever
       matters).

    The float expression mirrors the SQL oracle token-for-token
    (idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl)), ln/divide in
    the same order), so results are oracle-exact. Query terms must be
    distinct; docs containing none of them are not returned. Returns a
    Dataset of (doc_id, score_micro) ordered score DESC, doc_id ASC.
    """
    import math

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    terms = list(query_terms)
    th = _hash_word_array(pa.array(terms, pa.string()))

    def _flat_words(batch: pa.Table):
        splits = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = pc.list_flatten(splits)
        parent = pc.list_parent_indices(splits).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat.filter(pa.array(keep)), parent[keep]

    def stats(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_words(batch)
        wh = _hash_word_array(flat) if len(parent) else np.empty(
            0, np.uint64)
        row = {"n_docs": [batch.num_rows], "n_tokens": [len(parent)]}
        for i in range(len(terms)):
            row[f"df{i}"] = [int(len(np.unique(parent[wh == th[i]])))]
        return pa.table(row)

    agg = ds.map_batches(stats, batch_format="pyarrow").aggregate(
        Sum("n_docs"), Sum("n_tokens"),
        *[Sum(f"df{i}") for i in range(len(terms))])
    N = int(agg["sum(n_docs)"] or 0)
    toks = int(agg["sum(n_tokens)"] or 0)
    if N == 0 or toks == 0:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score_micro": pa.array([], pa.int64())}))
    dfs = [int(agg[f"sum(df{i})"] or 0) for i in range(len(terms))]
    avgdl = toks / N
    idf = [math.log((N - df + 0.5) / (df + 0.5) + 1.0) for df in dfs]

    def score(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_words(batch)
        n_rows = batch.num_rows
        out_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(parent) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "score_micro": pa.array([], pa.int64())})
        wh = _hash_word_array(flat)
        dl = np.bincount(parent, minlength=n_rows).astype(np.float64)
        total = np.zeros(n_rows, dtype=np.float64)  # exact int sums
        matched = np.zeros(n_rows, dtype=bool)
        for i in range(len(terms)):
            tf = np.bincount(parent[wh == th[i]],
                             minlength=n_rows).astype(np.float64)
            term = np.round(
                idf[i] * (tf * (k1 + 1))
                / (tf + k1 * (1 - b + b * dl / avgdl)) * 1e6)
            total += term
            matched |= tf > 0
        pdf = pd.DataFrame({"doc_id": out_ids[matched],
                            "score_micro": total[matched].astype(
                                np.int64)})
        return pa.Table.from_pandas(
            pdf.sort_values(["score_micro", "doc_id"],
                            ascending=[False, True]).head(k),
            preserve_index=False)

    # typed-empty seed: zero matching docs would otherwise yield a
    # schemaless empty dataset (Ray 2.49) and a 0-column frame
    cands = pa.concat_tables(
        [pa.schema([("doc_id", pa.int64()),
                    ("score_micro", pa.int64())]).empty_table()]
        + list(ds.map_batches(score, batch_format="pyarrow")
               .iter_batches(batch_size=1 << 18, batch_format="pyarrow"))
    ).to_pandas().sort_values(["score_micro", "doc_id"],
                              ascending=[False, True]) \
        .head(k).reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(cands,
                                              preserve_index=False))


def split_sentences(ds, text_col: str = "text"):
    """Sentence segmentation: (doc_id, sent_idx, sentence) rows, one per
    non-empty segment after splitting on terminator runs followed by
    whitespace (``[.!?]+[ \\t\\n]+`` — RE2 in pyarrow AND DuckDB, so the
    op is value-exact against regexp_split_to_array). ``sent_idx`` is
    the 1-based position among RAW segments (empties dropped after
    numbering, mirroring the SQL unnest+filter). Map-only, zero shuffle;
    the explode is vectorized (list offsets, no per-row Python)."""
    import pyarrow.compute as pc

    pat = r"[.!?]+[ \t\n]+"

    def explode(batch: pa.Table) -> pa.Table:
        # null text -> "" so list_flatten positions stay aligned with
        # the list offsets (flatten silently skips null lists)
        text = pc.coalesce(batch.column(text_col), "")
        parts = pc.split_pattern_regex(text, pat)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        # 1-based index within each document's raw segment list
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        starts = offsets[parent]
        idx = (np.arange(len(flat), dtype=np.int64) - starts + 1)
        ids = batch.column("doc_id").take(pa.array(parent))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": ids.filter(pa.array(keep)),
            "sent_idx": pa.array(idx[keep], pa.int64()),
            "sentence": flat.filter(pa.array(keep)),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def ngram_counts(ds, n: int = 3, min_count: int = 2,
                 num_parts: Optional[int] = None):
    """Corpus-wide word n-gram count table (the n-gram-LM / collocation
    building block): (gram, cnt) rows with cnt >= min_count. Words are
    lowercase alnum runs (same tokenization as the Jaccard family's SQL
    oracle). Per-batch value_counts combiner -> ONE gram-hash exchange
    of (gram, partial) rows -> partition-local sum + HAVING filter (all
    rows of a gram co-locate, so the threshold is exact)."""
    import pyarrow.compute as pc
    from .sketch import _hash64_route

    P = num_parts or default_num_parts()

    def partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.coalesce(batch.column("text"), ""))
        words = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = np.asarray(flat.to_pylist(), dtype=object)[keep]
        parent = parent[keep]
        if len(w) < n:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        # vectorized windowing: gram i spans words [i, i+n); valid when
        # the window stays within one document
        m = len(w) - n + 1
        grams = w[:m].copy()
        for j in range(1, n):
            grams = grams + " "
            grams = grams + w[j:m + j]
        valid = parent[:m] == parent[n - 1:n - 1 + m]
        vc = pa.array(grams[valid], pa.string()).value_counts()
        return pa.table({"gram": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow")

    def gram_hash(batch: pa.Table):
        return [_hash64_route(batch.column("gram")).astype(np.int64)]

    counts = partitioned_group_agg(rows, ["gram"], [("cnt", "sum", "cnt")],
                                   num_parts=P, key_arrays_fn=gram_hash)

    def having(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and "cnt" not in t.column_names:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        import pyarrow.compute as pc2
        return t.filter(pc2.greater_equal(t.column("cnt"), min_count))

    return counts.map_batches(having, batch_format="pyarrow")


class _PmiVocabJoin:
    """Map-side candidate-bigram x vocab join against a broadcast (word, c)
    table — fetched once per worker process, joined per batch with Arrow's
    in-process hash join (vectorized). Used only under the broadcast gate."""

    def __init__(self, uni_ref):
        import ray
        self.uni: pa.Table = ray.get(uni_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64())})
        t = batch.join(self.uni.rename_columns(["x", "cx"]), keys="x",
                       join_type="inner")
        t = t.join(self.uni.rename_columns(["y", "cy"]), keys="y",
                   join_type="inner")
        return t.select(["gram", "cnt", "cx", "cy"])


def pmi_topk(ds, k: int = 50, min_count: int = 5,
             num_parts: Optional[int] = None):
    """Top-k word-bigram collocations by pointwise mutual information —
    the phrase-mining / tokenizer-merge-candidate pass. PMI is quantized
    to integer micro-nats with the double arithmetic in ONE fixed
    association order, so the result is value-exact against the SQL
    oracle (same convention as unigram_logprob).

    Shape: ONE corpus scan emits per-batch value_counts partials for
    unigrams AND bigrams together (a bigram always contains a space and a
    unigram never does, so the two count tables share one gram-hash
    exchange and split apart afterwards with a vectorized substring
    filter); the candidate bigrams then pick up their two word counts
    either map-side against a broadcast vocab table (vocab small enough —
    one Arrow hash join per batch, zero extra exchanges) or through TWO
    string-key hash_joins above the gate; scoring is a map; the top-k is
    a per-batch local-topk combiner + bounded driver merge. Driver
    volume: two ints (corpus totals) + num_batches x k candidate rows
    (+ the vocab table only when it is under the broadcast gate)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import hash_join
    from .sketch import _hash64_route

    P = num_parts or default_num_parts()

    def fused_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        low = pc.utf8_lower(pc.coalesce(batch.column("text"), ""))
        words = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = np.asarray(flat.to_pylist(), dtype=object)[keep]
        parent = parent[keep]
        if len(w) == 0:
            return empty
        uvc = pa.array(w, pa.string()).value_counts()
        tables = [pa.table({"gram": uvc.field("values"),
                            "cnt": pc.cast(uvc.field("counts"),
                                           pa.int64())})]
        if len(w) >= 2:
            m = len(w) - 1
            grams = w[:m] + " "
            grams = grams + w[1:m + 1]
            valid = parent[:m] == parent[1:1 + m]
            if valid.any():
                bvc = pa.array(grams[valid], pa.string()).value_counts()
                tables.append(pa.table({
                    "gram": bvc.field("values"),
                    "cnt": pc.cast(bvc.field("counts"), pa.int64())}))
        return pa.concat_tables(tables)

    def gram_hash(batch: pa.Table):
        return [_hash64_route(batch.column("gram")).astype(np.int64)]

    counts = partitioned_group_agg(
        ds.map_batches(fused_partial, batch_format="pyarrow"),
        ["gram"], [("cnt", "sum", "cnt")], num_parts=P,
        key_arrays_fn=gram_hash).materialize()

    def _is_bigram(t: pa.Table):
        return pc.match_substring(t.column("gram"), " ")

    bigrams = counts.map_batches(
        lambda t: t.filter(_is_bigram(t)), batch_format="pyarrow")
    uni = counts.map_batches(
        lambda t: t.filter(pc.invert(_is_bigram(t)))
                   .rename_columns(["word", "c"]),
        batch_format="pyarrow").materialize()

    n_w = int(uni.sum("c") or 0)
    n_b = int(bigrams.sum("cnt") or 0)
    if n_w == 0 or n_b == 0:
        return rd.from_arrow(pa.table({
            "gram": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "pmi_micro": pa.array([], pa.int64())}))

    def split_big(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "gram" not in t.column_names:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        t = t.filter(pc.greater_equal(t.column("cnt"), min_count))
        parts = pc.split_pattern(t.column("gram"), " ")
        return pa.table({"x": pc.list_element(parts, 0),
                         "y": pc.list_element(parts, 1),
                         "gram": t.column("gram"),
                         "cnt": t.column("cnt")})

    b2 = bigrams.map_batches(split_big, batch_format="pyarrow")

    def rename_uni(col):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 and "word" not in t.column_names:
                return pa.table({col: pa.array([], pa.string()),
                                 f"c{col}": pa.array([], pa.int64())})
            return t.rename_columns([col, f"c{col}"])
        return fn

    # size-gated vocab attach: below the gate the (word, c) table is
    # broadcast once (ray.put; fetched once per worker process) and each
    # candidate batch picks up cx/cy with TWO in-process Arrow hash joins —
    # zero extra exchanges. Above the gate (vocab no longer driver-safe)
    # fall back to the distributed string-key hash_joins.
    BROADCAST_VOCAB_ROWS = 2_000_000
    s, i64 = pa.string(), pa.int64()
    if uni.count() <= BROADCAST_VOCAB_ROWS:
        import ray

        from .shuffle import TaskStage
        uni_tbl = pa.concat_tables(
            [pa.table({"word": pa.array([], s), "c": pa.array([], i64)})]
            + list(uni.iter_batches(batch_size=1 << 18,
                                    batch_format="pyarrow"))).combine_chunks()
        uref = ray.put(uni_tbl)
        jy = b2.map_batches(TaskStage(_PmiVocabJoin, uni_ref=uref),
                            batch_format="pyarrow")
    else:
        jx = hash_join(b2, uni.map_batches(rename_uni("x"),
                                           batch_format="pyarrow"),
                       on="x", num_parts=P,
                       left_types={"x": s, "y": s, "gram": s, "cnt": i64},
                       right_types={"x": s, "cx": i64})
        jy = hash_join(jx, uni.map_batches(rename_uni("y"),
                                           batch_format="pyarrow"),
                       on="y", num_parts=P,
                       left_types={"y": s, "x": s, "gram": s, "cnt": i64,
                                   "cx": i64},
                       right_types={"y": s, "cy": i64})

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return pa.table({"gram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "pmi_micro": pa.array([], pa.int64())})
        cnt = t.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cx = t.column("cx").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cy = t.column("cy").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # association order mirrored EXACTLY by the SQL oracle
        num = (cnt * np.float64(n_w)) * np.float64(n_w)
        den = (np.float64(n_b) * cx) * cy
        pmi = np.round(np.log(num / den) * 1e6).astype(np.int64)
        out = pa.table({"gram": t.column("gram"),
                        "cnt": t.column("cnt"),
                        "pmi_micro": pa.array(pmi, pa.int64())})
        pdf = out.to_pandas().sort_values(
            ["pmi_micro", "gram"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    cands = (jy.map_batches(score, batch_format="pyarrow")
             .to_pandas()
             .sort_values(["pmi_micro", "gram"], ascending=[False, True])
             .head(k).reset_index(drop=True))
    return rd.from_arrow(pa.Table.from_pandas(cands, preserve_index=False))


def weighted_sample(ds, k: int = 50, weight_col: str = "n_chars",
                    id_col: str = "doc_id"):
    """Deterministic weighted sampling WITHOUT replacement (top-k of the
    Efraimidis-Spirakis A-Res order): row i gets key ln(u_i)/w_i where
    u_i in (0,1] derives from md5(id) — the k largest keys are exactly a
    weight-proportional sample, and the same rows are chosen by ANY
    engine that computes md5/ln the same way (the auditable-sample rule
    stratified_sample follows).

    u_i = (int(md5(str(id))[:13 hex], 16) + 1) / 2^52 — a 52-bit value,
    so both the integer and the division are exact in float64; the SQL
    mirror is ('0x' || substr(md5(CAST(id AS VARCHAR)),1,13))::BIGINT.
    Rows with weight <= 0 are excluded (a zero weight cannot be sampled).

    Scale shape: zero shuffle — each batch emits only its local top-k
    (combiner), the driver merges n_batches x k candidate rows. Ties
    (bit-equal keys) break by id ASC."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    TWO52 = np.float64(4503599627370496.0)  # 2^52 = 16^13

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        u = (h.astype(np.float64) + 1.0) / TWO52
        key = np.log(u) / w
        keep = w > 0
        t = pa.table({id_col: batch.column(id_col),
                      weight_col: batch.column(weight_col),
                      "key": pa.array(key, pa.float64())}).filter(
                          pa.array(keep))
        pdf = t.to_pandas().sort_values(
            ["key", id_col], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    cands = (ds.map_batches(local_topk, batch_format="pyarrow")
             .to_pandas()
             .sort_values(["key", id_col], ascending=[False, True])
             .head(k).reset_index(drop=True))
    return rd.from_arrow(pa.Table.from_pandas(
        cands[[id_col, weight_col]], preserve_index=False))


# strip-path gate for boilerplate_strip: decision tables up to this many
# template lines broadcast for an in-batch map-side strip (no exchanges)
_BROADCAST_STRIP_LIMIT = 1_000_000


def boilerplate_strip(ds, min_docs: int = 3, max_frac: float = 0.5,
                      host_col: str = "source", id_col: str = "doc_id",
                      text_col: str = "text", min_words: int = 1,
                      broadcast_hosts: int = 200_000,
                      num_parts: Optional[int] = None):
    """CCNet-style per-host boilerplate line removal: a line that appears
    in >= ``max_frac`` of a host's documents (counting each document once,
    host having >= ``min_docs`` docs) is site template chrome — nav,
    cookie banners, footers — and is stripped from EVERY document of that
    host. Lines with < ``min_words`` words are never eligible (blank
    separator lines survive). Documents are reassembled from surviving
    lines in order; a fully-boilerplate document disappears. Returns
    (doc_id, text, n_units).

    Scale shape: host totals AND per-(host, line) document frequencies
    ride ONE corpus scan and ONE exchange (kind-tagged partial rows; the
    frequency partials dedup in-doc repeats map-side, so a (host, line,
    doc) triple ships once). The decision applies map-side against
    broadcast host totals below a cardinality gate, or through a
    distributed host join above it — either way the boilerplate table is
    SMALL (only template lines pass the frequency bar) and is
    materialized once. The strip itself is a bloom-prefiltered
    distributed anti-join — the non-boilerplate majority of lines routes
    AROUND the exchange and only bloom hits pay for it (skipped entirely
    when no line qualifies); reassembly is one doc_id exchange. The
    exploded corpus is recomputed per pass instead of materialized (cheap
    map passes beat holding a corpus-sized intermediate). No reference
    analog (SURVEY.md §2.8); the rule is the public CCNet/RefinedWeb
    paragraph-dedup-per-domain recipe."""
    import pyarrow.compute as pc

    from .shuffle import hash_join

    P = num_parts or default_num_parts()
    SEP = "\x00"  # cannot occur inside a line (lines are split on \n)

    def explode(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(batch.column(text_col), "\n")
        doc_ids, pos, flat = _explode_units(batch, splits, id_col)
        parent = pc.list_parent_indices(
            splits if not isinstance(splits, pa.ChunkedArray)
            else splits.combine_chunks())
        hosts = pc.take(batch.column(host_col), parent)
        wc = pc.count_substring_regex(flat, "[^ ]+")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "unit_no": pa.array(pos, pa.int64()),
            "unit": flat,
            "host": hosts,
            "elig": pc.greater_equal(wc, min_words),
            "hl": pc.binary_join_element_wise(hosts, flat, SEP),
        })

    def lines_ds():
        return ds.map_batches(explode, batch_format="pyarrow")

    # ONE corpus pass + ONE exchange computes BOTH aggregates: kind=0
    # rows are per-(host, line) document-frequency partials (in-doc
    # repeats deduped map-side — a (host, line, doc) triple ships once);
    # kind=1 rows are per-host document-count partials (each doc lives in
    # exactly one batch, so batch-distinct (host, doc) counts sum
    # exactly). Arrow kernels throughout: pandas MULTI-column hashing
    # truncates strings at embedded NUL bytes, which would collide every
    # "hl" key sharing a host — Arrow group_by hashes full binary values.
    def stat_partials(batch: pa.Table) -> pa.Table:
        """Raw docs batch -> unified partial rows for both aggregates."""
        lines = explode(batch)
        t = lines.filter(lines.column("elig"))
        dist = (t.select(["doc_id", "hl", "host", "unit"])
                .group_by(["doc_id", "hl", "host", "unit"]).aggregate([]))
        g = (dist.group_by(["hl", "host", "unit"])
             .aggregate([([], "count_all")])
             .rename_columns(["hl", "host", "unit", "c"]))
        # one row per doc in the source batch -> per-host doc counts are
        # plain row counts (each doc contributes to exactly one batch)
        hd = (batch.select([host_col])
              .group_by([host_col]).aggregate([([], "count_all")])
              .rename_columns(["host", "c"]))
        n0, n1 = g.num_rows, hd.num_rows
        return pa.table({
            "kind": pa.array(np.concatenate([
                np.zeros(n0, np.int8), np.ones(n1, np.int8)])),
            "hl": pa.concat_arrays([
                g.column("hl").combine_chunks(),
                pa.nulls(n1, pa.string())]),
            "host": pa.concat_arrays([
                g.column("host").combine_chunks(),
                hd.column("host").combine_chunks()]),
            "unit": pa.concat_arrays([
                g.column("unit").combine_chunks(),
                pa.nulls(n1, pa.string())]),
            "c": pa.concat_arrays([
                pc.cast(g.column("c"), pa.int64()).combine_chunks(),
                pc.cast(hd.column("c"), pa.int64()).combine_chunks()]),
        })

    def stat_keys(batch: pa.Table):
        from .sketch import _hash64_any
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        hh = _hash64_any(batch.column("hl")).astype(np.int64)
        hs = _hash64_any(batch.column("host")).astype(np.int64)
        return [np.where(kind == 0, hh, hs)]

    stats = partitioned_group_agg(
        ds.map_batches(stat_partials, batch_format="pyarrow"),
        ["kind", "hl", "host", "unit"], [("c", "sum", "c")], num_parts=P,
        key_arrays_fn=stat_keys).materialize()

    totals = stats.map_batches(
        lambda t: (t.filter(pc.equal(t.column("kind"), 1))
                   .select(["host", "c"]).rename_columns(["host", "nd"])),
        batch_format="pyarrow")
    freqs = stats.map_batches(
        lambda t: (t.filter(pc.equal(t.column("kind"), 0))
                   .select(["hl", "host", "unit", "c"])
                   .rename_columns(["hl", "host", "unit", "df"])),
        batch_format="pyarrow")

    # decision: frequencies meet host totals. Size-gated strategy (the
    # shipping_priority pattern): host cardinality below the threshold ->
    # broadcast the totals dict and decide map-side (no join exchange, no
    # extra stage); above it -> distributed hash_join on host. Both paths
    # produce identical boiler tables.
    def decide_kernel(t: pa.Table, nd_arr, df_arr) -> pa.Table:
        keep = (nd_arr >= min_docs) \
            & (df_arr.astype(np.float64)
               >= np.float64(max_frac) * nd_arr.astype(np.float64))
        return t.filter(pa.array(keep)).select(["hl"])

    if totals.count() <= broadcast_hosts:
        import ray as _ray
        tt = totals.to_pandas()
        nd_ref = _ray.put(dict(zip(tt["host"], tt["nd"].astype(int))))

        def decide_bcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "df" not in t.column_names:
                return pa.table({"hl": pa.array([], pa.string())})
            lookup = _ray.get(nd_ref)
            nd = np.array([lookup.get(h, 0)
                           for h in t.column("host").to_pylist()],
                          dtype=np.int64)
            df = t.column("df").to_numpy(zero_copy_only=False)
            return decide_kernel(t, nd, df)

        boiler = freqs.map_batches(decide_bcast, batch_format="pyarrow")
    else:
        def decide(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "df" not in t.column_names:
                return pa.table({"hl": pa.array([], pa.string())})
            nd = t.column("nd").to_numpy(zero_copy_only=False)
            df = t.column("df").to_numpy(zero_copy_only=False)
            return decide_kernel(t, nd, df)

        boiler = hash_join(
            freqs, totals, on="host",
            left_types={"host": pa.string(), "hl": pa.string(),
                        "unit": pa.string(), "df": pa.int64()},
            right_types={"host": pa.string(), "nd": pa.int64()},
            num_parts=P, post=decide)

    # materialize the SMALL decision table: the anti-join's bloom build
    # and its exchange would otherwise each re-execute the whole
    # frequency pipeline (the table is template-lines-sized, never
    # corpus-sized, so holding it is safe at any scale)
    boiler = boiler.materialize()
    n_boiler = boiler.count()

    if n_boiler == 0:
        # no template lines anywhere: skip the bloom + anti-join stages
        # entirely (common on small or template-free corpora)
        survivors = lines_ds()
    elif n_boiler <= _BROADCAST_STRIP_LIMIT:
        # gated map-side strip: the decision table is template-lines-
        # sized, so broadcast the exact (host NUL line) strings and strip
        # + reassemble IN-BATCH — a document's lines never leave the
        # batch that exploded them, so neither the bloom anti-join
        # exchange nor the doc_id reassembly exchange is needed. String
        # is_in keeps the anti-join's exact semantics (no hash step).
        import pandas as pd
        import ray as _ray

        hl_arr = pa.concat_tables(
            [pa.schema([("hl", pa.string())]).empty_table()]
            + list(boiler.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow"))
        ).combine_chunks().column("hl").combine_chunks()
        hl_ref = _ray.put(hl_arr)

        def strip_map(batch: pa.Table) -> pa.Table:
            vs = _ray.get(hl_ref)
            lines = explode(batch)
            kept = lines.filter(pc.invert(
                pc.is_in(lines.column("hl"), value_set=vs)))
            df = (kept.select(["doc_id", "unit_no", "unit"]).to_pandas()
                  .sort_values(["doc_id", "unit_no"], kind="stable"))
            g = df.groupby("doc_id", sort=True)["unit"]
            out = g.agg("\n".join).reset_index().rename(
                columns={"unit": "text"})
            return pa.table({
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "n_units": pa.array(g.size().to_numpy(), pa.int64()),
            })

        return ds.map_batches(strip_map, batch_format="pyarrow")
    else:
        survivors = hash_join(
            lines_ds(), boiler, on="hl", how="anti",
            left_types={"hl": pa.string(), "doc_id": pa.int64(),
                        "unit_no": pa.int64(), "unit": pa.string()},
            right_types={"hl": pa.string()},
            num_parts=P, bloom_prefilter=1 << 20)

    return _reassemble_docs(survivors.map_batches(
        lambda t: t.select(["doc_id", "unit_no", "unit"]),
        batch_format="pyarrow"), P, "\n")


def grouped_sample(ds, group_col: str, id_col: str = "doc_id", k: int = 3):
    """Deterministic uniform sample of k rows PER GROUP (per-host spot
    checks, per-language eval carve-outs): rank rows within each group by
    the 52-bit integer prefix of md5(id) — a reproducible uniform order
    any md5-capable engine agrees on — and keep the first k. Built on
    ``grouped_topk``, so it stays exact at unbounded group cardinality
    with zero driver state. Returns the input columns + rank."""
    import hashlib

    from .relational import grouped_topk

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        return batch.append_column("sample_key", pa.array(h, pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return grouped_topk(keyed, group_col, "sample_key", id_col, k=k,
                        ascending=True)


def keywords_tfidf(ds, k: int = 5, n_docs: Optional[int] = None,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_parts: Optional[int] = None):
    """Per-document keyword extraction by corpus-IDF-weighted term
    frequency: the top-k terms of every document under
    ``score = tf * ln(N / df)`` (classic TF-IDF, natural log, raw tf) —
    the topic-labeling / search-snippet pass of a training-data corpus.

    Tokens are lowercase alnum runs (the Jaccard family's oracle
    tokenization). Scale shape: per-batch (doc, term, tf) rows via a
    vectorized pandas hash group-by; ONE term-keyed exchange computes
    each term's document frequency AND annotates the co-located rows in
    the same kernel (no separate DF join — every (doc, term) row is
    distinct, so df = rows per term in its partition); scoring is a map;
    the per-doc top-k is :func:`grouped_topk` (ONE doc-keyed exchange,
    zero driver state). ``n_docs`` (corpus size) must be supplied or is
    counted with ``ds.count()`` (metadata-only on parquet sources).

    Scores are quantized to integer MICRO-units
    (``round(tf * ln(N/df) * 1e6)`` -> ``score_micro``), the repo's
    standard cross-engine determinism convention (unigram_logprob /
    bm25_topk): last-ulp ln() differences between libms vanish in the
    rounding, so ordering and values are value-exact against the SQL
    oracle. Ordering ties break on term ASC."""
    import pandas as pd
    import pyarrow.compute as pc

    from .relational import grouped_topk
    from .shuffle import add_hash_partition
    from .sketch import _hash64_any

    P = num_parts or default_num_parts()
    if n_docs is None:
        n_docs = ds.count()
    N = float(n_docs)

    def doc_term_tf(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.coalesce(batch.column(text_col), ""))
        words = pc.split_pattern_regex(low, "[^a-z0-9]+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pdf = pd.DataFrame({
            "doc_id": ids[parent[keep]],
            "term": flat.filter(pa.array(keep)).to_pandas()})
        g = (pdf.groupby(["doc_id", "term"], sort=False)
             .size().reset_index(name="tf"))
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(g["term"], pa.string()),
            "tf": pa.array(g["tf"].to_numpy(), pa.int64())})

    rows = ds.map_batches(doc_term_tf, batch_format="pyarrow")

    def term_keys(batch: pa.Table):
        return [_hash64_any(batch.column("term")).astype(np.int64)]

    parted = add_hash_partition(rows, ["term"], P, key_arrays_fn=term_keys)

    def attach_df(tbl: pa.Table) -> pa.Table:
        pdf = tbl.drop_columns("part").to_pandas()
        if len(pdf) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "score_micro": pa.array([], pa.int64())})
        # combine per-batch partial tf rows for the same (doc, term),
        # then df = distinct docs per term among the combined rows
        pdf = (pdf.groupby(["doc_id", "term"], sort=False)["tf"]
               .sum().reset_index())
        df = pdf.groupby("term", sort=False)["term"].transform("size")
        score = np.round(pdf["tf"].to_numpy() * np.log(
            N / df.to_numpy().astype(np.float64)) * 1e6).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(pdf["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(pdf["term"], pa.string()),
            "tf": pa.array(pdf["tf"].to_numpy(), pa.int64()),
            "score_micro": pa.array(score, pa.int64())})

    scored = parted.groupby("part").map_groups(attach_df,
                                               batch_format="pyarrow")
    return grouped_topk(scored, "doc_id", "score_micro", "term", k=k,
                        num_parts=num_parts)


def group_mean_gate(ds, group_col: str, value_col: str, min_avg: int,
                    broadcast_max_groups: int = 100_000,
                    num_parts: Optional[int] = None):
    """Group-level quality gate (the CCNet/RefinedWeb host-filter shape):
    keep every row whose GROUP's mean ``value_col`` clears ``min_avg`` —
    e.g. drop all documents from hosts whose average document length is
    boilerplate-short, regardless of each document's own length.

    The decision is the INTEGER comparison ``sum(value) >= min_avg *
    count(*)`` per group (never a float mean), so it is exact and
    engine-reproducible. Scale shape: per-batch (group, sum, count)
    partials -> ONE group-keyed exchange builds the group stats table
    (group-cardinality-sized, NOT corpus-sized); if the group count is
    within ``broadcast_max_groups`` the passing-group set broadcasts via
    ``ray.put`` and the corpus never shuffles (the common case — web
    hosts are ~10^7 at 10^12 docs, a few hundred MB of keys at most, and
    the gate guards it); past the gate the corpus anti-joins the FAILING
    groups through :func:`shuffle.hash_join` (how="semi" on passing
    groups), one corpus exchange. Both paths produce identical rows
    (equality-tested)."""
    import pyarrow.compute as pc

    from .shuffle import hash_join
    from .sketch import _hash64_any

    P = num_parts or default_num_parts()

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, value_col]).group_by(group_col).aggregate(
            [(value_col, "sum"), ([], "count_all")])
        return g.rename_columns([group_col, "s", "n"])

    rows = ds.map_batches(partial, batch_format="pyarrow")

    def gkeys(batch: pa.Table):
        col = batch.column(group_col)
        if pa.types.is_integer(col.type) and col.null_count == 0:
            return [col.to_numpy(zero_copy_only=False)]
        return [_hash64_any(col).astype(np.int64)]

    stats = partitioned_group_agg(rows, [group_col],
                                  [("s", "sum", "s"), ("n", "sum", "n")],
                                  num_parts=P, key_arrays_fn=gkeys)

    def decide(t: pa.Table) -> pa.Table:
        ok = pc.greater_equal(
            t.column("s"),
            pc.multiply(t.column("n"), pa.scalar(min_avg,
                                                 t.column("n").type)))
        return t.filter(ok).select([group_col])

    passing = stats.map_batches(decide, batch_format="pyarrow")

    n_groups = passing.count()
    if n_groups <= broadcast_max_groups:
        import ray
        keep_ref = ray.put(set(
            r[group_col] for b in passing.iter_batches(
                batch_format="pyarrow") for r in b.to_pylist()))

        class GateStage:
            def __init__(self, ref):
                import ray as _r
                self.keep_vals = sorted(_r.get(ref))
                self.keep = None        # typed lazily from the first batch

            def __call__(self, t: pa.Table) -> pa.Table:
                col = t.column(group_col)
                if self.keep is None:   # empty keep-set must still be typed
                    self.keep = pa.array(self.keep_vals, type=col.type)
                mask = pc.is_in(col, value_set=self.keep)
                return t.filter(mask)

        from .shuffle import TaskStage
        return ds.map_batches(TaskStage(GateStage, ref=keep_ref),
                              batch_format="pyarrow")

    schema = dict(zip(ds.schema().names, ds.schema().types))
    return hash_join(ds, passing, on=group_col, how="semi",
                     left_types=schema,
                     right_types={group_col: schema[group_col]},
                     num_parts=P)


def _dsir_gram_buckets(texts, B: int):
    """Hashed-ngram feature extraction for DSIR: word unigrams + adjacent
    bigrams ("w1 w2"), bucketed by md5 (the engine-reproducible hash the
    sampling family uses: bucket = int(md5(gram)[:13 hex], 16) % B, the
    SQL mirror is ('0x' || substr(md5(g),1,13))::BIGINT % B). ``texts``
    is a pyarrow string array; returns (bucket_ids, gram_parent_row).
    md5 runs once per batch-unique gram, vectorized back via np.unique's
    inverse index."""
    import hashlib

    import pyarrow.compute as pc

    splits = pc.split_pattern(texts, " ")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = pc.list_flatten(splits)
    parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    grams = [flat.to_numpy(zero_copy_only=False)]
    parents = [parent]
    if len(parent) > 1:
        adj = parent[1:] == parent[:-1]
        if adj.any():
            m = pa.array(adj)
            bi = pc.binary_join_element_wise(
                flat.slice(0, len(flat) - 1).filter(m),
                flat.slice(1).filter(m), " ")
            grams.append(bi.to_numpy(zero_copy_only=False))
            parents.append(parent[1:][adj])
    g = np.concatenate(grams) if grams else np.empty(0, object)
    p = np.concatenate(parents) if parents else np.empty(0, np.int64)
    if len(g) == 0:
        return np.empty(0, np.int64), p
    uniq, inv = np.unique(g, return_inverse=True)
    hb = np.fromiter(
        (int(hashlib.md5(s.encode()).hexdigest()[:13], 16) % B
         for s in uniq), dtype=np.int64, count=len(uniq))
    return hb[inv], p


def dsir_logratio(ds, target_texts: Sequence[str], buckets: int = 8192,
                  text_col: str = "text", id_col: str = "doc_id",
                  num_parts: Optional[int] = None):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per document, the log
    importance ratio of a TARGET hashed-ngram distribution over the
    SOURCE (raw-corpus) distribution —

        logratio(doc) = sum over grams g of
            ln p_target(bucket(g)) - ln p_source(bucket(g))

    with word unigram+bigram features hashed into ``buckets`` buckets
    and add-one smoothing: p(b) = (c[b]+1) / (N+B). Documents are then
    importance-RESAMPLED proportional to exp(logratio) (see
    ``dsir_sample``) to shift the corpus toward the target domain.

    Scale shape: the source distribution is ONE corpus scan of
    per-batch bincounts emitted as sparse (bucket, n) rows over one
    bounded exchange (<= B groups); the target side is tiny by
    definition (a benchmark/domain sample) and counts driver-side. The
    per-bucket micro-nat delta table (B int64s) broadcasts by closure;
    the score pass is zero-shuffle vectorized take + segment-sum.

    Both ln() terms quantize to integer micro-nats separately, so
    per-document sums are order-free exact integers and the operator is
    oracle-comparable. Returns (doc_id, n_grams, logratio_micro);
    documents with zero grams emit no row."""
    import ray.data as rd

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_grams": pa.array([], pa.int64()),
                      "logratio_micro": pa.array([], pa.int64())})
    B = int(buckets)

    def src_partial(batch: pa.Table) -> pa.Table:
        hb, _ = _dsir_gram_buckets(batch.column(text_col), B)
        if len(hb) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        counts = np.bincount(hb, minlength=B)
        nz = np.nonzero(counts)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    src_rows = (partitioned_group_agg(
        ds.map_batches(src_partial, batch_format="pyarrow"),
        ["bucket"], [("n", "sum", "n")], num_parts=num_parts)
        .to_pandas())
    cs = np.zeros(B, np.int64)
    if len(src_rows):
        cs[src_rows["bucket"].to_numpy()] = src_rows["n"].to_numpy()
    Ns = int(cs.sum())
    if Ns == 0:
        return rd.from_arrow(empty)

    tb, _ = _dsir_gram_buckets(
        pa.array(list(target_texts), pa.string()), B)
    ct = np.bincount(tb, minlength=B) if len(tb) else np.zeros(B, np.int64)
    Nt = int(ct.sum())

    lp_t = np.round(np.log((ct + 1.0) / float(Nt + B)) * 1e6)
    lp_s = np.round(np.log((cs + 1.0) / float(Ns + B)) * 1e6)
    delta = (lp_t - lp_s).astype(np.int64)

    def score(batch: pa.Table) -> pa.Table:
        hb, p = _dsir_gram_buckets(batch.column(text_col), B)
        n_rows = batch.num_rows
        if len(hb) == 0:
            return empty
        sums = np.bincount(p, weights=delta[hb].astype(np.float64),
                           minlength=n_rows)
        ng = np.bincount(p, minlength=n_rows)
        nz = ng > 0
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[nz], pa.int64()),
            "n_grams": pa.array(ng[nz].astype(np.int64), pa.int64()),
            "logratio_micro": pa.array(sums[nz].astype(np.int64),
                                       pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_sample(weights, k: int = 100, id_col: str = "doc_id",
                weight_col: str = "logratio_micro"):
    """Importance RESAMPLING over DSIR log-weights: the Gumbel-top-k
    trick — key_i = logratio_i + Gumbel(md5-uniform(id_i)) and the k
    largest keys are an exact sample without replacement proportional
    to exp(logratio_i). Deterministic and engine-reproducible (the
    md5-uniform rule of weighted_sample / stratified_sample; the SQL
    mirror computes the same doubles), zero shuffle: per-batch local
    top-k combiner, driver merges n_batches x k candidates. Ties break
    by id ASC. Returns (id, weight_col, key)."""
    import hashlib

    import ray.data as rd

    TWO52 = np.float64(4503599627370496.0)  # 2^52 = 16^13

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lw = batch.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.float64) / 1e6
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        # +0.5 keeps u strictly inside (0,1): u=1 would make the
        # Gumbel term ln(-ln(u)) = ln(0) explode (h+0.5 and the divide
        # are still exact float64 ops, so SQL mirrors bit-for-bit)
        u = (h.astype(np.float64) + 0.5) / TWO52
        key = lw - np.log(-np.log(u))
        t = pa.table({id_col: batch.column(id_col),
                      weight_col: batch.column(weight_col),
                      "key": pa.array(key, pa.float64())})
        pdf = t.to_pandas().sort_values(
            ["key", id_col], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    cands = (weights.map_batches(local_topk, batch_format="pyarrow")
             .to_pandas())
    top = (cands.sort_values(["key", id_col], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return rd.from_pandas(top)


def corpus_diff(old_ds, new_ds, id_col: str = "doc_id",
                text_col: str = "text",
                num_parts: Optional[int] = None):
    """Snapshot diff of two corpus versions — the audit step between
    crawl dumps: every document classified ``added`` (only in new),
    ``removed`` (only in old) or ``changed`` (same id, different content
    digest); unchanged documents produce no row. Returns
    (doc_id, change).

    Scale shape: both sides reduce map-side to (id, md5) int/string rows
    (text never leaves the scan), then ONE id-keyed FULL OUTER
    ``hash_join`` exchange classifies per partition — diff volume is
    change-proportional, never corpus-proportional, and there is no
    driver state."""
    import pyarrow.compute as pc

    from .shuffle import hash_join
    from .textstats import digest_batch

    def digests(name):
        def fn(t: pa.Table) -> pa.Table:
            d = digest_batch(t, text_col)
            return pa.table({
                id_col: pc.cast(d.column(id_col), pa.int64()),
                name: d.column("digest")})
        return fn

    old_d = old_ds.map_batches(digests("d_old"), batch_format="pyarrow")
    new_d = new_ds.map_batches(digests("d_new"), batch_format="pyarrow")
    s, i64 = pa.string(), pa.int64()
    j = hash_join(old_d, new_d, on=id_col, how="full",
                  num_parts=num_parts,
                  left_types={id_col: i64, "d_old": s},
                  right_types={id_col: i64, "d_new": s})

    def classify(t: pa.Table) -> pa.Table:
        d_old = t.column("d_old")
        d_new = t.column("d_new")
        added = pc.is_null(d_old)
        removed = pc.is_null(d_new)
        changed = pc.and_(pc.and_(pc.invert(added), pc.invert(removed)),
                          pc.invert(pc.equal(d_old, d_new)))
        keep = pc.or_(pc.or_(added, removed), pc.fill_null(changed, False))
        sub = t.filter(keep)
        a2 = pc.is_null(sub.column("d_old"))
        r2 = pc.is_null(sub.column("d_new"))
        label = pc.if_else(a2, "added",
                           pc.if_else(r2, "removed", "changed"))
        return pa.table({id_col: pc.cast(sub.column(id_col), i64),
                         "change": pc.cast(label, s)})

    return j.map_batches(classify, batch_format="pyarrow")


_C4_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("n_lines", pa.int64())])


def c4_filters(ds, min_words: int = 5, min_lines: int = 3,
               id_col: str = "doc_id", text_col: str = "text"):
    """The C4 heuristic cleaning rules (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning", Section 2.2), re-expressed
    deterministically so a SQL engine computes the identical result:

    * document rules — drop any page whose text contains ``{`` (code) or
      the phrase ``lorem ipsum`` (case-insensitive placeholder text);
    * line rules — split on ``\\n``, trim ASCII spaces/tabs/CRs from both
      ends; keep a line iff it ends in a terminal punctuation mark
      (``.``, ``!``, ``?``, ``"``), has >= ``min_words`` words (maximal
      runs of non-space/tab), and does not contain ``javascript``
      (case-insensitive);
    * page rule — keep the page iff >= ``min_lines`` lines survive
      (C4's "at least three sentences" gate, applied to kept lines).

    Returns (doc_id, text, n_lines) with ``text`` = surviving trimmed
    lines joined by ``\\n``. (The paper's remaining rules live elsewhere:
    the bad-words list is ``blocklist_filter``, and C4's three-sentence
    dedup is ``line_dedup``/``span_dedup``.)

    Scale shape: ZERO shuffle — every rule is per-document, so the whole
    operator is one ``map_batches`` of vectorized Arrow kernels (RE2
    regexes identical to the DuckDB oracle's). No reference analog
    (SURVEY.md §2.8)."""
    import pyarrow.compute as pc
    import pandas as pd

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        doc_ok = pc.and_(
            pc.invert(pc.match_substring(pc.utf8_lower(text),
                                         "lorem ipsum")),
            pc.invert(pc.match_substring(text, "{")))
        t = batch.filter(doc_ok)
        if t.num_rows == 0:
            return _C4_SCHEMA.empty_table()
        splits = pc.split_pattern(t.column(text_col), "\n")
        doc_ids, pos, flat = _explode_units(t, splits, id_col)
        line = pc.utf8_trim(flat, " \t\r")
        keep = pc.and_(
            pc.and_(pc.match_substring_regex(line, '[.!?"]$'),
                    pc.greater_equal(
                        pc.count_substring_regex(line, "[^ \t]+"),
                        min_words)),
            pc.invert(pc.match_substring(pc.utf8_lower(line),
                                         "javascript")))
        keep_np = keep.to_numpy(zero_copy_only=False) \
            if not isinstance(keep, pa.ChunkedArray) \
            else keep.combine_chunks().to_numpy(zero_copy_only=False)
        if not keep_np.any():
            return _C4_SCHEMA.empty_table()
        if isinstance(line, pa.ChunkedArray):
            line = line.combine_chunks()
        df = pd.DataFrame({"doc_id": doc_ids[keep_np],
                           "line": line.filter(pa.array(keep_np))
                                       .to_pandas()})
        # explode order is (doc, line_no), preserved under filter, so the
        # in-group join is already in document order
        g = df.groupby("doc_id", sort=True)["line"]
        out = g.agg("\n".join).reset_index().rename(columns={"line": "text"})
        out["n_lines"] = g.size().to_numpy()
        out = out[out["n_lines"] >= min_lines]
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "n_lines": pa.array(out["n_lines"].to_numpy(), pa.int64()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")


def oov_rate(ds, vocab_k: int = 50000, text_col: str = "text",
             id_col: str = "doc_id", num_parts: Optional[int] = None):
    """Per-document out-of-vocabulary token counts against the corpus
    top-``vocab_k`` vocabulary — the tokenizer/vocab coverage signal used
    to size vocabularies and spot language/domain mismatch. Vocabulary =
    ``vocab_topk``'s exact rule (count DESC, word ASC). Returns
    (doc_id, n_words, n_oov); rate = n_oov / n_words. Documents with zero
    words emit no row (SQL explode semantics).

    Scale shape: the train pass is vocab_topk's ONE word-hash exchange
    (driver holds k rows); the score pass broadcasts the vocabulary once
    (ray.put) and is ZERO shuffle — per batch one Arrow ``is_in`` against
    the C++ hash set plus per-doc segment sums."""
    import pyarrow.compute as pc
    import ray

    vocab_pdf = vocab_topk(ds, k=vocab_k, text_col=text_col,
                           num_parts=num_parts).to_pandas()
    vocab_ref = ray.put(pa.array(vocab_pdf["word"], pa.string()))

    out_schema = pa.schema([(id_col, pa.int64()), ("n_words", pa.int64()),
                            ("n_oov", pa.int64())])

    def score(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        splits = pc.split_pattern(batch.column(text_col), " ")
        doc_ids, _, flat = _explode_units(batch, splits, id_col)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not nonempty.any():
            return out_schema.empty_table()
        ids = doc_ids[nonempty]
        words = flat.filter(pa.array(nonempty))
        oov = pc.invert(pc.is_in(words, value_set=vocab)) \
            .to_numpy(zero_copy_only=False)
        n = len(ids)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        counts = np.diff(np.r_[starts, n])
        oov_sums = np.add.reduceat(oov.astype(np.int64), starts)
        return pa.table({
            id_col: pa.array(ids[starts], pa.int64()),
            "n_words": pa.array(counts, pa.int64()),
            "n_oov": pa.array(oov_sums, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
