"""Byte-pair-encoding tokenizer training and encoding over a Dataset —
the tokenizer-construction step of a training-data pipeline (Sennrich et
al. 2016, the standard BPE-over-word-frequencies formulation).

Scale shape: the corpus-proportional work is ONE word-count exchange
(per-batch value_counts combiner -> word-hash exchange). BPE itself
then trains on the distilled (word, count) table — vocabulary size is
sublinear in corpus size (Heaps' law), and standard practice (HF
tokenizers, sentencepiece) caps it further with min_count / top-N, so
the driver-side merge loop touches at most ``max_words`` rows, never
corpus rows. Encoding is a zero-shuffle map with a per-process merge
table and an LRU word cache.

Determinism: ties in pair frequency break lexicographically, so the
merge sequence is a pure function of the word-count table (itself exact
under any partitioning)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa


def _word_counts(ds, text_col: str, max_words: int,
                 num_parts: Optional[int]):
    """(word, n) table: whitespace tokens, top ``max_words`` by
    (n DESC, word ASC) — the distillation BPE trains on."""
    from .corpus import _word_hash_keys
    from .shuffle import partitioned_group_agg

    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(pc.coalesce(batch.column(text_col), ""), " "))
        words = words.filter(pc.not_equal(words, ""))
        if len(words) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = words.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = partitioned_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["word"], [("n", "sum", "n")], num_parts=num_parts,
        key_arrays_fn=_word_hash_keys)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "word" not in t.column_names:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pdf = t.to_pandas().sort_values(["n", "word"],
                                        ascending=[False, True])
        return pa.Table.from_pandas(pdf.head(max_words),
                                    preserve_index=False)

    cands = (counts.map_batches(local_topk, batch_format="pyarrow")
             .to_pandas()
             .sort_values(["n", "word"], ascending=[False, True])
             .head(max_words))
    return cands


_END = "</w>"


def train_bpe_merges(word_counts, num_merges: int) -> List[Tuple[str, str]]:
    """The classic merge loop over a (word -> count) dict. Pure driver
    compute on the distilled vocabulary; deterministic (count DESC,
    pair ASC tiebreak)."""
    from collections import Counter

    seqs = {}
    for w, n in word_counts.items():
        seqs[w] = (tuple(w) + (_END,), int(n))
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for seq, n in seqs.values():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_seqs = {}
        for w, (seq, n) in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if (i < len(seq) - 1 and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = (tuple(out), n)
        seqs = new_seqs
    return merges


def bpe_train(ds, num_merges: int = 200, text_col: str = "text",
              max_words: int = 100_000, num_parts: Optional[int] = None):
    """Train BPE merges over a Dataset. Returns a Dataset of
    (rank, left, right) merge rules (rank = application priority)."""
    import ray.data as rd

    wc = _word_counts(ds, text_col, max_words, num_parts)
    merges = train_bpe_merges(dict(zip(wc["word"], wc["n"])), num_merges)
    return rd.from_arrow(pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64),
                         pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
    }))


def _encode_word(word: str, ranks: dict) -> List[str]:
    seq = list(word) + [_END]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


class BpeEncodeStage:
    """Per-process merge table + LRU word cache; emits per-document BPE
    token counts (the sizing signal shard packing consumes). Zipf makes
    the cache hit rate ~95%+ on natural text."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import functools

        import ray
        rules = ray.get(merges_ref)
        self.ranks = {(l, r): i for i, (l, r) in enumerate(rules)}
        self.text_col, self.id_col = text_col, id_col
        self._enc = functools.lru_cache(maxsize=200_000)(
            lambda w: len(_encode_word(w, self.ranks)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts = []
        for t in texts:
            total = 0
            for w in (t or "").split(" "):
                if w:
                    total += self._enc(w)
            counts.append(total)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "n_bpe_tokens": pa.array(counts, pa.int64())})


def bpe_encode_counts(ds, merges, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Apply trained merges: (id, n_bpe_tokens) per document. ``merges``
    is the Dataset returned by bpe_train (collected once — merge tables
    are a few KB — and broadcast via ray.put)."""
    import ray

    from .shuffle import TaskStage

    mdf = merges.to_pandas().sort_values("rank")
    rules = list(zip(mdf["left"], mdf["right"]))
    ref = ray.put(rules)
    return ds.map_batches(
        TaskStage(BpeEncodeStage, merges_ref=ref, text_col=text_col,
                  id_col=id_col),
        batch_format="pyarrow")
