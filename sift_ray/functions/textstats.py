"""Text-analysis operators over a documents table (training-data pipeline
extensions; graded alongside SURVEY.md §2).

All per-batch bodies are VECTORIZED (pyarrow.compute kernels) except the
token counter / language-ID stages, which are genuinely per-document
compute kernels run in actor pools.

Regex character classes are ASCII-explicit so the DuckDB (RE2) oracle SQL in
__ray_entry__ computes byte-identical results.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# maximal runs of non-whitespace (ASCII ws, matching the RE2 oracle)
_WORD_PATTERN = r"[^ \t\n\r\f\v]+"
# ASCII punctuation ranges !-/ :-@ [-` {-~
_PUNCT_PATTERN = r"[!-/:-@\[-`{-~]"


def doc_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized per-doc stats: chars, words, punctuation, quality score."""
    text = batch.column(text_col)
    char_count = pc.utf8_length(text)
    word_count = pc.count_substring_regex(text, _WORD_PATTERN)
    punct_count = pc.count_substring_regex(text, _PUNCT_PATTERN)
    # deterministic arithmetic quality score (identical expression in SQL)
    wc = pc.cast(word_count, pa.float64())
    pun = pc.cast(punct_count, pa.float64())
    quality = pc.divide(wc, pc.add(pc.add(wc, pun), pa.scalar(10.0)))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "char_count": pc.cast(char_count, pa.int64()),
        "word_count": pc.cast(word_count, pa.int64()),
        "punct_count": pc.cast(punct_count, pa.int64()),
        "quality_score": quality,
    })


def digest_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 content digest per document (exact-dedup key; SQL: md5(text))."""
    texts = batch.column(text_col).to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None
               else None for t in texts]
    out = batch.append_column("digest", pa.array(digests, pa.string()))
    return out


class TokenCountStage:
    """cl100k-fallback token counting per document (T2 surface) — actor pool;
    tokenizer state built once per actor."""

    def __init__(self, text_col: str = "text"):
        from ..textproc.counters import TokenCounter
        self.counter = TokenCounter()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts = [self.counter.count(t or "") for t in texts]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "token_count": pa.array(counts, pa.int64()),
        })


class LangIdStage:
    """Character n-gram + stopword language heuristic (en/de/es/fr/zh) —
    actor pool; profile tables built once per actor. Deterministic."""

    _STOPWORDS = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "was"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
        "es": {"el", "la", "los", "las", "es", "un", "una", "que", "de", "y"},
        "fr": {"le", "la", "les", "est", "un", "une", "et", "que", "des", "du"},
    }

    def __init__(self, text_col: str = "text"):
        import re
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-ZÀ-ɏ]+")
        self.cjk_re = re.compile(r"[一-鿿]")

    def predict(self, text: str) -> str:
        if not text:
            return "unknown"
        cjk = len(self.cjk_re.findall(text))
        if cjk > 0 and cjk >= len(text) * 0.2:
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "unknown"
        scores = {lang: sum(1 for w in words if w in sw)
                  for lang, sw in self._STOPWORDS.items()}
        best = max(sorted(scores), key=lambda k: scores[k])
        if scores[best] == 0:
            # diacritic fallback
            if any("À" <= c <= "ſ" for c in text):
                return "fr"
            return "en"
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        preds = [self.predict(t or "") for t in texts]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(preds, pa.string()),
        })


class FingerprintStage:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    rolling Rabin-Karp hashes over character k-grams, minimum per window —
    returns the document fingerprint as min-hash and hash count."""

    def __init__(self, k: int = 8, window: int = 16, text_col: str = "text"):
        self.k = k
        self.window = window
        self.text_col = text_col

    def fingerprint(self, text: str) -> tuple:
        import numpy as np
        data = text.encode("utf-8", errors="replace")
        n = len(data)
        if n < self.k:
            h = int(hashlib.md5(data).hexdigest()[:16], 16)
            return h, 1
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        base = np.uint64(1000003)
        # vectorized k-gram rolling hash via prefix powers
        powers = np.power(base, np.arange(self.k, dtype=np.uint64))
        kgrams = np.lib.stride_tricks.sliding_window_view(arr, self.k)
        hashes = (kgrams * powers[::-1]).sum(axis=1)
        if len(hashes) <= self.window:
            mins = hashes
        else:
            windows = np.lib.stride_tricks.sliding_window_view(hashes, self.window)
            mins = windows.min(axis=1)
        selected = np.unique(mins)
        fp = int(selected.min())
        return fp, int(len(selected))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps, counts = [], []
        for t in texts:
            fp, c = self.fingerprint(t or "")
            fps.append(fp)
            counts.append(c)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, pa.uint64()),
            "n_hashes": pa.array(counts, pa.int64()),
        })


# --- dataset-level helpers (used by __ray_entry__ and pipelines) -----------

def doc_stats(ds) -> "object":
    return ds.map_batches(doc_stats_batch, batch_format="pyarrow")


def token_counts(ds, concurrency=None) -> "object":
    # default: plain tasks with per-process cached stage (regex/profile
    # setup is milliseconds — see shuffle.TaskStage); explicit concurrency
    # pins an actor pool
    from .shuffle import TaskStage
    if concurrency is None:
        return ds.map_batches(TaskStage(TokenCountStage),
                              batch_format="pyarrow")
    return ds.map_batches(TokenCountStage, batch_format="pyarrow",
                          concurrency=concurrency)


def lang_id(ds, concurrency=None) -> "object":
    from .shuffle import TaskStage
    if concurrency is None:
        return ds.map_batches(TaskStage(LangIdStage),
                              batch_format="pyarrow")
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          concurrency=concurrency)


def fingerprints(ds, concurrency=None) -> "object":
    from .shuffle import TaskStage
    if concurrency is None:
        return ds.map_batches(TaskStage(FingerprintStage),
                              batch_format="pyarrow")
    return ds.map_batches(FingerprintStage, batch_format="pyarrow",
                          concurrency=concurrency)


def quality_filter_batch(batch: pa.Table, text_col: str = "text",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mwl: float = 3.0, max_mwl: float = 10.0,
                         max_symbol_ratio: float = 0.1) -> pa.Table:
    """Gopher-style quality keep/drop rules, fully vectorized and expressed
    with the exact arithmetic the DuckDB oracle uses:

    keep = min_words <= word_count <= max_words
           AND min_mwl <= mean_word_len <= max_mwl
           AND symbol_ratio < max_symbol_ratio       (# and ellipsis chars)
           AND has a common English stopword (' the ' / ' and ' / ' to ')
    """
    text = batch.column(text_col)
    char_count = pc.cast(pc.utf8_length(text), pa.int64())
    word_count = pc.cast(pc.count_substring_regex(text, _WORD_PATTERN),
                         pa.int64())
    # total word chars = chars minus whitespace chars
    ws_count = pc.cast(pc.count_substring_regex(text, r"[ \t\n\r\f\v]"),
                       pa.int64())
    word_chars = pc.subtract(char_count, ws_count)
    wc_f = pc.cast(word_count, pa.float64())
    mean_word_len = pc.if_else(
        pc.equal(word_count, 0), pa.scalar(0.0),
        pc.divide(pc.cast(word_chars, pa.float64()),
                  pc.if_else(pc.equal(wc_f, 0.0), pa.scalar(1.0), wc_f)))
    hash_count = pc.cast(pc.count_substring(text, "#"), pa.int64())
    dots_count = pc.cast(pc.count_substring(text, "..."), pa.int64())
    denom = pc.cast(pc.if_else(pc.equal(char_count, 0), pa.scalar(1, pa.int64()),
                               char_count), pa.float64())
    symbol_ratio = pc.divide(
        pc.cast(pc.add(hash_count, pc.multiply(dots_count,
                                               pa.scalar(3, pa.int64()))),
                pa.float64()), denom)
    has_stopword = pc.or_(
        pc.or_(pc.match_substring(text, " the "),
               pc.match_substring(text, " and ")),
        pc.match_substring(text, " to "))
    keep = pc.and_(
        pc.and_(
            pc.and_(pc.greater_equal(word_count, min_words),
                    pc.less_equal(word_count, max_words)),
            pc.and_(pc.greater_equal(mean_word_len, min_mwl),
                    pc.less_equal(mean_word_len, max_mwl))),
        pc.and_(pc.less(symbol_ratio, max_symbol_ratio), has_stopword))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "word_count": word_count,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "has_stopword": has_stopword,
        "keep": keep,
    })


def quality_filter(ds) -> "object":
    return ds.map_batches(quality_filter_batch, batch_format="pyarrow")


# default PII patterns: RE2 syntax, identical semantics in pyarrow
# (count/replace_substring_regex are RE2) and DuckDB (regexp_* are RE2),
# which is what makes the scrub oracle-checkable byte-exact.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3,4}\b", "<PHONE>"),
)


def pii_scrub_batch(batch: pa.Table, text_col: str = "text",
                    patterns=PII_PATTERNS) -> pa.Table:
    """Redact PII spans in-place and count them per document. Patterns are
    applied in order (email first: its local part may contain digits that
    the later numeric patterns would otherwise mangle). Pure vectorized
    RE2 kernels; zero shuffle — the map-only scrub a web pipeline runs
    right before sharding."""
    import pyarrow.compute as pc

    text = batch.column(text_col)
    cols = {"doc_id": batch.column("doc_id")}
    for name, pat, repl in patterns:
        cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(text, pat),
                                    pa.int64())
        text = pc.replace_substring_regex(text, pat, repl)
    cols["text"] = text
    return pa.table(cols)


def pii_scrub(ds, text_col: str = "text", patterns=PII_PATTERNS):
    return ds.map_batches(
        lambda b: pii_scrub_batch(b, text_col, patterns),
        batch_format="pyarrow")


def repetition_stats_batch(batch: pa.Table,
                           text_col: str = "text") -> pa.Table:
    """Per-document repetition signals (the Gopher repetition-filter
    family, computed over space-separated words): distinct-word count and
    the frequency of the most common word 2-gram. Integer outputs so the
    downstream fractions (dup-word fraction, top-2-gram fraction) are
    engine-exact. Map-only; the per-doc group sizes are document-bounded."""
    import pandas as pd
    import pyarrow.compute as pc

    splits = pc.split_pattern(batch.column(text_col), " ")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = pc.list_flatten(splits)
    parent = pc.list_parent_indices(splits).to_numpy(zero_copy_only=False)
    words = flat.to_pandas()
    df = pd.DataFrame({"row": parent, "word": words})
    per_row = df.groupby("row", sort=True)["word"]
    n_words = per_row.size()
    n_distinct = per_row.nunique()
    # 2-grams: adjacent word pairs within a row
    same_row = parent[1:] == parent[:-1]
    grams = pd.DataFrame({
        "row": parent[1:][same_row],
        "gram": (words.iloc[:-1].reset_index(drop=True)[same_row] + " " +
                 words.iloc[1:].reset_index(drop=True)[same_row]),
    })
    gcnt = (grams.groupby(["row", "gram"], sort=False).size()
            .groupby("row").agg(["max", "sum"]))
    n = batch.num_rows
    rows = np.arange(n)
    out = pd.DataFrame(index=rows)
    out["n_words"] = n_words.reindex(rows, fill_value=0)
    out["n_distinct_words"] = n_distinct.reindex(rows, fill_value=0)
    out["top_2gram_n"] = gcnt["max"].reindex(rows, fill_value=0)
    out["n_2grams"] = gcnt["sum"].reindex(rows, fill_value=0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": pa.array(out["n_words"].to_numpy(), pa.int64()),
        "n_distinct_words": pa.array(out["n_distinct_words"].to_numpy(),
                                     pa.int64()),
        "top_2gram_n": pa.array(out["top_2gram_n"].to_numpy(), pa.int64()),
        "n_2grams": pa.array(out["n_2grams"].to_numpy(), pa.int64()),
    })


def repetition_stats(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col),
        batch_format="pyarrow")


def normalize_text_batch(batch: pa.Table,
                         text_col: str = "text") -> pa.Table:
    """Unicode + whitespace text normalization — the cleanup map a web
    corpus runs before dedup/tokenization so byte-different encodings of
    the same text collapse. Rules, in order (each mirrored verbatim by
    the DuckDB oracle, so the op is value-exact):

    1. NFC unicode normalization (combining sequences -> precomposed)
    2. CR / CRLF -> LF
    3. drop C0/DEL control chars except tab and newline
    4. collapse runs of 3+ newlines to exactly 2 (the reference's
       markdown rule, extract.go:132-134, applied corpus-wide)
    5. trim leading/trailing whitespace (space/tab/newline/CR)

    Regex steps are pyarrow RE2 kernels (identical semantics to DuckDB's
    regexp_replace); only the NFC step is per-row Python (C-speed via
    unicodedata, with an is_normalized fast path — ASCII corpora skip
    the allocation entirely).
    """
    import unicodedata

    import pyarrow.compute as pc

    text = batch.column(text_col)
    vals = text.to_pylist()
    nfc = [v if v is None or unicodedata.is_normalized("NFC", v)
           else unicodedata.normalize("NFC", v) for v in vals]
    arr = pa.array(nfc, pa.string())
    arr = pc.replace_substring_regex(arr, r"\r\n?", "\n")
    arr = pc.replace_substring_regex(
        arr, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    arr = pc.replace_substring_regex(arr, r"\n{3,}", "\n\n")
    arr = pc.utf8_trim(arr, " \t\n\r")
    changed = pc.invert(pc.equal(arr, text))
    # replace text in place, pass every other column through (callers
    # thread ids/hosts/metadata alongside the text)
    out = batch.set_column(batch.schema.get_field_index(text_col),
                           text_col, arr)
    return out.append_column("changed", changed)


def normalize_text(ds, text_col: str = "text"):
    """Map-only normalization pass; zero shuffle."""
    return ds.map_batches(
        lambda b: normalize_text_batch(b, text_col),
        batch_format="pyarrow")


def compression_ratio_batch(batch: pa.Table,
                            text_col: str = "text",
                            level: int = 6) -> pa.Table:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    Gopher-style redundancy signal: boilerplate and template spam
    compress far below prose. C-speed per row via zlib; map-only."""
    import zlib

    vals = batch.column(text_col).to_pylist()
    raw, comp, ratio = [], [], []
    for v in vals:
        b = (v or "").encode("utf-8")
        c = len(zlib.compress(b, level))
        raw.append(len(b))
        comp.append(c)
        ratio.append(c / len(b) if b else 1.0)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "raw_bytes": pa.array(raw, pa.int64()),
                     "compressed_bytes": pa.array(comp, pa.int64()),
                     "compression_ratio": pa.array(ratio, pa.float64())})


def compression_ratio(ds, text_col: str = "text", level: int = 6):
    return ds.map_batches(
        lambda b: compression_ratio_batch(b, text_col, level),
        batch_format="pyarrow")


def html_stats_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Cheap pre-extraction page signals straight off the RAW bytes —
    the triage pass a crawl-scale pipeline runs BEFORE paying for a DOM
    parse: script-heavy/link-farm pages are droppable from byte-level
    regex counts at a fraction of readability's cost. All counters are
    vectorized RE2 kernels over the binary column (no decode, no DOM).

    Columns: html_bytes, tag_count, script_tags, anchor_tags,
    visible_ratio (bytes outside tags / total, the text-density proxy),
    link_density_proxy (anchors per KB)."""
    import pyarrow.compute as pc

    raw = batch.column(html_col)
    # the RE2 kernels run on binary arrays directly — no UTF-8 decode,
    # invalid bytes never throw
    s = raw
    nbytes = pc.cast(pc.binary_length(raw), pa.int64())
    tags = pc.cast(pc.count_substring_regex(s, r"<[A-Za-z!/]"), pa.int64())
    scripts = pc.cast(pc.count_substring_regex(s, r"(?i)<script\b"),
                      pa.int64())
    anchors = pc.cast(pc.count_substring_regex(s, r"(?i)<a[ >]"),
                      pa.int64())
    intag = pc.cast(pc.binary_length(
        pc.replace_substring_regex(s, r"<[^>]*>", "")), pa.int64())
    nb = nbytes.to_numpy(zero_copy_only=False).astype(np.float64)
    vis = intag.to_numpy(zero_copy_only=False) / np.maximum(nb, 1.0)
    link_density = (anchors.to_numpy(zero_copy_only=False)
                    / np.maximum(nb / 1024.0, 1e-9))
    return pa.table({
        "url": batch.column("url"),
        "html_bytes": nbytes,
        "tag_count": tags,
        "script_tags": scripts,
        "anchor_tags": anchors,
        "visible_ratio": pa.array(vis, pa.float64()),
        "link_density_proxy": pa.array(link_density, pa.float64()),
    })


def html_stats(ds, html_col: str = "html"):
    """Map-only page triage signals; zero shuffle."""
    return ds.map_batches(
        lambda b: html_stats_batch(b, html_col), batch_format="pyarrow")


def blocklist_filter(ds, phrases, text_col: str = "text",
                     id_col: str = "doc_id", keep: bool = True):
    """C4-style blocklist filtering: drop (or flag) documents whose
    lowercased text contains ANY of the given phrases as a whole-word
    match. One RE2 alternation compiled once (identical semantics in
    pyarrow and DuckDB regexp_matches, so the op is value-exact); at
    10^5+ phrases swap the alternation for a per-process Aho-Corasick
    automaton — the plumbing (zero-shuffle map) is unchanged.

    keep=True returns surviving rows (id, text); keep=False returns the
    flag table (id, blocked) for auditing."""
    import re as _re

    import pyarrow.compute as pc

    pat = r"\b(" + "|".join(_re.escape(p.lower()) for p in phrases) + r")\b"

    def fn(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.coalesce(batch.column(text_col), ""))
        hit = pc.match_substring_regex(low, pat)
        if keep:
            return batch.filter(pc.invert(hit)).select([id_col, text_col])
        return pa.table({id_col: batch.column(id_col), "blocked": hit})

    return ds.map_batches(fn, batch_format="pyarrow")


def json_extract_cols(ds, json_col: str, fields, id_col: str = "event_id"):
    """Semi-structured extraction: parse a JSON-string column (stdlib
    ``json``) and project typed top-level fields — the props/metadata
    unpack step of an event pipeline. ``fields``: [(key, out_name,
    "int"|"float"|"str")]. Malformed JSON, missing keys, and wrong-typed
    values yield nulls (never task failures). Map-only, zero shuffle;
    the parse cost is per-row C-speed json.loads.

    SQL mirror: CAST(json_extract(col, '$.key') AS ...) — oracle-exact."""
    import json

    spec = [(k, name, t) for k, name, t in fields]

    def extract(batch: pa.Table) -> pa.Table:
        raws = batch.column(json_col).to_pylist()
        cols = {name: [] for _, name, _ in spec}
        for raw in raws:
            try:
                obj = json.loads(raw) if raw else {}
                if not isinstance(obj, dict):
                    obj = {}
            except (ValueError, TypeError):
                obj = {}
            for key, name, typ in spec:
                v = obj.get(key)
                if typ == "int":
                    cols[name].append(v if isinstance(v, int)
                                      and not isinstance(v, bool) else None)
                elif typ == "float":
                    cols[name].append(float(v) if isinstance(v, (int, float))
                                      and not isinstance(v, bool) else None)
                else:
                    cols[name].append(v if isinstance(v, str) else None)
        out = {id_col: batch.column(id_col)}
        for _, name, typ in spec:
            pt = {"int": pa.int64(), "float": pa.float64(),
                  "str": pa.string()}[typ]
            out[name] = pa.array(cols[name], pt)
        return pa.table(out)

    return ds.map_batches(extract, batch_format="pyarrow")


def regex_extract_cols(ds, source_col: str, pattern: str,
                       id_col: str = "doc_id"):
    """Typed field extraction from a semi-structured string column via an
    RE2 pattern with NAMED GROUPS — the log/identifier-parsing companion
    to :func:`json_extract_cols`. One output column per named group;
    non-matching (or null) rows yield null fields.

    Fully vectorized: ``pc.extract_regex`` runs RE2 over the Arrow
    buffer (the same regex engine DuckDB's ``regexp_extract`` uses, so
    cross-engine semantics match by construction). Zero shuffle."""
    import re as _re

    group_names = list(_re.compile(pattern).groupindex)
    if not group_names:
        raise ValueError("pattern needs at least one (?P<name>...) group")

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(source_col)
        st = pc.extract_regex(col, pattern)
        out = {id_col: batch.column(id_col)}
        for name in group_names:
            out[name] = pc.struct_field(st, name)
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")


def char_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document Shannon CHARACTER entropy in exact integer micro-nats
    — the "unigram entropy" gibberish / randomness signal of the public
    web-corpus quality suites (low entropy = repeated filler, very high =
    random bytes). Returns (doc_id, n_chars, entropy_micro) where

        entropy_micro = sum over distinct chars c of
                        n_c * round(ln(n_chars / n_c) * 1e6)

    so entropy in nats = entropy_micro / n_chars / 1e6. The per-char terms
    are quantized to integer micro-nats BEFORE summing (the repo's
    unigram_logprob recipe), so the sum is order-free and the SQL oracle
    computes the identical integer. Empty documents emit no row (matching
    the SQL GROUP BY over exploded characters).

    Scale shape: ZERO shuffle — one map_batches kernel, vectorized via a
    utf-32 view of the batch's concatenated text (one sort per batch,
    run-length counts, segment sums; no per-doc Python loop)."""

    out_schema = pa.schema([(id_col, pa.int64()), ("n_chars", pa.int64()),
                            ("entropy_micro", pa.int64())])

    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        blob = "".join(t or "" for t in texts)
        n = len(blob)
        if n == 0:
            return out_schema.empty_table()
        cp = np.frombuffer(blob.encode("utf-32-le"), np.uint32) \
            .astype(np.int64)
        lens = np.fromiter((len(t or "") for t in texts), np.int64,
                           count=len(texts))
        ends = np.cumsum(lens)
        # doc index per char without np.repeat (slow gather on this host)
        di = np.searchsorted(ends, np.arange(n, dtype=np.int64),
                             side="right")
        key = np.left_shift(di, 21) | cp          # codepoints < 2^21
        key.sort(kind="stable")
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        counts = np.diff(np.r_[starts, n])
        run_doc = key[starts] >> 21
        ntot = lens[run_doc].astype(np.float64)
        term = counts * np.round(
            np.log(ntot / counts) * 1e6).astype(np.int64)
        doc_starts = np.flatnonzero(np.r_[True,
                                          run_doc[1:] != run_doc[:-1]])
        sums = np.add.reduceat(term, doc_starts)
        doc_idx = run_doc[doc_starts]
        return pa.table({
            id_col: pa.array(ids[doc_idx], pa.int64()),
            "n_chars": pa.array(lens[doc_idx], pa.int64()),
            "entropy_micro": pa.array(sums.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")


def gopher_repetition_batch(batch: pa.Table,
                            text_col: str = "text") -> pa.Table:
    """The full Gopher repetition-filter signal family (Rae et al. 2021,
    Table A1) per document, as INTEGERS so every downstream fraction is
    engine-exact:

      n_chars          — document length (code points)
      n_lines          — ``\\n``-split line instances
      n_dup_lines      — line instances minus distinct lines
                         (-> "duplicate line fraction")
      line_chars       — sum of len(line) over instances
      dup_line_chars   — sum of (count-1) * len(line) over distinct lines
                         (-> "duplicate line character fraction")
      top{2,3,4}_chars — count * len(gram) of the most frequent word
                         n-gram (ties -> lexicographically smallest gram;
                         words = maximal runs of non-space/newline)
                         (-> "top n-gram character fraction")

    Map-only (zero shuffle): the repetition scope is one document. The
    word-level complement (distinct words, top-2-gram count) lives in
    ``repetition_stats``."""
    import pandas as pd
    import pyarrow.compute as pc

    n = batch.num_rows
    rows = np.arange(n)
    text = batch.column(text_col)
    out = pd.DataFrame(index=rows)
    out["n_chars"] = pc.utf8_length(text).to_numpy(zero_copy_only=False)

    # --- line family ---
    lsplit = pc.split_pattern(text, "\n")
    if isinstance(lsplit, pa.ChunkedArray):
        lsplit = lsplit.combine_chunks()
    lflat = pc.list_flatten(lsplit)
    lparent = pc.list_parent_indices(lsplit).to_numpy(zero_copy_only=False)
    ldf = pd.DataFrame({"row": lparent,
                        "line": lflat.to_pandas(),
                        "len": pc.utf8_length(lflat)
                        .to_numpy(zero_copy_only=False)})
    lc = (ldf.groupby(["row", "line"], sort=False)
          .agg(c=("len", "size"), ln=("len", "first")).reset_index())
    lc["inst_chars"] = lc["c"] * lc["ln"]
    lc["dup_chars"] = (lc["c"] - 1) * lc["ln"]
    lagg = lc.groupby("row", sort=True).agg(
        n_lines=("c", "sum"), n_distinct=("c", "size"),
        line_chars=("inst_chars", "sum"), dup_line_chars=("dup_chars", "sum"))
    lagg["n_dup_lines"] = lagg["n_lines"] - lagg["n_distinct"]
    for col in ["n_lines", "n_dup_lines", "line_chars", "dup_line_chars"]:
        out[col] = (lagg[col].reindex(rows, fill_value=0)
                    if len(lagg) else 0)

    # --- top n-gram character mass (words = runs of [^ \n]+) ---
    wsplit = pc.split_pattern(
        pc.replace_substring(text, "\n", " "), " ")
    if isinstance(wsplit, pa.ChunkedArray):
        wsplit = wsplit.combine_chunks()
    wflat = pc.list_flatten(wsplit)
    wparent = pc.list_parent_indices(wsplit).to_numpy(zero_copy_only=False)
    wmask = pc.not_equal(wflat, "").to_numpy(zero_copy_only=False)
    words = wflat.to_pandas()[wmask].reset_index(drop=True)
    wp = wparent[wmask]
    for k in (2, 3, 4):
        if len(words) >= k:
            same = wp[: len(wp) - k + 1] == wp[k - 1:]
            gram = words.iloc[:len(words) - k + 1].reset_index(drop=True)
            for j in range(1, k):
                gram = gram + " " + words.iloc[j:len(words) - k + 1 + j] \
                    .reset_index(drop=True)
            gdf = pd.DataFrame({"row": wp[: len(wp) - k + 1][same],
                                "gram": gram[same]})
            if len(gdf):
                gc = (gdf.groupby(["row", "gram"], sort=False).size()
                      .reset_index(name="c"))
                gc = gc.sort_values(["row", "c", "gram"],
                                    ascending=[True, False, True])
                top = gc.drop_duplicates("row", keep="first")
                chars = (top["c"].to_numpy()
                         * top["gram"].str.len().to_numpy())
                out[f"top{k}_chars"] = pd.Series(
                    chars, index=top["row"].to_numpy()) \
                    .reindex(rows, fill_value=0)
            else:
                out[f"top{k}_chars"] = 0
        else:
            out[f"top{k}_chars"] = 0

    cols = {"doc_id": batch.column("doc_id")}
    for c in ["n_chars", "n_lines", "n_dup_lines", "line_chars",
              "dup_line_chars", "top2_chars", "top3_chars", "top4_chars"]:
        cols[c] = pa.array(out[c].to_numpy().astype(np.int64), pa.int64())
    return pa.table(cols)


def gopher_repetition(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda b: gopher_repetition_batch(b, text_col),
        batch_format="pyarrow")
