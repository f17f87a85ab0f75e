"""Ray Data stages: stateful actor-pool callables for map_batches.

Each stage is a callable CLASS: construction (regex compilation, classifier
and counter state, recursion-limit setup) happens once per actor in
``__init__``; ``__call__`` processes one Arrow batch. Pass to
``ds.map_batches(Cls, fn_constructor_kwargs=..., batch_format="pyarrow",
concurrency=N)``.

Rows never crash a task: oversize rows are quarantined with
status="oversize" (mirroring the reference's hard size caps,
fetch.go:19-22, as data instead of errors), pathological DOMs surface as
status="error" with the message, and retries are safe because every
transform here is deterministic and side-effect-free.
"""

from __future__ import annotations

import sys
from typing import List, Optional

import pyarrow as pa

from ..config import SiftConfig
from ..extract.api import ExtractError, to_markdown
from ..extract.markdown import RenderDepthError
from ..textproc.classify import Classifier
from ..textproc.document import render_output, sift_markdown

# the reference errors past 50 MB files / 100 MB HTTP bodies (fetch.go:19-22);
# the batch engine quarantines instead of erroring
DEFAULT_MAX_HTML_BYTES = 50 * 1024 * 1024

STATUS_OK = "ok"
STATUS_EMPTY = "empty"
STATUS_OVERSIZE = "oversize"
STATUS_ERROR = "error"

_EXTRACT_OUT_FIELDS = [
    ("url", pa.string()),
    ("markdown", pa.string()),
    ("status", pa.string()),
    ("error", pa.string()),
    ("bytes_in", pa.int64()),
]


class ExtractStage:
    """HTML -> markdown extraction (E1-E6) over one batch.

    Emits (url, markdown, status, error, bytes_in). Deterministic per row.
    """

    def __init__(self, cfg: Optional[SiftConfig] = None,
                 max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
                 use_url_as_base: bool = True):
        self.cfg = cfg or SiftConfig()
        self.max_html_bytes = max_html_bytes
        self.use_url_as_base = use_url_as_base
        if sys.getrecursionlimit() < 10000:
            sys.setrecursionlimit(10000)
        # DOM builds churn ~10^5 objects per page; default gen-0 threshold
        # (700) triggers constant collections whose pointer-chasing scans are
        # expensive under many-actor memory contention. Trees are dropped
        # wholesale per row, so a high threshold trades brief peak RSS for
        # fewer, larger collections. Process-global, so only applied inside
        # Ray WORKER processes — a driver or library host constructing this
        # stage in-process keeps its default GC behavior.
        if self._in_ray_worker():
            import gc
            gc.set_threshold(100_000, 50, 50)

    @staticmethod
    def _in_ray_worker() -> bool:
        try:
            import ray
            if not ray.is_initialized():
                return False
            ctx = ray.get_runtime_context()
            return ctx.worker.mode == ray.WORKER_MODE
        except Exception:
            return False

    def extract_row(self, url: str, html: bytes) -> tuple:
        """Returns (markdown, status, error)."""
        if html is None or len(html) == 0:
            return "", STATUS_EMPTY, ""
        if len(html) > self.max_html_bytes:
            return "", STATUS_OVERSIZE, (
                f"content too large: {len(html)} bytes "
                f"(max {self.max_html_bytes})")
        try:
            if getattr(self.cfg, "sniff_charset", False):
                from ..functions.charset import decode_bytes
                text, _, _ = decode_bytes(html)
            else:
                text = html.decode("utf-8", errors="replace")
            base = url if (self.use_url_as_base
                           and url.startswith(("http://", "https://"))) else ""
            md = to_markdown(text, selector=self.cfg.selector,
                             include_all=self.cfg.include_all, base_url=base)
            if md.strip() == "":
                return "", STATUS_EMPTY, ""
            return md, STATUS_OK, ""
        except RenderDepthError as exc:
            return "", STATUS_ERROR, f"quarantined: {exc}"
        except ExtractError as exc:
            return "", STATUS_ERROR, str(exc)
        except Exception as exc:  # defensive: no row may kill the task
            return "", STATUS_ERROR, f"{type(exc).__name__}: {exc}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        mds: List[str] = []
        statuses: List[str] = []
        errors: List[str] = []
        sizes: List[int] = []
        for url, html in zip(urls, htmls):
            md, status, err = self.extract_row(url, html)
            mds.append(md)
            statuses.append(status)
            errors.append(err)
            sizes.append(len(html) if html is not None else 0)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "markdown": pa.array(mds, pa.string()),
            "status": pa.array(statuses, pa.string()),
            "error": pa.array(errors, pa.string()),
            "bytes_in": pa.array(sizes, pa.int64()),
        })


class SiftStage:
    """Post-extraction per-document pipeline (chunk + classify + BM25 search +
    select + size + render) over a batch that already has ``markdown``.

    Classifier / counters / regexes are built once per actor.
    """

    def __init__(self, cfg: Optional[SiftConfig] = None):
        self.cfg = cfg or SiftConfig()
        self.classifier = Classifier()

    def sift_row(self, markdown: str) -> str:
        out = sift_markdown(markdown, self.cfg, self.classifier)
        return render_output(out, self.cfg.output_format)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mds = batch.column("markdown").to_pylist()
        outs = []
        for md in mds:
            try:
                outs.append(self.sift_row(md) if md else "")
            except Exception as exc:  # defensive
                outs.append("")
        result = batch.append_column("extracted_md",
                                     pa.array(outs, pa.string()))
        return result


class SiftPipelineStage:
    """Fused extract+sift stage: one actor pass per batch, halving
    object-store traffic for the common full pipeline.

    ``keep_markdown=False`` (default) drops the intermediate pre-sift
    ``markdown`` column from the output — for the default token-budget
    path it is nearly the size of ``extracted_md``, so carrying it doubles
    the bytes every downstream stage, the object store, and the sink must
    move. Set True when the un-sifted markdown itself is the product."""

    def __init__(self, cfg: Optional[SiftConfig] = None,
                 max_html_bytes: int = DEFAULT_MAX_HTML_BYTES,
                 keep_markdown: bool = False):
        self.extract = ExtractStage(cfg, max_html_bytes)
        self.sift = SiftStage(cfg)
        self.keep_markdown = keep_markdown

    def __call__(self, batch: pa.Table) -> pa.Table:
        extracted = self.extract(batch)
        mds = extracted.column("markdown").to_pylist()
        outs = []
        for md in mds:
            try:
                outs.append(self.sift.sift_row(md) if md else "")
            except Exception:
                outs.append("")
        if not self.keep_markdown:
            extracted = extracted.drop_columns(["markdown"])
        return extracted.append_column("extracted_md",
                                       pa.array(outs, pa.string()))
