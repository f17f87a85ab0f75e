"""End-to-end Ray Data pipeline tests (single small corpus)."""

import json
import os

import pyarrow.dataset as pads
import pytest

from sift_ray.config import SiftConfig
from sift_ray.pipelines.extract_job import (build_extract_pipeline,
                                            run_extract_job)
from sift_ray.sources.pages import (PAGES_SCHEMA, gen_page, pages_batch,
                                    write_pages_corpus)


def test_gen_page_deterministic():
    a = gen_page(7)
    b = gen_page(7)
    assert a == b
    assert a["url"].startswith("https://fixtures.test/")
    assert isinstance(a["html"], bytes)
    c = gen_page(8)
    assert c["html"] != a["html"]


def test_pages_batch_schema():
    t = pages_batch(list(range(10)))
    assert t.schema.equals(PAGES_SCHEMA)
    assert t.num_rows == 10


def test_fixture_rows_embedded():
    from sift_ray.sources.fixture_pages import SIMPLE_HTML
    assert gen_page(0)["html"].decode() == SIMPLE_HTML


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("pages"))
    write_pages_corpus(d, 300, num_blocks=4)
    return d


def test_corpus_written(corpus_dir):
    ds = pads.dataset(corpus_dir, format="parquet")
    assert ds.count_rows() == 300


def test_extract_pipeline(corpus_dir, ray_session):
    import ray.data as rd
    ds = rd.read_parquet(corpus_dir, columns=["url", "html"])
    out = build_extract_pipeline(ds, SiftConfig(max_units=0), concurrency=2)
    table = out.take_all()
    assert len(table) == 300
    ok = [r for r in table if r["status"] == "ok"]
    assert len(ok) >= 290  # fixtures + synthetic pages extract fine
    # readability keeps article body, drops boilerplate, on synthetic pages
    sample = next(r for r in ok if "/normal/" in r["url"])
    assert "Related Posts" not in sample["extracted_md"]
    assert sample["extracted_md"] != ""
    # extraction is keyed per url and deterministic
    urls = {r["url"] for r in table}
    assert len(urls) == 300


def test_run_extract_job_and_resume(corpus_dir, ray_session, tmp_path):
    out_dir = str(tmp_path / "out")
    cfg = SiftConfig(max_units=100, counting_method="words")
    summary = run_extract_job(corpus_dir, out_dir, cfg, group_size=2,
                              concurrency=2)
    assert summary["rows"] == 300
    assert summary["partitions"] == 2
    # manifest rows carry lineage + throughput
    manifest_files = sorted(os.listdir(os.path.join(out_dir, "_manifest")))
    assert len(manifest_files) == 2
    rec = json.load(open(os.path.join(out_dir, "_manifest", manifest_files[0])))
    assert rec["status"] == "ok"
    assert rec["row_count"] > 0
    assert rec["pages_per_s"] > 0
    assert rec["input_files"]
    assert rec["bytes_in"] > 0
    assert rec["bytes_out"] > 0  # real on-disk partition size, not a stub
    # resume: delete one manifest row -> only that partition reruns
    os.remove(os.path.join(out_dir, "_manifest", manifest_files[0]))
    summary2 = run_extract_job(corpus_dir, out_dir, cfg, group_size=2,
                               concurrency=2)
    assert summary2["rows"] == 300
    # word limit respected in output
    ds = pads.dataset(os.path.join(out_dir, "part-00000"), format="parquet")
    t = ds.to_table(columns=["extracted_md", "status"])
    for md, status in zip(t.column("extracted_md").to_pylist(),
                          t.column("status").to_pylist()):
        if status == "ok":
            assert len(md.split()) <= 110  # 100 words + partial tolerance


def test_oversize_quarantine(ray_session, tmp_path):
    import ray.data as rd
    import pyarrow as pa
    rows = [
        {"url": "u://small", "warc_ts": 0, "html": b"<p>tiny page ok</p>",
         "text": "", "lang": "en"},
        {"url": "u://big", "warc_ts": 0, "html": b"x" * 5000,
         "text": "", "lang": "en"},
    ]
    t = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    ds = rd.from_arrow(t)
    out = build_extract_pipeline(ds, SiftConfig(include_all=True),
                                 concurrency=1, max_html_bytes=1000)
    rows_out = {r["url"]: r for r in out.take_all()}
    assert rows_out["u://big"]["status"] == "oversize"
    assert rows_out["u://big"]["extracted_md"] == ""
    assert "content too large" in rows_out["u://big"]["error"]
    assert rows_out["u://small"]["status"] == "ok"


def test_deep_dom_does_not_crash(ray_session):
    import ray.data as rd
    deep = gen_page(700)  # index 700 -> deeply nested page
    assert "/deep/" in deep["url"]
    import pyarrow as pa
    ds = rd.from_arrow(pa.Table.from_pylist([deep], schema=PAGES_SCHEMA))
    out = build_extract_pipeline(ds, SiftConfig(), concurrency=1)
    rows = out.take_all()
    assert len(rows) == 1
    assert rows[0]["status"] in ("ok", "error", "empty")


def test_bucketed_pipeline_matches_plain(corpus_dir, ray_session):
    """Size-bucketed routing must not change any output byte — only batch
    shapes differ."""
    import ray.data as rd
    from sift_ray.config import default_config
    from sift_ray.pipelines.extract_job import (build_bucketed_extract_pipeline,
                                                build_extract_pipeline)
    ds1 = rd.read_parquet(corpus_dir, columns=["url", "html"])
    plain = (build_extract_pipeline(ds1, default_config(), concurrency=2)
             .to_pandas().sort_values("url").reset_index(drop=True))
    ds2 = rd.read_parquet(corpus_dir, columns=["url", "html"])
    bucketed = (build_bucketed_extract_pipeline(ds2, default_config(),
                                                concurrency=2)
                .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(plain.columns) == list(bucketed.columns)
    import pandas.testing as pdt
    pdt.assert_frame_equal(plain, bucketed)


def test_resume_cleans_partial_tmp_partition(corpus_dir, ray_session, tmp_path):
    """A killed run leaves a partial tmp partition; resume must discard it
    and rerun that partition from scratch (no duplicate/partial rows)."""
    import os
    import json
    from sift_ray.config import default_config
    from sift_ray.pipelines.extract_job import run_extract_job
    from sift_ray.state.manifest import Manifest

    out = str(tmp_path / "job")
    manifest = Manifest(out)
    # simulate a crash: a half-written tmp partition for pid 0
    tmp0 = manifest.tmp_partition_dir(0)
    os.makedirs(tmp0, exist_ok=True)
    with open(os.path.join(tmp0, "part-garbage.parquet"), "wb") as f:
        f.write(b"not a real parquet file")
    summary = run_extract_job(corpus_dir, out, default_config(), group_size=3)
    assert summary["rows"] == 300
    # every committed partition readable end-to-end, garbage gone
    import pyarrow.dataset as pads
    total = pads.dataset(out, format="parquet").count_rows()
    assert total == 300


def test_cli_sift_single_document(tmp_path):
    """The reference CLI surface: sift FILE -> stdout (no Ray session)."""
    import subprocess
    import sys as _sys
    from sift_ray.sources.pages import gen_page
    p = tmp_path / "page.html"
    p.write_bytes(gen_page(1)["html"])
    out = subprocess.run(
        [_sys.executable, "-m", "sift_ray", "sift", str(p), "--words", "10"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0
    assert "Carrot Cake" in out.stdout
    assert len(out.stdout.split()) <= 11  # word budget respected
    bad = subprocess.run(
        [_sys.executable, "-m", "sift_ray", "sift", str(p),
         "--selector", ">>bad<<"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert bad.returncode == 1
    assert "selector" in bad.stderr


def test_web_corpus_pipeline_end_to_end(ray_session):
    """pages -> triage -> extract -> normalize -> line-dedup -> shards:
    deterministic, fully packed, and duplicate lines actually removed."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.pipelines.web_pipeline import web_corpus_pipeline
    from sift_ray.sources.pages import pages_batch

    base = pages_batch(list(range(24)))
    # plant a full-page duplicate under a different url: its lines must
    # dedup away, leaving an (almost) empty shard contribution
    dup = base.slice(5, 1)
    dup = dup.set_column(0, "url", pa.array(["https://dup.test/copy"]))
    pages = rd.from_arrow(pa.concat_tables([base, dup])).repartition(4)

    out = web_corpus_pipeline(pages, shard_tokens=500).to_pandas()
    assert len(out) >= 20
    assert (out.n_tokens >= 0).all()
    # shard_id is exactly start_offset // shard_tokens (a doc longer than
    # the budget legitimately leaves gaps in the shard-id sequence)
    assert (out.shard_id == out.start_offset // 500).all()
    assert out.shard_id.min() == 0
    # exclusive prefix sums consistent with n_tokens in doc_id order
    srt = out.sort_values("doc_id").reset_index(drop=True)
    assert (srt.start_offset.values ==
            np.concatenate([[0], srt.n_tokens.cumsum().values[:-1]])).all()
    # determinism under different partitioning
    out2 = web_corpus_pipeline(
        rd.from_arrow(pa.concat_tables([base, dup])).repartition(2),
        shard_tokens=500).to_pandas()
    pd1 = out.sort_values("doc_id").reset_index(drop=True)
    pd2 = out2.sort_values("doc_id").reset_index(drop=True)
    assert pd1.equals(pd2)


def test_web_corpus_pipeline_with_robots_and_boilerplate(ray_session):
    """The full hygiene chain: a robots-disallowed page never reaches
    extraction, and the optional per-host boilerplate stage leaves the
    shard packing consistent."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from sift_ray.pipelines.web_pipeline import web_corpus_pipeline
    from sift_ray.sources.pages import pages_batch

    pages = rd.from_arrow(pages_batch(list(range(16)))).repartition(3)
    robots = rd.from_items([{
        "host": "fixtures.test",
        "robots": "User-agent: *\nDisallow: /fixture\n",
    }])
    plain = web_corpus_pipeline(pages, shard_tokens=500).to_pandas()
    filtered = web_corpus_pipeline(pages, shard_tokens=500,
                                   robots=robots).to_pandas()
    # the corpus has /fixture pages among the first 16 -> fewer docs
    assert 0 < len(filtered) < len(plain)
    srt = filtered.sort_values("doc_id").reset_index(drop=True)
    assert (srt.start_offset.values ==
            np.concatenate([[0], srt.n_tokens.cumsum().values[:-1]])).all()

    boiled = web_corpus_pipeline(pages, shard_tokens=500,
                                 strip_boilerplate=True,
                                 boiler_min_docs=3,
                                 boiler_max_frac=0.5).to_pandas()
    assert len(boiled) > 0
    srt2 = boiled.sort_values("doc_id").reset_index(drop=True)
    assert (srt2.start_offset.values ==
            np.concatenate([[0], srt2.n_tokens.cumsum().values[:-1]])).all()
    # boilerplate stripping can only shrink per-doc token counts
    j = plain.set_index("doc_id")["n_tokens"]
    for _, r in srt2.iterrows():
        if r["doc_id"] in j.index:
            assert r["n_tokens"] <= j.loc[r["doc_id"]]


def test_run_web_corpus_job_and_resume(ray_session, tmp_path):
    """Checkpointed end-to-end web job: phase 1 resumes at partition
    granularity, phase 2 at the shards manifest; results match the
    unchunked pipeline."""
    import shutil
    import time as _t
    import pandas as pd
    import ray.data as rd
    from sift_ray.sources.pages import write_pages_corpus
    from sift_ray.pipelines.web_pipeline import (run_web_corpus_job,
                                                 web_corpus_pipeline)

    corpus = write_pages_corpus(str(tmp_path / "pages"), 60, 42,
                                num_blocks=6)
    out_dir = str(tmp_path / "web_job")
    res = run_web_corpus_job(corpus, out_dir, group_size=2,
                             shard_tokens=500)
    assert res["docs"]["partitions_done"] >= 3 \
        if "partitions_done" in res["docs"] else True
    shards = rd.read_parquet(out_dir + "/shards").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(shards) > 0

    # full resume: second call must be near-instant (everything committed)
    t0 = _t.time()
    run_web_corpus_job(corpus, out_dir, group_size=2, shard_tokens=500)
    assert _t.time() - t0 < 5.0

    # phase-2-only restart: drop the shards output, keep the docs
    # checkpoint; the rerun must NOT touch raw pages and must reproduce
    # the exact same shard table
    shutil.rmtree(out_dir + "/shards")
    run_web_corpus_job(corpus, out_dir, group_size=2, shard_tokens=500)
    shards2 = rd.read_parquet(out_dir + "/shards").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(shards, shards2)

    # equivalence with the one-shot lazy pipeline
    pages = rd.read_parquet(corpus, columns=["url", "html"])
    oneshot = web_corpus_pipeline(pages, shard_tokens=500).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(shards[oneshot.columns], oneshot)


def test_run_web_corpus_job_write_files(ray_session, tmp_path):
    """write_files=True materializes physical shard parquet files whose
    content is the CLEANED (post-line-dedup) text, reconstructs exactly
    the shard table of the plain path, and resumes instantly."""
    import os
    import time as _t

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd
    from sift_ray.pipelines.web_pipeline import run_web_corpus_job
    from sift_ray.sources.pages import write_pages_corpus

    corpus = write_pages_corpus(str(tmp_path / "pages"), 60, 42,
                                num_blocks=6)
    plain_dir = str(tmp_path / "web_plain")
    run_web_corpus_job(corpus, plain_dir, group_size=2, shard_tokens=500)
    plain = (rd.read_parquet(plain_dir + "/shards").to_pandas()
             .sort_values("doc_id").reset_index(drop=True))

    out_dir = str(tmp_path / "web_files")
    res = run_web_corpus_job(corpus, out_dir, group_size=2,
                             shard_tokens=500, write_files=True,
                             shard_groups=4)
    assert res["shard_files"]["partitions"] == 4
    withf = (rd.read_parquet(out_dir + "/shards").to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, withf)

    # every shard file's rows: correct shard, pack order, deduped text
    clean = (rd.read_parquet(out_dir + "/clean_docs").to_pandas()
             .set_index("doc_id")["text"])
    fdir = out_dir + "/shard_files"
    seen = []
    for part in sorted(os.listdir(fdir)):
        if not part.startswith("part-"):
            continue
        for f in sorted(os.listdir(os.path.join(fdir, part))):
            t = pq.read_table(os.path.join(fdir, part, f)).to_pandas()
            sid = int(f.split("-")[1].split(".")[0])
            assert (t["shard_id"] == sid).all()
            assert t["start_offset"].is_monotonic_increasing
            for _, r in t.iterrows():
                assert r["text"] == clean.loc[r["doc_id"]]
            seen.extend(t["doc_id"].tolist())
    assert sorted(seen) == sorted(plain["doc_id"].tolist())

    t0 = _t.time()
    run_web_corpus_job(corpus, out_dir, group_size=2, shard_tokens=500,
                       write_files=True, shard_groups=4)
    assert _t.time() - t0 < 5.0


def test_run_web_corpus_job_build_index(ray_session, tmp_path):
    """build_index=True leaves a queryable inverted index beside the
    shards; its answers match streaming BM25 over the docs checkpoint."""
    import os
    import ray.data as rd
    from sift_ray.functions.corpus import bm25_topk
    from sift_ray.pipelines.web_pipeline import run_web_corpus_job
    from sift_ray.sources.pages import write_pages_corpus
    from sift_ray.sources.text_index import query_text_index

    corpus = write_pages_corpus(str(tmp_path / "pages"), 40, 7,
                                num_blocks=4)
    out_dir = str(tmp_path / "web_job_idx")
    res = run_web_corpus_job(corpus, out_dir, group_size=2,
                             shard_tokens=500, build_index=True,
                             index_buckets=8)
    assert res["text_index"]["n_docs"] > 0
    idx_dir = os.path.join(out_dir, "text_index")
    docs = rd.read_parquet(os.path.join(out_dir, "docs"),
                           columns=["doc_id", "text"])
    terms = ["the", "and"]
    got = query_text_index(idx_dir, terms, k=10).to_pandas()
    want = bm25_topk(docs, terms, k=10).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(got, want)


def test_cli_index_build_and_query(ray_session, tmp_path, capsys):
    """CLI surface for the inverted index: build prints the meta JSON,
    query prints one JSON line per hit in rank order."""
    import json as _json
    import ray.data as rd
    from sift_ray.cli import main
    from sift_ray.sources.pages import write_pages_corpus

    docs = rd.from_items([
        {"doc_id": 0, "text": "hash join dup"},
        {"doc_id": 1, "text": "the quick fox"},
        {"doc_id": 2, "text": "hash table"},
    ]).to_pandas()
    src = str(tmp_path / "docs.parquet")
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    _pq.write_table(_pa.Table.from_pandas(docs, preserve_index=False), src)

    idx = str(tmp_path / "idx")
    assert main(["index-build", "--input", src, "--output", idx,
                 "--buckets", "4"]) == 0
    meta = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_docs"] == 3

    assert main(["index-query", "--index", idx, "--terms", "hash",
                 "--k", "5"]) == 0
    lines = [_json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert {r["doc_id"] for r in lines} == {0, 2}


def test_task_retry_produces_identical_bytes(ray_session, tmp_path):
    """North-rule evidence (SURVEY §4.2): the extract UDF is deterministic
    and side-effect-free, so a task that fails mid-run and is retried by
    Ray yields BYTE-identical output. One task attempt is killed via an
    O_EXCL marker file (exactly one attempt ever raises); Ray retries the
    application error (retry_exceptions) and the job completes with the
    same bytes as an uninjected run."""
    import ray.data as rd

    from sift_ray.sources.pages import generate_pages
    from sift_ray.stages.extract import SiftPipelineStage

    marker = str(tmp_path / "boom_once")
    cfg = SiftConfig()

    def flaky(batch, _marker=marker, _cfg=cfg):
        try:
            fd = os.open(_marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            raise RuntimeError("injected one-shot task failure")
        except FileExistsError:
            pass
        return SiftPipelineStage(_cfg)(batch)

    def clean(batch, _cfg=cfg):
        return SiftPipelineStage(_cfg)(batch)

    n = 240
    injected = (generate_pages(n, seed=7, num_blocks=6)
                .map_batches(flaky, batch_format="pyarrow", batch_size=64,
                             max_retries=3, retry_exceptions=True)
                .to_pandas().sort_values("url").reset_index(drop=True))
    assert os.path.exists(marker), "the injected failure never fired"
    baseline = (generate_pages(n, seed=7, num_blocks=6)
                .map_batches(clean, batch_format="pyarrow", batch_size=64)
                .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(injected) == len(baseline) == n
    for col in ("url", "status", "extracted_md"):
        assert (injected[col].to_numpy() == baseline[col].to_numpy()).all(), col


def test_empty_schema_warning_filter_selectivity():
    """The installed log filter drops ONLY the empty-new-schema variant of
    Ray's RefBundle divergence warning; real drift still passes."""
    import logging
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    flt = [f for f in lg.filters
           if type(f).__name__ == "_EmptyNewSchemaFilter"]
    assert flt, "filter not installed on import of sift_ray"
    mk = lambda msg: logging.LogRecord("x", logging.WARNING, "f", 1,
                                       msg, (), None)
    drop = mk("Operator produced a RefBundle with a different schema "
              "than the previous one. Previous schema: a: int64, "
              "new schema: . This may lead to unexpected behavior.")
    keep = mk("Operator produced a RefBundle with a different schema "
              "than the previous one. Previous schema: a: int64, "
              "new schema: a: double. This may lead to unexpected behavior.")
    assert not flt[0].filter(drop)
    assert flt[0].filter(keep)
    assert flt[0].filter(mk("unrelated message"))
