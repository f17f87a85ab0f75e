"""Page-metadata extraction: head-field rules and the quarantine
contract (oversize / null / pathological rows yield status rows, never
task failures)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sift_ray.functions.metadata import _page_metadata

FULL = b"""<html lang="en-US"><head>
<title>  The   Title </title>
<meta name="Description" content="  a page about things ">
<meta property="og:title" content="OG Title">
<meta property="og:description" content="og desc">
<meta property="article:published_time" content="2024-01-05T10:00:00Z">
<link rel="stylesheet" href="/s.css">
<link rel="canonical" href="/canonical-path">
</head><body><p>hi</p></body></html>"""

MINIMAL = b"<html><body><p>no head</p></body></html>"

TIME_FALLBACK = b"""<html><head><title>T</title></head>
<body><time datetime="2023-12-31">NYE</time></body></html>"""

DUPES = b"""<html><head>
<title>first</title><title>second</title>
<meta name="description" content="first desc">
<meta name="description" content="second desc">
<link rel="canonical" href="http://a.test/one">
<link rel="canonical" href="http://a.test/two">
</head></html>"""


def test_full_head_fields():
    m = _page_metadata("http://x.test/page", FULL.decode())
    assert m["title"] == "The Title"                 # whitespace collapsed
    assert m["description"] == "a page about things"  # name case-insensitive
    assert m["og_title"] == "OG Title"
    assert m["og_description"] == "og desc"
    assert m["canonical_url"] == "http://x.test/canonical-path"  # resolved
    assert m["html_lang"] == "en-us"
    assert m["published"] == "2024-01-05T10:00:00Z"


def test_minimal_page_all_null():
    m = _page_metadata("http://x.test/", MINIMAL.decode())
    assert all(v is None for k, v in m.items() if k != "html_lang")
    assert m["html_lang"] is None


def test_time_element_fallback():
    m = _page_metadata("http://x.test/", TIME_FALLBACK.decode())
    assert m["published"] == "2023-12-31"


def test_first_occurrence_wins():
    m = _page_metadata("http://x.test/", DUPES.decode())
    assert m["title"] == "first"
    assert m["description"] == "first desc"
    assert m["canonical_url"] == "http://a.test/one"


def test_stage_quarantine_and_schema(ray_session):
    import ray.data as rd
    from sift_ray.functions.metadata import page_metadata
    big = b"<html>" + b"x" * (51 * 1024 * 1024) + b"</html>"
    deep = ("<div>" * 1500 + "t" + "</div>" * 1500).encode()
    tbl = pa.table({
        "url": ["http://t/ok", "http://t/big", "http://t/null",
                "http://t/deep"],
        "html": pa.array([FULL, big, None, deep], pa.binary())})
    out = page_metadata(rd.from_arrow(tbl)).to_pandas()
    st = dict(zip(out.url, out.status))
    assert st["http://t/ok"] == "ok"
    assert st["http://t/big"] == "oversize"
    assert st["http://t/null"] == "empty"
    assert st["http://t/deep"] in ("ok", "error")
    ok = out[out.url == "http://t/ok"].iloc[0]
    assert ok.title == "The Title"
    assert set(out.columns) == {"url", "title", "description", "og_title",
                                "og_description", "canonical_url",
                                "html_lang", "published", "status"}


@pytest.mark.parametrize("num_parts", [1, 8])
def test_pca_matches_numpy(ray_session, num_parts):
    import ray.data as rd
    from sift_ray.functions.similarity import pca_fit, pca_project
    rng = np.random.RandomState(7)
    # anisotropic cloud so components are well separated
    base = rng.randn(400, 6) * np.array([10.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    rot, _ = np.linalg.qr(rng.randn(6, 6))
    X = base @ rot + rng.randn(6) * 3
    df = pd.DataFrame({"vec_id": np.arange(400),
                       "embedding": [r.tolist() for r in X]})
    ds = rd.from_pandas(df).repartition(4)
    loadings, model = pca_fit(ds, k=3, num_parts=num_parts)
    out = loadings.to_pandas().sort_values(["component", "dim"])

    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    ref_evals = evals[order]
    ref = evecs[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]

    got = out["loading"].to_numpy().reshape(3, 6)
    assert np.allclose(got, ref, atol=1e-6)
    got_evals = out.groupby("component")["eigenvalue"].first().to_numpy()
    assert np.allclose(got_evals, ref_evals, rtol=1e-9)
    evr = out.groupby("component")["explained_var_ratio"].first()
    assert (evr.to_numpy() > 0).all() and evr.iloc[0] > 0.5

    # projection: matches centered matmul, preserves ids
    proj = pca_project(ds, model).to_pandas().sort_values("vec_id")
    P = np.stack(proj["proj"].to_numpy())
    refP = (X - X.mean(axis=0)) @ ref.T
    assert np.allclose(np.abs(P), np.abs(refP), atol=1e-5)


def test_pca_partition_invariant(ray_session):
    import ray.data as rd
    from sift_ray.functions.similarity import pca_fit
    rng = np.random.RandomState(3)
    X = rng.randn(200, 4)
    df = pd.DataFrame({"vec_id": np.arange(200),
                       "embedding": [r.tolist() for r in X]})
    a, _ = pca_fit(rd.from_pandas(df).repartition(1), k=2)
    b, _ = pca_fit(rd.from_pandas(df).repartition(13), k=2)
    pa_ = a.to_pandas().sort_values(["component", "dim"]).reset_index(drop=True)
    pb = b.to_pandas().sort_values(["component", "dim"]).reset_index(drop=True)
    assert np.allclose(pa_["loading"], pb["loading"], atol=1e-9)
