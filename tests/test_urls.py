"""URL canonicalization rules and canonical-URL dedup."""

import datetime

import pandas as pd
import pyarrow as pa

from sift_ray.functions.urls import canonical_url


def test_canonical_url_rules():
    assert canonical_url("HTTP://Example.COM:80/a#frag") == \
        "http://example.com/a"
    assert canonical_url("https://example.com:443/") == "https://example.com/"
    assert canonical_url("https://example.com:8443/x") == \
        "https://example.com:8443/x"
    assert canonical_url("http://example.com") == "http://example.com/"
    # tracking params dropped, the rest sorted by (key, value)
    assert canonical_url(
        "http://e.com/p?utm_source=x&b=2&a=1&gclid=99&fbclid=z&a=0") == \
        "http://e.com/p?a=0&a=1&b=2"
    assert canonical_url("http://e.com/p?ref=tw&keep=1") == \
        "http://e.com/p?keep=1"
    # trailing host dot, preserved case-sensitive path
    assert canonical_url("http://E.com./CaseSensitive") == \
        "http://e.com/CaseSensitive"
    # non-navigational / unparseable
    assert canonical_url("ftp://e.com/x") is None
    assert canonical_url("not a url") is None
    assert canonical_url("http://") is None


def test_url_dedup_keeps_earliest_ts(ray_session):
    import ray.data as rd
    from sift_ray.functions.urls import url_dedup
    t0 = datetime.datetime(2020, 1, 1)
    df = pd.DataFrame({
        "url": [
            "http://a.com/x?utm_source=feed",   # dup group A (later)
            "http://A.com:80/x",                # dup group A (earliest)
            "http://a.com/x?v=2",               # distinct (real param)
            "::::bad::::",                      # unparseable, kept raw
        ],
        "warc_ts": [t0 + datetime.timedelta(days=d) for d in (5, 1, 2, 3)],
        "payload": ["late", "early", "v2", "bad"],
    })
    out = (url_dedup(rd.from_pandas(df).repartition(3), ts_col="warc_ts")
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert sorted(out.payload) == ["bad", "early", "v2"]
    # the kept group-A row is the earliest fetch, raw url preserved
    assert "early" in set(out.payload)
    assert set(out.columns) == {"url", "warc_ts", "payload"}


def test_url_dedup_lexicographic_without_ts(ray_session):
    import ray.data as rd
    from sift_ray.functions.urls import url_dedup
    df = pd.DataFrame({"url": ["http://b.com/x?utm_medium=m",
                               "http://B.com/x",
                               "http://c.com/y"]})
    out = url_dedup(rd.from_pandas(df)).to_pandas()
    # keep-first by raw url: "http://B.com/x" < "http://b.com/x?..."
    assert sorted(out.url) == ["http://B.com/x", "http://c.com/y"]


def test_assign_splits_host_grouped_and_balanced(ray_session):
    import pandas as pd
    import ray.data as rd
    from sift_ray.functions.urls import assign_splits
    urls = [f"http://host{h}.com/page{p}" for h in range(300)
            for p in range(3)]
    df = pd.DataFrame({"url": urls})
    out = assign_splits(rd.from_pandas(df).repartition(4)).to_pandas()
    out["host"] = out.url.str.extract(r"http://(host\d+\.com)")
    # every page of a host lands in ONE split (leakage safety)
    assert (out.groupby("host").split.nunique() == 1).all()
    frac = out.split.value_counts(normalize=True)
    assert 0.8 < frac.get("train", 0) < 0.97
    assert frac.get("val", 0) > 0.01 and frac.get("test", 0) > 0.01
    # deterministic under repartitioning
    out2 = assign_splits(rd.from_pandas(df).repartition(2)).to_pandas()
    assert out.sort_values("url").split.tolist() == \
        out2.sort_values("url").split.tolist()


ADVERSARIAL_URLS = [
    None, "", "   ", "not a url", "ftp://a.com/x", "mailto:a@b.com",
    "http://Example.COM/Path", "http://example.com", "http://example.com/",
    "https://example.com:443/x", "https://example.com:8443/x",
    "http://example.com:80/x", "http://example.com:8080/x",
    "http://user:pw@example.com/x", "http://example.com./x",
    "http://example.com/x?utm_source=a&b=2&a=1",
    "http://example.com/x?b=2&a=1#frag", "http://example.com/#frag",
    "http://example.com/x?", "http://example.com/x?a",
    "  http://example.com/x  ", "http://exa mple.com/x",
    "http://example.com//double//slash", "http://example.com/a%20b",
    "http://example.com/UPPER/Case", "http://example.com/x;param=1",
    "http://xn--bcher-kva.example/x", "http://[::1]:8080/x",
    "http://[::1]/x", "http://:80/x", "http:///x", "http://?q=1",
    "HTTP://EXAMPLE.COM/X", "http://-dash.example/x",
    "http://dash-.example/x", "http://a/x", "http://9.9.9.9/x",
    "http://example.com/x?gclid=1&keep=2&fbclid=3&ref=z",
    "http://example.com/x?z=1&z=0&a=9",  # param sort by (key, value)
    "http://example.com/tab\tchar", "http://example.com/x\n",
]


def test_canonical_urls_array_matches_per_row():
    import pyarrow as pa
    from sift_ray.functions.urls import canonical_url, canonical_urls_array
    col = pa.array(ADVERSARIAL_URLS, pa.string())
    got = canonical_urls_array(col).to_pylist()
    want = [canonical_url(u) if u is not None else None
            for u in ADVERSARIAL_URLS]
    assert got == want


def test_canonical_urls_array_property():
    """Randomized cross-check: assembled URL soup, vectorized == per-row."""
    import random
    import pyarrow as pa
    from sift_ray.functions.urls import canonical_url, canonical_urls_array
    rng = random.Random(7)
    schemes = ["http", "https", "HTTP", "ftp", ""]
    hosts = ["example.com", "Sub.Example.com", "a.b-c.de", "x", "x.",
             "127.0.0.1", "[::1]", "", "ex_ample.com"]
    ports = ["", ":80", ":443", ":8080", ":0"]
    paths = ["", "/", "/a/b", "/A%2fB", "//x", "/x;y"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=x&a=1", "?a"]
    frags = ["", "#f"]
    urls = []
    for _ in range(600):
        urls.append(rng.choice(schemes) + "://" + rng.choice(hosts)
                    + rng.choice(ports) + rng.choice(paths)
                    + rng.choice(queries) + rng.choice(frags))
    got = canonical_urls_array(pa.array(urls, pa.string())).to_pylist()
    want = [canonical_url(u) for u in urls]
    assert got == want


def test_host_of_urls():
    import pyarrow as pa
    from sift_ray.functions.urls import host_of_urls
    col = pa.array(["http://a.com/x", "https://b.io:8080/", "http://c.de",
                    "not a url", None], pa.string())
    assert host_of_urls(col).to_pylist() == \
        ["a.com", "b.io:8080", "c.de", None, None]
