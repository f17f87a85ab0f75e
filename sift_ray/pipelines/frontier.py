"""Crawl-frontier build: sitemaps -> canonical URLs -> already-seen
anti-join -> per-host politeness schedule.

The third flagship composition (after the extraction job and corpus
prep): the DISCOVERY half of a crawl, stitched entirely from existing
operators — ``webstruct.sitemap_entries`` (frontier candidates),
``urls.canonical_url`` (dedupe key normalization), ``shuffle.hash_join
(how="anti")`` (drop URLs a previous crawl already fetched — a
corpus-sized seen set, so it must be an exchange, never a broadcast),
and ``urls.politeness_schedule`` (one fetch slot per host per interval).

Scale shape: TWO key exchanges total — the anti-join's url-keyed
exchange, whose partition kernel also applies the candidate DISTINCT
(the same page is legitimately listed in many sitemaps and under many
tracking-param variants; all copies of a url co-locate in the join's
exchange, so the distinct folds in via the ``post`` hook instead of
paying its own exchange), and the schedule's host-keyed exchange. Everything else is map-only. The seen
side ships only its canonical-url column. Hot hosts are inherent to
scheduling (a 10^7-page host owns 10^7 slots) and bound partition sort
memory only.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa


def build_frontier(sitemap_pages, seen_urls,
                   interval_us: int = 1_000_000,
                   num_parts: Optional[int] = None):
    """(url, html=sitemap XML) pages + a Dataset with a ``url`` column of
    already-fetched URLs -> (url, host, fetch_rank, slot_us) dispatch
    schedule for every NEW url discovered in the sitemaps.

    Both sides are canonicalized with the same ``canonical_url`` before
    the anti-join, so tracking-param/port/fragment variants of a seen
    URL never re-enter the frontier. Non-http(s)/unparseable locs drop.
    """
    import pyarrow.compute as pc

    from ..functions.shuffle import hash_join
    from ..functions.urls import (canonical_urls_array, host_of_urls,
                                  politeness_schedule)
    from ..functions.webstruct import sitemap_entries

    def canon_locs(t: pa.Table) -> pa.Table:
        # index entries point at more sitemaps, not pages
        pages_only = t.filter(pc.equal(t.column("kind"), "url"))
        canon = canonical_urls_array(pages_only.column("loc"))
        return pa.table({"url": canon.drop_null()})

    def canon_seen(t: pa.Table) -> pa.Table:
        canon = canonical_urls_array(t.column("url"))
        return pa.table({"url": canon.drop_null()})

    candidates = (sitemap_entries(sitemap_pages)
                  .map_batches(canon_locs, batch_format="pyarrow"))

    seen = seen_urls.map_batches(canon_seen, batch_format="pyarrow")

    # the candidate DISTINCT folds into the anti-join's url-keyed
    # exchange via the ``post`` hook (all copies of a url co-locate
    # there anyway) — one exchange instead of two. Type hints are
    # load-bearing: an unhinted join's schema() probe would execute the
    # whole candidate pipeline once for the probe and again for real.
    def distinct_urls(t: pa.Table) -> pa.Table:
        return t.group_by(["url"], use_threads=False).aggregate([])

    fresh = hash_join(candidates, seen, on=["url"], how="anti",
                      num_parts=num_parts,
                      left_types={"url": pa.string()},
                      right_types={"url": pa.string()},
                      post=distinct_urls)

    def add_host(t: pa.Table) -> pa.Table:
        # urls here are canonical (lowercase netloc), so one RE2 kernel
        return pa.table({"url": t.column("url"),
                         "host": host_of_urls(t.column("url"))})

    with_host = fresh.map_batches(add_host, batch_format="pyarrow")
    return politeness_schedule(with_host, host_col="host", id_col="url",
                               interval_us=interval_us,
                               num_parts=num_parts)
