"""Byte-identity gate: frozen golden extraction outputs per (url, mode).

Goldens were minted by tools/mint_goldens.py after the implementation passed
every ported reference assertion (SURVEY.md §5), then frozen. Any change to
the extraction path that alters a single output byte fails here.
"""

import json
import os

import pytest

from tools.mint_goldens import MODES, extract_one
from sift_ray.sources.pages import gen_page

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "extract_goldens.json")


def _goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("mode", [m for m, _ in MODES])
def test_goldens_byte_identical(mode):
    goldens = [g for g in _goldens() if g["mode"] == mode]
    assert goldens, f"no goldens for mode {mode}"
    cfg = dict(MODES)[mode]
    mismatches = []
    for g in goldens:
        idx = int(g["url"].rsplit("/", 1)[1])
        page = gen_page(idx)
        assert page["url"] == g["url"]
        html = page["html"].decode("utf-8", errors="replace")
        result = extract_one(html, page["url"], cfg)
        if result != g["extracted_md"]:
            mismatches.append(g["url"])
    assert mismatches == [], f"{len(mismatches)} byte mismatches in {mode}"


def test_golden_coverage():
    goldens = _goldens()
    assert len(goldens) == 64 * len(MODES)
    ok = [g for g in goldens if not g["extracted_md"].startswith("__ERROR__")
          and g["extracted_md"] != ""]
    # the vast majority of (page, mode) combos must produce content
    assert len(ok) > len(goldens) * 0.9
