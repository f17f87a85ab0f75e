"""Mint frozen golden extraction outputs (the byte-identity gate).

Per SURVEY.md §5: the sandbox has no Go toolchain or network, so goldens
cannot be produced by executing the reference binary; they are minted by THIS
implementation once it passes every ported reference assertion
(tests/test_extract.py etc.), then frozen. tests/test_goldens.py re-runs the
pipeline and compares extracted_md byte-for-byte per (url, mode).

Run: python tools/mint_goldens.py   (overwrites tests/goldens/extract_goldens.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.config import SiftConfig, default_config  # noqa: E402
from sift_ray.extract.api import ExtractError, to_markdown  # noqa: E402
from sift_ray.sources.pages import gen_page  # noqa: E402
from sift_ray.textproc.document import sift_markdown  # noqa: E402

N_PAGES = 64

MODES = [
    ("readability", SiftConfig(max_units=0)),
    ("include_all", SiftConfig(max_units=0, include_all=True)),
    ("selector:p", SiftConfig(max_units=0, selector="p")),
    ("default_2500tok", default_config()),  # sift's no-flag default path
    ("search_sift", default_config(search="sifting flour texture")),
    ("word_100_middle", SiftConfig(max_units=100, counting_method="words",
                                   sizing_strategy="middle")),
]


def extract_one(html: str, url: str, cfg: SiftConfig) -> str:
    try:
        md = to_markdown(html, selector=cfg.selector,
                         include_all=cfg.include_all, base_url=url)
    except ExtractError as exc:
        return f"__ERROR__:{exc}"
    return sift_markdown(md, cfg)


def main() -> None:
    out = []
    for i in range(N_PAGES):
        page = gen_page(i)
        html = page["html"].decode("utf-8", errors="replace")
        for mode, cfg in MODES:
            result = extract_one(html, page["url"], cfg)
            out.append({"url": page["url"], "mode": mode, "extracted_md": result})
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "extract_goldens.json"), "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=0)
    print(f"minted {len(out)} goldens")


if __name__ == "__main__":
    main()
