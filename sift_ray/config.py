"""Pipeline configuration, mirroring the reference Config struct.

Reference: internal/app/sift.go:55-70 (Config) and cmd/sift/main.go:17-127
(buildConfig defaults). Config is plain data broadcast to actors via
constructor args — never a column.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

TOKENS = "tokens"
WORDS = "words"
CHARACTERS = "characters"

BEGINNING = "beginning"
MIDDLE = "middle"
END = "end"

FORMAT_MARKDOWN = "markdown"
FORMAT_TEXT = "text"
FORMAT_JSON = "json"


@dataclass(frozen=True)
class SiftConfig:
    """All pipeline parameters (reference sift.go:55-70)."""

    selector: str = ""              # CSS selector (overrides include_all)
    max_units: int = 0              # 0/negative = no size limit
    counting_method: str = TOKENS   # tokens | words | characters
    sizing_strategy: str = BEGINNING
    search_query: str = ""
    output_format: str = FORMAT_MARKDOWN
    context_before: int = 1         # chunks before each search hit (main.go:119)
    context_after: int = 2          # chunks after each search hit (main.go:120)
    context_units: int = 0          # smart-context unit budget
    use_smart_context: bool = False
    include_all: bool = False       # skip readability + classification
    sniff_charset: bool = False     # engine extension: decode raw bytes via
                                    # the BOM/meta/UTF-8/cp1252 ladder
                                    # (functions/charset.py) instead of the
                                    # reference's implicit utf-8; off by
                                    # default so goldens stay byte-identical

    def with_(self, **kw) -> "SiftConfig":
        return replace(self, **kw)


def default_config(search: str = "", token_limit: int = 0, word_limit: int = 0,
                   char_limit: int = 0, **kw) -> SiftConfig:
    """Mirror the CLI default-resolution logic (cmd/sift/main.go:36-61):
    explicit limit wins; otherwise 2500 tokens unless a search query is given
    (search without limits => no size constraint)."""
    if token_limit > 0:
        method, max_units = TOKENS, token_limit
    elif word_limit > 0:
        method, max_units = WORDS, word_limit
    elif char_limit > 0:
        method, max_units = CHARACTERS, char_limit
    elif search == "":
        method, max_units = TOKENS, 2500
    else:
        method, max_units = TOKENS, 0
    return SiftConfig(search_query=search, counting_method=method,
                      max_units=max_units, **kw)
