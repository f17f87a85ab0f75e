"""Extraction tests ported from internal/extract/extract_test.go."""

import pytest

from sift_ray.extract import ExtractError, to_markdown
from tests.fixtures_html import BLOG_POST_HTML, MALFORMED_HTML, SIMPLE_HTML


# extract_test.go:98-249
@pytest.mark.parametrize("name,html,selector,contains,not_contains", [
    ("simple readability", SIMPLE_HTML, "",
     ["Main Article Title", "main content", "bold text", "italic text",
      "First list item"],
     ["Site Header", "Navigation", "sidebar content", "Footer content"]),
    ("blog readability", BLOG_POST_HTML, "",
     ["How to Bake", "carrot cake", "sifting flour", "Ingredients",
      "Instructions"],
     ["My Blog", "Related Posts"]),
    ("article selector", SIMPLE_HTML, "article",
     ["Main Article Title", "main content", "bold text", "First list item"],
     ["Site Header", "Navigation", "sidebar content", "Footer"]),
    ("class selector", BLOG_POST_HTML, ".post-content",
     ["sifting flour", "Ingredients", "Instructions", "2 cups flour",
      "The secret is in the sifting"],
     ["How to Bake", "Published on", "My Blog", "Related Posts"]),
    ("h3 selector multi", BLOG_POST_HTML, "h3",
     ["Ingredients", "Instructions"],
     ["How to Bake", "carrot cake", "sifting flour"]),
    ("ol selector", BLOG_POST_HTML, "ol",
     ["Sift the flour", "Mix wet ingredients", "Combine and bake"],
     ["Ingredients", "2 cups flour"]),
    ("blockquote selector", BLOG_POST_HTML, "blockquote",
     ["The secret is in the sifting"],
     ["Ingredients", "Instructions"]),
    ("malformed with selector", MALFORMED_HTML, ".content",
     ["Unclosed Header", "Paragraph without closing", "Some text"], []),
])
def test_to_markdown(name, html, selector, contains, not_contains):
    result = to_markdown(html, selector=selector)
    for expected in contains:
        assert expected in result, f"{name}: missing {expected!r}\n{result}"
    for unexpected in not_contains:
        assert unexpected not in result, f"{name}: has {unexpected!r}\n{result}"
    # no raw HTML tags in output (extract_test.go:236-247)
    if result.strip():
        for tag in ("<div>", "<span>", "<article>", "</div>", "</span>",
                    "</article>"):
            assert tag not in result


def test_selector_errors():
    # extract_test.go:164-175
    with pytest.raises(ExtractError):
        to_markdown(SIMPLE_HTML, selector=".non-existent")
    with pytest.raises(ExtractError):
        to_markdown(SIMPLE_HTML, selector=">>invalid<<")


def test_empty_html():
    # extract_test.go:184-196
    assert to_markdown("", selector="").strip() == ""
    assert to_markdown("   \n\t   ", selector="").strip() == ""


# extract_test.go:251-323 — markdown format shapes
def test_headers_format():
    result = to_markdown(
        "<html><body><h1>Header 1</h1><h2>Header 2</h2><h3>Header 3</h3>"
        "</body></html>", selector="body")
    assert "# Header 1" in result
    assert "## Header 2" in result
    assert "### Header 3" in result


def test_lists_format():
    result = to_markdown(
        "<html><body><ul><li>Item 1</li><li>Item 2</li></ul>"
        "<ol><li>First</li><li>Second</li></ol></body></html>",
        selector="body")
    assert "- Item 1" in result
    assert "1. First" in result
    assert "2. Second" in result


def test_emphasis_format():
    result = to_markdown(
        "<html><body><p>This is <strong>bold</strong> and <em>italic</em> "
        "text.</p></body></html>", selector="body")
    assert "**bold**" in result
    assert "*italic*" in result


def test_blockquote_format():
    result = to_markdown(
        "<html><body><blockquote><p>This is a quote about sifting "
        "confectioner sugar for icing.</p></blockquote></body></html>",
        selector="body")
    assert "> This is a quote" in result


# extract_test.go:325-382 — edge cases run without error
@pytest.mark.parametrize("html,selector", [
    (r"<html><body><div>   \n\t   </div></body></html>", "div"),
    ('<html><body><div class="outer"><div class="inner">Content</div></div>'
     "</body></html>", ".outer .inner"),
    ("<html><body><p>Para 1</p><p>Para 2</p><p>Para 3</p></body></html>", "p"),
    ("<html><body><div><article><header><h1>Title</h1></header><section>"
     "<p>Content</p></section></article></div></body></html>", "article"),
])
def test_edge_cases_no_error(html, selector):
    to_markdown(html, selector=selector)


def test_nested_selector_content():
    result = to_markdown(
        '<html><body><div class="outer"><div class="inner">Content</div>'
        "</div></body></html>", selector=".outer .inner")
    assert "Content" in result


def test_multiple_matches_joined():
    result = to_markdown(
        "<html><body><p>Para 1</p><p>Para 2</p><p>Para 3</p></body></html>",
        selector="p")
    assert "Para 1" in result and "Para 2" in result and "Para 3" in result


# extract_test.go:384-433 — <br> handling
@pytest.mark.parametrize("html,contains", [
    ("<html><body><p>Line one<br>Line two<br>Line three</p></body></html>",
     ["Line one", "Line two", "Line three"]),
    ("<html><body><p>First line<br/>Second line</p></body></html>",
     ["First line", "Second line"]),
    ("<html><body><p>Line one<br><br>Line two</p></body></html>",
     ["Line one", "Line two"]),
])
def test_br_line_breaks(html, contains):
    result = to_markdown(html, selector="p")
    for expected in contains:
        assert expected in result
    assert "oneLine two" not in result
    assert "lineSecond" not in result


def test_include_all():
    # convertAllHTML keeps everything (extract.go:95-104)
    result = to_markdown(SIMPLE_HTML, include_all=True)
    assert "Site Header" in result
    assert "Main Article Title" in result
    assert "Footer content" in result


def test_selector_overrides_include_all():
    # extract.go:28 — selector wins over include_all
    result = to_markdown(SIMPLE_HTML, selector="article", include_all=True)
    assert "Site Header" not in result
    assert "Main Article Title" in result


def test_text_index_matches_walk_based_helpers():
    """_TextIndex.text/link_density must equal the subtree-walk helpers on
    random trees, including <a>-wrapper edge cases (ancestor <a> sharing a
    start offset, nested <a>, empty <a>)."""
    import random
    from sift_ray.dom.parser import parse_html
    from sift_ray.extract.readability import (_TextIndex, _inner_text,
                                              _link_density)

    rng = random.Random(11)
    frags = ['<a href="x">link text</a>', '<a href="#">anchor</a>',
             '<a href="y"><div>wrapped block {i}</div></a>',
             '<a></a>', '<p>plain paragraph {i} with words</p>',
             '<div><a href="z">inner {i}</a> tail</div>',
             '<span>span {i}</span>', 'loose text {i} ',
             '<a href="q"><a href="r">nested {i}</a></a>',
             '<ul><li><a href="l">item link</a></li><li>item {i}</li></ul>']
    for trial in range(60):
        body = "".join(rng.choice(frags).replace("{i}", str(j))
                       for j in range(rng.randint(2, 12)))
        doc = parse_html(f"<html><body>{body}</body></html>")
        idx = _TextIndex(doc)
        for node in doc.iter():
            if node.type != 0:  # ELEMENT
                continue
            assert idx.text(node) == _inner_text(node), (trial, node.tag)
            assert idx.link_density(node) == _link_density(node), \
                (trial, node.tag, idx.text(node))


def test_textindex_counts_match_walks():
    """The element-position range queries must equal subtree walks for the
    candidate tags _clean_conditionally evaluates (index excludes self;
    candidate tags are never in the counted set)."""
    import random
    from sift_ray.dom.parser import ELEMENT, parse_html
    from sift_ray.extract.readability import _TextIndex

    rng = random.Random(12)
    tags = ["div", "p", "ul", "ol", "li", "table", "tr", "td", "img",
            "input", "object", "embed", "iframe", "span", "a"]

    def gen(depth):
        if depth == 0 or rng.random() < 0.3:
            return "text %d " % rng.randint(0, 9)
        t = rng.choice(tags)
        inner = "".join(gen(depth - 1) for _ in range(rng.randint(0, 4)))
        return f"<{t}>{inner}</{t}>"

    def walk_counts(node):
        p = img = li = inputs = embeds = 0
        for d in node.iter():
            if d.type != ELEMENT:
                continue
            t = d.tag
            if t == "p":
                p += 1
            elif t == "img":
                img += 1
            elif t == "li":
                li += 1
            elif t == "input":
                inputs += 1
            elif t in ("object", "embed", "iframe"):
                embeds += 1
        return p, img, li, inputs, embeds

    checked = 0
    for _ in range(120):
        doc = parse_html("<html><body>" + gen(5) + "</body></html>")
        idx = _TextIndex(doc)
        for node in doc.iter_elements():
            if node.tag in ("table", "ul", "div", "ol"):
                got = (idx.elem_count(node, "p"), idx.elem_count(node, "img"),
                       idx.elem_count(node, "li"),
                       idx.elem_count(node, "input"), idx.embed_count(node))
                assert got == walk_counts(node)
                lt = idx.list_text_len(node)
                ref = sum(len(idx.text(lst)) for t in ("ul", "ol")
                          for lst in node.iter_elements(t))
                if node.tag in ("ul", "ol"):
                    ref -= len(idx.text(node))  # index excludes self
                assert lt == ref
                checked += 1
    assert checked > 100
