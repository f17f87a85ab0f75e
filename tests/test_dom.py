"""DOM parser / selector / serializer unit tests."""

import pytest

from sift_ray.dom import SelectorError, inner_html, outer_html, parse_html, select


def test_basic_tree():
    doc = parse_html("<html><body><div id='a'><p>hi</p></div></body></html>")
    body = doc.find_first("body")
    assert body is not None
    div = doc.find_first("div")
    assert div.get("id") == "a"
    assert div.text_content() == "hi"


def test_implied_body():
    doc = parse_html("<p>bare paragraph</p>")
    body = doc.find_first("body")
    assert body is not None
    assert body.find_first("p").text_content() == "bare paragraph"


def test_head_synthesis():
    doc = parse_html("<title>T</title><p>content</p>")
    head = doc.find_first("head")
    assert head is not None and head.find_first("title").text_content() == "T"
    assert doc.find_first("body").find_first("p") is not None


def test_unclosed_tags():
    doc = parse_html("<div><h1>Header<p>para<div class='n'><span>x</span></div></div>")
    h1 = doc.find_first("h1")
    assert "Header" in h1.text_content()
    assert doc.find_first("span").text_content() == "x"


def test_p_auto_close():
    doc = parse_html("<body><p>one<p>two</body>")
    ps = list(doc.find_first("body").iter_elements("p"))
    assert len(ps) == 2
    assert ps[0].text_content() == "one"
    assert ps[1].text_content() == "two"


def test_li_auto_close():
    doc = parse_html("<ul><li>a<li>b<li>c</ul>")
    lis = list(doc.iter_elements("li"))
    assert [li.text_content() for li in lis] == ["a", "b", "c"]


def test_entities_decoded():
    doc = parse_html("<p>a &amp; b &lt;c&gt; &#233;</p>")
    assert doc.find_first("p").text_content() == "a & b <c> é"


def test_deep_nesting_no_recursion_error():
    html = "<div>" * 3000 + "deep" + "</div>" * 3000
    doc = parse_html(html)
    assert "deep" in doc.text_content()
    assert doc.find_first("body").depth_below() >= 3000


def test_selectors():
    doc = parse_html(
        '<body><div class="outer"><div class="inner" id="x" data-k="v">'
        "<p>one</p><p>two</p></div></div><p>three</p></body>")
    assert len(select(doc, "p")) == 3
    assert len(select(doc, ".outer .inner")) == 1
    assert len(select(doc, ".outer > .inner")) == 1
    assert len(select(doc, "#x")) == 1
    assert len(select(doc, "div.inner")) == 1
    assert len(select(doc, "[data-k]")) == 1
    assert len(select(doc, "[data-k=v]")) == 1
    assert len(select(doc, '[data-k="v"]')) == 1
    assert len(select(doc, "p, div")) == 5
    assert select(doc, ".missing") == []
    assert len(select(doc, "*")) >= 6


def test_selector_invalid():
    doc = parse_html("<p>x</p>")
    for bad in (">>invalid<<", "", "  ", "..", "div >"):
        with pytest.raises(SelectorError):
            select(doc, bad)


def test_selector_document_order():
    doc = parse_html("<body><p>1</p><div><p>2</p></div><p>3</p></body>")
    assert [p.text_content() for p in select(doc, "p")] == ["1", "2", "3"]


def test_serialize_roundtrip():
    doc = parse_html('<body><div class="c">a <b>x</b> &amp; y<br>z</div></body>')
    div = doc.find_first("div")
    html = outer_html(div)
    assert html == '<div class="c">a <b>x</b> &amp; y<br/>z</div>'
    reparsed = parse_html(html)
    assert reparsed.find_first("div").text_content() == div.text_content()


def test_inner_html_escaping():
    doc = parse_html("<p>1 &lt; 2 &amp; 3 &gt; 2</p>")
    assert inner_html(doc.find_first("p")) == "1 &lt; 2 &amp; 3 &gt; 2"


def test_clone_independent():
    doc = parse_html("<div><p>a</p></div>")
    div = doc.find_first("div")
    c = div.clone()
    c.children[0].remove()
    assert div.find_first("p") is not None
    assert c.find_first("p") is None
