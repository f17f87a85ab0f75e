"""Differential tests: the fast regex HTML scanner must produce the exact
same tree as the stdlib html.parser path, or fall back."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sift_ray.dom.parser import (_FAST_UNSAFE_RE, _TreeBuilder, _fast_feed,
                                 parse_html)
from sift_ray.dom.serialize import outer_html


def _fast_tree_or_none(h):
    if _FAST_UNSAFE_RE.search(h) is not None:
        return None
    b = _TreeBuilder()
    try:
        _fast_feed(b, h)
    except Exception:
        return None
    if b.body is None:
        b._ensure_body()
    return b.root


ADVERSARIAL = [
    '<html><body><p>a &amp; b &lt;c&gt; &#65; &#x42; &unknown; &amp</p>',
    '<div class="a b" id=\'x\' data-n=3 checked>text</div>',
    '<br/><br /><hr/><img src=x alt="y"/>',
    '<a href=foo/>slash value</a>',
    '<a href="x"/>selfclose</a>',
    '<script>if (a<b && c>d) { x("</div>"); }</script><p>after</p>',
    '<style>a>b { color: red; }</style><p>s</p>',
    '<!DOCTYPE html><html><body><p>doc</p>',
    '<!-- comment --><p>x</p><!-- multi\nline -->',
    '<p>unclosed<p>another<div>nested',
    '<ul><li>one<li>two<li>three</ul>',
    '<table><tr><td>a<td>b<tr><td>c</table>',
    '<P CLASS="Upper">MiXeD</P>',
    '<div\nclass="nl">newline in tag</div>',
    '<em>outer <strong>inner</em> tail</strong>',
    'plain text only, no tags at all & < > loose',
    '<textarea><b>parsed as tags</b></textarea>',
    '<title>the <i>title</i></title><p>body</p>',
    '<div title="a&quot;b">q</div>',
    '<a href="">empty</a><a href>none</a>',
    '<foo-bar custom>custom element</foo-bar>',
    '<svg><circle r=1/></svg><p>after svg</p>',
    '\x00weird<div>\x01</div>',
    '<div  multiple   spaces = "v" >sp</div>',
    '</span>\n\t<<a href=y>&amp;',
    'x<<p>bare lt</p>',
    '<span/ >x</span>',
    '<a href="x" / >y</a>',
    '<div foo="a b" =>x</div>',
    '<div/ >q</div>',
    '<a href=foo/ >v</a>',
    '<!-->x<p>after</p>',
    '<!--->y<p>after</p>',
    '<!---->z<p>after</p>',
    '<!----->w<p>after</p>',
]


def test_abrupt_comment_close_falls_back():
    # html.parser emits '<!-->' / '<!--->' as literal TEXT, which the fast
    # scanner's decl branch would silently drop — they must hit the unsafe
    # regex and take the stdlib path
    for h in ('<!-->', '<!--->', 'a<!-->b', 'a<!--->b'):
        assert _FAST_UNSAFE_RE.search(h) is not None, h


def test_adversarial_cases_match_stdlib():
    for h in ADVERSARIAL:
        ft = _fast_tree_or_none(h)
        if ft is None:
            continue  # fallback is always allowed
        assert outer_html(ft) == outer_html(parse_html(h, fast=False)), h


def test_corpus_pages_all_fast_and_identical():
    from sift_ray.sources.pages import gen_page
    for i in range(0, 120):
        h = gen_page(i)["html"].decode("utf-8")
        ft = _fast_tree_or_none(h)
        assert ft is not None, f"page {i} unexpectedly fell back"
        assert outer_html(ft) == outer_html(parse_html(h, fast=False)), i


def test_fuzz_tag_soup_matches_stdlib():
    rng = random.Random(7)
    frags = ['<div>', '</div>', '<p>', '</p>', '<a href="x">', '<a href=y>',
             '</a>', '<br>', '<br/>', '<img src=a>', 'text ', '&amp;', '&lt;',
             '& ', '<', '>', '<!-- c -->', '<span class="s">', '</span>',
             '<b>', '</b>', '"', "'", '<ul><li>', '</li></ul>',
             '<script>a<b</script>', '<style>.x{}</style>', '=', '/',
             '<em >', '</ em>', '<x-y z>', '<div class=>', '<div =bad>',
             '<p junk"quote>', '\n', '\t', '<!DOCTYPE html>', '<h1>',
             '</h3>', '<td>', '<tr>', '<input type=text />',
             '<div foo="a b">', '<span/ >', '<a title=\'c d\' =>',
             '<!-->', '<!--->', '<!---->']
    for _ in range(1500):
        h = "".join(rng.choice(frags) for _ in range(rng.randint(1, 25)))
        ft = _fast_tree_or_none(h)
        if ft is None:
            continue
        assert outer_html(ft) == outer_html(parse_html(h, fast=False)), repr(h)


def test_unsafe_constructs_fall_back():
    for h in ('<?php echo 1 ?>', '<![CDATA[x]]>', '<!ENTITY x>',
              '</ div>', '<a href="x>y">broken</a>'):
        assert (_FAST_UNSAFE_RE.search(h) is not None
                or _fast_tree_or_none(h) is None
                or outer_html(_fast_tree_or_none(h))
                == outer_html(parse_html(h, fast=False)))


def test_rawtext_close_variants_match_stdlib():
    cases = [
        '<script>var a=1;</scriptx>b</script><p>hi</p>',
        '<script>x</script/>tail',
        '<script>x</script >tail',
        '<script>x</script\n>tail',
        '<script>x</scripty>y</script><p>z</p>',
        '<style>.a{}</styleX>b</style><p>c</p>',
        '<script>never closed',
        '<script>a</scr</script><p>q</p>',
    ]
    for h in cases:
        ft = _fast_tree_or_none(h)
        if ft is None:
            continue  # fallback is always correct
        assert outer_html(ft) == outer_html(parse_html(h, fast=False)), h
