"""tokenize_fast (regex scan) must be event-identical to the HTMLParser
reference tokenization on the synthetic corpus and on hand-written edge
cases — it is the shared ground-truth tokenizer for engine AND oracle,
so this equality is what licenses the swap."""

from __future__ import annotations

from webcrawlerfull_spark.html_tokens import tokenize_fast, tokenize_reference
from webcrawlerfull_spark.synthgen import World

EDGE_CASES = [
    "",
    "plain text only",
    "<p>hello &amp; goodbye</p>",
    '<a href="/x">link</a>tail',
    "<a href=''>empty quoted</a>",
    '<a href="">empty</a>',
    "<a>no href</a>",
    '<a href="/x"><b>bold</b> and <i>ital</i></a>',
    '<a href="/x?a=1&amp;b=2">entity in href</a>',
    "<a href='/sq'>single quotes</a>",
    "<a href=/unquoted>unquoted</a>",
    '<img src="/i.png">',
    '<img src="/i.png"/>',
    "<img src='/j.png' >",
    "<img alt nothing>",
    '<IMG SRC="/caps.png">',
    '<A HREF="/caps">CAPS TAG</A>',
    "<script>var x = '<a href=no>not a link</a>';</script>after",
    "<style>a { color: red }</style>text",
    'before<a href="/x">mid » ent&gt;ity</a>after',
    "<p>text with > bare gt</p>",
    '<a href="/x">anchor with > inside</a>',
    "text<br>more<hr/>even more",
    '<a href="/a">one</a><a href="/b">two</a>',
    "<title>t @ h</title><h1>H</h1>",
    # img nested in an anchor: media event emitted BEFORE the anchor event
    '<a href="/x"><img src="/t.png">thumb</a>',
    '<a href="/x"><img src="/a.png"><img src="/b.png"></a>tail',
    '<a href="/x">pre<img src="/i.png"/>post</a>',
    "<a href='/x'><IMG SRC='/caps.png'>txt</a>",
    '<a href="/x"><img alt="no src">only alt</a>',
    # script inside an anchor: its content is CDATA-skipped, and an img
    # inside it emits nothing
    '<a href="/x"><script>var s = "<img src=/no.png>";</script>cap</a>',
    '<a href="/x"><style>a{}</style>styled</a>',
    'loose<img src="/k.png">then<a href="/y"><b><img src="/n.png"></b>deep</a>',
]


def test_edge_cases_match_reference():
    for html in EDGE_CASES:
        assert tokenize_fast(html) == tokenize_reference(html), html


def test_corpus_pages_match_reference(world):
    urls = list(world.seeds())
    # walk two hops of every page kind from each seed
    seen, frontier = set(), list(urls)
    pages = 0
    while frontier and pages < 400:
        url = frontier.pop()
        if url in seen:
            continue
        seen.add(url)
        html = world.fetch(url)
        if html is None:
            continue
        pages += 1
        fast, ref = tokenize_fast(html), tokenize_reference(html)
        assert fast == ref, url
        for ev in ref:
            if ev[0] == "anchor" and ev[1] and ev[1].startswith("/"):
                frontier.append(url.split("/", 3)[0] + "//" + url.split("/")[2] + ev[1])
    assert pages > 100
