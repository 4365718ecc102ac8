"""Document-order HTML tokenization (stdlib, dependency-free).

Stand-in for the reference's BeautifulSoup ``html.parser`` usage
(/root/reference/worker/src/tasks.py:71-79 ``soup.find_all("a", href=True)``
+ ``a_tag.get_text()``; /root/reference/worker/src/parsers/_pattern_parser.py:25-31).
bs4 is not available in this environment; for the well-formed HTML this
engine processes, stdlib ``html.parser`` yields identical anchors in
identical document order.

This module is deliberately shared by BOTH the Spark engine UDF and the
pytest oracle: it is the ground-truth *tokenization*. The semantics under
test (classification, ordering, dedup, cascade, attribution) are
implemented independently on each side.

Events emitted in document order:
    ("text", chunk)           raw character data outside <a>, unstripped
    ("anchor", href, text)    an <a href=...> element; text = concatenated
                              descendant character data (get_text semantics)
    ("media", src)            an <img src=...> element
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_TEXT_WITHIN = {"script", "style"}


class _Tokenizer(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.events: list[tuple] = []
        self._anchor_href: str | None = None
        self._anchor_text: list[str] = []
        self._anchor_depth = 0
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_WITHIN:
            self._skip_depth += 1
            return
        if tag == "a":
            attrs_d = dict(attrs)
            href = attrs_d.get("href")
            if self._anchor_depth == 0:
                self._anchor_href = href
                self._anchor_text = []
            self._anchor_depth += 1
            return
        if tag == "img":
            src = dict(attrs).get("src")
            if src:
                self.events.append(("media", src))

    def handle_startendtag(self, tag, attrs):
        if tag == "img":
            src = dict(attrs).get("src")
            if src:
                self.events.append(("media", src))

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_WITHIN:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1
            if self._anchor_depth == 0:
                self.events.append(
                    ("anchor", self._anchor_href, "".join(self._anchor_text))
                )
                self._anchor_href = None
                self._anchor_text = []

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._anchor_depth > 0:
            self._anchor_text.append(data)
        else:
            self.events.append(("text", data))


def tokenize(html: str) -> list[tuple]:
    """Parse ``html`` into the document-order event list described above."""
    t = _Tokenizer()
    t.feed(html or "")
    t.close()
    # unterminated trailing anchor: flush it like bs4's lenient close
    if t._anchor_depth > 0:
        t.events.append(("anchor", t._anchor_href, "".join(t._anchor_text)))
    return t.events
