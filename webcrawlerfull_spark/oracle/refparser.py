"""Reference parse semantics, vendored for the pytest oracle.

Faithful reimplementations of the reference's pure functions, with the
two hash-order dependencies canonicalized per FIXTURES.md §5 (both the
oracle and the Spark engine adopt the same canonical order):

- ``find_urls`` returned ``list(set)`` (/root/reference/worker/src/tasks.py:106)
  → canonical: pagination links first, then others, each in first-seen
  document order.
- ``generate_sequential_urls`` used ``random.sample`` and set iteration
  (/root/reference/worker/src/tasks.py:129-133,162) → canonical: sample =
  first 10 in sorted order; output sorted before the 30-cap.

Everything else matches the reference line-for-line in behavior:
- normalize_url           tasks.py:23-53
- pagination classification  tasks.py:84-98 (text markers on stripped,
  lowered anchor text; URL patterns tested against the RAW href)
- product pattern matching   _pattern_parser.py:25-39 (match on joined
  absolute URL, emit ``full_url.rstrip('/')``, sorted unique)
- config key selection       config_parser.py:29-37 (first dict key, in
  insertion order, that re.search-es the page netloc; else "default")
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse, urlsplit, urlunsplit

from webcrawlerfull_spark import config as C
from webcrawlerfull_spark.html_tokens import tokenize

_PAGINATION_RES = [re.compile(p) for p in C.PAGINATION_PATTERNS]
_SIMPLE_RES = [re.compile(p) for p in C.PATTERNS]
_DOMAIN_RES = {k: [re.compile(p) for p in v] for k, v in C.DOMAIN_PATTERNS.items()}
_SEQ_RES = [re.compile(p) for p in C.SEQUENTIAL_NUMBER_PATTERNS]


def normalize_url(url: str) -> str:
    # tasks.py:23-53 — substring match on param NAME; '='-less params dropped
    try:
        parsed = urlsplit(url)
        filtered = []
        for param in parsed.query.split("&"):
            if param and "=" in param:
                name = param.split("=")[0].lower()
                if not any(t in name for t in C.TRACKING_PARAM_SUBSTRINGS):
                    filtered.append(param)
        return urlunsplit(
            (
                parsed.scheme,
                parsed.netloc.lower(),
                parsed.path.rstrip("/"),
                "&".join(filtered),
                "",
            )
        )
    except Exception:
        return url


def is_pagination(anchor_text: str, href: str) -> bool:
    # tasks.py:84-98 — note: regexes run on the raw href, not the joined URL
    text = (anchor_text or "").strip().lower()
    if any(m in text for m in C.PAGINATION_TEXT_MARKERS):
        return True
    return any(r.search(href or "") for r in _PAGINATION_RES)


def iter_anchors(html: str):
    """(href, anchor_text) for every <a href=...> in document order."""
    for ev in tokenize(html):
        if ev[0] == "anchor" and ev[1]:
            yield ev[1], ev[2]


def find_urls(html: str, base_url: str, domain_netloc: str) -> list[str]:
    # tasks.py:55-110 with canonical ordering (see module docstring)
    pagination: dict[str, None] = {}
    others: dict[str, None] = {}
    for href, text in iter_anchors(html):
        full = urljoin(base_url, href)
        p = urlparse(full)
        if p.netloc and p.netloc != domain_netloc:
            continue
        if is_pagination(text, href):
            pagination.setdefault(full, None)
        else:
            others.setdefault(full, None)
    return list(pagination) + [u for u in others if u not in pagination]


def pattern_parse(html: str, base_url: str, patterns: list[re.Pattern]) -> list[str]:
    # _pattern_parser.py:9-39 — match joined URL, emit rstrip('/'), sorted
    found = set()
    for href, _text in iter_anchors(html):
        full = urljoin(base_url, href)
        if any(r.search(full) for r in patterns):
            found.add(full.rstrip("/"))
    return sorted(found)


def config_key_for(page_url: str) -> str:
    # config_parser.py:29-37 — insertion-order first re.search on netloc
    netloc = urlparse(page_url).netloc
    for key in C.DOMAIN_PATTERNS:
        if re.search(key, netloc):
            return key
    return "default"


def simple_parse(html: str, base_url: str) -> list[str]:
    return pattern_parse(html, base_url, _SIMPLE_RES)


def config_parse(html: str, page_url: str) -> list[str]:
    return pattern_parse(html, page_url, _DOMAIN_RES[config_key_for(page_url)])


def ai_parse(html: str, page_url: str) -> list[str]:
    """Deterministic stub for the live-LLM parser (ai_parser_langchain.py)
    — out of scope per SURVEY.md; keeps the cascade slot."""
    return []


def generate_sequential_urls(product_urls, max_urls: int = C.SEQGEN_MAX_URLS) -> list[str]:
    # tasks.py:112-163, canonicalized sampling/ordering
    product_urls = set(product_urls)
    if len(product_urls) < C.SEQGEN_MIN_PRODUCTS:
        return []
    sample = sorted(product_urls)[: C.SEQGEN_SAMPLE]
    generated: set[str] = set()
    for pattern in _SEQ_RES:
        pattern_found = False
        for url in sample:
            m = pattern.search(url)
            if not m:
                continue
            pattern_found = True
            num = int(m.group(1))
            for i in range(1, 4):
                for new_num in ([num + i] + ([num - i] if num > i else [])):
                    # canonical replace semantics shared by the engine
                    # (cascade.py F.replace) and the DuckDB g1 oracle:
                    # take the FIRST match's text and string-replace every
                    # occurrence of it (the reference's re.sub rewrote each
                    # match occurrence independently — divergent only for
                    # URLs matching a numeric pattern more than once, which
                    # the canonicalization forbids; see FIXTURES.md §5)
                    generated.add(
                        url.replace(
                            m.group(0), m.group(0).replace(m.group(1), str(new_num))
                        )
                    )
        if pattern_found:
            break
    return sorted(u for u in generated if u not in product_urls)[:max_urls]


def parse_spans(html: str, base_url: str, domain_netloc: str) -> list[dict]:
    """Ground-truth interleaved spans (the input_hint payload) in document
    order. kind='pagination' only for internal links (the reference only
    classifies internal ones, tasks.py:83-98); external anchors stay
    kind='link'."""
    spans: list[dict] = []

    def add(kind, text, media_ref):
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    for ev in tokenize(html):
        if ev[0] == "text":
            chunk = ev[1].strip()
            if chunk:
                add("text", chunk, None)
        elif ev[0] == "anchor":
            href, text = ev[1], ev[2]
            if not href:
                continue
            full = urljoin(base_url, href)
            p = urlparse(full)
            internal = (not p.netloc) or p.netloc == domain_netloc
            kind = "pagination" if internal and is_pagination(text, href) else "link"
            add(kind, text.strip(), full)
        elif ev[0] == "media":
            add("media", None, urljoin(base_url, ev[1]))
    return spans
