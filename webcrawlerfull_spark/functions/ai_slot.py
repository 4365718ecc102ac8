"""P10/P11 — the AI-parser slot's columnar pre/post-processing, plus a
deterministic stand-in for the live-LLM parser itself.

The reference's AI parser (out of scope: live LLM calls) wraps two pure
transformations that ARE in scope:

- P11: prompt truncation — the page HTML is cut to the first 10,000
  characters before it reaches the model
  (/root/reference/worker/src/parsers/ai_parser_langchain.py:82).
- P10: output post-processing — every URL the model returns is
  absolutized against the page URL and deduplicated preserving FIRST
  occurrence order (``BaseAIParser._process_urls``,
  /root/reference/worker/src/parsers/ai_parser_langchain.py:109-128).

Both are native column expressions (codegen, no Python). The stand-in
``fake_ai_candidates`` makes the cascade's ``ai`` rank exercisable end to
end without a network: it is OFF by default so reference parity (AI stub
returns nothing) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AI_HTML_TRUNCATE = 10_000  # ai_parser_langchain.py:82


def truncate_html(html: Column, n: int = AI_HTML_TRUNCATE) -> Column:
    """P11 — first ``n`` characters of the page HTML (the AI prompt
    payload). Constant-folded substring; at 100 TB this bounds the bytes
    shipped to any downstream model stage."""
    return F.substring(html, 1, n)


def absolutize_and_dedup(urls: Column, base_url: Column) -> Column:
    """P10 — ``_process_urls`` exactly (ai_parser_langchain.py:109-128).
    NOT RFC 3986 resolution (that lives in the parse UDF, P2) — the
    reference's own three-branch rule, reproduced branch for branch:

    - href starting with '/': appended to the FULL page URL with exactly
      one trailing '/' stripped first — ``'https://h/cat/c3' + '/x' ->
      'https://h/cat/c3/x'`` (the page path is kept, unlike urljoin)
    - href not starting with http:// or https://: ``base_url.rstrip('/')
      + '/' + href.lstrip('/')``
    - otherwise (http/https absolute): passed through

    Dedup preserves FIRST occurrence (``array_distinct`` keeps the first
    copy)."""
    base_one = F.regexp_replace(base_url, r"/$", "")   # base_url[:-1] iff trailing '/'
    base_all = F.regexp_replace(base_url, r"/+$", "")  # base_url.rstrip('/')

    def _abs(u):
        return (
            F.when(u.startswith("/"), F.concat(base_one, u))
            .when(u.startswith("http://") | u.startswith("https://"), u)
            .otherwise(
                F.concat(base_all, F.lit("/"), F.regexp_replace(u, r"^/+", ""))
            )
        )

    return F.array_distinct(F.transform(urls, _abs))


def fake_ai_candidates(link_spans: Column, page_url: Column) -> Column:
    """Deterministic AI-parser stand-in: 'reads' the (truncated) page and
    returns the anchor hrefs a product-finding LLM would plausibly emit —
    here, anchors whose URL mentions /detail|/buy|/goods — then applies
    the real P10 post-processing. Exists so the cascade's ``ai`` rank,
    early-exit interaction, and attribution are testable; parity runs
    leave it disabled (the reference AI slot is a stub)."""
    hrefs = F.transform(link_spans, lambda s: s["media_ref"])
    cand = F.filter(hrefs, lambda u: F.lower(u).rlike(r"/detail|/buy|/goods"))
    return absolutize_and_dedup(cand, page_url)
