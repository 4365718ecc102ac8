"""Deterministic synthetic web world.

Every page is a pure function of ``(seed, url)`` — any executor can render
any page with no stored HTML, which is how a 10^10-URL frontier stays
*addressable* while only the crawled slice is ever materialized
(FIXTURES.md §2). No network, no wall-clock, no global state.

World grammar (per host, all parameters derived from a stable digest of
``seed|host``):

    /                              home: links to categories, about, blog
    /category/c{j}                 category page 0
    /category/c{j}?page={n}        category pagination (n >= 2)
    <product paths per platform flavor — see _FLAVORS>
    /about, /blog/post-{k}         text pages
    external links, tracking-param links, media imgs sprinkled in

Host *flavors* exercise every DOMAIN_PATTERNS key of the reference
(/root/reference/worker/src/utils/config.py:79-102): the ConfigParser
picks its pattern set by regex-matching the key against the netloc, so
flavor substrings are embedded in hostnames.

Hot-domain skew: host page counts follow a Zipf-ish rank^-a law so one
host dominates — exercises salting (SURVEY.md §4 custom work #2).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from urllib.parse import urlparse

try:  # vectorized word stream (render hot path); stdlib fallback below
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None


def _digest(*parts) -> int:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big")


def _rng(*parts) -> random.Random:
    return random.Random(_digest(*parts))


_WORDS = (
    "lorem ipsum dolor commerce retail quality premium classic modern durable "
    "lightweight portable wireless ergonomic stylish affordable luxury compact "
    "versatile reliable innovative sustainable organic handmade vintage sleek "
    "robust elegant practical efficient seamless intuitive powerful advanced "
    "professional essential exclusive limited edition signature deluxe ultra "
    "warranty shipping delivery returns support reviews ratings bestseller"
).split()

class _WordStream:
    """Byte-identical, vectorized replacement for repeated
    ``g.choice(_WORDS)`` — the render hot path (~1.7k choice calls per
    product page was 93% of World.fetch time, profiled r7).

    CPython's ``Random.choice(seq)`` with ``len(seq) == 50`` consumes one
    MT19937 output word per draw via ``getrandbits(6)`` (= genrand_uint32
    >> 26), rejecting values >= 50. numpy's MT19937 bit generator shares
    the state layout with ``random.Random.getstate()``, so ``random_raw``
    yields the identical word sequence and the whole choice stream
    vectorizes (verified word-for-word in tests/test_extras.py). Only
    valid while nothing else consumes ``g`` afterwards — render()'s
    category/product branches qualify (paragraph words are their sole
    RNG use)."""

    __slots__ = ("_bg", "_acc", "_pos")

    # one bit-generator per process, re-stated per page: MT19937()
    # construction runs SeedSequence.generate_state (~65us) whose output
    # is immediately overwritten by the state assignment below. Python
    # workers are single-task, and a _WordStream never outlives its
    # render() call, so the shared generator is never aliased.
    _BG = None

    def __init__(self, g: random.Random, expect: int):
        st = g.getstate()[1]
        bg = _WordStream._BG
        if bg is None:
            bg = _WordStream._BG = _np.random.MT19937()
        bg.state = {
            "bit_generator": "MT19937",
            "state": {
                "key": _np.array(st[:-1], dtype=_np.uint32),
                "pos": st[-1],
            },
        }
        self._bg = bg
        self._acc: list[int] = []
        self._pos = 0
        self._fill(expect)

    def _fill(self, n: int) -> None:
        while len(self._acc) - self._pos < n:
            raw = self._bg.random_raw(max(256, int(n * 1.4)))
            vals = raw >> _np.uint64(26)
            self._acc = self._acc[self._pos :] + vals[vals < len(_WORDS)].tolist()
            self._pos = 0

    def words(self, n: int) -> list[str]:
        self._fill(n)
        w = _WORDS
        out = [w[i] for i in self._acc[self._pos : self._pos + n]]
        self._pos += n
        return out


# flavor -> (name template, product path builder)
_FLAVORS = [
    ("store", lambda k: f"/p/{k}"),                          # default patterns; seq /(\d+)(?:/|$)
    ("shopify", lambda k: f"/products/widget-{k}"),          # shopify patterns
    ("amazon", lambda k: f"/dp/B{k:09d}"),                   # amazon /dp/[A-Z0-9]{10}
    ("woocommerce", lambda k: f"/product/widget-{k}"),       # woocommerce
    ("magento", lambda k: f"/catalog/product/view/id/{k}"),  # magento; seq /(\d+)$
    ("bigcommerce", lambda k: f"/gizmo-p{k}"),               # bigcommerce; seq -p(\d+)
]


@dataclass(frozen=True)
class World:
    seed: int = 42
    n_hosts: int = 12
    base_pages: int = 60          # rank-1 host category*product budget scale
    zipf_a: float = 1.1
    fail_rate: float = 0.02       # deterministic fetch failures
    # fan-out knobs (defaults = small test world; bench raises them)
    cat_min: int = 2
    cat_span: int = 2
    per_page_min: int = 3
    per_page_span: int = 3
    max_pag: int = 4

    # ---- host enumeration -------------------------------------------------
    def hosts(self) -> list[dict]:
        out = []
        for rank in range(1, self.n_hosts + 1):
            flavor, _ = _FLAVORS[(rank - 1) % len(_FLAVORS)]
            host = f"www.{flavor}{rank}.example.com"
            n_pages = max(6, int(self.base_pages * rank ** (-self.zipf_a)))
            out.append({"host": host, "n_pages": n_pages, "zipf_rank": rank})
        return out

    def seeds(self) -> list[str]:
        return [f"https://{h['host']}" for h in self.hosts()]

    # ---- per-host derived parameters --------------------------------------
    def _host_rank(self, host: str) -> int | None:
        # O(1) inverse of the hosts() naming scheme (runs per-URL in the
        # fetch UDF — no scans)
        labels = host.split(".")
        if len(labels) != 4 or labels[0] != "www" or labels[2:] != ["example", "com"]:
            return None
        name = labels[1]
        flavor = name.rstrip("0123456789")
        digits = name[len(flavor):]
        if not digits.isdigit():
            return None
        rank = int(digits)
        if not (1 <= rank <= self.n_hosts):
            return None
        if _FLAVORS[(rank - 1) % len(_FLAVORS)][0] != flavor:
            return None
        return rank

    def _host_params(self, host: str) -> dict | None:
        rank = self._host_rank(host)
        if rank is None:
            return None
        n_pages = max(6, int(self.base_pages * rank ** (-self.zipf_a)))
        g = _rng(self.seed, host, "params")
        n_categories = self.cat_min + g.randrange(self.cat_span)
        products_per_cat_page = self.per_page_min + g.randrange(self.per_page_span)
        # pagination depth absorbs the page budget
        pag_pages = max(1, n_pages // (n_categories * products_per_cat_page))
        flavor = host.split(".")[1].rstrip("0123456789")
        builder = dict(_FLAVORS)[flavor]
        return {
            "rank": rank,
            "n_categories": n_categories,
            "per_page": products_per_cat_page,
            "pag_pages": min(self.max_pag, pag_pages),
            "flavor": flavor,
            "product_path": builder,
        }

    # ---- URL classification (the grammar) ----------------------------------
    def _classify(self, url: str):
        """Return (host, kind, args) or None if the URL is outside the world."""
        p = urlparse(url)
        host = p.netloc.lower()
        params = self._host_params(host)
        if params is None or p.scheme not in ("http", "https"):
            return None
        path = p.path.rstrip("/")
        query = p.query
        if path == "" and not query:
            return host, "home", ()
        if path == "/about":
            return host, "about", ()
        if path.startswith("/blog/post-"):
            return host, "blog", (path[len("/blog/post-"):],)
        if path.startswith("/category/c"):
            cat_s = path[len("/category/c"):]
            if not cat_s.isdigit():
                return None
            cat = int(cat_s)
            if cat >= params["n_categories"]:
                return None
            page = 1
            if query:
                kv = dict(
                    q.split("=", 1) for q in query.split("&") if "=" in q
                )
                kv = {k: v for k, v in kv.items() if k == "page"}
                if kv:
                    if not kv["page"].isdigit():
                        return None
                    page = int(kv["page"])
            if not (1 <= page <= params["pag_pages"]):
                return None
            return host, "category", (cat, page)
        pid = self._product_id_of(path, params)
        if pid is not None:
            total = params["n_categories"] * params["pag_pages"] * params["per_page"]
            if 0 <= pid < total:
                return host, "product", (pid,)
        return None

    def _product_id_of(self, path: str, params) -> int | None:
        flavor = params["flavor"]
        try:
            if flavor == "store" and path.startswith("/p/"):
                return int(path[3:])
            if flavor == "shopify" and path.startswith("/products/widget-"):
                return int(path[len("/products/widget-"):])
            if flavor == "amazon" and path.startswith("/dp/B"):
                return int(path[len("/dp/B"):])
            if flavor == "woocommerce" and path.startswith("/product/widget-"):
                return int(path[len("/product/widget-"):])
            if flavor == "magento" and path.startswith("/catalog/product/view/id/"):
                return int(path[len("/catalog/product/view/id/"):])
            if flavor == "bigcommerce" and path.startswith("/gizmo-p"):
                return int(path[len("/gizmo-p"):])
        except ValueError:
            return None
        return None

    def page_exists(self, url: str) -> bool:
        return self._classify(url) is not None

    # ---- the fetcher --------------------------------------------------------
    def fetch(self, url: str) -> str | None:
        """Deterministic stand-in for fetch_page_async
        (/root/reference/worker/src/utils/fetcher.py:227-269): returns the
        page HTML, or None for out-of-world URLs and a deterministic
        ``fail_rate`` slice of real ones (a retry — tasks.py:594-601 —
        deterministically fails again)."""
        c = self._classify(url)
        if c is None:
            return None
        if (_digest(self.seed, url, "fail") % 10_000) < int(self.fail_rate * 10_000):
            return None
        return self.render(url)

    # ---- HTML rendering ------------------------------------------------------
    def render(self, url: str) -> str:
        """Pages carry realistic text weight (a few KB of prose per page,
        like real product/category HTML) so that fetch+parse benchmarks
        measure parse throughput, not scheduler latency."""
        c = self._classify(url)
        if c is None:
            raise ValueError(f"URL outside world: {url}")
        host, kind, args = c
        params = self._host_params(host)
        g = _rng(self.seed, url, "html")
        base = f"https://{host}"
        parts = [f"<html><head><title>{kind} @ {host}</title></head><body>"]
        parts.append(f"<h1>{kind.title()} page</h1>")
        parts.append(f"<p>Welcome to {host}, a fine {params['flavor']} shop.</p>")

        def a(href, text):
            parts.append(f'<a href="{href}">{text}</a>')

        # category/product pages consume g ONLY through paragraph words,
        # so their whole choice stream can come from the vectorized
        # _WordStream snapshot of g's state (identical byte output);
        # home/blog interleave g.randrange with no paras — stdlib path
        if _np is not None and kind == "category":
            ws = _WordStream(g, 128 + params["per_page"] * 36)
        elif _np is not None and kind == "product":
            ws = _WordStream(g, 14 * 110 + 6 * 31)
        else:
            ws = None

        def para(n_words: int):
            if ws is not None:
                words = " ".join(ws.words(n_words))
            else:
                words = " ".join(g.choice(_WORDS) for _ in range(n_words))
            parts.append(f"<p>{words}.</p>")

        if kind == "home":
            for j in range(params["n_categories"]):
                a(f"/category/c{j}", f"Category {j}")
            a("/about", "About us")
            a(f"/blog/post-{g.randrange(3)}", "From the blog")
            # a couple of featured products (absolute URLs)
            for pid in (0, params["per_page"]):
                a(base + params["product_path"](pid), f"Featured {pid}")
            a("https://www.elsewhere.example.org/deals", "Partner deals")  # external
            parts.append('<img src="/img/banner.png">')
        elif kind == "category":
            cat, page = args
            para(120)
            start = (cat * params["pag_pages"] + (page - 1)) * params["per_page"]
            for i in range(params["per_page"]):
                pid = start + i
                href = params["product_path"](pid)
                if i % 3 == 2:
                    href += "?utm_source=home&ref=cat"  # tracking params
                if i % 2 == 0:
                    # thumbnail WRAPPED IN the product link (the ubiquitous
                    # real-HTML shape): the media event precedes the anchor
                    parts.append(
                        f'<a href="{href}"><img src="/img/thumb-{pid}.jpg">'
                        f"Product {pid}</a>"
                    )
                else:
                    a(href, f"Product {pid}")
                para(35)  # per-product blurb
            parts.append(f"<p>Showing page {page} of category {cat}.</p>")
            if page < params["pag_pages"]:
                a(f"/category/c{cat}?page={page + 1}", "Next »")
            if page > 1:
                a(f"/category/c{cat}?page={page - 1}", "« prev page")
            a("/", "Back home")
        elif kind == "product":
            (pid,) = args
            parts.append(f"<p>Product {pid}: a very nice item, SKU-{pid}.</p>")
            for _ in range(14):
                para(110)  # description / specs / reviews / faq prose
            parts.append(f'<img src="/img/product-{pid}-main.jpg">')
            parts.append(f'<img src="/img/product-{pid}-alt.jpg">')
            parts.append(f'<img src="/img/product-{pid}-360.jpg">')
            cat = (pid // (params["pag_pages"] * params["per_page"])) % params["n_categories"]
            a(f"/category/c{cat}", "Back to category")
            total = params["n_categories"] * params["pag_pages"] * params["per_page"]
            for k in (1, 7, 13, 19, 29, 41):
                rel = (pid + k) % total
                a(params["product_path"](rel), f"<b>Related</b> item {rel}")
                para(30)
            a("", "broken anchor")  # empty href: reference skips it (tasks.py:76-77)
            parts.append("<p>Reviews &amp; ratings: ★★★★</p>")
        elif kind == "about":
            parts.append(f"<p>About {host}. We sell things since 2020.</p>")
            a("/", "home")
            a("https://www.partner.example.net/", "our partner")  # external
        elif kind == "blog":
            parts.append(f"<p>Blog post {args[0]} with musings about commerce.</p>")
            a("/", "home")
            a(f"/category/c{g.randrange(params['n_categories'])}", "shop now >")
        parts.append("</body></html>")
        return "".join(parts)


class MirrorWorld(World):
    """World variant with deterministic CONTENT duplicates: every ODD
    product page renders its even sibling's HTML verbatim (an exact
    cross-URL duplicate — the syndicated/mirrored-page shape), or, with
    ``perturb=True``, with one extra sentence appended (a near-duplicate:
    different fingerprint, most MinHash bands shared). Used by the
    doc-dedup crawl tests and the dedup gate entry. NOTE: because the
    odd page renders its twin's HTML verbatim, its OUTGOING links are
    the twin's too — the crawl graph matches a MirrorWorld no-dedup run
    (what the tests compare against), not the base World's (whose odd
    pages link out differently). URL set and fetch order still follow
    the base layout; only rendered content (and thus link targets)
    aliases (ADVICE r5)."""

    def __init__(self, *args, perturb: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.perturb = perturb

    def render(self, url: str) -> str:
        c = self._classify(url)
        if c is not None and c[1] == "product" and c[2][0] % 2 == 1:
            host, _, (pid,) = c
            params = self._host_params(host)
            twin = f"https://{host}" + params["product_path"](pid - 1)
            html = super().render(twin)
            if self.perturb:
                html = html.replace(
                    "</body></html>",
                    "<p>mirrored variant note.</p></body></html>",
                )
            return html
        return super().render(url)
