"""Public-suffix handling for S12 (Storage._simplify_domain,
/root/reference/worker/src/db/storage.py:52-65).

The reference calls ``tldextract.extract`` (tldextract 5.1.3,
reference requirements.txt:90) and keys storage by
``f"{domain}.{suffix}".replace(".", "_")``. tldextract implements the
publicsuffix.org algorithm over the PSL snapshot; its DEFAULT instance
uses ICANN rules only (``include_psl_private_domains=False``), so
private-section suffixes like github.io are NOT treated as public —
``foo.github.io`` → ``github_io``.

tldextract is not in this container and the full ~9k-rule PSL snapshot
cannot be fetched offline, so this module vendors a curated ICANN-rule
subset (publicsuffix.org data, public knowledge) but implements the
FULL rule algorithm — exact rules, wildcard rules (``*.ck``: any single
label under the parent is itself a public suffix), and exception rules
(``!www.ck``: carved out of a wildcard; the public suffix is the rule
minus its leading label) with the correct precedence
(exception > wildcard > longest exact > the implicit ``*`` default).
Extending coverage = adding rows to the three tables below.

All matching is native column expressions (regex alternations compiled
once JVM-side; the rule table is program text, nothing is shipped to
executors) — at crawl scale this runs inside whole-stage codegen over
the frontier, no broadcast join and no Python.

Output-format parity notes (match tldextract's behavior through the
reference's ``f"{domain}.{suffix}"`` formatting):
- host IS a public suffix (``co.uk``, ``b.ck``): domain='' → ``_co_uk``
- single unlisted label (``localhost``): suffix='' → ``localhost_``

**Parity scope**: exact tldextract agreement holds for hosts whose
public suffix is covered by the vendored tables below (plus all
single-label TLD hosts, via the implicit ``*`` default both
implementations share). Two documented divergences outside that scope:
- a host whose TRUE public suffix is a multi-label PSL rule absent from
  the curated subset falls through to the implicit default here and
  keys one label too high (``shop.co.ao`` → ``co_ao`` vs tldextract's
  ``shop_co_ao`` — fix: add ``co.ao`` to EXACT_SUFFIXES);
- multi-label hosts under a TLD that is entirely unlisted in the full
  PSL format identically here (implicit ``*``: last label is the
  suffix, → ``reg_tld``) but tldextract's default instance reports
  suffix='' for unregistered TLDs in some versions (→ ``tld_``).
The 550-host fuzz test (tests/test_api.py) checks parity against the
independent Python PSL-algorithm oracle over the vendored rule set —
i.e., it pins the ALGORITHM; coverage beyond the vendored rules is a
data question, not a code question.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- exact multi-label ICANN rules (curated PSL subset) --------------------
EXACT_SUFFIXES: list[str] = [
    # uk / ie
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "plc.uk",
    "ltd.uk", "sch.uk", "nhs.uk", "police.uk",
    # au / nz
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz",
    # in / za
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in", "nic.in",
    "co.za", "org.za", "net.za", "ac.za", "gov.za", "web.za", "edu.za",
    # jp — organizational + prefecture-level EXACT rules. The seven
    # designated cities (kawasaki etc.) are WILDCARD rules, not exact —
    # see WILDCARD_PARENTS / EXCEPTIONS below.
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "aichi.jp", "akita.jp", "aomori.jp", "chiba.jp", "ehime.jp",
    "fukui.jp", "fukuoka.jp", "fukushima.jp", "gifu.jp", "gunma.jp",
    "hiroshima.jp", "hokkaido.jp", "hyogo.jp", "ibaraki.jp",
    "ishikawa.jp", "iwate.jp", "kagawa.jp", "kagoshima.jp",
    "kanagawa.jp", "kochi.jp", "kumamoto.jp", "kyoto.jp", "mie.jp",
    "miyagi.jp", "miyazaki.jp", "nagano.jp", "nagasaki.jp", "nara.jp",
    "niigata.jp", "oita.jp", "okayama.jp", "okinawa.jp", "osaka.jp",
    "saga.jp", "saitama.jp", "shiga.jp", "shimane.jp", "shizuoka.jp",
    "tochigi.jp", "tokushima.jp", "tokyo.jp", "tottori.jp", "toyama.jp",
    "wakayama.jp", "yamagata.jp", "yamaguchi.jp", "yamanashi.jp",
    # kr / tw / hk / sg / th / id / my / ph / vn / cn
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "co.th", "or.th", "ac.th", "go.th", "in.th", "mi.th", "net.th",
    "co.id", "or.id", "net.id", "ac.id", "web.id", "go.id", "sch.id",
    "my.id", "biz.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # south asia / central asia / middle east
    "com.lk", "org.lk", "edu.lk", "gov.lk", "net.lk", "ac.lk", "sch.lk",
    "com.pk", "net.pk", "edu.pk", "org.pk", "gov.pk", "fam.pk", "biz.pk",
    "com.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz",
    "com.uz", "co.uz", "net.uz", "org.uz",
    "com.by", "gov.by", "mil.by", "of.by",
    "com.ge", "edu.ge", "gov.ge", "org.ge", "net.ge", "mil.ge", "pvt.ge",
    "com.am", "net.am", "org.am",
    "com.az", "net.az", "org.az", "edu.az", "gov.az", "int.az", "mil.az",
    "co.ir", "ac.ir", "gov.ir", "org.ir", "net.ir", "sch.ir", "id.ir",
    "com.jo", "org.jo", "net.jo", "edu.jo", "gov.jo", "mil.jo", "sch.jo",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "com.kw", "edu.kw", "gov.kw", "net.kw", "org.kw", "ind.kw",
    "com.qa", "edu.qa", "gov.qa", "net.qa", "org.qa", "mil.qa", "sch.qa",
    "com.om", "edu.om", "gov.om", "net.om", "org.om", "co.om", "med.om",
    "com.sa", "edu.sa", "gov.sa", "net.sa", "org.sa", "med.sa", "sch.sa",
    "pub.sa",
    "com.ae", "org.ae", "net.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "k12.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "idf.il",
    # africa
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg", "sci.eg", "eun.eg",
    "co.ma", "net.ma", "gov.ma", "org.ma", "ac.ma", "press.ma",
    "com.dz", "org.dz", "net.dz", "gov.dz", "edu.dz", "asso.dz",
    "com.tn", "gov.tn", "org.tn", "net.tn", "edunet.tn", "ens.tn",
    "fin.tn", "ind.tn", "info.tn", "intl.tn", "nat.tn", "rns.tn",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng", "sch.ng", "name.ng",
    "mobi.ng",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.tz", "ac.tz", "go.tz", "or.tz", "ne.tz", "sc.tz", "hotel.tz",
    "info.tz", "me.tz", "mobi.tz", "tv.tz",
    "co.ug", "or.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "com.ug",
    "org.ug",
    "co.zw", "org.zw", "gov.zw", "ac.zw", "mil.zw",
    "co.zm", "com.zm", "org.zm", "gov.zm", "ac.zm", "edu.zm", "net.zm",
    "sch.zm",
    "co.bw", "org.bw",
    "com.mu", "net.mu", "org.mu", "gov.mu", "ac.mu", "co.mu", "or.mu",
    # americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "adv.br",
    "blog.br", "eco.br", "esp.br", "etc.br", "far.br", "imb.br",
    "ind.br", "inf.br", "jus.br", "leg.br", "mil.br", "tv.br", "wiki.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar",
    "tur.ar", "musica.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co", "mil.co",
    "com.pe", "org.pe", "net.pe", "edu.pe", "gob.pe", "nom.pe", "mil.pe",
    "gob.cl", "gov.cl", "mil.cl",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "info.ve",
    "mil.ve", "web.ve", "co.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "gov.ec", "fin.ec",
    "med.ec", "pro.ec", "info.ec", "k12.ec", "mil.ec",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "org.uy", "mil.uy",
    "com.py", "edu.py", "gov.py", "net.py", "org.py", "coop.py", "mil.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo",
    "tv.bo", "web.bo",
    "com.gt", "edu.gt", "gob.gt", "net.gt", "org.gt", "ind.gt", "mil.gt",
    "co.cr", "ac.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.hn", "edu.hn", "org.hn", "net.hn", "mil.hn", "gob.hn",
    "com.ni", "gob.ni", "edu.ni", "org.ni", "net.ni", "co.ni", "ac.ni",
    "biz.ni", "info.ni", "in.ni", "int.ni", "mil.ni", "nom.ni",
    "com.cu", "edu.cu", "org.cu", "net.cu", "gov.cu", "inf.cu",
    "com.do", "edu.do", "gob.do", "gov.do", "net.do", "org.do", "sld.do",
    "web.do", "art.do", "mil.do",
    "com.pa", "net.pa", "org.pa", "edu.pa", "gob.pa", "ac.pa", "sld.pa",
    "abo.pa", "ing.pa", "med.pa", "nom.pa",
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca",
    # europe
    "ac.at", "co.at", "gv.at", "or.at",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "avocat.fr", "aeroport.fr", "chambagri.fr", "cci.fr",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "edu.it", "gov.it",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "wroc.pl", "krakow.pl", "poznan.pl", "lodz.pl", "gda.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "kyiv.ua", "kharkov.ua", "kharkiv.ua", "lviv.ua",
    "odessa.ua", "odesa.ua", "dp.ua", "zp.ua", "te.ua",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
    "msk.ru", "spb.ru",
    "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs", "in.rs",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "com.mt", "edu.mt", "net.mt", "org.mt",
    "com.cy", "biz.cy", "info.cy", "ltd.cy", "pro.cy", "net.cy",
    "org.cy", "name.cy", "tm.cy", "ac.cy", "press.cy", "parliament.cy",
    "co.hu", "org.hu", "priv.hu", "info.hu", "tm.hu", "2000.hu",
    "agrar.hu", "bolt.hu", "city.hu", "film.hu",
]

# --- wildcard rules (*.<parent>): any ONE label under the parent is a
# public suffix. ICANN wildcards + the seven jp designated cities.
WILDCARD_PARENTS: list[str] = [
    "ck", "bd", "er", "fk", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
]

# --- exception rules (!<rule>): carved out of a wildcard; the public
# suffix is the rule minus its leading label.
EXCEPTIONS: list[str] = [
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
]


def _alt(items: list[str]) -> str:
    return "|".join(re.escape(s) for s in items)


def registered_key(host: Column) -> Column:
    """tldextract-parity ``f"{domain}.{suffix}".replace('.', '_')`` over
    a lowercase host column, with full PSL rule semantics."""
    und = lambda c: F.replace(c, F.lit("."), F.lit("_"))  # noqa: E731

    # 1. exception rules — highest precedence; the output is a constant
    # per rule (public suffix = rule minus leading label, registered =
    # leading label of the matched tail)
    expr = None
    for e in EXCEPTIONS:
        first, rest = e.split(".", 1)
        cond = host.rlike(rf"(^|\.){re.escape(e)}$")
        out = F.lit(f"{first}_{rest.replace('.', '_')}")
        expr = F.when(cond, out) if expr is None else expr.when(cond, out)

    w1 = [p for p in WILDCARD_PARENTS if "." not in p]
    w2 = [p for p in WILDCARD_PARENTS if "." in p]
    # 2. wildcard rules: <reg>.<label>.<parent>; a host that IS the
    # wildcard public suffix (<label>.<parent>) yields empty domain
    for parents in (w2, w1):  # longer parents first
        if not parents:
            continue
        pat = rf"([^.]+)\.([^.]+\.(?:{_alt(parents)}))$"
        expr = expr.when(
            host.rlike(pat),
            F.concat(
                F.regexp_extract(host, pat, 1),
                F.lit("_"),
                und(F.regexp_extract(host, pat, 2)),
            ),
        )
        expr = expr.when(
            host.rlike(rf"^[^.]+\.(?:{_alt(parents)})$"),
            F.concat(F.lit("_"), und(host)),
        )

    # 3. exact rules, longest first (group by label count)
    by_len: dict[int, list[str]] = {}
    for s in EXACT_SUFFIXES:
        by_len.setdefault(s.count("."), []).append(s)
    for n in sorted(by_len, reverse=True):
        alt = _alt(by_len[n])
        pat = rf"([^.]+)\.({alt})$"
        expr = expr.when(
            host.rlike(pat),
            F.concat(
                F.regexp_extract(host, pat, 1),
                F.lit("_"),
                und(F.regexp_extract(host, pat, 2)),
            ),
        )
        expr = expr.when(
            host.rlike(rf"^(?:{alt})$"), F.concat(F.lit("_"), und(host))
        )

    # 4. implicit '*' default: last label is the suffix
    pat1 = r"([^.]+)\.([^.]+)$"
    expr = expr.when(
        host.rlike(pat1),
        F.concat(
            F.regexp_extract(host, pat1, 1),
            F.lit("_"),
            F.regexp_extract(host, pat1, 2),
        ),
    )
    # single label: suffix='' → trailing '_' (tldextract formatting parity)
    return expr.otherwise(
        F.when(host != "", F.concat(und(host), F.lit("_"))).otherwise(und(host))
    )
