"""Minimal vendored public-suffix table (VERDICT r9 #3).

A STATIC two-level-exception subset of the Public Suffix List's ICANN
section (publicdata; https://publicsuffix.org/): the ``co.uk`` /
``com.au`` class of second-level registration suffixes under which
names are registered one label deeper. ``registered_domain`` uses it
to upgrade the last-two-labels heuristic: a host whose last two
labels form one of these suffixes takes its last THREE labels as the
registered domain (``news.example.co.uk`` → ``example.co.uk``), which
is what makes per-domain strata honest for the multi-label-suffix
hosts a web corpus actually hits (the last-two heuristic lumps every
``*.co.uk`` site into one ``co.uk`` stratum).

Deliberately NOT a full PSL implementation (documented contract):

- two-label suffixes only — no three-label entries (``act.edu.au``),
  wildcards (``*.ck``) or exceptions (``!www.ck``); hosts under those
  rare deeper suffixes fall back to a three-label answer that is
  still strictly better than the two-label one;
- ICANN section only — no private-section entries (``github.io`` and
  friends are intentionally excluded: for curation strata the
  platform domain IS usually the right stratum);
- static by design: the table ships as a module literal so the
  operator has zero runtime dependencies and the DuckDB oracle can
  replicate the EXACT same alternation (one source of truth —
  ``PSL2_REGEX`` below feeds both engines).
"""

from __future__ import annotations

# fmt: off
PUBLIC_SUFFIX_2LEVEL: frozenset = frozenset({
    # uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "mod.uk", "net.uk",
    "nhs.uk", "org.uk", "plc.uk", "police.uk", "sch.uk",
    # au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # nz
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    # jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # kr
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    # cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # tw
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    # hk
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # za
    "ac.za", "co.za", "edu.za", "gov.za", "net.za", "nom.za", "org.za",
    "web.za",
    # br
    "adv.br", "arq.br", "art.br", "com.br", "edu.br", "eng.br", "gov.br",
    "ind.br", "inf.br", "jus.br", "leg.br", "med.br", "mil.br", "net.br",
    "odo.br", "org.br", "psi.br", "rec.br", "srv.br", "tur.br", "tv.br",
    "vet.br",
    # mx / ar / co (Colombia)
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar", "net.ar",
    "org.ar", "tur.ar",
    "com.co", "edu.co", "firm.co", "gov.co", "info.co", "int.co",
    "mil.co", "net.co", "nom.co", "org.co", "rec.co", "web.co",
    # id / my / sg / th / ph / vn
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # il / tr / sa / ae / eg
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "name.tr", "net.tr",
    "org.tr", "pol.tr", "tsk.tr", "tv.tr", "web.tr",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    # pk / bd / lk / np / ke / ng
    "biz.pk", "com.pk", "edu.pk", "fam.pk", "gob.pk", "gok.pk", "gop.pk",
    "gos.pk", "gov.pk", "net.pk", "org.pk", "web.pk",
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "mil.bd", "net.bd", "org.bd",
    "ac.lk", "com.lk", "edu.lk", "gov.lk", "int.lk", "net.lk", "org.lk",
    "sch.lk",
    "com.np", "edu.np", "gov.np", "mil.np", "net.np", "org.np",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    # ca provinces + gc.ca
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
    # es / fr / it / at / gr / pt / ro / hu / ie / be / ua / pl / ru
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "edu.it", "gov.it",
    "ac.at", "co.at", "gv.at", "or.at",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro",
    "org.ro", "rec.ro", "store.ro", "tm.ro", "www.ro",
    "co.hu", "info.hu", "org.hu", "priv.hu",
    "gov.ie",
    "ac.be",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl",
    "org.pl", "waw.pl",
    "com.ru", "msk.ru", "net.ru", "org.ru", "pp.ru", "spb.ru",
})
# fmt: on

# the 3-label registered-domain extraction pattern, shared VERBATIM by
# the Spark operator and the DuckDB oracle fragment (RE2-subset:
# literal alternation + [^.]+ + anchor — both engines). Sorted for
# determinism; matches "<label>.<suffix>" at end-of-host only when the
# suffix's own dots line up, so "xco.uk" can never false-match "co.uk".
PSL2_REGEX: str = (
    "([^.]+\\.(?:"
    + "|".join(s.replace(".", "\\.") for s in sorted(PUBLIC_SUFFIX_2LEVEL))
    + "))$"
)
