"""Deterministic synthetic web-pages corpus (FIXTURES.md F1/F2/F3).

Generates Common-Crawl-style page rows (url, warc_ts, html, text, lang) with
one company name embedded per page, plus perturbed twin variants whose
ground-truth entity link is known by construction -- the shape of the
reference's 500-name test corpus (/root/reference/test/test_names.csv,
adjusted_test_names.csv) lifted onto the BASELINE.json input_hint schema.

Everything is a pure function of (seed, ids): no wall clock, no RNG state,
so driver-side and executor-side generation produce identical rows.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import struct
from functools import lru_cache

# syllable inventory sized so the name space stays diverse at bench scale
# (low-entropy corpora make every name resemble every other and turn any
# blocker quadratic -- unrealistic for real company registries)
_ONSETS = ["b", "br", "c", "ch", "d", "dr", "f", "fl", "g", "gr", "h", "j",
           "k", "kl", "l", "m", "n", "p", "pr", "qu", "r", "s", "sch", "st",
           "t", "tr", "v", "w", "x", "z"]
_NUCLEI = ["a", "e", "i", "o", "u", "ae", "ei", "ie", "oo", "au"]
_CODAS = ["n", "r", "l", "s", "t", "rd", "nd", "ck", "ff", "m", "ng", "rn",
          "st", "lz", ""]
_SYLLABLES = [o + n + c for o in _ONSETS for n in _NUCLEI for c in _CODAS]
_SUFFIXES = ["PLC", "Ltd", "BV", "NV", "GmbH", "Inc", "LLC", "Group",
             "Holding", "and Sons", "Partners", "International"]
_JOINERS = ["{a} {b} {s}", "{a}, {b} and {c}", "{a}-{b} {s}", "{a} {s}",
            "{a} {b}", "{a}, {b} and {c} {s}"]
_COUNTRIES = ["NL", "DE", "FR", "BE", "GB", "US", "ES", "IT"]
_LANGS = ["en", "nl", "de", "fr"]

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _h(seed: int, *parts) -> int:
    """Deterministic 64-bit hash of (seed, parts)."""
    raw = ("|".join(str(p) for p in parts) + f"|{seed}").encode()
    return struct.unpack("<Q", hashlib.md5(raw).digest()[:8])[0]


def _word(seed: int, entity_id: int, slot: int) -> str:
    n = 2 + _h(seed, entity_id, slot, "len") % 2
    w = "".join(
        _SYLLABLES[_h(seed, entity_id, slot, i) % len(_SYLLABLES)]
        for i in range(n)
    )
    return w.capitalize()


@lru_cache(maxsize=1 << 14)
def company_name(entity_id: int, seed: int = 42) -> str:
    """Deterministic faker-style company name.  Cached: every variant row
    of an entity re-derives the same base name (variants are adjacent in
    generation batches), so the memo halves the md5 work of page_row."""
    joiner = _JOINERS[_h(seed, entity_id, "j") % len(_JOINERS)]
    return joiner.format(
        a=_word(seed, entity_id, 0),
        b=_word(seed, entity_id, 1),
        c=_word(seed, entity_id, 2),
        s=_SUFFIXES[_h(seed, entity_id, "s") % len(_SUFFIXES)],
    )


def perturb_name(name: str, entity_id: int, variant_id: int,
                 seed: int = 42) -> str:
    """Apply one deterministic perturbation; variant 0 is the original.

    Perturbation kinds mirror the reference corpus: char deletion, char
    substitution, space removal, hyphen insertion, token reorder,
    punctuation noise; ~1.5% of variants are scrambled beyond recognition
    (reproducing the reference's 493/500 top-1 accuracy anchor).
    """
    if variant_id == 0:
        return name
    h = _h(seed, entity_id, variant_id, "kind")
    if h % 1000 < 15:  # mangled beyond recognition
        return "Xq" + "".join(
            chr(97 + _h(seed, entity_id, variant_id, i) % 26) for i in range(6)
        )
    kind = h % 6
    pos = _h(seed, entity_id, variant_id, "pos") % max(1, len(name) - 2) + 1
    if kind == 0:  # char deletion
        return name[:pos] + name[pos + 1:]
    if kind == 1:  # char substitution
        sub = chr(97 + _h(seed, entity_id, variant_id, "c") % 26)
        return name[:pos] + sub + name[pos + 1:]
    if kind == 2:  # remove one space
        return name.replace(" ", "", 1)
    if kind == 3:  # hyphen insertion
        return name[:pos] + "-" + name[pos:]
    if kind == 4:  # token reorder
        toks = name.split(" ")
        if len(toks) > 1:
            return " ".join(toks[1:] + toks[:1])
        return name + "."
    # punctuation noise
    noise = "|[."[_h(seed, entity_id, variant_id, "n") % 3]
    return name[:pos] + noise + name[pos:]


def page_row(entity_id: int, variant_id: int, seed: int = 42) -> dict:
    """One pages-table row (FIXTURES.md F1)."""
    name = perturb_name(company_name(entity_id, seed), entity_id,
                        variant_id, seed)
    url = f"https://site{entity_id}.example/{variant_id}"
    ts = _EPOCH + _dt.timedelta(seconds=entity_id * 3600 + variant_id * 60)
    html = b"<html><title>" + name.encode("utf-8") + b"</title></html>"
    text = f"Welcome to the homepage of {name}. Contact us for details."
    lang = _LANGS[(entity_id + variant_id) % len(_LANGS)]
    return {"url": url, "warc_ts": ts, "html": html, "text": text,
            "lang": lang, "entity_id": entity_id, "variant_id": variant_id}


def names_corpus(n: int = 500, seed: int = 42) -> list[dict]:
    """Reference-corpus twin shape: (id, company_name, country)."""
    return [
        {"id": i, "company_name": company_name(i, seed),
         "country": _COUNTRIES[_h(seed, i, "cc") % len(_COUNTRIES)]}
        for i in range(n)
    ]


def adjusted_names_corpus(n: int = 500, seed: int = 42) -> list[dict]:
    """Perturbed twins with identical ids (ground truth = same id)."""
    return [
        {"id": i,
         "company_name": perturb_name(company_name(i, seed), i, 1, seed),
         "country": _COUNTRIES[_h(seed, i, "cc") % len(_COUNTRIES)]}
        for i in range(n)
    ]


def pages_rows(entities: int, variants: int, seed: int = 42,
               hot_entity: int | None = None, hot_variants: int = 0) -> list[dict]:
    """Full pages corpus; optionally one hot entity with extra variants to
    exercise skew handling."""
    rows = [
        page_row(e, v, seed)
        for e in range(entities)
        for v in range(variants)
    ]
    if hot_entity is not None and hot_variants:
        rows.extend(
            page_row(hot_entity, variants + v, seed)
            for v in range(hot_variants)
        )
    return rows


def labeled_pairs(n_entities: int = 60, seed: int = 42,
                  negatives_per_positive: int = 10,
                  threshold: float = 95.0) -> list[dict]:
    """FIXTURES.md F3: labeled pairs with ground truth and the reference-
    semantics decision (oracle pipeline at the run_nm threshold).

    Positives: every (variant, original) twin.  Negatives: same-block pairs
    with the nearest other entities (hard) plus deterministic random pairs.
    ``ref_decision`` is the oracle's match/no-match for the pair's query --
    the F1 >= 0.99 comparison target.
    """
    from ..nm_core.oracle import run_nm_oracle

    originals = names_corpus(n_entities, seed)
    variants = adjusted_names_corpus(n_entities, seed)
    decisions = run_nm_oracle(
        [r["company_name"] for r in variants],
        [r["company_name"] for r in originals],
        threshold=threshold)
    rows = []
    for i in range(n_entities):
        url_a = f"https://site{i}.example/1"
        block = variants[i]["country"]
        # positive pair
        rows.append({
            "url_a": url_a, "url_b": f"https://site{i}.example/0",
            "block_key": block, "label": 1,
            "ref_decision": int(decisions.get(i, (None,))[0] == i),
        })
        # negatives: deterministic same-block non-matches
        added = 0
        j = i
        while added < negatives_per_positive:
            j = (j + 1 + _h(seed, i, added, "neg") % (n_entities - 1)) \
                % n_entities
            if j == i:
                continue
            rows.append({
                "url_a": url_a, "url_b": f"https://site{j}.example/0",
                "block_key": block, "label": 0,
                "ref_decision": int(decisions.get(i, (None,))[0] == j),
            })
            added += 1
    return rows


PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, text string, "
                "lang string, entity_id bigint, variant_id bigint")


def spark_pages_df(spark, entities: int, variants: int, seed: int = 42):
    """Distributed pages generation: spark.range over (entity, variant)
    pairs -> mapInPandas with the same pure-function row generator, so no
    data ever funnels through the driver."""
    import pandas as pd  # noqa: F401

    n = entities * variants

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = [
                page_row(int(i) // variants, int(i) % variants, seed)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1).mapInPandas(gen, schema=PAGES_SCHEMA)
