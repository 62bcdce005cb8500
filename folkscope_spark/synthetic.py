"""Deterministic synthetic corpus generator (FIXTURES.md F1-F5).

Generates the graft input table ``pages(url, warc_ts, html, text, lang)`` plus
the dimension tables (items, probase) entirely from seeded hashes — no RNG
state, every row is a pure function of (seed, row index), so any subset of
rows can be regenerated on any executor independently: the generator is
expressed as ``spark.range(n)`` + ``mapInPandas``, which scales to arbitrary
row counts without driver materialization.

Planted ground truth: each page's url encodes an item pair; the surrogate
generation stage later derives deterministic assertion tails from the same
hash stream, so the expected final KG is computable independently for parity
tests (SURVEY.md §5.2 #3).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

import pandas as pd

from .nlp import GAZETTEER

SEED = 42


def _h(*parts) -> int:
    """Stable 64-bit hash of the parts (pure function, no RNG state)."""
    s = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _pick(seq, *key):
    return seq[_h(SEED, *key) % len(seq)]


# ---------------------------------------------------------------- vocabularies

CATEGORIES = [
    "Clothing", "Electronics", "Home", "Sports", "Toys", "Books", "Garden",
    "Automotive", "Beauty", "Grocery", "Office", "Pet", "Music", "Tools",
    "Baby", "Health", "Outdoors", "Jewelry", "Shoes", "Appliances",
]

TITLE_ADJ = [
    "durable", "comfortable", "stylish", "portable", "affordable", "reliable",
    "lightweight", "waterproof", "soft", "warm", "strong", "classic", "modern",
    "compact", "premium", "ergonomic",
]
TITLE_NOUN = [
    "jacket", "monitor", "blender", "backpack", "sneaker", "lamp", "keyboard",
    "mattress", "helmet", "bottle", "tent", "speaker", "charger", "sweater",
    "wallet", "tripod", "router", "kettle", "glove", "scarf", "drill", "mug",
    "headphone", "umbrella", "sandal", "notebook", "camera", "pillow",
]

# noun instances shared with the probase fixture (conceptualization hits)
INSTANCE_NOUNS = [
    "cotton", "leather", "plastic", "steel", "wool", "rubber", "glass", "wood",
    "nylon", "aluminum", "runner", "hiker", "traveler", "student", "athlete",
    "musician", "gamer", "chef", "parent", "teacher", "music", "comfort",
    "warmth", "safety", "storage", "travel", "exercise", "cooking", "reading",
    "camping", "gift", "quality", "style", "protection", "support", "battery",
    "screen", "fabric", "design", "material",
]

CONCEPTS = [
    "material", "natural material", "synthetic material", "metal", "person",
    "active person", "hobby", "activity", "outdoor activity", "benefit",
    "abstract quality", "equipment part", "profession", "need",
]

# relation -> deterministic tail templates; {n}/{n2} noun slots, {a} adjective
TAIL_TEMPLATES: dict[str, list[str]] = {
    "open": ["the person enjoys {n}", "they are perfect for {n}", "he needs {n} every day"],
    "relatedTo": ["{n} and {n2}", "the world of {n}", "{a} {n}"],
    "isA": ["{n}", "{a} {n}", "{n} for the {n2}"],
    "partOf": ["the {n}", "a {a} {n}", "the {n} of the {n2}"],
    "madeOf": ["{n}", "{a} {n}", "{n} and {n2}"],
    "similarTo": ["the {n}", "a {a} {n}", "other {n}"],
    "createdBy": ["the {n}", "a {a} {n}", "Acme"],
    "hasA": ["a {a} {n}", "the {n}", "{n} and {n2}"],
    "propertyOf": ["{n}", "{a} {n}", "the {n}"],
    "distinctFrom": ["the {n}", "a {a} {n}", "other {n}"],
    "usedFor": ["{n}", "{a} {n}", "{n} and {n2}"],
    "can": ["protect the {n}", "keep the {n} warm", "store the {n}"],
    "capableOf": ["keeping the {n} warm", "protecting the {n}", "storing the {n}"],
    "definedAs": ["{a} {n}", "the {n}", "{n} for {n2}"],
    "symbolOf": ["{n}", "{a} {n}", "the {n}"],
    "mannerOf": ["{n}", "the {n}", "{a} {n}"],
    "deriveFrom": ["{n}", "the {n}", "{a} {n}"],
    "effect": ["enjoy the {n}", "use the {n} often", "feel the {n}"],
    "cause": ["get the {n}", "keep the {n} safe", "use the {n}"],
    "motivatedBy": ["the {n}", "a {a} {n}", "{n} and {n2}"],
    "causeEffect": ["{n} to look {a}", "{n} to stay {a}", "{n} to feel {a}"],
}

_BOILERPLATE = [
    "Home | About | Contact | Privacy Policy",
    "Subscribe to our newsletter for deals!",
    "Copyright 2023 Example Shop Inc. All rights reserved.",
    "Free shipping on orders over $50.",
]

_NOISE = [
    "Customers also viewed these products.",
    "This item ships in its original packaging.",
    "Rated {stars} stars by {cnt} reviewers.",
    "In stock and ready to ship.",
    "See more details on our site at shop.example.com/deals today.",
    "Visit https://reviews.example.org/item for reviews.",
    "Café décor collection — très chic!",
    "As seen in the catalog <ref name=cat2023> earlier this year.",
]

_ENTITY_NAMES = [k.title() for k in sorted(GAZETTEER)]

_EPOCH = datetime(2023, 1, 1, tzinfo=timezone.utc)


# ---------------------------------------------------------------- items


def item_asin(i: int) -> str:
    return "B%09d" % i


def item_row(i: int) -> dict:
    n_words = 2 + _h(SEED, "titlelen", i) % 5
    words = []
    for w in range(n_words):
        pool = TITLE_ADJ if w % 2 == 0 else TITLE_NOUN
        words.append(_pick(pool, "title", i, w))
    n_cat = 1 + _h(SEED, "ncat", i) % 3
    cates = [_pick(CATEGORIES, "cat", i, c) for c in range(n_cat)]
    return {
        "asin": item_asin(i),
        "title": " ".join(words),
        "cates": cates,
        "top_cate": cates[0],
    }


def items_df(spark, n_items: int):
    from .schemas import ITEMS

    def gen(batches):
        for pdf in batches:
            rows = [item_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(n_items).mapInPandas(gen, schema=ITEMS)


# ---------------------------------------------------------------- pages


def page_pair(i: int, n_items: int) -> tuple[int, int]:
    """Zipf-flavored pair: item_a is head-skewed (hot keys for salting tests)."""
    r = _h(SEED, "pa", i) % 100
    if r < 30:
        a = _h(SEED, "pahot", i) % max(1, n_items // 50)  # hot heads
    else:
        a = _h(SEED, "pacold", i) % n_items
    b = _h(SEED, "pb", i) % n_items
    if b == a:
        b = (b + 1) % n_items
    return a, b


def page_row(i: int, n_items: int) -> dict:
    a, b = page_pair(i, n_items)
    lang_r = _h(SEED, "lang", i) % 10
    lang = "en" if lang_r < 9 else ["de", "fr", "zz"][_h(SEED, "lang2", i) % 3]
    cat = _pick(CATEGORIES, "pagecat", i).lower()
    url = "https://shop-%04x.example/%s/%s+%s" % (
        _h(SEED, "host", i) % 65536, cat, item_asin(a), item_asin(b),
    )
    sents = []
    n_noise = 1 + _h(SEED, "nnoise", i) % 3
    for k in range(n_noise):
        noise = _pick(_NOISE, "noise", i, k)
        noise = noise.replace("{stars}", str(1 + _h(SEED, "st", i, k) % 5))
        noise = noise.replace("{cnt}", str(_h(SEED, "cnt", i, k) % 5000))
        sents.append(noise)
    if _h(SEED, "ent", i) % 4 == 0:
        name = _pick(_ENTITY_NAMES, "entn", i)
        sents.append("%s recommended this product last week." % name)
    text = " ".join(sents)
    boiler = _pick(_BOILERPLATE, "boiler", i)
    html = ("<html><body><nav>%s</nav><p>%s</p></body></html>" % (boiler, text)).encode("utf-8")
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=137 * i),
        "html": html,
        "text": text,
        "lang": lang,
    }


def pages_df(spark, n_pages: int, n_items: int):
    from .schemas import PAGES

    def gen(batches):
        for pdf in batches:
            rows = [page_row(int(i), n_items) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return spark.range(n_pages).mapInPandas(gen, schema=PAGES)


# ---------------------------------------------------------------- probase


def probase_rows() -> list[dict]:
    """Small deterministic concept table: every instance noun maps to 1-3
    concepts with Zipf-ish frequencies (hand-checkable likelihoods)."""
    rows = []
    for inst in INSTANCE_NOUNS:
        n_c = 1 + _h(SEED, "pbn", inst) % 3
        for c in range(n_c):
            concept = _pick(CONCEPTS, "pbc", inst, c)
            freq = 1 + _h(SEED, "pbf", inst, c) % 1000
            rows.append({"concept": concept, "instance": inst, "freq": freq})
    # dedupe (instance, concept) keeping first
    seen = set()
    out = []
    for r in rows:
        k = (r["instance"], r["concept"])
        if k not in seen:
            seen.add(k)
            out.append(r)
    return out


def probase_df(spark):
    from .schemas import PROBASE

    return spark.createDataFrame(probase_rows(), schema=PROBASE)


# ---------------------------------------------------------------- surrogate LM


def gen_tail(pair_key: str, relation: str, seq: int, dense: bool = False) -> str:
    """Deterministic LLM surrogate: hash-seeded template filling.  Same
    (pair, relation, seq) -> same tail on every host.

    ``dense=True`` yields a length-diverse corpus: continuations are
    deterministically truncated to 0-2 words (matched sentences of exactly
    anchor length and just above — where the reference's CDF walk starts) or
    extended with 0-4 prepositional chunks ("with the <noun>").  The base
    templates yield only 2-3 lengths per relation, which degenerates the
    reference's CDF-driven adaptive mining schedule (its own exit case); the
    dense variant gives the schedule real window mass to walk."""
    tpl = _pick(TAIL_TEMPLATES[relation], "tt", pair_key, relation, seq)
    n = _pick(INSTANCE_NOUNS, "tn", pair_key, relation, seq, 0)
    n2 = _pick(INSTANCE_NOUNS, "tn2", pair_key, relation, seq, 1)
    if n2 == n:
        n2 = INSTANCE_NOUNS[(INSTANCE_NOUNS.index(n) + 1) % len(INSTANCE_NOUNS)]
    a = _pick(TITLE_ADJ, "ta", pair_key, relation, seq)
    tail = tpl.replace("{n2}", n2).replace("{n}", n).replace("{a}", a)
    if dense:
        r = _h(SEED, "densek", pair_key, relation, seq) % 8
        if r < 3:
            tail = " ".join(tail.split()[:r])  # 0-2 word continuation
        else:
            for j in range(r - 3):  # 0-4 extension chunks
                n3 = _pick(INSTANCE_NOUNS, "densen", pair_key, relation, seq, j)
                tail += " with the %s" % n3
    return tail
