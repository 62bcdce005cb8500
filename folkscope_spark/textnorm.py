"""Text normalization — the byte-identical extraction contract.

``clean_text`` is a semantics-exact port of the reference cleaner
(``/root/reference/src/pattern/utils.py:195-214``): per ``BASELINE.json``'s
per-row invariant, the cleaned text for every url must be byte-identical to
what the reference would produce.  It is pure Python ``re`` (Spark's
``regexp_replace`` uses Java regex, whose semantics differ subtly — e.g. in
character-class handling — so the hot path runs this function inside an
Arrow-batched pandas UDF instead).

The URL regex is the widely-published Gruber "liberal, accurate" URL pattern,
assembled programmatically below; a golden test
(``tests/test_textnorm.py``) extracts the literal from the reference source
and asserts byte-identity of the compiled pattern.
"""

from __future__ import annotations

import re
from itertools import chain

# Generic TLDs followed by country codes, in the exact alternation order of the
# published pattern (the reference keeps the quirky "Ja" entry — harmless under
# IGNORECASE but preserved for pattern byte-identity).
_GTLDS = (
    "com net org edu gov mil aero asia biz cat coop info int jobs mobi museum "
    "name post pro tel travel xxx"
)
_CCTLDS = (
    "ac ad ae af ag ai al am an ao aq ar as at au aw ax az "
    "ba bb bd be bf bg bh bi bj bm bn bo br bs bt bv bw by bz "
    "ca cc cd cf cg ch ci ck cl cm cn co cr cs cu cv cx cy cz "
    "dd de dj dk dm do dz ec ee eg eh er es et eu "
    "fi fj fk fm fo fr ga gb gd ge gf gg gh gi gl gm gn gp gq gr gs gt gu gw gy "
    "hk hm hn hr ht hu id ie il im in io iq ir is it "
    "je jm jo jp ke kg kh ki km kn kp kr kw ky kz "
    "la lb lc li lk lr ls lt lu lv ly "
    "ma mc md me mg mh mk ml mm mn mo mp mq mr ms mt mu mv mw mx my mz "
    "na nc ne nf ng ni nl no np nr nu nz om "
    "pa pe pf pg ph pk pl pm pn pr ps pt pw py qa re ro rs ru rw "
    "sa sb sc sd se sg sh si sj Ja sk sl sm sn so sr ss st su sv sx sy sz "
    "tc td tf tg th tj tk tl tm tn to tp tr tt tv tw tz "
    "ua ug uk us uy uz va vc ve vg vi vn vu wf ws ye yt yu za zm zw"
)
_TLDS = "|".join(chain(_GTLDS.split(), _CCTLDS.split()))

_URL_PATTERN = (
    r"(?i)\b((?:https?:(?:/{1,3}|[a-z0-9%])|[a-z0-9.\-]+[.](?:" + _TLDS + r")/)"
    r"(?:[^\s()<>{}\[\]]+|\([^\s()]*?\([^\s()]+\)[^\s()]*?\)|\([^\s]+?\))+"
    r"(?:\([^\s()]*?\([^\s()]+\)[^\s()]*?\)|\([^\s]+?\)"
    r'|[^\s`!()\[\]{};:\'".,<>?«»“”‘’])'
    r"|(?:(?<!@)[a-z0-9]+(?:[.\-][a-z0-9]+)*[.](?:" + _TLDS + r")\b/?(?!@)))"
)

URL_REGEX = re.compile(_URL_PATTERN, re.IGNORECASE)

_NON_ASCII_RE = re.compile(r"[^\x00-\x7F]+")
_REF_TAG_RE = re.compile(r"<ref(.*?)>")
_URL_PAIR_RE = re.compile(r"<url>[\(\)\[\]]*<url>")

MAX_LEN = 1024  # parity: /root/reference/src/pattern/utils.py:69


def clean_text(text: str) -> str:
    """Byte-identical port of ``clean_sentence_for_parsing``
    (/root/reference/src/pattern/utils.py:195-214):
    non-ASCII runs -> single space, ``<ref...>`` -> ``<ref>``, URLs ->
    ``<url>``, collapse bracket-joined ``<url>`` pairs, strip.

    Fast path: when no rule can fire, the rewrite chain is the identity and
    only the final ``strip`` applies.  The gate is exact: the non-ASCII rule
    needs a non-ASCII char; both ``<ref...>`` and the ``<url>`` pair collapse
    need ``<``; every URL alternation needs either a ``.`` (dotted TLD forms)
    or a ``:`` (the ``https?:`` scheme form) — so ASCII text without
    ``<``/``.``/``:`` passes through all four regexes unchanged.  The URL
    regex scan is ~50µs/row (measured); the gate is ~0.2µs.
    """
    if "." not in text and text.isascii() and "<" not in text and ":" not in text:
        return text.strip()
    text = _NON_ASCII_RE.sub(" ", text)
    text = _REF_TAG_RE.sub("<ref>", text)
    text = URL_REGEX.sub("<url>", text)
    text = _URL_PAIR_RE.sub("<url>", text)
    return text.strip()


# Deterministic sentence boundary: terminal punctuation run followed by
# whitespace.  Replaces the reference's CoreNLP ssplit call (a network service
# we do not depend on); deterministic and seed-free by construction.
_SSPLIT_RE = re.compile(r"(?<=[.!?])[\s]+")


def split_sentences(text: str) -> list[str]:
    """Split page text into parse-unit sentences (deterministic ssplit)."""
    parts: list[str] = []
    for block in re.split(r"\n+", text):
        block = block.strip()
        if not block:
            continue
        for sent in _SSPLIT_RE.split(block):
            sent = sent.strip()
            if sent:
                parts.append(sent)
    return parts


def split_long_text(text: str, max_len: int = MAX_LEN) -> list[str]:
    """Length-capped recursive split mirroring the reference cascade
    (/root/reference/src/pattern/utils.py:144-192): ``\\n\\n`` -> ``\\n`` ->
    sentence split -> hard punctuation/space chunking.  (The reference's final
    fallback ``re.split(PUNCTUATION_SET, ...)`` passes a frozenset as the
    pattern and would raise; we implement the documented intent.)
    """
    if len(text) <= max_len:
        return [text]
    for sep in ("\n\n", "\n"):
        chunks = text.split(sep)
        if len(chunks) > 1:
            return [p for c in chunks for p in split_long_text(c, max_len)]
    sents = _SSPLIT_RE.split(text)
    if len(sents) > 1:
        return [p for s in sents for p in split_long_text(s, max_len)]
    # single overlong unit: chunk on spaces near max_len, else hard slice
    out: list[str] = []
    start = 0
    while start < len(text):
        end = min(start + max_len, len(text))
        if end < len(text):
            cut = text.rfind(" ", start, end)
            if cut > start:
                end = cut
        out.append(text[start:end])
        start = end + (1 if end < len(text) and text[end] == " " else 0)
    return [o for o in out if o]
