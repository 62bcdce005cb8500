"""Deterministic lightweight NLP kernel (``parse_light``).

Replaces the reference's CoreNLP HTTP annotators
(``/root/reference/src/pattern/utils.py:217-299``) with a seed-free,
rule-based tokenizer / POS tagger / lemmatizer / dependency builder / gazetteer
NER.  It is NOT a general English parser — it is a deterministic surrogate
whose contract is: (a) identical output for identical input on every run and
host, (b) the 21 relation-template prefixes tag exactly to their published POS
prefixes (``utils.py:8-30``), so the anchored pattern-mining stage sees the
same shapes the reference mines, and (c) output rows carry schema D6
(``schemas.PARSED``).

Everything here is pure Python over lists so the same functions run inside
Arrow-batched ``mapInPandas`` UDFs and in unit tests.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- tokenizer

_CLITIC_RE = re.compile(r"(?i)^(.+?)(n't|'s|'ll|'re|'ve|'d|'m)$")
_TOKEN_RE = re.compile(
    r"<url>|<ref>|[A-Za-z]+(?:'[A-Za-z]+)?|\d+(?:\.\d+)?|\.\.\.|--+|[^\sA-Za-z0-9]"
)


def tokenize(text: str) -> list[str]:
    out: list[str] = []
    for tok in _TOKEN_RE.findall(text):
        m = _CLITIC_RE.match(tok)
        if m and m.group(1):
            out.extend([m.group(1), m.group(2)])
        else:
            out.append(tok)
    return out


# ---------------------------------------------------------------- POS tagger

_DT = {"a", "an", "the", "this", "that", "these", "those", "both", "all", "each",
       "every", "some", "any", "no"}
_PRP = {"i", "you", "he", "she", "it", "we", "they", "them", "him", "us", "me",
        "himself", "herself", "itself", "themselves", "myself", "yourself"}
_PRP_DOLLAR = {"my", "your", "his", "its", "our", "their"}  # "her" handled as PRP$ too
_MD = {"will", "would", "can", "could", "shall", "should", "may", "might", "must"}
_CC = {"and", "or", "but", "nor", "yet", "plus"}
_TO = {"to"}
_IN = {"of", "in", "on", "at", "by", "for", "with", "from", "as", "about", "into",
       "over", "after", "before", "under", "between", "during", "against",
       "without", "within", "like", "than", "because", "while", "if", "though",
       "since", "until", "upon", "across", "through", "toward", "towards"}
_WDT = {"which", "what"}
_WP = {"who", "whom"}
_WRB = {"when", "where", "why", "how"}
_EX = {"there"}
_RB = {"not", "n't", "very", "too", "also", "well", "so", "just", "often",
       "always", "never", "here", "now", "then", "really", "quite", "together",
       "even", "still", "only", "more", "most"}

# irregular / template-critical open-class words (word -> tag)
_WORD_TAGS = {
    "is": "VBZ", "was": "VBD", "are": "VBP", "were": "VBD", "am": "VBP",
    "be": "VB", "been": "VBN", "being": "VBG",
    "has": "VBZ", "have": "VBP", "had": "VBD", "do": "VBP", "does": "VBZ",
    "did": "VBD", "'s": "VBZ", "'re": "VBP", "'ve": "VBP", "'m": "VBP",
    "'ll": "MD", "'d": "MD",
    # template predicate words with their reference POS (utils.py:8-30)
    "related": "JJ", "similar": "JJ", "distinct": "JJ", "capable": "JJ",
    "made": "VBN", "created": "VBN", "defined": "VBN", "derived": "VBN",
    "motivated": "VBN", "used": "VBN",
    "wants": "VBZ", "want": "VBP", "buying": "VBG", "bought": "VBD",
    "person": "NN", "type": "NN", "part": "NN", "manner": "NN", "property": "NN",
    "symbols": "NNS", "symbol": "NN",
    "good": "JJ", "new": "JJ", "same": "JJ", "other": "JJ", "great": "JJ",
    "high": "JJ", "small": "JJ", "large": "JJ", "different": "JJ", "easy": "JJ",
    "durable": "JJ", "comfortable": "JJ", "useful": "JJ", "stylish": "JJ",
    "portable": "JJ", "affordable": "JJ", "reliable": "JJ", "lightweight": "JJ",
    "waterproof": "JJ", "soft": "JJ", "warm": "JJ", "strong": "JJ",
    "gets": "VBZ", "get": "VB", "keep": "VB", "keeps": "VBZ", "make": "VB",
    "makes": "VBZ", "use": "VB", "uses": "VBZ", "need": "VB", "needs": "VBZ",
    "enjoy": "VB", "enjoys": "VBZ", "wear": "VB", "wears": "VBZ",
    "protect": "VB", "protects": "VBZ", "carry": "VB", "carries": "VBZ",
    "store": "VB", "stores": "VBZ", "clean": "VB", "cleans": "VBZ",
    "feel": "VB", "feels": "VBZ", "look": "VB", "looks": "VBZ",
    "stay": "VB", "stays": "VBZ", "work": "VB", "works": "VBZ",
}

_PUNCT_TAGS = {
    ".": ".", "!": ".", "?": ".", ",": ",", ":": ":", ";": ":", "...": ":",
    "--": ":", "-": ":", "$": "$", "#": "#", "(": "-LRB-", ")": "-RRB-",
    "`": "``", "``": "``", "'": "''", "''": "''", '"': "''",
}

_VERB_AFTER = {"VBP", "VBZ", "VBD", "MD", "VB", "TO"}  # contexts where -ed => VBN

_NUM_RE = re.compile(r"\d+(?:\.\d+)?")


def pos_tag(tokens: list[str]) -> list[str]:
    tags: list[str] = []
    for i, tok in enumerate(tokens):
        low = tok.lower()
        prev = tags[-1] if tags else ""
        if tok in _PUNCT_TAGS:
            tags.append(_PUNCT_TAGS[tok])
        elif tok in ("<url>", "<ref>"):
            tags.append("NN")
        elif _NUM_RE.fullmatch(tok):
            tags.append("CD")
        elif low == "both":
            # parity quirk: "they could both" tags both as CC (utils.py:20),
            # elsewhere DT (utils.py:10-24)
            tags.append("CC" if prev == "MD" else "DT")
        elif low == "her":
            tags.append("PRP$")
        elif low in _WORD_TAGS:
            tags.append(_WORD_TAGS[low])
        elif low in _DT:
            tags.append("DT")
        elif low in _PRP:
            tags.append("PRP")
        elif low in _PRP_DOLLAR:
            tags.append("PRP$")
        elif low in _MD:
            tags.append("MD")
        elif low in _CC:
            tags.append("CC")
        elif low in _TO:
            tags.append("TO")
        elif low in _IN:
            tags.append("IN")
        elif low in _WDT:
            tags.append("WDT")
        elif low in _WP:
            tags.append("WP")
        elif low in _WRB:
            tags.append("WRB")
        elif low in _EX:
            tags.append("EX")
        elif low in _RB or low.endswith("ly"):
            tags.append("RB")
        elif low.endswith("ing") and len(low) > 4:
            tags.append("VBG")
        elif low.endswith("ed") and len(low) > 3:
            tags.append("VBN" if prev in _VERB_AFTER or prev == "VBN" else "VBD")
        elif low.endswith("est") and len(low) > 4:
            tags.append("JJS")
        elif tok[0].isupper() and i > 0:
            tags.append("NNPS" if low.endswith("s") else "NNP")
        elif low.endswith("s") and not low.endswith(("ss", "us", "is")) and len(low) > 2:
            tags.append("NNS")
        else:
            tags.append("NN")
    return tags


# ---------------------------------------------------------------- lemmatizer

_IRREGULAR_LEMMAS = {
    "is": "be", "are": "be", "was": "be", "were": "be", "been": "be",
    "being": "be", "am": "be", "'s": "be", "'re": "be", "'m": "be",
    "has": "have", "had": "have", "'ve": "have",
    "does": "do", "did": "do", "n't": "not",
    "bought": "buy", "made": "make", "went": "go", "got": "get", "gets": "get",
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "wants": "want", "carries": "carry",
}

_VOWELS = set("aeiou")


def lemmatize(token: str, tag: str) -> str:
    low = token.lower()
    if low in _IRREGULAR_LEMMAS:
        return _IRREGULAR_LEMMAS[low]
    if tag in ("NNS", "NNPS"):
        if low.endswith("ies") and len(low) > 4:
            return low[:-3] + "y"
        if low.endswith(("ses", "xes", "zes", "ches", "shes")):
            return low[:-2]
        if low.endswith("s") and not low.endswith("ss"):
            return low[:-1]
        return low
    if tag == "VBZ":
        if low.endswith("ies") and len(low) > 4:
            return low[:-3] + "y"
        if low.endswith(("ses", "xes", "zes", "ches", "shes", "oes")):
            return low[:-2]
        if low.endswith("s") and not low.endswith("ss"):
            return low[:-1]
        return low
    if tag in ("VBD", "VBN") and low.endswith("ed") and len(low) > 3:
        stem = low[:-2]
        if stem.endswith("i"):
            return stem[:-1] + "y"
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
            return stem[:-1]
        if stem.endswith(("at", "iz", "us", "in", "ar", "ir", "or", "ag")) or (
            len(stem) > 2 and stem[-1] not in _VOWELS and stem[-2] in _VOWELS
            and stem[-3] not in _VOWELS
        ):
            return stem + "e" if low.endswith(("ated", "ized", "used", "ined",
                                               "ared", "ired", "ored", "aged")) else stem
        return stem
    if tag == "VBG" and low.endswith("ing") and len(low) > 4:
        stem = low[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
            return stem[:-1]
        return stem
    return low


# ---------------------------------------------------------------- dependencies

_NOUN_TAGS = {"NN", "NNS", "NNP", "NNPS", "CD", "PRP", "EX", "WP", "WDT"}
_FINITE_VERB_TAGS = {"VBZ", "VBP", "VBD"}
_VERB_TAGS = {"VBZ", "VBP", "VBD", "VB", "VBG", "VBN"}
_BE_FORMS = {"is", "are", "was", "were", "am", "be", "been", "being", "'s", "'re", "'m"}
_ADJ_TAGS = {"JJ", "JJR", "JJS"}


def _np_head(tags: list[str], start: int, end: int) -> int | None:
    """Head of the noun phrase starting at ``start``: last noun of the first
    contiguous DT/PRP$/JJ/NN run."""
    head = None
    for j in range(start, end):
        t = tags[j]
        if t in _NOUN_TAGS:
            head = j
        elif t in _ADJ_TAGS or t in ("DT", "PRP$", "RB", "VBG", "VBN"):
            if head is not None:
                break
            continue
        else:
            break
    return head


def dep_parse(tokens: list[str], tags: list[str]) -> list[tuple[int, str, int]]:
    """Deterministic shallow dependency builder.

    Output convention matches the reference record shape: 0-indexed
    ``(governor, relation, dependent)`` triples, ROOT edge omitted, sorted by
    ``(governor, dependent)`` (utils.py:259-267).
    """
    n = len(tokens)
    edges: set[tuple[int, str, int]] = set()
    lows = [t.lower() for t in tokens]

    # ---- find clause head (copular predicate or first finite verb)
    head = None
    cop = None
    root_verb = None
    for i in range(n):
        if tags[i] in _FINITE_VERB_TAGS or tags[i] == "MD":
            root_verb = i
            break
    if root_verb is not None and lows[root_verb] in _BE_FORMS:
        # copula: predicate = first JJ/NN*/VBN after the be-form
        for j in range(root_verb + 1, n):
            if tags[j] in _ADJ_TAGS or tags[j] in ("NN", "NNS", "NNP", "NNPS", "VBN", "VBG", "CD"):
                head = j
                cop = root_verb
                break
            if tags[j] in _FINITE_VERB_TAGS:
                break
        if head is None:
            head = root_verb
    elif root_verb is not None and tags[root_verb] == "MD":
        # modal: head = next verb, modal is aux
        head = root_verb
        for j in range(root_verb + 1, n):
            if tags[j] in _VERB_TAGS:
                edges.add((j, "aux", root_verb))
                head = j
                break
    elif root_verb is not None:
        head = root_verb
    else:
        head = _np_head(tags, 0, n)
        if head is None:
            head = 0

    if cop is not None:
        edges.add((head, "cop", cop))

    # ---- subject: NP head before the first verb/cop position
    first_pred = cop if cop is not None else (root_verb if root_verb is not None else head)
    subj = None
    for j in range(first_pred - 1, -1, -1) if first_pred else []:
        if tags[j] in _NOUN_TAGS:
            subj = j
            break
    if subj is not None and subj != head:
        edges.add((head, "nsubj", subj))

    # ---- local attachments
    def nearest_noun_after(i: int) -> int | None:
        for j in range(i + 1, n):
            if tags[j] in _NOUN_TAGS:
                return j
            if tags[j] in _VERB_TAGS or tags[j] in ("IN", "TO", ",", "."):
                return None
        return None

    attach_target = head
    j = (head + 1) if head is not None else 0
    last_obj = None
    while j < n:
        t = tags[j]
        if t in ("IN", "TO"):
            np = _np_head(tags, j + 1, n)
            if np is not None:
                label = "nmod:%s" % lows[j] if (attach_target is not None and
                                                tags[attach_target] in _NOUN_TAGS) \
                    else "obl:%s" % lows[j]
                if lows[j] == "to" and np is None:
                    label = "xcomp"
                edges.add((attach_target if attach_target is not None else head, label, np))
                edges.add((np, "case", j))
                attach_target = np
                last_obj = np
                j = np + 1
                continue
            elif t == "TO" and j + 1 < n and tags[j + 1] in _VERB_TAGS:
                edges.add((j + 1, "mark", j))
                edges.add((head, "xcomp", j + 1))
                attach_target = j + 1
                j += 2
                continue
        elif t in _VERB_TAGS and j != head and attach_target == head and t != "VBN":
            # secondary verb after the head: complement clause
            edges.add((head, "xcomp" if tags[j] in ("VB", "VBG") else "ccomp", j))
            attach_target = j
            j += 1
            continue
        elif t in _NOUN_TAGS and attach_target is not None and attach_target == head \
                and head is not None and tags[head] in _VERB_TAGS:
            np = _np_head(tags, j, n)
            if np is not None:
                edges.add((head, "obj", np))
                attach_target = np
                last_obj = np
                j = np + 1
                continue
        elif t == "CC":
            nxt = nearest_noun_after(j)
            if nxt is not None and last_obj is not None:
                edges.add((last_obj, "conj:%s" % lows[j], nxt))
                edges.add((nxt, "cc", j))
                j = nxt + 1
                continue
        j += 1

    # ---- NP-internal edges: det / amod / nmod:poss / compound / advmod / aux
    for i in range(n):
        t = tags[i]
        if t in ("DT", "PRP$") or t in _ADJ_TAGS:
            tgt = None
            for j2 in range(i + 1, n):
                if tags[j2] in ("NN", "NNS", "NNP", "NNPS"):
                    tgt = j2
                    break
                if tags[j2] not in _ADJ_TAGS and tags[j2] not in ("DT", "PRP$", "RB", "NN", "VBG", "VBN"):
                    break
            if tgt is not None:
                label = "det" if t == "DT" else ("nmod:poss" if t == "PRP$" else "amod")
                edges.add((tgt, label, i))
            elif t in _ADJ_TAGS and head is not None and i != head:
                edges.add((head, "amod" if tags[head] in _NOUN_TAGS else "advmod", i))
            elif t == "DT" and head is not None and i != head and not any(
                e for e in edges if e[2] == i
            ):
                edges.add((head, "det", i))
        elif t in ("NN", "NNS", "NNP", "NNPS") and i + 1 < n and \
                tags[i + 1] in ("NN", "NNS", "NNP", "NNPS"):
            # compound chain: attach to the run-final noun
            j2 = i + 1
            while j2 + 1 < n and tags[j2 + 1] in ("NN", "NNS", "NNP", "NNPS"):
                j2 += 1
            edges.add((j2, "compound", i))
        elif t == "RB":
            tgt = None
            for j2 in range(i + 1, min(i + 3, n)):
                if tags[j2] in _VERB_TAGS or tags[j2] in _ADJ_TAGS:
                    tgt = j2
                    break
            edges.add((tgt if tgt is not None else (head if head is not None else i),
                       "advmod", i)) if (tgt is not None or (head is not None and head != i)) else None
        elif t == "MD" and head is not None and i != head and not any(
            e for e in edges if e[2] == i
        ):
            edges.add((head, "aux", i))

    # drop self-loops and edges pointing at the implicit root
    edges = {e for e in edges if e[0] != e[2] and e[0] is not None and e[2] is not None}
    out = sorted(edges, key=lambda x: (x[0], x[2]))
    return out


# ---------------------------------------------------------------- gazetteer NER

# Fixed public-style gazetteer shared with the synthetic corpus generator so
# planted entities are recoverable (deterministic stand-in for CoreNLP NER).
GAZETTEER: dict[str, str] = {
    "paris": "CITY", "london": "CITY", "tokyo": "CITY", "berlin": "CITY",
    "seattle": "CITY", "boston": "CITY",
    "france": "COUNTRY", "germany": "COUNTRY", "japan": "COUNTRY",
    "canada": "COUNTRY", "italy": "COUNTRY",
    "california": "STATE_OR_PROVINCE", "texas": "STATE_OR_PROVINCE",
    "ontario": "STATE_OR_PROVINCE",
    "acme": "ORGANIZATION", "contoso": "ORGANIZATION", "globex": "ORGANIZATION",
    "initech": "ORGANIZATION",
    "alice": "PERSON", "bob": "PERSON", "carol": "PERSON", "david": "PERSON",
    "emma": "PERSON", "frank": "PERSON",
    "french": "NATIONALITY", "german": "NATIONALITY", "japanese": "NATIONALITY",
    "everest": "LOCATION", "sahara": "LOCATION",
}

from .relations import PRONOUN_SET, TYPE_SET  # noqa: E402  (shared gates)


def ner_tag(tokens: list[str]) -> tuple[list[str], list[dict]]:
    """Per-token NER labels + entity mentions, applying the reference's
    TYPE_SET / pronoun gates (utils.py:279-292)."""
    ners = ["O"] * len(tokens)
    for i, tok in enumerate(tokens):
        typ = GAZETTEER.get(tok.lower())
        if typ:
            ners[i] = typ
    mentions = []
    i = 0
    while i < len(tokens):
        if ners[i] == "O":
            i += 1
            continue
        j = i + 1
        while j < len(tokens) and ners[j] == ners[i]:
            j += 1
        text = " ".join(tokens[i:j])
        if ners[i] in TYPE_SET and text.lower().strip() not in PRONOUN_SET:
            mentions.append({"start": i, "end": j, "text": text, "ner": ners[i]})
        i = j
    return ners, mentions


# ---------------------------------------------------------------- full parse


def parse_sentence(text: str) -> dict:
    """Full parse of one pre-cleaned sentence -> D6-shaped dict (sans sid)."""
    tokens = tokenize(text)
    tags = pos_tag(tokens)
    lemmas = [lemmatize(t, g) for t, g in zip(tokens, tags)]
    deps = dep_parse(tokens, tags)
    ners, mentions = ner_tag(tokens)
    return {
        "text": text,
        "tokens": tokens,
        "pos_tags": tags,
        "lemmas": lemmas,
        "dependencies": deps,
        "ners": ners,
        "mentions": mentions,
    }
