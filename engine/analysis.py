"""Text analysis: code-aware tokenizer, case folding, Porter stemmer.

Spec source: BASELINE.json:6 ("code-aware tokenization, Porter-style
stemming, case folding").  Porter semantics follow the published
algorithm exactly ([LIT-PORTER] Porter 1980, "An algorithm for suffix
stripping") — implemented from the paper's rule tables, not copied from
any existing code.

This module is PURE and deterministic; it is shared verbatim by the
distributed build/query pipeline and by ``engine.refimpl`` (the
single-process oracle), which is what makes rank-identity
(BASELINE.json:14) testable.

Analyzer contract (SURVEY.md SS2.10):
    analyze(text) -> list[str]     # token stream; position = list index

Tokenization rules (frozen; documented for the golden fixtures):
1. Raw tokens = maximal runs of [A-Za-z0-9_].  Anything else (operators,
   punctuation, whitespace, non-ASCII) separates tokens.
2. Each raw token splits into subtokens on '_' and on camelCase /
   digit boundaries: ``getHTTPResponse2`` -> get, HTTP, Response, 2;
   ``utf8_ok`` -> utf, 8, ok.  Only subtokens are emitted (positions
   advance per subtoken).
3. Subtokens are ASCII-lowercased.
4. Tokens of length < 1 or > 64 are dropped.
5. (stemming analyzers only) purely-alphabetic tokens longer than 2
   chars are Porter-stemmed; digit-bearing tokens pass through.
"""

from __future__ import annotations

import re

_RAW_TOKEN = re.compile(r"[A-Za-z0-9_]+")
# camel/digit splitter: ALLCAPS runs (not followed by lowercase), Capitalized
# runs, lowercase runs, digit runs.
_SUBTOKEN = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+")

_MAX_TOKEN_LEN = 64

# ---------------------------------------------------------------------------
# Porter stemmer (Porter 1980) — implemented from the paper's rule list.
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: number of VC sequences in the stem."""
    m = 0
    i, n = 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while True:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            return m
        while i < n and _is_cons(stem, i):
            i += 1
        m += 1
        if i >= n:
            return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    n = len(word)
    if n < 3:
        return False
    return (
        _is_cons(word, n - 3)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 1)
        and word[n - 1] not in "wxy"
    )


# (suffix, replacement) rule tables for steps 2-4; condition is on the
# measure of the would-be stem.
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(word: str) -> str:
    """Porter 1980, exact published rules.  Input must be lowercase ASCII
    letters; words of length <= 2 are returned unchanged (paper convention).
    """
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# ---------------------------------------------------------------------------
# Tokenizers / analyzers
# ---------------------------------------------------------------------------


def split_ident(raw: str) -> list[str]:
    """F2: split a raw identifier on '_' and camel/digit boundaries."""
    if raw.isalpha() and raw.islower():
        return [raw]  # fast path: plain lowercase alphabetic run
    return _SUBTOKEN.findall(raw)


def tokenize_code(text: str) -> list[str]:
    """M3: code-aware token stream (lowercased subtokens, len-bounded)."""
    out: list[str] = []
    for m in _RAW_TOKEN.finditer(text):
        raw = m.group()
        if raw.isalpha() and raw.islower():
            if len(raw) <= _MAX_TOKEN_LEN:
                out.append(raw)
            continue
        for sub in _SUBTOKEN.findall(raw):
            if len(sub) <= _MAX_TOKEN_LEN:
                out.append(sub.lower())
    return out


def tokenize_simple(text: str) -> list[str]:
    """Whitespace split + lowercase, no stemming — SQL-replicable mode
    (DuckDB: unnest(string_split(text, ' '))); empty tokens dropped on
    both sides (FIXTURES.md F5)."""
    return [t.lower() for t in text.split(" ") if t]


def split_signed(text: str) -> tuple[str, str]:
    """Boolean-NOT query syntax (M8): whitespace tokens starting with
    '-' are exclusions.  Returns (positive_text, negative_text), each a
    space-joined remainder fed to the normal analyzer afterwards, so
    NOT parsing stays analyzer-independent and refimpl / SQL oracles
    can replay it exactly.  A bare '-' is kept as positive text."""
    pos, neg = [], []
    for w in text.split():
        if len(w) > 1 and w.startswith("-"):
            neg.append(w[1:])
        else:
            pos.append(w)
    return " ".join(pos), " ".join(neg)


def split_bool(text: str) -> tuple[str, str, str]:
    """Lucene-BooleanQuery syntax (M8): '+term' is MUST, '-term' is
    MUST_NOT, bare terms are SHOULD.  Returns (must_text, should_text,
    not_text), each a space-joined remainder fed to the normal analyzer
    afterwards.  Bare '+' / '-' stay SHOULD text."""
    must, should, nots = [], [], []
    for w in text.split():
        if len(w) > 1 and w.startswith("+"):
            must.append(w[1:])
        elif len(w) > 1 and w.startswith("-"):
            nots.append(w[1:])
        else:
            should.append(w)
    return " ".join(must), " ".join(should), " ".join(nots)


def split_wildcard(text: str) -> tuple[str, list[str]]:
    """Prefix-query syntax (M8): whitespace tokens ending with a single
    trailing '*' are PREFIX terms.  Returns (plain_text, prefixes):
    plain_text is the space-joined remainder fed to the normal analyzer;
    prefixes are lowercased literals matched against INDEX terms (never
    analyzed/stemmed — the standard wildcard-query rule: expansion
    happens in index-term space, Lucene MultiTermQuery semantics).
    Duplicate prefixes keep first occurrence; a bare '*' stays plain."""
    plain, prefixes = [], []
    for w in text.split():
        if len(w) > 1 and w.endswith("*") and "*" not in w[:-1]:
            p = w[:-1].lower()
            if p not in prefixes:
                prefixes.append(p)
        else:
            plain.append(w)
    return " ".join(plain), prefixes


def split_fuzzy(text: str) -> tuple[str, list[tuple[str, int]]]:
    """Fuzzy-query syntax (M8): 'term~' (edit distance 1) or 'term~2'
    (distance 2) tokens expand to vocabulary terms within banded
    Levenshtein distance.  Returns (plain_text, [(base, d)]); bases are
    lowercased literals matched against INDEX terms (not analyzed, same
    rule as split_wildcard).  Duplicate (base, d) keep first occurrence;
    a bare '~' stays plain."""
    plain, fuzzies = [], []
    for w in text.split():
        base, d = None, 1
        if len(w) > 1 and w.endswith("~"):
            base = w[:-1]
        elif len(w) > 2 and w.endswith(("~1", "~2")):
            base, d = w[:-2], int(w[-1])
        if base is not None and "~" not in base:
            item = (base.lower(), d)
            if item not in fuzzies:
                fuzzies.append(item)
        else:
            plain.append(w)
    return " ".join(plain), fuzzies


class Analyzer:
    """Named analyzer chain: tokenize [-> stem], with a per-instance
    term->stem memo (A2: per-actor cache; corpus vocab is Zipf so the
    memo hit rate is high)."""

    def __init__(self, name: str = "code"):
        if name not in ("code", "code_nostem", "simple"):
            raise ValueError(f"unknown analyzer {name!r}")
        self.name = name
        self._memo: dict[str, str] = {}

    def __call__(self, text: str) -> list[str]:
        if self.name == "simple":
            return tokenize_simple(text)
        toks = tokenize_code(text)
        if self.name == "code_nostem":
            return toks
        memo = self._memo
        out = []
        for t in toks:
            s = memo.get(t)
            if s is None:
                s = porter_stem(t) if t.isalpha() else t
                memo[t] = s
            out.append(s)
        return out


def get_analyzer(name: str) -> Analyzer:
    return Analyzer(name)
