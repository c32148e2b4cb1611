"""Deterministic fixture corpus + query generator (FIXTURES.md F1/F2).

Byte-identical across runs/machines: fixed seed, no time/locale
dependence.  Exercises every analyzer path (hot keywords, snake_case,
camelCase, digits, operators, non-ASCII) plus the dedup fixtures.
"""

from __future__ import annotations

import hashlib
import random

HOT = ["def", "import", "self", "return", "class", "if", "for", "while"]
EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "c": "c"}
LANGS = ["py"] * 40 + ["java"] * 20 + ["js"] * 20 + ["go"] * 10 + ["c"] * 10


def _vocab(rng: random.Random, n: int = 5000) -> list[str]:
    base = ["alpha", "beta", "gamma", "delta", "node", "edge", "index", "query",
            "token", "parse", "merge", "score", "block", "cache", "batch", "shard"]
    # widen the atom pool so the corpus vocabulary is realistically large
    # (hundreds of distinct stems, not 16)
    cons, vow = "bcdfghklmnprstvz", "aeiou"
    for _ in range(400):
        w = "".join(rng.choice(cons) + rng.choice(vow) for _ in range(rng.randint(2, 4)))
        base.append(w)
    out = []
    for i in range(n):
        a, b = rng.choice(base), rng.choice(base)
        style = i % 5
        if style == 0:
            out.append(f"{a}_{b}_{i % 97}")          # snake_case + digit
        elif style == 1:
            out.append(f"{a}{b.capitalize()}{i % 53}")  # camelCase + digit
        elif style == 2:
            out.append(f"{a.capitalize()}{b.capitalize()}")  # PascalCase
        elif style == 3:
            out.append(f"{a}{i % 211}")
        else:
            out.append(a + b)
    return out


def gen_corpus(n_docs: int, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    vocab = _vocab(rng)
    ops = [" = ", "(", ")", ": ", " + ", ".", ", ", " -> ", "[", "]"]
    rows = []
    for i in range(n_docs):
        lang = LANGS[i % len(LANGS)]
        n_lines = rng.randint(8, 40)
        lines = []
        for _ in range(n_lines):
            toks = []
            # hot keywords in nearly every doc (skew fixture)
            if rng.random() < 0.8:
                toks.append(rng.choice(HOT))
            for _ in range(rng.randint(2, 8)):
                # Zipf-ish: low ranks much more likely
                r = int(rng.paretovariate(1.1)) % len(vocab)
                toks.append(vocab[r])
            if rng.random() < 0.05:
                toks.append('"héllo wörld"')  # non-ASCII in string literal
            line = ""
            for t in toks:
                line += t + rng.choice(ops)
            lines.append(line)
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/pkg{i % 11}/mod_{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        rows.append({"repo": repo, "path": path, "commit": commit,
                     "lang": lang, "content": "\n".join(lines)})
    # 1% exact duplicate rows (same key+content -> dedup D1)
    for i in range(0, n_docs, 100):
        rows.append(dict(rows[i]))
    # 2% content-duplicates under a different path (must NOT dedup)
    for i in range(0, n_docs, 50):
        r = dict(rows[i])
        r["path"] = r["path"] + ".copy"
        r["commit"] = hashlib.sha1(f"{r['repo']}/{r['path']}".encode()).hexdigest()
        rows.append(r)
    return rows


def gen_queries(seed: int = 42) -> list[dict]:
    """F2: 60 queries stressing WAND / stemming / casefold / ties / OOV."""
    rng = random.Random(seed + 1)
    vocab = _vocab(random.Random(seed))
    qs = []
    texts = [
        "import", "def", "return", "zzzznotfound",            # hot + OOV single
        "Return", "running run", "getUserName", "alpha_beta_1",
        "nodeEdge3 cache", "merge score block", "self.index(query)",
        "ClassName and running quickly",
    ]
    for t in texts:
        qs.append(t)
    while len(qs) < 60:
        n = rng.randint(1, 4)
        toks = [rng.choice(HOT)] if rng.random() < 0.5 else []
        toks += [vocab[int(rng.paretovariate(1.1)) % len(vocab)] for _ in range(n)]
        qs.append(" ".join(toks))
    return [{"query_id": i, "text": t, "k": 10} for i, t in enumerate(qs)]
