"""corpus_prep composite pipeline vs an independent pure-Python replay
of its stage semantics (the DuckDB replay runs in the driver gate)."""

import math

import numpy as np
import pytest

from engine import prep
from engine.functions import round6_scalar


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def _local(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    docs = {}
    for did, text, lang in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    ):
        toks = [w.lower() for w in text.split(" ") if w]
        docs[did] = (toks, lang)
    return docs


def test_corpus_prep_vs_local(ray_session, sf_dir):
    q, n, mod, min_ov, jthr = 0.25, 3, 50, 3, 0.5
    docs = _local(sf_dir)

    # stage 1: quality-quantile threshold (quantile_disc rule)
    ratios = sorted(
        round6_scalar(len(set(tk)) / len(tk)) if tk else 0.0
        for tk, _ in docs.values()
    )
    thr = ratios[max(int(math.ceil(q * len(ratios))), 1) - 1]

    # stage 2: contamination vs the eval slice
    sh = {
        d: {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}
        for d, (tk, _) in docs.items()
    }
    ev = set()
    for d, s in sh.items():
        if d % mod == 0:
            ev |= s
    contaminated = {
        d for d, s in sh.items() if d % mod != 0 and len(s & ev) >= min_ov
    }

    # stage 3: near-dup b-side drops
    ids = sorted(sh)
    dup_b = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sh[a], sh[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= jthr:
                dup_b.add(b)

    want = sorted(
        (d, lang)
        for d, (tk, lang) in docs.items()
        if (round6_scalar(len(set(tk)) / len(tk)) if tk else 0.0) >= thr
        and d % mod != 0
        and d not in contaminated
        and d not in dup_b
    )
    got = sorted(
        (r["doc_id"], r["lang"])
        for r in prep.corpus_prep(
            sf_dir, q=q, n=n, eval_mod=mod, min_overlap=min_ov,
            jaccard_threshold=jthr,
        ).take_all()
    )
    assert got == want
    assert 0 < len(got) < len(docs)  # the chain actually filters


def test_split_corpus_deterministic(ray_session):
    from engine.functions import fnv1a64
    from engine.prep import split_corpus

    sf = "/root/testdata/sf0.01"
    rows = split_corpus(sf).take_all()
    assert len(rows) == 500
    for r in rows[:50]:  # closed-form check
        b = fnv1a64(str(r["doc_id"])) % 10000
        assert r["bucket"] == b
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert r["split"] == want
    # ratios are in the right ballpark and all three splits non-empty
    from collections import Counter

    c = Counter(r["split"] for r in rows)
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 8 * (c["val"] + c["test"]) / 2
    # custom bounds validated
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_corpus(sf, bounds={"a": 5000, "b": 4000})


def test_epoch_shuffle_properties(ray_session):
    from engine.prep import epoch_shuffle

    sf = "/root/testdata/sf0.01"
    e1 = epoch_shuffle(sf, epoch=1, k=50).take_all()
    e1b = epoch_shuffle(sf, epoch=1, k=50).take_all()
    e2 = epoch_shuffle(sf, epoch=2, k=50).take_all()
    assert e1 == e1b  # reproducible
    assert [r["doc_id"] for r in e1] != [r["doc_id"] for r in e2]  # epoch-distinct
    assert [r["pos"] for r in e1] == list(range(1, 51))
    keys = [r["shuffle_key"] for r in e1]
    assert keys == sorted(keys)


def test_dsir_weights_vs_local(ray_session, sf_dir):
    """DSIR importance weights == a local pure-Python replay (hashed
    uni+bi-gram bucket models, Laplace smoothing, integer micros), and
    target-language docs score higher on average (the op's purpose)."""
    import math

    import pyarrow.parquet as pq

    from engine.functions import fnv1a64, micro_signed
    from engine.prep import dsir_weights

    B = 4096
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    grams_by_doc: dict[int, list[int]] = {}
    langs: dict[int, str] = {}
    bucket_memo: dict[str, int] = {}

    def bucket(g: str) -> int:
        got = bucket_memo.get(g)
        if got is None:
            got = bucket_memo[g] = fnv1a64(g) % B
        return got

    for did, text, lang in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("lang").to_pylist(),
    ):
        toks = [w for w in text.lower().split(" ") if w]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        grams_by_doc[did] = [bucket(g) for g in grams]
        langs[did] = lang

    c_all = [0] * B
    c_tgt = [0] * B
    for did, bs in grams_by_doc.items():
        for b in bs:
            c_all[b] += 1
            if langs[did] == "en":
                c_tgt[b] += 1
    ta, tt = sum(c_all), sum(c_tgt)
    delta = [
        int(micro_signed(math.log((c_tgt[b] + 1) / (tt + B))))
        - int(micro_signed(math.log((c_all[b] + 1) / (ta + B))))
        for b in range(B)
    ]
    want = {
        did: (len(bs), sum(delta[b] for b in bs))
        for did, bs in grams_by_doc.items()
        if bs
    }

    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_sum_micro"])
        for r in dsir_weights(sf_dir, n_buckets=B).take_all()
    }
    assert got == want

    by_lang: dict[str, list[float]] = {}
    for did, (ng, s) in got.items():
        by_lang.setdefault(langs[did], []).append(s / ng)
    mean_en = sum(by_lang["en"]) / len(by_lang["en"])
    for lang, vals in by_lang.items():
        if lang != "en":
            assert mean_en > sum(vals) / len(vals)


def test_corpus_prep_join_path_identical(ray_session, sf_dir):
    """VERDICT r03 task #2: forcing the removal sets past the broadcast
    cap (cap=0) flips corpus_prep onto the distributed LEFT ANTI join —
    output must be identical to the broadcast fast path."""
    kw = dict(q=0.25, n=3, eval_mod=50, min_overlap=3, jaccard_threshold=0.5)
    fast = sorted(
        (r["doc_id"], r["lang"])
        for r in prep.corpus_prep(sf_dir, **kw).take_all()
    )
    joined = sorted(
        (r["doc_id"], r["lang"])
        for r in prep.corpus_prep(
            sf_dir, removal_broadcast_max=0, **kw
        ).take_all()
    )
    assert joined == fast
    assert 0 < len(joined)
