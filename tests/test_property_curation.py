"""Randomized model-checking for the curation second wave (the reference's
randomized-test style): a pure-Python model is the spec; the distributed
operator must agree exactly on random corpora with planted structure."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dshackle_archive_spark.operators.dedup import repeated_segment_removal
from dshackle_archive_spark.operators.similarity import semantic_dedup


def _model_segment_removal(texts: dict[int, str], seg_len: int, min_df: int):
    """Spec: cut normalized docs into non-overlapping seg_len-token
    segments, strip segments in >= min_df distinct docs, rebuild."""
    segs = {}
    for did, text in texts.items():
        toks = " ".join(text.lower().strip().split()).split(" ")
        out = []
        for s in range(0, len(toks), seg_len):
            st = " ".join(toks[s : s + seg_len])
            if st:
                out.append(st)
        segs[did] = out
    df = {}
    for did, ss in segs.items():
        for st in set(ss):
            df[st] = df.get(st, 0) + 1
    rep = {st for st, n in df.items() if n >= min_df}
    expect = {}
    for did, ss in segs.items():
        kept = [st for st in ss if st not in rep]
        expect[did] = (
            len(ss),
            sum(1 for st in ss if st in rep),
            sum(len(st.split(" ")) for st in kept),
            " ".join(kept),
        )
    return expect


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_segment_removal_matches_model(spark, seed):
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(40)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 30)))
        for _ in range(3)
    ]
    texts = {}
    for did in range(80):
        words = [rng.choice(vocab) for _ in range(rng.randint(5, 60))]
        text = " ".join(words)
        if rng.random() < 0.4:  # plant a shared passage at a random spot
            p = rng.choice(passages)
            cut = rng.randint(0, len(words))
            text = " ".join(words[:cut] + p.split(" ") + words[cut:])
        texts[did] = text
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_segments"],
            r["n_removed"],
            r["kept_tokens"],
            r["cleaned_text"],
        )
        for r in repeated_segment_removal(docs, seg_len=8, min_df=4).collect()
    }
    assert got == _model_segment_removal(texts, seg_len=8, min_df=4)


def _model_semantic_dedup(vecs: dict[int, list[float]], n_cells, threshold):
    import math

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def nrm(a):
        return math.sqrt(dot(a, a))

    seeds = sorted(vecs)[:n_cells]
    assign = {}
    for vid, v in vecs.items():
        best = max(
            seeds,
            key=lambda s: (round(dot(v, vecs[s]) / (nrm(v) * nrm(vecs[s])), 6), -s),
        )
        assign[vid] = best
    removed = {}
    ids = sorted(vecs)
    for i, b in enumerate(ids):
        for a in ids[:i]:
            if assign[a] != assign[b]:
                continue
            cos = round(dot(vecs[a], vecs[b]) / (nrm(vecs[a]) * nrm(vecs[b])), 6)
            if cos >= threshold:
                prev = removed.get(b)
                if prev is None:
                    removed[b] = (assign[b], a, cos)
                else:
                    removed[b] = (
                        prev[0],
                        min(prev[1], a),
                        max(prev[2], cos),
                    )
    return removed


@pytest.mark.parametrize("seed", [3, 11])
def test_semantic_dedup_matches_model(spark, seed):
    rng = random.Random(seed)
    dim = 8
    vecs = {}
    for vid in range(60):
        vecs[vid] = [rng.uniform(-1, 1) for _ in range(dim)]
    # planted near-copies: tiny jitter on one coordinate
    for vid in range(0, 60, 9):
        v = list(vecs[vid])
        v[0] += 0.01
        vecs[vid + 1000] = v
    rows = [(vid, v) for vid, v in vecs.items()]
    frame = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cell_id"], r["kept_by"], r["max_sim"])
        for r in semantic_dedup(
            frame, n_cells=8, threshold=0.95, dim=dim
        ).collect()
    }
    assert got == _model_semantic_dedup(vecs, 8, 0.95)
