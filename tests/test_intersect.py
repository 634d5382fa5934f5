"""Co-occurrence mining (intersect.cpp analog)."""

import numpy as np

from trinity_tpu.exec import Executor
from trinity_tpu.index.builder import SegmentIndexSession
from trinity_tpu.query.intersect import intersect, intersection_alternatives


def build():
    docs = {
        1: "apple iphone case",
        2: "apple iphone",
        3: "apple case",
        4: "iphone case",
        5: "apple iphone case pro",
        6: "unrelated words here",
        7: "apple iphone case",
    }
    sess = SegmentIndexSession()
    for d, text in docs.items():
        p = sess.begin(d)
        for i, t in enumerate(text.split(), 1):
            p.insert(t, i)
        sess.insert(p)
    return Executor(sess.commit()), docs


def naive_masks(docs, tokens):
    out = {}
    for text in docs.values():
        toks = set(text.split())
        m = sum(1 << i for i, t in enumerate(tokens) if t in toks)
        if m:
            out[m] = out.get(m, 0) + 1
    return out


def test_intersect_counts():
    ex, docs = build()
    tokens = ["apple", "iphone", "case"]
    res = dict(intersect(ex, tokens))
    expected = naive_masks(docs, tokens)
    # every returned mask's count matches the naive count
    for mask, count in res.items():
        assert expected[mask] == count
    # the full intersection (all three) is present: docs 1, 5, 7
    assert res[0b111] == 3


def test_dominated_masks_removed():
    ex, docs = build()
    res = intersect(ex, ["apple", "iphone", "case"])
    masks = [m for m, _ in res]
    # {apple} alone (mask 0b001) never occurs without iphone or case
    assert 0b001 not in masks


def test_alternatives_ordering():
    ex, docs = build()
    alts = intersection_alternatives(ex, ["apple", "iphone", "case", "zzz"])
    # largest matching subset first
    assert alts[0][0] == ["apple", "iphone", "case"]
    assert alts[0][1] == 3


def test_intersect_many_tokens():
    """> 30 tokens exercises the multi-plane (uint64) mask path — the
    reference supports up to 64 (intersect.h uint64_t masks)."""
    from trinity_tpu.index.builder import SegmentIndexSession
    from trinity_tpu.exec import Executor
    from trinity_tpu.query.intersect import intersect

    sess = SegmentIndexSession()
    # doc 1 holds tokens 0..39; docs 2+4 hold evens (count 2 beats the
    # full mask's count 1, so the subset survives dedup); doc 3's 35..39
    # mask (count 1) is dominated by the full mask (count 1 >= 1)
    groups = {1: range(40), 2: range(0, 40, 2), 3: range(35, 40),
              4: range(0, 40, 2)}
    for d, rng_ in groups.items():
        p = sess.begin(d)
        for i, t in enumerate(rng_):
            p.insert(f"w{t}", i + 1)
        sess.insert(p)
    ex = Executor(sess.commit())
    toks = [f"w{i}" for i in range(40)]
    res = intersect(ex, toks)
    full = (1 << 40) - 1
    evens = sum(1 << i for i in range(0, 40, 2))
    got = dict(res)
    assert got.get(full) == 1  # doc 1
    assert got.get(evens) == 2  # docs 2+4 (bit 34 > 30 -> 2nd plane)
    assert sum(1 << i for i in range(35, 40)) not in got  # dominated
