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
