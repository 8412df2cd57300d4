"""Winnowing fingerprints vs a plain-Python oracle + the MOSS
shared-substring guarantee."""

from __future__ import annotations

import hashlib

from hortacloud_importer_spark.queries.text import (
    _WINNOW_K,
    _WINNOW_W,
    winnow_fingerprints,
)


def _py_oracle(texts):
    """A fully independent Python winnower: the gram hash (first 60
    bits of md5) is engine-portable, so no Spark round trip is needed
    to reproduce it."""
    def h(gram: str) -> int:
        return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)

    out = {}
    for doc_id, text in texts:
        words = text.split(" ")
        n = len(words) - _WINNOW_K + 1
        hs = [
            h(" ".join(words[i : i + _WINNOW_K])) for i in range(n)
        ]
        fps = set()
        for i in range(max(1, n - _WINNOW_W + 1)):
            fps.add(min(hs[i : i + _WINNOW_W]))
        out[doc_id] = fps
    return out


def test_winnow_matches_python(spark):
    texts = [
        (0, "a b c d e f g h i j k l m"),
        (1, "x y z a b c d e f q r s t"),
        (2, "one two three"),  # exactly k words -> single gram
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    got = {}
    for r in winnow_fingerprints(df, hash="md5").collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = _py_oracle(texts)
    assert got == want


def test_shared_run_shares_fingerprint(spark):
    """MOSS guarantee: docs sharing >= w+k-1 consecutive words share
    at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 words
    texts = [
        (0, f"p q r {shared} s t"),
        (1, f"{shared} u v w x"),
        (2, "totally different words here entirely now"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    # the MOSS property is hash-agnostic: check BOTH leaves
    for h in ("xxhash64", "md5"):
        fps = {}
        for r in winnow_fingerprints(df, hash=h).collect():
            fps.setdefault(r["doc_id"], set()).add(r["fp"])
        assert fps[0] & fps[1], f"shared run must share a fp ({h})"
        assert not (fps[0] & fps[2])
