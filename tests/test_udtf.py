"""J4 Python UDTF: sentence segmentation vs plain-Python oracle."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hortacloud_importer_spark.operators.udtfs import SplitSentences


def test_split_sentences_matches_python(spark):
    docs = [
        (0, "One. Two sentences! A third? yes."),
        (1, "no terminal punctuation at all"),
        (2, ""),
        (3, "Multiple   spaces.  And... ellipsis? end"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["doc_id"], r["idx"]): (r["sentence"], r["n_words"])
        for r in df.lateralJoin(SplitSentences(F.col("text").outer())).collect()
    }
    pat = re.compile(r"(?<=[.!?])\s+")
    want = {}
    for doc_id, text in docs:
        for i, s in enumerate(pat.split(text or "")):
            s = s.strip()
            if s:
                want[(doc_id, i)] = (s, len(s.split()))
    assert got == want
    assert (2, 0) not in got  # empty doc yields no rows
