"""Python UDTFs (SURVEY.md §2.J4): one row -> N rows with Python in
the generator.

Built-in `explode`/`posexplode` cover the array duals (blockify's
inverse); a Python UDTF is for when the row-expansion logic itself
needs Python (tokenizers, parsers, decoders). Arrow-batched like
Pandas UDFs; used via ``df.lateralJoin(TheUdtf(col.outer()))``.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="idx int, sentence string, n_words int")
class SplitSentences:
    """documents.text -> one row per sentence with its word count —
    the UDTF shape of a text-pipeline segmenter."""

    def eval(self, text: str):  # noqa: D102
        for i, s in enumerate(_SENTENCE_RE.split(text or "")):
            s = s.strip()
            if s:
                yield i, s, len(s.split())
