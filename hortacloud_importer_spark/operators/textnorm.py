"""Shared Unicode-lite token normalization (round-13 ask #4).

One definition of "normalized words" — lowercase, punctuation stripped
to spaces, whitespace collapsed, empties dropped — used consistently by
the normalized text ops (text_wordcount_norm, text_ngram_ppx_norm) and
benchmark decontamination (dedup.py::corpus_decontaminate_norm), with
the byte-identical DuckDB mirror next to it so every consumer's oracle
replays the same tokenization. Real multilingual corpora need at least
this much before any word-level statistic means anything; a full
Unicode NFKC fold would require ICU tables (not derivable clean-room
in-container), so the contract is the explicit [^a-z0-9]+ class, which
both engines implement identically over UTF-8.

The normalization is a pure per-row Catalyst expression (regexp +
split + filter) — map-side, no UDF, no shuffle contribution.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB mirror of norm_words(); keep the two in lockstep.
NORM_WORDS_SQL = (
    "list_filter(str_split(trim(regexp_replace(lower(text),"
    " '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
)


def norm_words(col: str = "text") -> Column:
    """array<string> of normalized words from a text column."""
    return F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]+", " ")),
            " ",
        ),
        lambda x: x != "",
    )
