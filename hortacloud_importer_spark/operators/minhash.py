"""MinHash-LSH and SimHash near-duplicate operators.

Pure Catalyst-expression implementations (no Python UDFs in the hot
path): shingle/token ids come from xxhash64, permutations are the
classic (a*x + b) mod p family, and signatures/bands are built with
built-in aggregate + bit functions. At 100 TB the only shuffles are
(a) the signature groupBy per document and (b) the band-bucket join,
whose fan-out is governed by band width — the documents themselves
are never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^31-1: keeps (a*x + b) < 2^62 so the bigint math can't overflow —
# Spark 4 runs ANSI mode by default, where overflow raises.
_MERSENNE_P = (1 << 31) - 1


def _perm_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    # Deterministic LCG-derived (a, b) pairs — stable across runs/nodes.
    params = []
    state = seed
    for _ in range(n_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_MERSENNE_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sig: array<bigint>) — min over permuted shingle hashes.

    h_j(x) = ((a_j * x + b_j) mod p); x = xxhash64(shingle) masked to
    non-negative. The whole signature is one hash aggregate of
    n_hashes MIN()s.
    """
    x = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE_P))
    mins = [
        F.min((x * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)).alias(f"h{j}")
        for j, (a, b) in enumerate(_perm_params(n_hashes))
    ]
    sig = shingles.groupBy(id_col).agg(*mins)
    return sig.select(
        id_col, F.array(*[f"h{j}" for j in range(n_hashes)]).alias("sig")
    )


def minhash_pairs(
    shingles: DataFrame, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Banded-LSH candidate pairs with estimated similarity.

    rows = n_hashes // bands hashes per band; a pair is a candidate if
    any band matches exactly (classic banding: P[match] = 1-(1-s^r)^b).
    Output: (doc_a, doc_b, est_jaccard = matching hash fraction).
    """
    rows = n_hashes // bands
    sig = minhash_signatures(shingles, n_hashes).cache()
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(*[F.col("sig")[i * rows + r] for r in range(rows)]).alias(
                            "bucket"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
            )
        ).cast("double")
        / F.lit(float(n_hashes))
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def simhash_signatures(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document from token xxhash64 bit majorities."""
    h = F.xxhash64("token")
    one = F.lit(1).cast("bigint")
    bit_sums = [
        F.sum(
            F.when(F.shiftrightunsigned(h, b).bitwiseAND(one) == one, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = tokens.groupBy(id_col).agg(*bit_sums)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, b)
        # bitwise OR, not +: distinct bits anyway, and OR can never trip
        # ANSI overflow on the sign bit
        sim = term if sim is None else sim.bitwiseOR(term)
    return agg.select(id_col, sim.alias("simhash"))


def simhash_pairs(tokens: DataFrame, max_hamming: int = 12) -> DataFrame:
    """Candidate pairs via 16-bit prefix band + exact hamming filter."""
    sig = simhash_signatures(tokens).withColumn(
        "band", F.shiftrightunsigned("simhash", 48)
    )
    a = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band"
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band"
    )
    hamming = F.bit_count(F.expr("sim_a ^ sim_b"))
    return (
        a.join(b, "band")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )
