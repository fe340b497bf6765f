"""Physical-plan guards: the scale properties SCALE.md claims must be
visible in the executed plan, not just asserted in prose. These tests pin
them so a refactor that silently de-optimizes a pipeline fails CI.

Each test inspects `executedPlan` (post-AQE plan skeleton) of a real query
over the sf0.001 fixtures.
"""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


def test_similarity_and_dedup_have_no_python_in_row_path(spark, entry):
    """Dot products / minhash / simhash are Catalyst expressions; a Python
    eval node appearing in these DAGs means someone reintroduced a UDF on
    the hot path (input_hint: no per-row Python)."""
    for name in [
        "knn_bruteforce", "knn_ivf", "dedup_simhash", "embedding_near_dup",
        # tokenize_expr made the whole postings pipeline JVM-side too
        "tokenize_postings", "document_frequency", "tfidf_search",
    ]:
        plan = _plan(entry.queries()[name](spark, SF))
        assert "EvalPython" not in plan, f"{name} has Python on the row path"


def test_pricing_summary_pushes_filter_and_prunes_columns(spark, entry):
    plan = _plan(entry.queries()["tpch_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan
    # projection pruning: untouched wide columns never leave the scan
    assert "l_comment" not in plan


def test_tfidf_topk_is_take_ordered_not_global_sort(spark, entry):
    plan = _plan(entry.queries()["tfidf_search"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_search_df_aggregate_is_word_restricted(spark, entry):
    """search()'s df aggregate must sit ABOVE a query-word semi-join, never
    over the bare postings relation: Catalyst does not push a later
    semi-join below an Aggregate, so the r2 shape (join after groupBy)
    silently aggregated the FULL postings table per query — a scale-killer
    at the 100 TB read path. toString prints top-down, so the semi-join
    must appear AFTER the distinct-count aggregate in the plan string."""
    from pyspark.sql import functions as F
    from see_spark.operators.search import search

    postings = entry._doc_postings(spark, SF).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "word", "term_count", "doc_len",
        (F.col("term_count") / F.col("doc_len")).alias("tf"),
    )
    docs = entry._documents(spark, SF).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("source").alias("title"),
    )
    plan = _plan(search(spark, "table join query", postings, docs, 500))
    agg_pos = plan.find("distinct doc_id")
    assert agg_pos != -1, "df aggregate (count distinct doc_id) not found"
    assert "LeftSemi" in plan[agg_pos:], (
        "no word semi-join below the df aggregate — it is scanning the "
        "full postings table"
    )


def test_dimension_joins_are_broadcast(spark, entry):
    plan = _plan(entry.queries()["region_order_counts"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_checkout_window_shuffles_only_unvisited_slice(spark):
    """The politeness window's host exchange must sit ABOVE the state
    filter, so only the unvisited slice shuffles (checkout's plan shape;
    the dense-seq localCheckpoint hides this fragment from checkout's own
    executedPlan, so the fragment is pinned directly)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from see_spark.operators.frontier import STATE_UNVISITED
    from see_spark.sources.synth import synth_frontier

    frontier = synth_frontier(spark, 1000).withColumn(
        "state",
        F.when(F.col("seq") % 2 == 0, F.lit("visited")).otherwise(F.col("state")),
    )
    w = Window.partitionBy("host").orderBy("depth", "seq")
    ranked = (
        frontier.filter(F.col("state") == STATE_UNVISITED)
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= 2)
    )
    plan = _plan(ranked)
    exchange_pos = plan.find("Exchange hashpartitioning(host")
    filter_pos = plan.find("unvisited")
    assert exchange_pos != -1 and filter_pos != -1
    # toString prints top-down: the filter must appear BELOW the exchange
    assert filter_pos > exchange_pos


def test_seen_filter_bloom_branch_is_union_of_filtered_scans(spark):
    """Bloom-negative candidates must bypass the anti-join: exactly one
    join in the plan, fed by the suspect branch only."""
    from see_spark.functions import bloom as bloomlib
    from see_spark.operators.frontier import seen_filter
    from see_spark.sources.synth import synth_candidates, synth_frontier

    frontier = synth_frontier(spark, 1000)
    cands = synth_candidates(spark, 500, 1000)
    bloom = bloomlib.build_bloom(frontier.select("url_hash"), n_bits=1 << 16)
    probe = bloomlib.maybe_seen_udf(spark, bloom)
    plan = _plan(seen_filter(cands, frontier, probe))
    assert plan.count("Join LeftAnti") + plan.count("BroadcastHashJoin [url_hash") >= 1
    assert "Union" in plan


def test_bm25_df_aggregate_is_word_restricted_and_topk(spark, entry):
    """search_bm25 shares search()'s scale contract: df aggregate above a
    broadcast query-word semi-join (never the full postings table) and a
    TakeOrderedAndProject k-cut, with no Python on the row path."""
    from pyspark.sql import functions as F
    from see_spark.operators.search import search_bm25

    postings = entry._doc_postings(spark, SF)
    docs = entry._documents(spark, SF).select(
        "doc_id", F.col("source").alias("title")
    )
    plan = _plan(search_bm25(spark, "table join query", postings, docs, 500))
    agg_pos = plan.find("distinct doc_id")
    assert agg_pos != -1, "df aggregate (count distinct doc_id) not found"
    assert "LeftSemi" in plan[agg_pos:], (
        "no word semi-join below the df aggregate — it is scanning the "
        "full postings table"
    )
    assert "TakeOrderedAndProject" in plan


def test_pagerank_iteration_has_no_python_and_no_cartesian(spark):
    """One PageRank iteration's plan: JVM-only (no EvalPython) and no
    cartesian/broadcast-nested-loop blow-up from the rank join."""
    from pyspark.sql import functions as F
    from see_spark.operators.linkgraph import pagerank, synthetic_edges

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    pr = pagerank(nodes, synthetic_edges(docs), n_iter=1)
    plan = _plan(pr)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_facet_counts_broadcasts_result_page(spark, entry):
    """facet_counts must broadcast the (small) result page into the
    metadata join — the docs table shuffling to meet a 100-row top-k
    would be the backwards plan at 100 TB."""
    from pyspark.sql import functions as F

    from see_spark.operators.search import facet_counts

    docs = entry._documents(spark, SF)
    res = spark.range(50).select(F.col("id").alias("doc_id"))
    plan = _plan(facet_counts(res, docs, ["lang", "source"]))
    assert "BroadcastHashJoin" in plan and "BuildRight" in plan
    # the docs side must not hash-exchange before the join
    assert plan.index("BroadcastHashJoin") < plan.index("FileScan")


def test_no_gated_query_plans_a_cartesian_or_unbounded_nested_loop(
    spark, entry
):
    """Scale guard over the ENTIRE driver-gated list: no gated query may
    compile to a CartesianProduct, and BroadcastNestedLoopJoin is allowed
    only where the broadcast side is a bounded query/dimension set (the
    exact-kNN baseline's broadcast query scan — the corpus side never
    shuffles). Anything else joining a table against itself without an
    equi-key would be quadratic at 100 TB; this pins the r3 verdict fix
    that moved embedding_near_dup onto the LSH-bucketed equi-join."""
    # knn_bruteforce: exact-kNN baseline — BNLJ with the ≤5-row query set
    # broadcast. knn_ivf: centroid-assignment map-side expansion — BNLJ
    # with the n_centroids-row (constant) centroid dim broadcast; the
    # corpus side never shuffles for it. Both are O(N·const), documented
    # in similarity.py. Nothing else gets a pass.
    bnlj_ok = {"knn_bruteforce", "knn_ivf"}
    offenders = {}
    for name, fn in entry.queries().items():
        plan = _plan(fn(spark, SF))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, f"quadratic join shapes in gated plans: {offenders}"
