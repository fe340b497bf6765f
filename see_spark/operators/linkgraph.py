"""Link-graph analytics: PageRank, degree stats, link-graph extraction.

A web-scale crawler's frontier IS a link graph (the reference stores the
raw material — per-page outlinks at parse time, see_html.erl:54-78 /
see_crawler_srv.erl link handling — but never analyzes it). PageRank over
that graph is the canonical crawl-priority / quality signal for a
training-data pipeline, so it's implemented here as an engine addition,
Spark-first:

- ``edges_from_docs``: the crawl path's (src_url -> dst_url) edge table,
  derived from parsed link spans joined to the frontier (used in tests on
  the fixture site).
- ``synthetic_edges``: a deterministic expander over any keyed table
  (doc_id arithmetic), so the gate queries run on the driver's testdata
  tables with an exact DuckDB oracle — no external data.
- ``pagerank``: fixed-iteration join-based power method. Per iteration
  exactly ONE shuffle of (dst, contribution) — the edges×ranks join
  broadcasts nothing and co-partitions on ``src`` (both sides are
  repartitioned on the key once, and every iteration reuses that
  partitioning), and the dangling-mass term is a one-row aggregate
  broadcast back as a literal join-free column. At 10^10 edges this is
  the standard Pregel-equivalent shape: state = one rank row per node,
  messages = one contribution row per edge, no driver-side iteration
  state beyond the loop counter.

Determinism: double summation order varies across partitionings, so raw
ranks differ in the last ulp across cluster sizes. Callers that need
cross-parallelism-identical output (the north rule's determinism half)
round to ROUND_DP decimals — error headroom is ~1e5 ulps at graph sizes
up to 10^9 nodes, verified against the unrolled-CTE oracle.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_DP = 9

# (multiplier, offset) pairs for the synthetic expander; coprime-ish odd
# multipliers so dst sets differ per stride and the graph is connected.
SYNTH_STRIDES: Tuple[Tuple[int, int], ...] = ((7, 1), (13, 5), (31, 11))


def synthetic_edges(
    nodes: DataFrame, id_col: str = "doc_id", n_nodes: Optional[int] = None
) -> DataFrame:
    """Deterministic out-degree-≤3 expander over a keyed table:
    dst = (src * m + c) mod N for each stride, self-loops dropped,
    duplicate dsts collapsed. Expressible identically in ANSI SQL, which
    is what makes the PageRank gate query exactly checkable."""
    n = n_nodes if n_nodes is not None else nodes.count()
    src = F.col(id_col).cast("long")
    dsts = F.array_distinct(
        F.array(*[(src * F.lit(m) + F.lit(c)) % F.lit(n) for m, c in SYNTH_STRIDES])
    )
    return nodes.select(
        src.alias("src"),
        F.explode(F.filter(dsts, lambda d: d != src)).alias("dst"),
    )


def edges_from_docs(parsed_docs: DataFrame) -> DataFrame:
    """(url, links array<string>) -> distinct (src, dst) edge rows; the
    crawl-pipeline link graph (dst is the already-absolutized link — the
    crawl loop resolves links before this point, crawl.py)."""
    return (
        parsed_docs.select(
            F.col("url").alias("src"), F.explode("links").alias("dst")
        )
        .where(F.col("dst") != F.col("src"))
        .distinct()
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count("*").alias("out_deg"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node (node, out_deg, in_deg) with 0s for one-sided nodes —
    the hub/authority raw counts. Two map-side-combinable shuffles plus
    one outer join on the node key."""
    out = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    inn = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out.join(inn, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    id_col: str = "node",
    round_dp: Optional[int] = ROUND_DP,
    shuffle_partitions: Optional[int] = None,
) -> DataFrame:
    """Fixed-iteration PageRank with dangling-mass redistribution.

    r_{t+1}(v) = (1-d)/N + d * (Σ_{u->v} r_t(u)/outdeg(u) + dangling_t/N)

    ``nodes``: one row per node (column ``id_col``). Returns
    (node, rank) with rank rounded to ``round_dp`` (None = raw doubles).

    Scale shape per iteration: edges (co-partitioned on src once, reused)
    join ranks on src -> groupBy dst sum (the single edge-volume shuffle)
    -> left join back to the node list (co-partitioned on the node key).
    The dangling mass is a scalar: computed with a one-row agg and
    injected as a literal, never a join. Lineage is cut every iteration
    with localCheckpoint(eager=False) so n_iter chains don't stack plans.
    """
    n = nodes.count()
    node = F.col(id_col).cast("long").alias("node")
    nodes_n = nodes.select(node)
    if shuffle_partitions:
        nodes_n = nodes_n.repartition(shuffle_partitions, "node")
        edges = edges.repartition(shuffle_partitions, "src")
    edges = edges.localCheckpoint(eager=False)

    deg = out_degrees(edges)
    # rank state: (node, rank, out_deg); out_deg carried so the dangling
    # scalar and the per-edge contribution need no extra join per round
    state = nodes_n.join(deg, nodes_n["node"] == deg["src"], "left").select(
        "node",
        F.lit(1.0 / n).alias("rank"),
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
    )
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        dangling = (
            state.where(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            edges.join(
                state.where(F.col("out_deg") > 0).select(
                    "node", (F.col("rank") / F.col("out_deg")).alias("share")
                ),
                edges["src"] == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        state = (
            state.select("node", "out_deg")
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
                "out_deg",
            )
            .localCheckpoint(eager=False)
        )
    out = state.select("node", "rank")
    if round_dp is not None:
        out = out.select("node", F.round("rank", round_dp).alias("rank"))
    return out


def anchor_postings(raw_docs: DataFrame, url_col: str = "url", body_col: str = "body") -> DataFrame:
    """Anchor-text postings: tokenize each link's anchor text and attribute
    the terms to the link TARGET (engine addition — the standard signal the
    reference's href-only collection drops; see core/htmlx.links_with_text).

    raw_docs: (url, body) -> (word, dst_url, src_url, term_count), where
    dst_url is absolutized against the source page with the reference's
    resolver quirks (core/urls.absolute_link via absolute_link_udf).

    Scale shape: one Arrow-batched parse pass (the anchors UDF), explode,
    absolutize (JVM pass-through fast path for already-absolute hrefs),
    then one map-side-combinable groupBy — the same two-shuffle build as
    the body-text index (indexer.postings_from_docs).
    """
    from ..functions.udfs import absolute_link_udf, anchors_udf, tokenize_expr

    pairs = (
        raw_docs.select(
            F.col(url_col).alias("src_url"),
            F.explode(anchors_udf(F.col(body_col))).alias("__a"),
        )
        .select(
            "src_url",
            F.col("__a.href").alias("href"),
            F.col("__a.anchor").alias("anchor"),
        )
        .withColumn(
            "dst_url",
            F.when(
                F.col("href").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"),
                F.col("href"),
            ).otherwise(absolute_link_udf(F.col("src_url"), F.col("href"))),
        )
        .where(F.col("dst_url").isNotNull())
    )
    words = pairs.select(
        "src_url",
        "dst_url",
        F.explode(tokenize_expr(F.col("anchor"))).alias("word"),
    )
    return words.groupBy("word", "dst_url", "src_url").agg(
        F.count("*").alias("term_count")
    )


def edges_from_crawl_docs(docs: DataFrame, domain_filter=None) -> DataFrame:
    """Link graph of a crawled corpus straight from the docs table
    (tables.DOCS_SCHEMA): explode kind='link' spans, absolutize each raw
    href against its page (same JVM pass-through as the crawl loop,
    crawl.py), canonicalize with the fixpoint fast path, and emit distinct
    (src, dst) canonical-URL edges. src = doc_id (already canonical).

    One Arrow pass only for the non-absolute/non-canonical minority of
    hrefs; the whole stage is codegen for clean-link corpora.
    """
    from ..functions.udfs import absolute_link_udf
    from .frontier import canonicalize_and_filter

    raw = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("link"))
        ).alias("__s"),
    ).select("src", F.col("__s.media_ref").alias("raw_link"))
    absolutized = raw.withColumn(
        "abs_link",
        F.when(
            F.col("raw_link").rlike(r"[^/]+://"), F.col("raw_link")
        ).otherwise(absolute_link_udf(F.col("src"), F.col("raw_link"))),
    )
    canon = canonicalize_and_filter(
        absolutized.select("src", F.col("abs_link")),
        url_col="abs_link",
        domain_filter=domain_filter,
    ).filter(F.col("ingest_status") == "ok")
    return (
        canon.select("src", F.col("url").alias("dst"))
        .where(F.col("dst") != F.col("src"))
        .distinct()
    )


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    id_col: str = "node",
    round_dp: Optional[int] = ROUND_DP,
) -> DataFrame:
    """Fixed-iteration HITS (hubs & authorities), L1-normalized:

      a_t(v) = sum over u->v of h_{t-1}(u),  then a_t /= sum(a_t)
      h_t(u) = sum over u->v of a_t(v),      then h_t /= sum(h_t)

    Returns (node, hub, authority) rounded like pagerank(). Two
    edge-volume shuffles per iteration (one per direction); the L1
    normalizers are one-row aggregates injected as literals — same scalar
    pattern as pagerank()'s dangling mass, never a join. h_0 = 1 for
    every node; nodes with no in-links (out-links) hold authority (hub) 0.
    """
    node = F.col(id_col).cast("long").alias("node")
    nodes_n = nodes.select(node).localCheckpoint(eager=False)
    edges = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).localCheckpoint(eager=False)

    hubs = nodes_n.select("node", F.lit(1.0).alias("hub"))
    auths = None
    for _ in range(n_iter):
        a_raw = (
            edges.join(hubs, edges["src"] == hubs["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        a_tot = a_raw.agg(F.coalesce(F.sum("authority"), F.lit(1.0))).collect()[0][0]
        auths = (
            nodes_n.join(a_raw, "node", "left")
            .select(
                "node",
                (F.coalesce("authority", F.lit(0.0)) / F.lit(a_tot)).alias("authority"),
            )
            .localCheckpoint(eager=False)
        )
        h_raw = (
            edges.join(auths, edges["dst"] == auths["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        h_tot = h_raw.agg(F.coalesce(F.sum("hub"), F.lit(1.0))).collect()[0][0]
        hubs = (
            nodes_n.join(h_raw, "node", "left")
            .select(
                "node",
                (F.coalesce("hub", F.lit(0.0)) / F.lit(h_tot)).alias("hub"),
            )
            .localCheckpoint(eager=False)
        )
    out = hubs.join(auths, "node").select("node", "hub", "authority")
    if round_dp is not None:
        out = out.select(
            "node",
            F.round("hub", round_dp).alias("hub"),
            F.round("authority", round_dp).alias("authority"),
        )
    return out


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "url",
) -> DataFrame:
    """Exact shortest-hop distance from a seed set — the crawl-depth
    audit: a frontier's stored ``depth`` is DISCOVERY depth (the round a
    URL was first queued), which upper-bounds but need not equal the
    link-graph BFS distance; this computes the true distance so the two
    can be diffed (a persistent gap flags scheduler starvation — a page
    one hop from a seed crawled only at depth 9 means its host budget
    starved it for eight rounds).

    Delta-frontier BFS (the Pregel shape): iteration i joins ONLY the
    nodes first reached at depth i-1 against the edge table, anti-joins
    the already-settled set, and stops early when no new node appears.
    Each iteration therefore shuffles the frontier-adjacent edge slice,
    not the graph; total work is O(E) across all iterations — the same
    bound as single-machine BFS, just bucketed by depth. Out-degree hub
    skew lands in the edges-side join key, where AQE's skew-join split
    applies. Lineage is cut per iteration (localCheckpoint), matching
    pagerank's loop hygiene. Returns (url, depth) for every node
    reachable within ``max_iters`` hops; depths are exact integers, so
    the result is bit-identical at any parallelism.
    """
    edge = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    dist = seeds.select(
        F.col(seed_col).alias("url"), F.lit(0).cast("long").alias("depth")
    ).distinct().localCheckpoint(eager=True)
    frontier = dist
    for i in range(1, max_iters + 1):
        nxt = (
            frontier.join(edge, frontier["url"] == edge["__src"])
            .select(F.col("__dst").alias("url"))
            .distinct()
            .join(dist, "url", "left_anti")
            .select("url", F.lit(i).cast("long").alias("depth"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def trustrank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    id_col: str = "node",
    round_dp: Optional[int] = ROUND_DP,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank
    with the teleport vector CONCENTRATED on a hand-vetted trusted seed
    set instead of uniform — trust flows out from good pages, so spam
    farms that amass raw in-links but sit far from any trusted region
    score near zero. The standard web-spam demotion signal beside the
    in-degree/PageRank priorities feeding checkout_prioritized.

      r_{t+1}(v) = (1-d)*s(v) + d*(Σ_{u->v} r_t(u)/outdeg(u)
                                   + dangling_t * s(v))

    with s(v) = 1/|seeds| on seeds, else 0 (dangling mass teleports to
    the seeds too — mass is conserved exactly as in pagerank()).

    Identical scale shape to ``pagerank``: per iteration one edge-volume
    shuffle + a scalar dangling aggregate injected as a literal; the
    teleport column rides the rank state (one broadcast seed join at
    init, never per-iteration). Lineage cut per iteration.
    """
    m = seeds.count()
    node = F.col(id_col).cast("long").alias("node")
    nodes_n = nodes.select(node)
    seed_n = seeds.select(F.col(seeds.columns[0]).cast("long").alias("node"))
    edges = edges.localCheckpoint(eager=False)
    deg = out_degrees(edges)
    tele = F.when(
        F.col("__s").isNotNull(), F.lit(1.0) / F.lit(float(m))
    ).otherwise(F.lit(0.0))
    state = (
        nodes_n.join(
            F.broadcast(seed_n.withColumn("__s", F.lit(1))), "node", "left"
        )
        .join(deg, nodes_n["node"] == deg["src"], "left")
        .select(
            "node",
            tele.alias("tele"),
            tele.alias("rank"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
    )
    for _ in range(n_iter):
        dangling = (
            state.where(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            edges.join(
                state.where(F.col("out_deg") > 0).select(
                    "node", (F.col("rank") / F.col("out_deg")).alias("share")
                ),
                edges["src"] == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        state = (
            state.select("node", "tele", "out_deg")
            .join(contribs, "node", "left")
            .select(
                "node",
                "tele",
                (
                    F.lit(1.0 - damping) * F.col("tele")
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.lit(dangling) * F.col("tele")
                    )
                ).alias("rank"),
                "out_deg",
            )
            .localCheckpoint(eager=False)
        )
    out = state.select("node", "rank")
    if round_dp is not None:
        out = out.select("node", F.round("rank", round_dp).alias("rank"))
    return out


def link_farm_scores(
    host_edges: DataFrame,
    min_links: int = 10,
    share_threshold_milli: int = 800,
) -> DataFrame:
    """Outlink-concentration link-farm signal (the classic web-spam
    heuristic complementing ``trustrank``: a farm's pages exist to point
    at ONE beneficiary, so its outlink distribution is near-degenerate,
    while organic hosts link broadly). Per source host: total outlinks,
    the single most-linked target host and its share in integer milli,
    flagged suspect when the share reaches the threshold WITH enough
    evidence (min_links — tiny hosts trivially concentrate).

    ``host_edges``: (src_host, dst_host), one row per link. Two
    combinable aggregates keyed by host — (src, dst) counts then a
    struct-max per src (top target picked without a window; ties pinned
    by the struct order n desc, dst_host desc). Nothing corpus-wide
    shuffles twice.
    """
    counts = host_edges.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("long").alias("n")
    )
    per = counts.groupBy("src_host").agg(
        F.sum("n").cast("long").alias("n_links"),
        F.max(F.struct(F.col("n"), F.col("dst_host"))).alias("__top"),
    )
    return per.select(
        "src_host",
        "n_links",
        F.col("__top.dst_host").alias("top_dst"),
        F.col("__top.n").cast("long").alias("top_dst_links"),
        F.expr("(__top.n * 1000) div n_links").cast("long")
        .alias("top_share_milli"),
        (
            (F.expr("(__top.n * 1000) div n_links") >= share_threshold_milli)
            & (F.col("n_links") >= min_links)
        ).alias("is_suspect"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient (integer
    milli) over the UNDIRECTED simple graph induced by ``edges`` — the
    classic web-spam / community-density signal (a link farm's
    neighborhood is near-clique; organic hosts are sparse).

    Scale shape (Suri & Vassilvitskii 2011 "Counting triangles and the
    curse of the last reducer"): orient every undirected edge from the
    lower-(degree, id) endpoint to the higher one, so each node's
    oriented out-degree is O(sqrt(m)) even for celebrity nodes; wedges
    are the oriented self-join on the source (bounded per-key fan-out —
    never deg^2 of a hub), and each wedge probes the oriented edge set
    once. Three shuffles total (degree agg, wedge join, closure join) +
    one count-per-corner aggregate; no step is quadratic in a hub's
    degree. The triangle SET is orientation-invariant, so an id-ordered
    ANSI-SQL brute enumeration is an exact oracle.

    Output: (node, degree, triangles, clustering_milli) where
    clustering_milli = 1000 * 2T div (d*(d-1)), 0 for d < 2.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    # rank = (degree, id); orient low -> high
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    lo_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    # wedges at the low-rank corner u: (v, w) both oriented-out of u
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = e1.join(e2, "u").where(F.col("v") < F.col("w"))
    # closure: does (v, w) exist as an undirected edge? (canonical a<b)
    closing = und.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tris = wedges.join(closing, ["v", "w"])  # rows (u, v, w): one per triangle
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("v").alias("node")))
        .unionAll(tris.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return (
        deg.join(corners, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(coalesce(triangles, 0) * 2000)"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_milli"),
        )
    )


def reciprocity(edges: DataFrame, min_out: int = 1) -> DataFrame:
    """Per-source link reciprocity (integer milli) over a DIRECTED edge
    set: the fraction of a host's distinct outlinks that link back — the
    link-exchange-scheme signal that complements ``link_farm_scores``
    (farms concentrate; exchanges reciprocate). One distinct pass, one
    self-join on the reversed key (co-partitioned equi-join — both sides
    hash on the same pair), one per-source aggregate.

    Output: (src, out_links, reciprocated, reciprocity_milli) for
    sources with at least ``min_out`` distinct outlinks.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(rev.withColumn("__back", F.lit(1)), ["src", "dst"], "left")
    return (
        marked.groupBy("src")
        .agg(
            F.count("*").cast("long").alias("out_links"),
            F.sum(F.coalesce("__back", F.lit(0))).cast("long")
            .alias("reciprocated"),
        )
        .where(F.col("out_links") >= min_out)
        .select(
            "src",
            "out_links",
            "reciprocated",
            F.expr("(reciprocated * 1000) div out_links").cast("long")
            .alias("reciprocity_milli"),
        )
    )


def community_edges(
    nodes: DataFrame, id_col: str = "doc_id", block: int = 8
) -> DataFrame:
    """Deterministic COMMUNITY graph over a keyed table: nodes fall into
    consecutive blocks of ``block``; each node links to the next 1, 2 and
    3 positions within its block (mod block), plus a +6 back-stride when
    node % 3 == 0 (so reciprocity varies per node instead of being
    degenerate). Unlike ``synthetic_edges`` (an expander — triangle-free
    in practice), blocks are near-cliques, so triangle/clustering/
    reciprocity signals are non-trivial. Pure integer arithmetic —
    expressible identically in ANSI SQL for the exact oracle."""
    n = nodes.count()
    src = F.col(id_col).cast("long")
    pos = src % block
    blk = src - pos
    strides = [F.lit(1), F.lit(2), F.lit(3)]
    dsts = [blk + (pos + s) % block for s in strides]
    back = blk + (pos + F.lit(6)) % block
    arr = F.array_union(
        F.array(*dsts),
        F.when(src % 3 == 0, F.array(back)).otherwise(F.array().cast("array<bigint>")),
    )
    return nodes.select(
        src.alias("src"),
        F.explode(
            F.filter(arr, lambda d: (d != src) & (d < F.lit(n)))
        ).alias("dst"),
    )


def kcore(edges: DataFrame, k: int = 3, n_iter: int = 8) -> DataFrame:
    """k-core membership by iterative peeling (Seidman 1983; the
    Batagelj–Zaveršnik distributed variant): repeatedly delete nodes of
    degree < k from the UNDIRECTED simple graph until none remain. The
    surviving subgraph — every member keeps >= k neighbors inside it —
    is the standard dense-community / link-spam-nucleus signal one level
    up from triangles (a farm's core survives high k; organic long-tail
    hosts peel away immediately).

    ``n_iter`` bounds the peeling rounds; peeling is MONOTONE (deleted
    nodes never return), so if a round removes nothing the loop is at
    the true fixpoint and remaining rounds are no-ops — callers pick
    n_iter >= the cascade depth (graphs peel in O(log n) rounds in
    practice; the pytest asserts fixpoint-reached on its graphs).

    Per round: one combinable degree aggregate + two semi-joins on the
    endpoint keys (the standard Pregel-equivalent shape; lineage cut per
    round like pagerank). Returns (node, degree) of the surviving core
    with degrees WITHIN the core.
    """
    alive = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(n_iter):
        deg = (
            alive.select(F.col("a").alias("node"))
            .unionAll(alive.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("__d"))
        )
        keep = deg.where(F.col("__d") >= k).select("node")
        alive = (
            alive.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        alive.select(F.col("a").alias("node"))
        .unionAll(alive.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )


def opic(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 4,
    id_col: str = "node",
    grain: int = 1_000_000,
) -> DataFrame:
    """OPIC — Adaptive On-Line Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW 2003), synchronous batch variant in EXACT integer
    micro-cash, the crawl-native importance signal: unlike PageRank it
    needs no convergence criterion — the frontier can consume ``hist``
    after any number of rounds, which is why real crawlers (and the
    north rule's priority queue) prefer it for ordering fetches.

    Every node starts with ``grain`` cash. Per iteration: (1) history
    absorbs current cash, (2) each node with out-degree d sends
    ``cash div d`` to every out-neighbor; division remainders and the
    whole cash of dangling nodes go to the virtual pot, (3) the pot is
    split uniformly (``pot div n``; the sub-micro remainder is dropped,
    deterministically). All arithmetic is BIGINT so the DuckDB oracle
    replays it bit-for-bit — no float tolerance anywhere.

    Returns (node, hist_micro, cash_micro). Importance after t rounds is
    hist/t; callers rank by (hist_micro DESC, node) — e.g. joined into
    the frontier checkout priority exactly as
    frontier_priority_indegree feeds depth+indegree.

    Scale per iteration: one edge-volume shuffle (join cash on src,
    groupBy dst) + a one-row scalar agg for the pot — the same shape as
    pagerank(); lineage cut per round with lazy localCheckpoint.
    """
    n = nodes.count()
    nodes_n = nodes.select(F.col(id_col).cast("long").alias("node"))
    edges = edges.localCheckpoint(eager=False)
    deg = out_degrees(edges)
    state = nodes_n.join(deg, nodes_n["node"] == deg["src"], "left").select(
        "node",
        F.lit(grain).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
    )
    for _ in range(n_iter):
        pot = (
            state.select(
                F.when(F.col("out_deg") == 0, F.col("cash"))
                .otherwise(
                    F.col("cash")
                    - F.col("out_deg") * F.expr("cash div out_deg")
                )
                .alias("leftover")
            )
            .agg(F.coalesce(F.sum("leftover"), F.lit(0)))
            .collect()[0][0]
        )
        contribs = (
            edges.join(
                state.where(F.col("out_deg") > 0).select(
                    "node", F.expr("cash div out_deg").alias("share")
                ),
                edges["src"] == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        vshare = int(pot) // n
        state = (
            state.select(
                "node", "out_deg", (F.col("hist") + F.col("cash")).alias("hist")
            )
            .join(contribs, "node", "left")
            .select(
                "node",
                (F.coalesce("contrib", F.lit(0)) + F.lit(vshare))
                .cast("long")
                .alias("cash"),
                "hist",
                "out_deg",
            )
            .localCheckpoint(eager=False)
        )
    return state.select(
        "node",
        F.col("hist").cast("long").alias("hist_micro"),
        F.col("cash").cast("long").alias("cash_micro"),
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 4,
    id_col: str = "node",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007, the deterministic batch variant): every node
    starts labeled with its own id; each round it adopts the label most
    frequent among its UNDIRECTED neighbors, ties broken by the SMALLEST
    label, isolated nodes keep their own. Fixed ``n_iter`` synchronous
    rounds (the asynchronous variant is order-dependent and therefore
    unreproducible across partitionings — exactly what the north rule's
    determinism criterion forbids), so the DuckDB oracle can unroll the
    identical rounds and the check is bit-exact.

    Crawl relevance: LPA is the cheap first-pass host/page community
    signal (mirror clusters, link farms, topical hubs) — near-linear
    per round vs PageRank's full propagation, no damping parameter.

    Scale per round: ONE shuffle of edge volume (neighbor-label join →
    groupBy (node, label) count, map-side combinable) + one node-keyed
    window for the argmax; lineage cut per round like pagerank/kcore.
    Returns (node, label, community_size).
    """
    und = (
        edges.select("src", "dst")
        .unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes_n = nodes.select(F.col(id_col).cast("long").alias("node"))
    labels = nodes_n.select("node", F.col("node").alias("label"))
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(n_iter):
        neigh = (
            und.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            )  # label of each neighbor, keyed by the adopting node (src)
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            neigh.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node", F.coalesce("new_label", "label").cast("long").alias("label")
            )
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("community_size"))
    return labels.join(sizes, "label").select("node", "label", "community_size")


def cocitation_pairs(
    edges: DataFrame,
    min_count: int = 1,
    max_out_deg: int = 64,
) -> DataFrame:
    """Co-citation relatedness (Small 1973): pages (a, b) are related in
    proportion to how many pages link to BOTH — the classic link-based
    "related pages" signal (it needs no text, so it works on the crawl
    frontier before content arrives). Counts pairs (dst_a < dst_b)
    sharing a source, keeping pairs seen >= ``min_count`` times.

    The self-join's fan-out is quadratic in SOURCE out-degree, so
    sources with out-degree > ``max_out_deg`` are dropped first — the
    standard hub-cap (a directory page linking 10^4 pages asserts
    little relatedness and would alone emit 10^8 pairs). With the cap,
    work is bounded by E * max_out_deg — linear in edges for fixed cap.
    Returns (doc_a, doc_b, cocite).
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("__d"))
    e = (
        edges.join(deg.where(F.col("__d") <= max_out_deg), "src", "left_semi")
        .select("src", "dst")
        .distinct()
    )
    a = e.select("src", F.col("dst").alias("doc_a"))
    b = e.select("src", F.col("dst").alias("doc_b"))
    return (
        a.join(b, "src")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("cocite"))
        .where(F.col("cocite") >= min_count)
    )


def coupling_pairs(
    edges: DataFrame,
    min_count: int = 1,
    max_in_deg: int = 64,
) -> DataFrame:
    """Bibliographic coupling (Kessler 1963), the dual of co-citation:
    pages (a, b) are related in proportion to how many pages they BOTH
    link to. Same shape mirrored — the self-join keys on dst, and the
    cap is on IN-degree (a page everyone links to, e.g. a homepage,
    asserts nothing). Returns (doc_a, doc_b, coupling)."""
    deg = edges.groupBy("dst").agg(F.count("*").alias("__d"))
    e = (
        edges.join(deg.where(F.col("__d") <= max_in_deg), "dst", "left_semi")
        .select("src", "dst")
        .distinct()
    )
    a = e.select("dst", F.col("src").alias("doc_a"))
    b = e.select("dst", F.col("src").alias("doc_b"))
    return (
        a.join(b, "dst")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("coupling"))
        .where(F.col("coupling") >= min_count)
    )


def host_condense(
    edges: DataFrame,
    src_host: "F.Column",
    dst_host: "F.Column",
) -> DataFrame:
    """Host-graph condensation: collapse the page-level link graph to
    the HOST graph — the coarsening every web-scale link analysis runs
    first, because host-level PageRank/TrustRank over 10^7 hosts is
    tractable where page-level over 10^10 pages needs the full budget,
    and inter-host edges are the ones that carry endorsement (intra-host
    links are navigation). ``src_host``/``dst_host`` are column
    expressions mapping page ids to hosts (URL parse or a dimension
    join, caller's choice). Self-loops (intra-host links) are reported
    per host separately rather than dropped silently.

    One combinable aggregate on (src_host, dst_host). Returns
    (src_host, dst_host, n_links, n_src_pages, n_dst_pages,
    self_loop) — n_*_pages are the distinct page endpoints behind the
    condensed edge, the multiplicity signal host-level algorithms
    weight by.
    """
    return (
        edges.select(
            src_host.alias("src_host"),
            dst_host.alias("dst_host"),
            F.col("src").alias("__s"),
            F.col("dst").alias("__t"),
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.countDistinct("__s").cast("long").alias("n_src_pages"),
            F.countDistinct("__t").cast("long").alias("n_dst_pages"),
        )
        .withColumn("self_loop", F.col("src_host") == F.col("dst_host"))
    )


def hyperball(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    p: int = 8,
    id_col: str = "node",
    round_dp: int = 4,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): estimate every node's
    ``n_iter``-hop out-neighborhood ("ball") size by iterating the
    engine-portable HyperLogLog (functions/sketches.py) along edges —
    B(v, r+1) = B(v, r) ∪ ⋃_{v→w} B(w, r), with each ball held as
    mergeable (bucket, max-rank) sketch rows instead of a node set.
    This is THE public technique for neighborhood functions /
    centralities on 10^10-node graphs: exact balls explode
    combinatorially, while the sketch caps per-node state at 2^p rows
    (256 here) no matter the ball size.

    Per iteration: ONE edge-volume shuffle (edges join sketches on dst,
    re-key to src) + a map-side-combinable max-merge — the same Pregel
    shape as pagerank/opic; lineage cut per round. Because sketch-union
    is an idempotent max-merge, the DuckDB oracle needn't iterate: the
    sketch of the r-ball equals the HLL computed directly over the
    exact member set, which is what makes the gate check exact.

    Returns (node, ball_estimate) — the HLL estimate of
    |{u : dist(v, u) <= n_iter}| rounded to ``round_dp``.
    """
    from ..functions.sketches import hll_estimate, hll_sketch

    base = nodes.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(id_col).cast("long").cast("string").alias("__v"),
    )
    sk = hll_sketch(base, ["node"], "__v", p)
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    for _ in range(n_iter):
        prop = e.join(
            sk.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "hll_bucket", "register")
        sk = (
            sk.unionByName(prop)
            .groupBy("node", "hll_bucket")
            .agg(F.max("register").alias("register"))
            .localCheckpoint(eager=False)
        )
    return hll_estimate(sk, ["node"], p).select(
        "node", F.round("hll_estimate", round_dp).alias("ball_estimate")
    )


def anchor_diversity(
    anchors: DataFrame,
    min_anchors: int = 5,
    flag_milli: int = 900,
) -> DataFrame:
    """Anchor-text diversity audit — the SEO-manipulation signal dual to
    link farms: organic inlinks describe a page many ways, while bought
    or farmed links repeat one exact-match phrase, so a target whose top
    anchor text covers ~all its inlinks with enough evidence is suspect
    (the signal behind classic over-optimization demotions). Input: one
    row per inlink (href, anchor).

    Per target: n_anchors, n_distinct texts, top_share_milli (most
    frequent text's share, ties by smallest text), flagged when
    n_anchors >= ``min_anchors`` and top share >= ``flag_milli``.

    Two combinable aggregates on (href[, anchor]) + one href-keyed
    window for the argmax. Returns (href, n_anchors, n_distinct,
    top_anchor, top_share_milli, flagged).
    """
    from pyspark.sql import Window

    counts = anchors.groupBy("href", "anchor").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("href").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("href", F.col("anchor").alias("top_anchor"), F.col("cnt").alias("__top"))
    )
    per = counts.groupBy("href").agg(
        F.sum("cnt").cast("long").alias("n_anchors"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    return (
        per.join(top, "href")
        .withColumn(
            "top_share_milli",
            F.expr("(1000 * __top) div n_anchors").cast("long"),
        )
        .withColumn(
            "flagged",
            (F.col("n_anchors") >= min_anchors)
            & (F.col("top_share_milli") >= flag_milli),
        )
        .select(
            "href", "n_anchors", "n_distinct", "top_anchor",
            "top_share_milli", "flagged",
        )
    )


def pagerank_residuals(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 5,
    d: float = 0.85,
    id_col: str = "node",
) -> DataFrame:
    """PageRank convergence audit: per iteration, the L1 residual
    Σ|r_i - r_{i-1}| and max per-node delta — the numbers that answer
    "how many iterations does THIS graph need" before committing a
    10^10-edge production run to a fixed budget (the power method's
    geometric decay rate ≈ d shows up directly in the L1 column).
    Same per-iteration plan as ``pagerank`` (one edge shuffle + scalar
    dangling aggregate) plus one node-keyed join for the delta.
    Rounded to ROUND_DP like pagerank (9dp headroom analysis in the
    module docstring). Returns (iteration, l1_residual, max_delta).
    """
    n = nodes.count()
    nodes_n = nodes.select(F.col(id_col).cast("long").alias("node"))
    edges = edges.localCheckpoint(eager=False)
    deg = out_degrees(edges)
    ranks = nodes_n.withColumn("rank", F.lit(1.0 / n))
    rows = []
    for i in range(1, n_iter + 1):
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        new_ranks = (
            nodes_n.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        delta = (
            ranks.withColumnRenamed("rank", "__prev")
            .join(new_ranks, "node")
            .agg(
                # round JVM-side: Spark HALF_UP matches SQL ROUND (a
                # Python round() here would be banker's rounding)
                F.round(
                    F.sum(F.abs(F.col("rank") - F.col("__prev"))), ROUND_DP
                ).alias("l1"),
                F.round(
                    F.max(F.abs(F.col("rank") - F.col("__prev"))), ROUND_DP
                ).alias("mx"),
            )
            .collect()[0]
        )
        rows.append((i, delta["l1"], delta["mx"]))
        ranks = new_ranks
    spark = nodes.sparkSession
    return spark.createDataFrame(
        rows, "iteration long, l1_residual double, max_delta double"
    )


def spam_mass(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    id_col: str = "node",
    round_dp: Optional[int] = ROUND_DP,
    mass_threshold: float = 0.98,
    min_rank_x_n: float = 1.0,
) -> DataFrame:
    """Relative spam-mass estimation (Gyongyi, Garcia-Molina & Pedersen,
    VLDB 2006, "Link Spam Detection Based on Mass Estimation"): the
    fraction of a page's PageRank that does NOT come through the trusted
    core.  With p = uniform-teleport PageRank and t = seed-personalized
    PageRank (trustrank — trust can only flow out of the good core),

        rel_mass(v) = (p(v) - t(v)) / p(v)

    ~1 means essentially all of v's rank is earned from un-trusted
    regions — the spam-farm signature — while well-linked legitimate
    pages keep rel_mass low because the core reaches them.  The paper's
    detector flags v when rel_mass exceeds a threshold AND p(v) is large
    enough to matter (low-rank pages are statistically meaningless and
    dominated by the teleport term), mirrored here by ``min_rank_x_n``:
    keep only p(v)*N >= min_rank_x_n (1.0 = at least the uniform rank).

    The engine complement to ``trustrank`` (demotion score) and
    ``link_farm_scores`` (structural detector): mass estimation catches
    farms whose raw PageRank is real but whose support is disjoint from
    the trusted seeds.

    Scale shape: two fixed-iteration power methods (each per-iteration
    one edge-volume shuffle — see ``pagerank``), then ONE node-keyed
    join of the two rank vectors; the seed set joins once at trustrank
    init (broadcast).  Never materializes anything edge-sized beyond the
    per-iteration contributions.

    Determinism: rel_mass is computed on RAW doubles (identical IEEE op
    order in both engines) and rounded to ``round_dp``; the candidate
    flag compares the ROUNDED mass so the cut is engine-exact.  Returns
    (node, rank, trust, rel_mass, spam_candidate:int 0/1).
    """
    n = nodes.count()
    p = pagerank(
        nodes, edges, n_iter=n_iter, damping=damping,
        id_col=id_col, round_dp=None,
    )
    t = trustrank(
        nodes, edges, seeds, n_iter=n_iter, damping=damping,
        id_col=id_col, round_dp=None,
    ).withColumnRenamed("rank", "trust")
    out = p.join(t, "node").withColumn(
        "rel_mass", (F.col("rank") - F.col("trust")) / F.col("rank")
    )
    if round_dp is not None:
        out = out.select(
            "node",
            F.round("rank", round_dp).alias("rank"),
            F.round("trust", round_dp).alias("trust"),
            F.round("rel_mass", round_dp).alias("rel_mass"),
        )
    return out.withColumn(
        "spam_candidate",
        (
            (F.col("rel_mass") >= F.lit(mass_threshold))
            & (F.col("rank") * F.lit(float(n)) >= F.lit(min_rank_x_n))
        ).cast("int"),
    )


def distance_distribution(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    p: int = 8,
    percentile_milli: int = 900,
    id_col: str = "node",
) -> DataFrame:
    """Distance distribution + effective diameter from HyperBall (Boldi &
    Vigna 2013 — the technique behind the "four degrees of separation"
    measurements): iterate the portable-HLL ball sketch exactly like
    ``hyperball`` and, at each radius r, take the NEIGHBORHOOD FUNCTION
    N(r) = sum over v of |B(v, r)| — the estimated number of reachable
    pairs within distance r. N(r) - N(r-1) is the mass at distance
    exactly r, and the effective diameter is the (interpolated) radius
    where N first reaches ``percentile_milli``/1000 of its final value.

    Determinism: per-node HLL estimates are converted to INTEGER 1e-4
    units (round half-up) BEFORE summing, so the per-radius totals are
    exact integer sums — no cross-engine / cross-parallelism double
    summation-order sensitivity — and the interpolation is pure integer
    arithmetic in milli-hops.

    Scale shape: per radius one edge-volume shuffle + a max-merge (the
    hyperball loop) plus ONE scalar aggregate; the driver holds only
    ``n_iter + 1`` integers (the N(r) sums), never per-node data. Returns
    one row per radius: (radius, nf_e4, delta_e4, eff_diameter_milli) —
    eff_diameter_milli repeated on every row (a scalar of the run).
    """
    from ..functions.sketches import hll_estimate, hll_sketch

    base = nodes.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(id_col).cast("long").cast("string").alias("__v"),
    )
    sk = hll_sketch(base, ["node"], "__v", p)
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=False)

    def _nf(sketch: DataFrame) -> int:
        return (
            hll_estimate(sketch, ["node"], p)
            .agg(
                F.sum(
                    F.round(F.col("hll_estimate") * 10000, 0).cast("long")
                ).alias("s")
            )
            .collect()[0][0]
        )

    sums = [_nf(sk)]
    for _ in range(n_iter):
        prop = e.join(
            sk.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "hll_bucket", "register")
        sk = (
            sk.unionByName(prop)
            .groupBy("node", "hll_bucket")
            .agg(F.max("register").alias("register"))
            .localCheckpoint(eager=False)
        )
        sums.append(_nf(sk))

    target = (percentile_milli * sums[-1]) // 1000
    eff = 0
    for r, cur in enumerate(sums):
        if cur >= target:
            if r > 0:
                prev = sums[r - 1]
                eff = (r - 1) * 1000 + ((target - prev) * 1000) // (cur - prev)
            break
    rows = [
        (r, v, v - (sums[r - 1] if r else 0), eff)
        for r, v in enumerate(sums)
    ]
    return nodes.sparkSession.createDataFrame(
        rows,
        "radius int, nf_e4 long, delta_e4 long, eff_diameter_milli long",
    )


def synthetic_bowtie_edges(
    docs: DataFrame, id_col: str = "doc_id", n_nodes: Optional[int] = None
) -> DataFrame:
    """Deterministic directed graph with the web's bow-tie anatomy
    (Broder et al., WWW 2000) over any keyed table, for gate queries and
    tests — no external data:

    with lim = N - N//10 and m = number of multiples of 4 below lim,
    - CORE (id % 4 == 0, id < lim): a circulant strongly-connected
      component — core index k links to (k+1), (k+5), (k+25) mod m
      (strides keep the SCC diameter ~a dozen hops at test sizes);
    - IN   (id % 4 == 1, id < lim): one link INTO the core (id -> id-1);
    - OUT  (id % 4 == 2, id < lim): fed FROM the core (id-2 -> id);
    - TENDRIL (id % 4 == 3, id < lim): hangs off IN (id-2 -> id) —
      reachable from IN without passing through the core;
    - ids >= lim get no edges at all (the DISCONNECTED component).
    """
    n = n_nodes if n_nodes is not None else docs.count()
    lim = n - n // 10
    m = (lim + 3) // 4
    ids = docs.select(F.col(id_col).cast("long").alias("id")).where(
        F.col("id") < lim
    )
    k = F.expr("id div 4")
    core = ids.where(F.col("id") % 4 == 0)
    parts = [
        core.select(
            F.col("id").alias("src"),
            (((k + s) % m) * 4).alias("dst"),
        )
        for s in (1, 5, 25)
    ]
    parts.append(
        ids.where(F.col("id") % 4 == 1).select(
            F.col("id").alias("src"), (F.col("id") - 1).alias("dst")
        )
    )
    parts.append(
        core.where(F.col("id") + 2 < lim).select(
            F.col("id").alias("src"), (F.col("id") + 2).alias("dst")
        )
    )
    parts.append(
        ids.where((F.col("id") % 4 == 1) & (F.col("id") + 2 < lim)).select(
            F.col("id").alias("src"), (F.col("id") + 2).alias("dst")
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("src") != F.col("dst"))


def bowtie_classify(
    nodes: DataFrame,
    edges: DataFrame,
    seed: int,
    max_iters: int = 20,
    id_col: str = "node",
) -> DataFrame:
    """Bow-tie decomposition of a directed graph relative to a seed's
    strongly connected component (Broder et al., WWW 2000 "Graph
    structure in the Web" — the famous SCC/IN/OUT/TENDRILS/DISCONNECTED
    anatomy). Full SCC decomposition is iteration-unbounded at web scale;
    the bow-tie paper's own method — and this operator — instead takes a
    seed inside the (giant) core and classifies every node by three BFS
    reachabilities:

      fwd  = reachable FROM the seed          (seed's forward cone)
      bwd  = reaches the seed                 (backward cone, reversed edges)
      weak = in the seed's WEAKLY connected component (undirected BFS)

      scc          : fwd and bwd        (the seed's SCC, by definition)
      in           : bwd only           (reaches the core, not reached)
      out          : fwd only           (reached from the core)
      tendril      : weak only          (attached to IN/OUT, bypasses core)
      disconnected : none of the above

    Scale shape: three delta-frontier BFS runs (``bfs_depths`` — each
    iteration shuffles only the frontier-adjacent edge slice, early-stops
    on fixpoint) + one node-keyed 3-way left join; everything integer /
    set-membership, so output is bit-identical at any parallelism.
    Returns (node, component).
    """
    spark = nodes.sparkSession
    seeds = spark.createDataFrame([(int(seed),)], "url long")
    # Materialize the edge list ONCE before the three BFS loops: each loop
    # re-joins the edge table up to max_iters times, so re-executing a
    # derived edge plan (e.g. a union-of-selects fixture or a parse->resolve
    # pipeline) per iteration multiplies its cost by 3*max_iters — and deep
    # re-codegen of the same nested plan inside the loop is what broke the
    # broadcast build here. One localCheckpoint (MEMORY_AND_DISK) is the
    # same trade a 100 TB run wants: pay the edge scan once, iterate on the
    # materialized form.
    base = edges.select("src", "dst").localCheckpoint(eager=True)
    rev = base.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    und = base.unionByName(rev)

    def _reach(e, flag):
        return bfs_depths(e, seeds, max_iters=max_iters).select(
            F.col("url").alias("node"), F.lit(1).alias(flag)
        )

    fwd = _reach(base, "__f")
    bwd = _reach(rev, "__b")
    weak = _reach(und, "__w")
    base = nodes.select(F.col(id_col).cast("long").alias("node"))
    joined = (
        base.join(fwd, "node", "left")
        .join(bwd, "node", "left")
        .join(weak, "node", "left")
    )
    f, b, w = (F.col(c).isNotNull() for c in ("__f", "__b", "__w"))
    return joined.select(
        "node",
        F.when(f & b, F.lit("scc"))
        .when(b, F.lit("in"))
        .when(f, F.lit("out"))
        .when(w, F.lit("tendril"))
        .otherwise(F.lit("disconnected"))
        .alias("component"),
    )


def salsa(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    round_dp: Optional[int] = ROUND_DP,
) -> DataFrame:
    """SALSA (Lempel & Moran, WWW 2000 "The stochastic approach for
    link-structure analysis"): HITS's hub/authority idea re-derived as two
    random walks on the bipartite hub/authority graph, which makes the
    scores stochastic (each step is mass-conserving) and famously robust
    to the tightly-knit-community effect that inflates HITS. The authority
    walk alternates backward-then-forward steps:

      a_{t+1}(k) = Σ_{i→k} (1/outdeg(i)) Σ_{i→j} a_t(j)/indeg(j)

    (from authority j, walk BACK along a uniform in-link to hub i, then
    FORWARD along a uniform out-link to authority k); the hub walk is the
    mirror image. a_0 / h_0 are uniform over the authority side (indeg>0)
    / hub side (outdeg>0). Within a connected component the stationary
    authority vector is proportional to in-degree — the fixed-iteration
    power method here converges toward exactly that, so scores stay
    comparable to the indegree prior while damping link farms that HITS
    amplifies.

    Scale shape per iteration per walk: two edge-volume shuffles (the
    backward and forward half-steps), each a map-side-combinable SUM over
    the degree-annotated edge table, which is materialized ONCE
    (localCheckpoint) and reused across all 2*2*n_iter joins. No
    normalization pass is needed — both half-steps are stochastic, so
    total mass stays exactly 1 per walk. Scalars never leave the plan.
    Returns (node, hub, authority), zeros for one-sided nodes.
    """
    deg = degree_stats(edges)
    edgesd = (
        edges.select("src", "dst")
        .join(
            deg.select(F.col("node").alias("src"), "out_deg"), "src"
        )
        .join(
            deg.select(F.col("node").alias("dst"), "in_deg"), "dst"
        )
        .localCheckpoint(eager=True)
    )
    auth_nodes = edgesd.select(F.col("dst").alias("node")).distinct()
    hub_nodes = edgesd.select(F.col("src").alias("node")).distinct()
    n_a = auth_nodes.count()
    n_h = hub_nodes.count()
    a = auth_nodes.select(
        "node", F.lit(1.0 / max(n_a, 1)).alias("authority")
    ).localCheckpoint(eager=False)
    h = hub_nodes.select(
        "node", F.lit(1.0 / max(n_h, 1)).alias("hub")
    ).localCheckpoint(eager=False)
    for _ in range(n_iter):
        hub_mass = (
            edgesd.join(a, edgesd["dst"] == a["node"])
            .groupBy(F.col("src").alias("hnode"))
            .agg(F.sum(F.col("authority") / F.col("in_deg")).alias("mass"))
        )
        a = (
            edgesd.join(hub_mass, edgesd["src"] == F.col("hnode"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("mass") / F.col("out_deg")).alias("authority"))
            .localCheckpoint(eager=False)
        )
        auth_mass = (
            edgesd.join(h, edgesd["src"] == h["node"])
            .groupBy(F.col("dst").alias("anode"))
            .agg(F.sum(F.col("hub") / F.col("out_deg")).alias("mass"))
        )
        h = (
            edgesd.join(auth_mass, edgesd["dst"] == F.col("anode"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("mass") / F.col("in_deg")).alias("hub"))
            .localCheckpoint(eager=False)
        )
    out = (
        nodes.select(F.col(nodes.columns[0]).cast("long").alias("node"))
        .join(h, "node", "left")
        .join(a, "node", "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )
    if round_dp is not None:
        out = out.select(
            "node",
            F.round("hub", round_dp).alias("hub"),
            F.round("authority", round_dp).alias("authority"),
        )
    return out


def degree_assortativity(
    edges: DataFrame, round_dp: Optional[int] = ROUND_DP
) -> DataFrame:
    """Directed degree assortativity (Newman, PRL 2002; the four directed
    variants per Foster, Foster, Grassberger & Paczuski, PNAS 2010 "Edge
    direction and the structure of networks"): over the edge list, the
    Pearson correlation between a chosen degree of the source and a
    chosen degree of the target — (out,out), (out,in), (in,out), (in,in).
    The web graph is famously DISassortative (high-out-degree hubs link
    to low-in-degree pages, r < 0); a strongly assortative subgraph is a
    link-farm signature, which makes this a one-row audit worth running
    before trusting PageRank/TrustRank priorities on a new crawl.

    Numeric determinism: every moment is accumulated as an exact BIGINT
    sum of integer degrees (no double accumulation, so partition order
    cannot perturb it); the four r values are then a fixed-order double
    formula over those exact scalars — bit-identical at any parallelism
    and term-for-term mirrorable in ANSI SQL. Degrees and edge counts up
    to ~2^26 keep every product inside the 2^63 long range (comfortable
    at 10^10 edges only after per-host condensation; run it on the host
    graph at full crawl scale).

    Scale shape: two node-keyed joins to attach (out,in) degrees to each
    edge endpoint, then ONE map-side-combinable aggregate over the edge
    volume. Returns a single row (m, r_out_out, r_out_in, r_in_out,
    r_in_in).
    """
    deg = degree_stats(edges)
    ed = (
        edges.select("src", "dst")
        .join(
            deg.select(
                F.col("node").alias("src"),
                F.col("out_deg").alias("s_out"),
                F.col("in_deg").alias("s_in"),
            ),
            "src",
        )
        .join(
            deg.select(
                F.col("node").alias("dst"),
                F.col("out_deg").alias("d_out"),
                F.col("in_deg").alias("d_in"),
            ),
            "dst",
        )
    )
    sums = ed.agg(
        F.count("*").alias("m"),
        F.sum("s_out").alias("sx_o"),
        F.sum(F.col("s_out") * F.col("s_out")).alias("sx_o2"),
        F.sum("s_in").alias("sx_i"),
        F.sum(F.col("s_in") * F.col("s_in")).alias("sx_i2"),
        F.sum("d_out").alias("sy_o"),
        F.sum(F.col("d_out") * F.col("d_out")).alias("sy_o2"),
        F.sum("d_in").alias("sy_i"),
        F.sum(F.col("d_in") * F.col("d_in")).alias("sy_i2"),
        F.sum(F.col("s_out") * F.col("d_out")).alias("s_oo"),
        F.sum(F.col("s_out") * F.col("d_in")).alias("s_oi"),
        F.sum(F.col("s_in") * F.col("d_out")).alias("s_io"),
        F.sum(F.col("s_in") * F.col("d_in")).alias("s_ii"),
    )

    def _r(sxy, sx, sx2, sy, sy2):
        m = F.col("m").cast("double")
        num = m * F.col(sxy).cast("double") - F.col(sx).cast(
            "double"
        ) * F.col(sy).cast("double")
        vx = m * F.col(sx2).cast("double") - F.col(sx).cast(
            "double"
        ) * F.col(sx).cast("double")
        vy = m * F.col(sy2).cast("double") - F.col(sy).cast(
            "double"
        ) * F.col(sy).cast("double")
        # zero variance on either endpoint (regular graph) -> undefined
        # correlation; NULL, not a divide-by-zero (ANSI mode errors)
        r = F.when(
            (vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))
        )
        return F.round(r, round_dp) if round_dp is not None else r

    return sums.select(
        F.col("m").cast("long").alias("m"),
        _r("s_oo", "sx_o", "sx_o2", "sy_o", "sy_o2").alias("r_out_out"),
        _r("s_oi", "sx_o", "sx_o2", "sy_i", "sy_i2").alias("r_out_in"),
        _r("s_io", "sx_i", "sx_i2", "sy_o", "sy_o2").alias("r_in_out"),
        _r("s_ii", "sx_i", "sx_i2", "sy_i", "sy_i2").alias("r_in_in"),
    )


def harmonic_centrality(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    p: int = 8,
    id_col: str = "node",
) -> DataFrame:
    """Harmonic centrality, truncated at ``n_iter`` hops, from HyperBall
    in-ball sketches (Boldi & Vigna 2013 §5 — THE use case HyperBall was
    built for; the 10^10-node alternative to Brandes-style exact BFS per
    node):

        H(v) = Σ_{r=1..n_iter} (|B_in(v,r)| - |B_in(v,r-1)|) / r

    where B_in(v,r) is the set of nodes that REACH v within r hops — the
    loop therefore runs on the transposed edge list (the paper's own
    trick), and nodes newly appearing at distance r contribute 1/r.

    Determinism: per-(node, radius) HLL estimates become INTEGER 1e-4
    units first (round half-up, exactly as distance_distribution), and
    the harmonic sum is kept integer by scaling with L = lcm(1..n_iter):
    h_lcm_e4 = Σ_r (e4_r - e4_{r-1}) * (L/r) — exact integer arithmetic,
    bit-identical at any parallelism and in the SQL oracle. Divide by
    L*1e4 for the float value.

    Scale shape: the hyperball Pregel loop (one edge-volume shuffle + a
    map-side-combinable max-merge per radius) plus n_iter node-keyed
    joins of the per-radius estimate tables — per-node state stays at
    2^p sketch rows. Returns (node, h_lcm_e4, lcm).
    """
    from math import lcm

    from ..functions.sketches import hll_estimate, hll_sketch

    scale = lcm(*range(1, n_iter + 1))
    base = nodes.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(id_col).cast("long").cast("string").alias("__v"),
    )
    sk = hll_sketch(base, ["node"], "__v", p)
    # transposed graph: propagate ball sketches along REVERSED edges
    e = (
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _e4(sketch: DataFrame, r: int) -> DataFrame:
        return hll_estimate(sketch, ["node"], p).select(
            "node",
            F.round(F.col("hll_estimate") * 10000, 0)
            .cast("long")
            .alias(f"__e{r}"),
        )

    ests = [_e4(sk, 0)]
    for r in range(1, n_iter + 1):
        prop = e.join(
            sk.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "hll_bucket", "register")
        sk = (
            sk.unionByName(prop)
            .groupBy("node", "hll_bucket")
            .agg(F.max("register").alias("register"))
            .localCheckpoint(eager=False)
        )
        ests.append(_e4(sk, r))
    joined = ests[0]
    for t in ests[1:]:
        joined = joined.join(t, "node")  # balls contain self -> inner safe
    h = None
    for r in range(1, n_iter + 1):
        term = (F.col(f"__e{r}") - F.col(f"__e{r-1}")) * F.lit(scale // r)
        h = term if h is None else h + term
    return joined.select(
        "node",
        h.cast("long").alias("h_lcm_e4"),
        F.lit(scale).cast("long").alias("lcm"),
    )


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    round_dp: Optional[int] = ROUND_DP,
) -> DataFrame:
    """Directed modularity per community (Leicht & Newman, PRL 2008):

        Q = Σ_c [ e_c/m − (kout_c · kin_c)/m² ]

    where e_c counts intra-community edges, kout_c/kin_c sum the out-/
    in-degrees of community members, m = |edges|. The quality metric for
    any node partition — label_propagation communities, host/PLD
    grouping, topic shards — answering "is this partition denser than
    the degree-preserving random graph" before acting on it (e.g. using
    communities as crawl shards or dedup blocks). Q near 0 means the
    partition is noise; the classic actionable range is ≳ 0.3.

    ``assign``: (node, community). Returns one row per community with
    incident edges: (community, intra_edges, kout, kin, q_contrib);
    Σ q_contrib over rows is Q (communities without incident edges
    contribute exactly 0 and are omitted). The three counts are exact
    BIGINTs (the only shuffles: the two node-keyed assignment joins and
    three map-side-combinable counts); q_contrib is a fixed-order double
    formula over them — bit-identical at any parallelism.
    """
    a = assign.select(
        F.col("node").cast("long").alias("node"),
        F.col("community").cast("long").alias("community"),
    )
    ed = (
        edges.select("src", "dst")
        .join(
            a.select(
                F.col("node").alias("src"),
                F.col("community").alias("__sc"),
            ),
            "src",
        )
        .join(
            a.select(
                F.col("node").alias("dst"),
                F.col("community").alias("__dc"),
            ),
            "dst",
        )
    )
    m_df = ed.agg(F.count("*").alias("__m"))
    kout = ed.groupBy(F.col("__sc").alias("community")).agg(
        F.count("*").alias("kout")
    )
    kin = ed.groupBy(F.col("__dc").alias("community")).agg(
        F.count("*").alias("kin")
    )
    intra = (
        ed.where(F.col("__sc") == F.col("__dc"))
        .groupBy(F.col("__sc").alias("community"))
        .agg(F.count("*").alias("intra_edges"))
    )
    per = (
        kout.join(kin, "community", "full_outer")
        .join(intra, "community", "left")
        .select(
            "community",
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias(
                "intra_edges"
            ),
            F.coalesce("kout", F.lit(0)).cast("long").alias("kout"),
            F.coalesce("kin", F.lit(0)).cast("long").alias("kin"),
        )
        .crossJoin(F.broadcast(m_df))
    )
    md = F.col("__m").cast("double")
    q = F.col("intra_edges").cast("double") / md - (
        F.col("kout").cast("double") * F.col("kin").cast("double")
    ) / (md * md)
    return per.select(
        "community",
        "intra_edges",
        "kout",
        "kin",
        (F.round(q, round_dp) if round_dp is not None else q).alias(
            "q_contrib"
        ),
    )


def wl_refine(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    id_col: str = "node",
) -> DataFrame:
    """Weisfeiler-Leman label refinement (1-WL / color refinement — the
    procedure behind WL graph kernels, Shervashidze et al. JMLR 2011):
    iteratively relabel every node with a hash of (its label, the sorted
    multiset of its out-neighbors' labels). After k rounds, two nodes
    share a label iff their k-hop out-neighborhood trees are isomorphic —
    the structural fingerprint that clusters template pages (nav hubs,
    leaf articles, pagination chains) by LINK SHAPE alone, no content:
    the graph-side complement of the winnowing/template_mass content
    detectors.

    label_0 = out-degree; label_{i+1} = hash60 of
    "<label>|<sorted neighbor labels joined ,>". Unreferenced direction
    (in-links) is deliberately excluded so the refinement matches the
    classic rooted-out-tree WL; run on the reversed edge list for
    in-shape.

    Scale shape per iteration: ONE edge-volume shuffle (labels joined to
    edges on dst, grouped by src) with `sort_array(collect_list(...))` —
    per-node list size = out-degree, so degree caps bound the row width
    (cap hubs upstream like cocitation does). Hashing is the md5-slice
    convention shared bit-for-bit with the DuckDB oracle (dedup.hash60).
    Returns (node, wl_label) with wl_label the 60-bit final label.
    """
    from .dedup import hash60

    e = edges.select("src", "dst").localCheckpoint(eager=False)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    lab = (
        nodes.select(F.col(id_col).cast("long").alias("node"))
        .join(deg, "node", "left")
        .select(
            "node",
            F.coalesce("d", F.lit(0)).cast("long").alias("label"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(n_iter):
        neigh = (
            e.join(
                lab.select(
                    F.col("node").alias("dst"),
                    F.col("label").alias("__nl"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list(F.col("__nl"))), ","
                ).alias("__ns")
            )
        )
        lab = (
            lab.join(neigh, "node", "left")
            .select(
                "node",
                hash60(
                    F.concat_ws(
                        "|",
                        F.col("label").cast("string"),
                        F.coalesce("__ns", F.lit("")),
                    )
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return lab.select("node", F.col("label").alias("wl_label"))


def katz_centrality(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 4,
    beta: float = 0.05,
    id_col: str = "node",
    round_dp: Optional[int] = ROUND_DP,
) -> DataFrame:
    """Truncated Katz centrality (Katz 1953): katz(v) = Σ_{t=1..K} β^t ·
    walks_t(v), where walks_t(v) is the NUMBER of directed walks of
    length t ending at v. The classic attenuated-influence ranking — a
    page is important if many (short) walk chains reach it — and, unlike
    PageRank, it needs no out-degree normalization and no dangling-mass
    term, so the per-iteration state is an exact BIGINT walk count.

    The reference never ranks its link graph (it stores outlinks at parse
    time, see_html.erl:54-78, and ignores them for scoring); this is an
    engine addition on the crawl graph.

    Exactness: walk counts are integers (w_0 ≡ 1; w_t(v) = Σ_{u→v}
    w_{t-1}(u)), so every iteration is partition-order-invariant BIGINT
    arithmetic; floats enter only in the final Σ β^t·w_t, evaluated
    left-associated in t-ascending order with Python-repr'd β^t literals
    so an unrolled-CTE SQL oracle reproduces it bit-for-bit (then both
    sides round to ``round_dp``).

    Scale shape per iteration: ONE shuffle — edges join walk counts on
    ``src`` (both sides hash-partitioned on the key) → groupBy ``dst``
    integer sum (map-side combinable). Lineage cut per iteration with a
    lazy localCheckpoint so K iterations don't stack plans. At 10^10
    edges this is the same Pregel-equivalent shape as pagerank() above,
    minus its dangling-scalar driver round-trip.
    """
    node = F.col(id_col).cast("long").alias("node")
    nodes_n = nodes.select(node)
    edges = edges.localCheckpoint(eager=False)

    # state: (node, w BIGINT walk count, score DOUBLE running Katz sum)
    state = nodes_n.select(
        "node", F.lit(1).cast("long").alias("w"), F.lit(0.0).alias("score")
    )
    for t in range(1, n_iter + 1):
        arriving = (
            edges.join(
                state.select(F.col("node").alias("src"), "w"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").cast("long").alias("w_next"))
        )
        state = (
            state.select("node", "score")
            .join(arriving, "node", "left")
            .select(
                "node",
                F.coalesce("w_next", F.lit(0)).cast("long").alias("w"),
                (
                    F.col("score")
                    + F.lit(beta ** t) * F.coalesce("w_next", F.lit(0))
                ).alias("score"),
            )
            .localCheckpoint(eager=False)
        )
    out = state.select("node", F.col("w").alias("walks_last"), "score")
    if round_dp is not None:
        out = out.select(
            "node", "walks_last", F.round("score", round_dp).alias("score")
        )
    return out


def link_prediction(
    edges: DataFrame,
    min_common: int = 2,
    round_dp: Optional[int] = ROUND_DP,
) -> DataFrame:
    """Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg
    2003): for every unordered node pair (a < b) sharing ≥ ``min_common``
    neighbors in the UNDIRECTED simple graph, emit the three classic
    scores — common-neighbor count, Jaccard |Γa∩Γb| / |Γa∪Γb| (exact
    integer milli), and Adamic-Adar Σ_{w∈Γa∩Γb} 1/ln(deg(w)). The
    crawl-side use is frontier prioritization: a candidate URL whose
    neighborhood already overlaps a crawled cluster is likely in-topic
    (the focused-crawl sibling of cocitation_pairs, which only counts
    shared IN-links on the directed graph).

    Scale shape: candidate pairs are generated ONLY through shared
    neighbors — adjacency self-joined on the neighbor key (per-key
    fan-out deg(w)², the same wedge bound as triangle_counts; a degree
    cap upstream bounds hubs) → groupBy (a, b) with map-side-combinable
    count/sum. Degrees join in by key; nothing is quadratic in N. The
    existing-edge exclusion is one anti-join on the canonical pair.

    Adamic-Adar determinism: the per-pair Σ 1/ln(deg) is a float sum
    whose order varies across partitionings, so the output rounds to
    ``round_dp`` (same rule as pagerank); ties in ranking consumers must
    break on (a, b).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).select(
        F.col("a").alias("node"), F.col("b").alias("nb")
    )
    deg = adj.groupBy("node").agg(F.count("*").cast("long").alias("deg"))
    # wedges through the shared neighbor w: (u, w) x (v, w), u < v
    left = adj.select(F.col("nb").alias("w"), F.col("node").alias("u"))
    right = adj.select(F.col("nb").alias("w"), F.col("node").alias("v"))
    wedges = left.join(right, "w").where(F.col("u") < F.col("v"))
    wdeg = deg.select(F.col("node").alias("w"), F.col("deg").alias("wdeg"))
    pairs = (
        wedges.join(wdeg, "w")
        .groupBy(F.col("u").alias("a"), F.col("v").alias("b"))
        .agg(
            F.count("*").cast("long").alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("wdeg"))).alias("adamic_adar"),
        )
        .where(F.col("common") >= F.lit(int(min_common)))
    )
    # drop already-linked pairs; attach endpoint degrees for Jaccard
    pairs = pairs.join(und, ["a", "b"], "left_anti")
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    out = (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            F.expr("common * 1000 div (deg_a + deg_b - common)")
            .cast("long")
            .alias("jaccard_milli"),
            F.col("adamic_adar"),
        )
    )
    if round_dp is not None:
        out = out.select(
            "a",
            "b",
            "common",
            "jaccard_milli",
            F.round("adamic_adar", round_dp).alias("adamic_adar"),
        )
    return out


INF_DIST = 1 << 40  # unreachable sentinel — BIGINT-safe, shared with oracles


def bellman_ford(
    nodes: DataFrame,
    edges: DataFrame,
    source: int,
    n_iter: int = 12,
    id_col: str = "node",
    weight_col: str = "w",
) -> DataFrame:
    """Single-source WEIGHTED shortest paths by distributed Bellman-Ford
    (the Pregel min-plus iteration; bfs_depths above is its unweighted
    hop-count special case). Edge weights are positive BIGINTs, so every
    round is exact integer arithmetic — relaxation is
    dist'(v) = min(dist(v), min_{u→v}(dist(u) + w(u,v))) — and after
    ``n_iter`` ≥ graph-diameter rounds distances are final (classic BF
    bound: n−1 rounds always suffice; pass the diameter bound when
    known).

    Unreachable nodes hold ``INF_DIST`` (a sentinel, never NULL, so
    min() semantics stay engine-portable).

    Scale shape per round: ONE shuffle — edges join the current
    distance relation on src (both hash-partitioned on the key) →
    min-combine by dst (map-side combinable) → left join back to the
    node list. Lineage cut per round with a lazy localCheckpoint.
    Convergence short-circuit (stop when no distance changed) costs one
    extra scalar aggregate per round at 10^10 scale — callers pick
    n_iter from the known diameter instead (the same trade bfs_depths
    makes).
    """
    node = F.col(id_col).cast("long").alias("node")
    nodes_n = nodes.select(node)
    edges = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint(eager=False)

    state = nodes_n.select(
        "node",
        F.when(F.col("node") == int(source), F.lit(0))
        .otherwise(F.lit(INF_DIST))
        .cast("long")
        .alias("dist"),
    )
    for _ in range(int(n_iter)):
        relaxed = (
            edges.join(
                state.where(F.col("dist") < INF_DIST).select(
                    F.col("node").alias("src"), F.col("dist").alias("__d")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("__d") + F.col("w")).cast("long").alias("__cand"))
        )
        state = (
            state.join(relaxed, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("dist"), F.coalesce("__cand", F.lit(INF_DIST))
                )
                .cast("long")
                .alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
    return state


def boruvka_mst(
    nodes: DataFrame,
    edges: DataFrame,
    weight_col: str = "w",
    max_rounds: int = 16,
) -> DataFrame:
    """Minimum spanning forest by distributed Borůvka (1926; the
    textbook MapReduce/Pregel MST — Kruskal/Prim are inherently
    sequential, Borůvka's per-component min-edge choice is one
    aggregate): each round every component selects its lightest
    incident cross-component edge (total order (w, a, b) — ties never
    ambiguous, so the forest is UNIQUE and partitioning-invariant),
    selected edges merge components, rounds halve the component count
    (≤ log2(n) rounds).

    Component merging reuses ``dedup.connected_components`` (large-star
    /small-star) on the selected-edge component graph — a graph with one
    node per current component, exponentially smaller each round.

    Scale shape per round: one join of edges to the label relation
    (hash-partitioned on the node key), one min-struct aggregate per
    component (map-side combinable), CC on the contracted graph, one
    label-update join. The driver sees only per-round counts.

    Returns the forest edges (a, b, w) — n − #components rows.
    """
    from .dedup import connected_components

    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    labels = nodes.select(
        F.col("node").cast("long").alias("node"),
        F.col("node").cast("long").alias("label"),
    ).localCheckpoint(eager=False)
    chosen = None
    for _ in range(int(max_rounds)):
        la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
        lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
        e2 = (
            und.join(la, "a")
            .join(lb, "b")
            .where(F.col("la") != F.col("lb"))
            .localCheckpoint(eager=False)
        )
        if e2.limit(1).count() == 0:
            break
        incident = e2.select(
            F.col("la").alias("comp"), F.struct("w", "a", "b", "lb").alias("e")
        ).unionByName(
            e2.select(
                F.col("lb").alias("comp"),
                F.struct("w", "a", "b", F.col("la").alias("lb")).alias("e"),
            )
        )
        picks = (
            incident.groupBy("comp")
            .agg(F.min("e").alias("e"))
            .select(F.col("e.w").alias("w"), F.col("e.a").alias("a"), F.col("e.b").alias("b"))
            .distinct()
        )
        picks = picks.localCheckpoint(eager=False)
        chosen = picks if chosen is None else chosen.unionByName(picks).distinct()
        chosen = chosen.localCheckpoint(eager=False)
        # contract: CC over the component graph of selected edges
        pa = picks.join(
            labels.select(F.col("node").alias("a"), F.col("label").alias("ca")), "a"
        ).join(
            labels.select(F.col("node").alias("b"), F.col("label").alias("cb")), "b"
        )
        cc = connected_components(
            pa.select(F.col("ca").alias("doc_a"), F.col("cb").alias("doc_b"))
        )
        # cc: (doc_id=old label, component=new label); unmatched keep label
        labels = (
            labels.join(
                cc.select(
                    F.col("node").alias("label"),
                    F.col("component").alias("__nl"),
                ),
                "label",
                "left",
            )
            .select(
                "node", F.coalesce("__nl", F.col("label")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    if chosen is None:
        return und.where(F.lit(False)).select("a", "b", "w")
    return chosen.select("a", "b", "w")


def topic_pagerank(
    nodes_topics: DataFrame,
    edges: DataFrame,
    n_iter: int = 4,
    damping: float = 0.85,
    round_dp: Optional[int] = ROUND_DP,
) -> DataFrame:
    """Topic-sensitive PageRank (Haveliwala, WWW 2002): one personalized
    rank vector per topic, teleporting ONLY to that topic's seed pages —
    the biased importance signal a focused crawler or vertical ranker
    blends at query time instead of re-running PageRank per query.

    ``nodes_topics``: (node, topic, is_seed) — the full node list
    replicated per topic with seed membership. All topics run in ONE
    pipeline: the per-iteration state is (node, topic, rank), the edge
    relation joins once on src and aggregates by (dst, topic) — one
    shuffle per iteration carrying K× the single-vector volume, K =
    #topics (the standard batched-TSPR trade: K small and fixed).
    Dangling mass and teleport both go to the topic's seed set
    (uniformly over seeds — the TSPR convention), so each topic vector
    sums to 1.

      r'_t(v) = d·(Σ_{u→v} r_t(u)/deg(u) + dang_t·seed_t(v)/|S_t|)
                + (1−d)·seed_t(v)/|S_t|

    Per-topic dangling scalars come from ONE grouped two-row aggregate
    per iteration (never row data). Ranks round to ``round_dp`` (same
    determinism rule as pagerank).
    """
    nt = nodes_topics.select(
        F.col("node").cast("long").alias("node"),
        F.col("topic").cast("long").alias("topic"),
        F.col("is_seed").cast("long").alias("is_seed"),
    )
    seeds = nt.groupBy("topic").agg(
        F.sum("is_seed").cast("long").alias("n_seeds")
    )
    nt = nt.join(seeds, "topic").localCheckpoint(eager=False)
    edges = edges.localCheckpoint(eager=False)
    deg = out_degrees(edges)
    base = nt.join(deg, nt["node"] == deg["src"], "left").select(
        "node",
        "topic",
        "is_seed",
        "n_seeds",
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
    )
    state = base.withColumn(
        "rank",
        F.when(F.col("is_seed") == 1, F.lit(1.0) / F.col("n_seeds")).otherwise(
            F.lit(0.0)
        ),
    ).localCheckpoint(eager=False)
    d = float(damping)
    for _ in range(int(n_iter)):
        dang = {
            int(r["topic"]): float(r["m"])
            for r in state.where(F.col("out_deg") == 0)
            .groupBy("topic")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()
        }
        dang_expr = F.lit(0.0)
        for t, m in sorted(dang.items()):
            dang_expr = F.when(F.col("topic") == t, F.lit(m)).otherwise(
                dang_expr
            )
        contribs = (
            edges.join(
                state.where(F.col("out_deg") > 0).select(
                    F.col("node").alias("src"),
                    "topic",
                    (F.col("rank") / F.col("out_deg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "topic")
            .agg(F.sum("share").alias("contrib"))
        )
        state = (
            base.join(contribs, ["node", "topic"], "left")
            .select(
                "node",
                "topic",
                "is_seed",
                "n_seeds",
                "out_deg",
                (
                    F.lit(d)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + dang_expr
                        * F.col("is_seed")
                        / F.col("n_seeds")
                    )
                    + F.lit(1.0 - d)
                    * F.col("is_seed")
                    / F.col("n_seeds")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    out = state.select("node", "topic", "rank")
    if round_dp is not None:
        out = out.select(
            "node", "topic", F.round("rank", round_dp).alias("rank")
        )
    return out


def ktruss(
    edges: DataFrame,
    k: int = 4,
    n_rounds: int = 6,
) -> DataFrame:
    """k-truss subgraph (Cohen 2008): iteratively delete every edge
    supported by fewer than k−2 triangles until stable — the
    community-core detector that is strictly stronger than k-core
    (every edge in a k-truss sits in k−2 triangles WITHIN the truss,
    so loose tendrils that survive degree-peeling fall away). On a web
    graph this isolates genuinely interlinked cliques (link farms,
    topic cores) from star-shaped hubs.

    Fixed ``n_rounds`` of support-peeling in BOTH the operator and the
    oracle (peeling is monotone and idempotent at the fixpoint, so any
    round count ≥ convergence yields the same subgraph — pytest pins
    convergence within the default rounds at test scale; at 10^10 edges
    pass the known peel depth or iterate with a driver count check).

    Scale shape per round: support = per-edge common-neighbor count via
    the wedge join (adjacency self-joined through the shared endpoint —
    the same deg-bounded fan-out as triangle_counts/link_prediction),
    one combinable aggregate, one filter. Returns surviving
    (a, b, support).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    need = int(k) - 2
    cur = und
    support = None
    for _ in range(int(n_rounds)):
        adj = cur.unionAll(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).select(F.col("a").alias("u"), F.col("b").alias("w"))
        # triangles per edge (a,b): w adjacent to both endpoints
        wa = adj.select(F.col("u").alias("a"), "w")
        wb = adj.select(F.col("u").alias("b"), "w")
        sup = (
            cur.join(wa, "a")
            .join(wb, ["b", "w"])
            .groupBy("a", "b")
            .agg(F.count("*").cast("long").alias("support"))
        )
        support = cur.join(sup, ["a", "b"], "left").select(
            "a",
            "b",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
        )
        cur = (
            support.where(F.col("support") >= need)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    # final support recomputed on the surviving subgraph
    adj = cur.unionAll(
        cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("u"), F.col("b").alias("w"))
    wa = adj.select(F.col("u").alias("a"), "w")
    wb = adj.select(F.col("u").alias("b"), "w")
    sup = (
        cur.join(wa, "a")
        .join(wb, ["b", "w"])
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("support"))
    )
    return cur.join(sup, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )


def multi_source_bfs(
    nodes: DataFrame,
    edges: DataFrame,
    sources: list,
    n_iter: int = 8,
    undirected: bool = True,
) -> DataFrame:
    """Hop distances from MANY sources in ONE pipeline: state is
    (node, src, dist) — the source id rides as a key dimension exactly
    like topic_pagerank's topic, so S sources cost one shuffle per round
    carrying S× the single-BFS volume instead of S sequential jobs (the
    batching that makes landmark sketches affordable). Exact BIGINT;
    ``INF_DIST`` for nodes unreached within ``n_iter`` hops.
    """
    node = F.col("node").cast("long")
    nodes_n = nodes.select(node.alias("node"))
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    if undirected:
        e = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=False)
    src_arr = F.array(*[F.lit(int(s)).cast("long") for s in sources])
    state = nodes_n.select(
        "node", F.explode(src_arr).alias("lm")
    ).withColumn(
        "dist",
        F.when(F.col("node") == F.col("lm"), F.lit(0))
        .otherwise(F.lit(INF_DIST))
        .cast("long"),
    )
    state = state.localCheckpoint(eager=False)
    base = state.select("node", "lm")
    for _ in range(int(n_iter)):
        relaxed = (
            e.join(
                state.where(F.col("dist") < INF_DIST).select(
                    F.col("node").alias("src"), "lm", F.col("dist").alias("__d")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "lm")
            .agg((F.min("__d") + 1).cast("long").alias("__cand"))
        )
        state = (
            state.join(relaxed, ["node", "lm"], "left")
            .select(
                "node",
                "lm",
                F.least(F.col("dist"), F.coalesce("__cand", F.lit(INF_DIST)))
                .cast("long")
                .alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
    return state


def landmark_distance_audit(
    nodes: DataFrame,
    edges: DataFrame,
    landmarks: list,
    pairs: list,
    n_iter: int = 8,
) -> DataFrame:
    """Landmark (2-hop-sketch-lite) distance estimation audit (Das
    Sarma et al., WSDM 2010 family): est(u,v) = min over landmarks of
    d(u,L)+d(L,v) upper-bounds the true distance by the triangle
    inequality; the audit measures the stretch on known pairs. ONE
    multi-source BFS over landmarks ∪ {pair sources} supplies both the
    estimates and the exact distances — no per-pair traversals.

    Returns (u, v, exact, est, stretch_milli = est·1000 div max(exact,1))
    for each requested pair, all exact BIGINT; est ≥ exact always,
    INF_DIST where unreachable.
    """
    us = sorted({int(u) for u, _ in pairs})
    srcs = sorted(set(int(x) for x in landmarks) | set(us))
    d = multi_source_bfs(nodes, edges, srcs, n_iter).localCheckpoint(
        eager=False
    )
    lm_set = [int(x) for x in landmarks]
    out = None
    for u, v in pairs:
        exact = d.where(
            (F.col("lm") == int(u)) & (F.col("node") == int(v))
        ).select(F.col("dist").alias("exact"))
        est = (
            d.where(F.col("lm").isin(lm_set) & F.col("node").isin([int(u), int(v)]))
            .groupBy("lm")
            .agg(
                F.max(F.when(F.col("node") == int(u), F.col("dist"))).alias("du"),
                F.max(F.when(F.col("node") == int(v), F.col("dist"))).alias("dv"),
            )
            .agg(
                F.min(
                    F.when(
                        (F.col("du") < INF_DIST) & (F.col("dv") < INF_DIST),
                        F.col("du") + F.col("dv"),
                    ).otherwise(F.lit(INF_DIST))
                ).alias("est")
            )
        )
        row = exact.crossJoin(est).select(
            F.lit(int(u)).cast("long").alias("u"),
            F.lit(int(v)).cast("long").alias("v"),
            F.col("exact").cast("long").alias("exact"),
            F.col("est").cast("long").alias("est"),
            F.expr("est * 1000 div greatest(exact, 1)")
            .cast("long")
            .alias("stretch_milli"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def pseudo_random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    n_steps: int = 6,
) -> DataFrame:
    """Deterministic hash-driven graph walks — the sampling primitive
    behind DeepWalk/node2vec-style corpus generation and WalkSAT-style
    frontier exploration, made reproducible: at step t a walker at node
    u moves to the neighbor whose per-node rank equals
    md5_60('walk:<walker>:<t>') mod out_deg(u) — no RNG state, so walks
    are identical on any cluster size AND expressible in SQL for an
    exact oracle (the repo's determinism rule applied to sampling).
    Dead ends (out_deg 0) absorb: the walker stays put.

    Scale shape per step: one join of walker positions against the
    ranked adjacency on (node, rank) — both sides keyed, no fan-out;
    the ranked adjacency is built ONCE (one window shuffle keyed by
    src, per-key width = out-degree).

    Returns the trajectories: (walker, step, node), step 0 = seed.
    """
    adj = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    ranked = adj.withColumn("rank", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    deg = ranked.groupBy("src").agg(F.max("rank").cast("long").alias("deg"))
    state = seeds.select(
        F.col("walker").cast("long").alias("walker"),
        F.col("walker").cast("long").alias("node"),
    )
    out = state.select(
        "walker", F.lit(0).cast("long").alias("step"), "node"
    )
    for t in range(1, int(n_steps) + 1):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("walk:"),
                        F.col("walker").cast("string"),
                        F.lit(f":{t}"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        picked = (
            state.join(deg, state["node"] == deg["src"], "left")
            .select(
                "walker",
                "node",
                F.when(
                    F.col("deg").isNotNull(),
                    (h % F.col("deg") + 1).cast("long"),
                ).alias("__pick"),
            )
            .join(
                ranked.select(
                    F.col("src").alias("node"),
                    F.col("rank").alias("__pick"),
                    F.col("dst").alias("__next"),
                ),
                ["node", "__pick"],
                "left",
            )
            .select(
                "walker",
                F.coalesce("__next", F.col("node")).cast("long").alias("node"),
            )
        )
        state = picked.localCheckpoint(eager=False)
        out = out.unionByName(
            state.select(
                "walker", F.lit(t).cast("long").alias("step"), "node"
            )
        )
    return out


def rich_club(
    edges: DataFrame,
    k_levels: list = (1, 2, 4, 8, 16),
) -> DataFrame:
    """Rich-club coefficient (Colizza et al. 2006): for each degree
    threshold k, the edge density among nodes of degree > k —
    φ(k) = 2·E_k / (N_k·(N_k−1)). A rising φ(k) means hubs link to each
    other far more than chance (the "rich club" of portals/link farms);
    flat φ means hub links spread out. Exact integer milli output.

    One degree aggregate + per-level filtered joins of the edge list
    against the qualifying-node set (broadcast-sized once k is large —
    exactly when it matters). Returns (k, n_nodes, n_edges, phi_milli).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint(eager=False)
    )
    out = None
    for k in k_levels:
        rich = deg.where(F.col("deg") > int(k)).select("node")
        n_nodes = rich.count()
        e_k = (
            und.join(rich.select(F.col("node").alias("a")), "a")
            .join(rich.select(F.col("node").alias("b")), "b")
            .count()
        )
        denom = n_nodes * (n_nodes - 1)
        phi = (2 * e_k * 1000) // denom if denom > 0 else 0
        row = und.sparkSession.range(1).select(
            F.lit(int(k)).cast("long").alias("k"),
            F.lit(int(n_nodes)).cast("long").alias("n_nodes"),
            F.lit(int(e_k)).cast("long").alias("n_edges"),
            F.lit(int(phi)).cast("long").alias("phi_milli"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def homophily_audit(
    edges: DataFrame,
    attrs: DataFrame,
    attr_col: str = "attr",
) -> DataFrame:
    """Attribute homophily on the link graph (the Newman attribute-
    mixing numerator, exact): observed fraction of edges joining
    same-attribute endpoints vs the chance expectation Σ_c p_c² from
    endpoint attribute frequencies. same_milli > expected_milli means
    assortative linking (language/topic silos — e.g. pages
    overwhelmingly link within their language); below means
    disassortative. All exact integer milli; expectation uses
    endpoint-occurrence frequencies (each edge contributes both ends —
    the standard convention).

    Returns ONE row: (n_edges, same, same_milli, expected_milli).
    """
    a = attrs.select(
        F.col("node").cast("long").alias("a"), F.col(attr_col).alias("ca")
    )
    b = attrs.select(
        F.col("node").cast("long").alias("b"), F.col(attr_col).alias("cb")
    )
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    j = und.join(a, "a").join(b, "b").localCheckpoint(eager=False)
    base = j.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum((F.col("ca") == F.col("cb")).cast("long"))
        .cast("long")
        .alias("same"),
    )
    ends = j.select(F.col("ca").alias("c")).unionAll(
        j.select(F.col("cb").alias("c"))
    )
    freq = ends.groupBy("c").agg(F.count("*").cast("long").alias("m"))
    tot = freq.agg(
        F.sum("m").cast("long").alias("t"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("sq"),
    )
    return base.crossJoin(tot).select(
        "n_edges",
        "same",
        F.expr("same * 1000 div n_edges").cast("long").alias("same_milli"),
        F.expr("sq * 1000 div (t * t)").cast("long").alias("expected_milli"),
    )
