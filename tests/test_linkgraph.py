"""Link-graph analytics: PageRank vs a pure-Python power method (same
formula), degree stats, synthetic-expander determinism, anchor-text
postings, and BM25 vs hand-computed scores."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from see_spark.operators.linkgraph import (
    ROUND_DP,
    anchor_postings,
    degree_stats,
    edges_from_docs,
    pagerank,
    synthetic_edges,
)
from see_spark.operators.search import search_bm25

# tiny graph with a dangling node (3 has no outlinks) and a 2-cycle
EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3)]
N = 4


def _pagerank_ref(edges, n, n_iter=5, d=0.85):
    """Driver-side power method, the exact formula pagerank() implements."""
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: 1.0 / n for v in range(n)}
    for _ in range(n_iter):
        dangling = sum(r for v, r in ranks.items() if out.get(v, 0) == 0)
        contrib = {v: 0.0 for v in range(n)}
        for s, t in edges:
            contrib[t] += ranks[s] / out[s]
        ranks = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in range(n)
        }
    return ranks


def test_pagerank_matches_power_method(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(nodes, edges).collect()}
    want = _pagerank_ref(EDGES, N)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(round(want[v], ROUND_DP), abs=1e-9)


def test_pagerank_mass_conserved(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    total = pagerank(nodes, edges, n_iter=3).agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_deterministic_across_partitionings(spark):
    nodes = spark.createDataFrame([(i,) for i in range(20)], ["node"])
    edges = synthetic_edges(nodes, id_col="node")
    a = sorted(map(tuple, pagerank(nodes, edges, shuffle_partitions=2).collect()))
    b = sorted(map(tuple, pagerank(nodes, edges, shuffle_partitions=7).collect()))
    assert a == b  # rounded ranks identical at any parallelism


def test_synthetic_edges_shape(spark):
    nodes = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    rows = synthetic_edges(nodes).collect()
    assert all(r["src"] != r["dst"] for r in rows)
    assert all(0 <= r["dst"] < 10 for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], set()).add(r["dst"])
    assert set(by_src) == set(range(10))
    assert all(1 <= len(v) <= 3 for v in by_src.values())
    # pure function of doc_id arithmetic -> rerun identical
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, synthetic_edges(nodes).collect())
    )


def test_degree_stats(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(edges).collect()}
    assert got == {0: (2, 1), 1: (1, 1), 2: (2, 2), 3: (0, 1)}


def test_edges_from_docs(spark):
    docs = spark.createDataFrame(
        [("a", ["b", "c", "a", "b"]), ("b", ["a"])], ["url", "links"]
    )
    got = sorted(map(tuple, edges_from_docs(docs).collect()))
    assert got == [("a", "b"), ("a", "c"), ("b", "a")]


HTML_A = (
    "<html><title>t</title><body>"
    '<a href="http://x.com/page">Click Here Now</a>'
    '<a href="sub/rel.html">relative link</a>'
    "<a>no href</a>"
    '<a href="http://y.com/">outer <a href="http://z.com/">inner text</a></a>'
    "</body></html>"
)


def test_anchor_postings(spark):
    raw = spark.createDataFrame([("http://base.com/dir/p.html", HTML_A)], ["url", "body"])
    rows = anchor_postings(raw).collect()
    by_dst = {}
    for r in rows:
        by_dst.setdefault(r["dst_url"], {})[r["word"]] = r["term_count"]
    assert by_dst["http://x.com/page"] == {"click": 1, "here": 1, "now": 1}
    # relative href absolutized against the source page's directory
    assert by_dst["http://base.com/dir/sub/rel.html"] == {"relative": 1, "link": 1}
    # nested link: outer anchor text includes inner's (subtree text);
    # inner link also indexed with its own text
    assert by_dst["http://y.com/"] == {"outer": 1, "inner": 1, "text": 1}
    assert by_dst["http://z.com/"] == {"inner": 1, "text": 1}
    assert all(r["src_url"] == "http://base.com/dir/p.html" for r in rows)


def _mk_postings(spark, docs_words):
    """docs_words: {doc_id: [words]} -> postings rows like the indexer's."""
    rows = []
    for d, words in docs_words.items():
        dl = len(words)
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            rows.append((w, d, c, dl, c / dl))
    return spark.createDataFrame(
        rows, ["word", "doc_id", "term_count", "doc_len", "tf"]
    )


def _bm25_ref(docs_words, query_words, n_pages, k1=1.2, b=0.75):
    dls = {d: len(ws) for d, ws in docs_words.items()}
    avgdl = sum(dls.values()) / len(dls)
    df = {}
    for d, ws in docs_words.items():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    scores = {}
    for d, ws in docs_words.items():
        if not all(q in ws for q in set(query_words)):
            continue
        s = 0.0
        for q in query_words:  # multiplicity scores multiply
            tc = ws.count(q)
            idf = math.log(1 + (n_pages - df[q] + 0.5) / (df[q] + 0.5))
            tfn = tc * (k1 + 1) / (tc + k1 * (1 - b + b * dls[d] / avgdl))
            s += idf * tfn
        scores[d] = round(s, 9)
    return scores


DOCS_WORDS = {
    "u1": ["apple", "banana", "apple", "cherry"],
    "u2": ["apple", "cherry", "cherry", "date", "egg"],
    "u3": ["banana", "date"],
}


def test_bm25_matches_reference_formula(spark):
    postings = _mk_postings(spark, DOCS_WORDS)
    docs = spark.createDataFrame(
        [(d, f"title {d}") for d in DOCS_WORDS], ["doc_id", "title"]
    )
    got = {
        r["url"]: r["score"]
        for r in search_bm25(spark, "apple cherry", postings, docs, 3).collect()
    }
    want = _bm25_ref(DOCS_WORDS, ["apple", "cherry"], 3)
    assert got == pytest.approx(want, abs=1e-9)
    assert set(got) == {"u1", "u2"}  # AND semantics: u3 lacks both


def test_bm25_query_multiplicity(spark):
    postings = _mk_postings(spark, DOCS_WORDS)
    docs = spark.createDataFrame(
        [(d, f"title {d}") for d in DOCS_WORDS], ["doc_id", "title"]
    )
    single = {
        r["url"]: r["score"]
        for r in search_bm25(spark, "apple", postings, docs, 3).collect()
    }
    double = {
        r["url"]: r["score"]
        for r in search_bm25(spark, "apple apple", postings, docs, 3).collect()
    }
    for u in single:
        assert double[u] == pytest.approx(2 * single[u], abs=1e-8)


def test_bm25_empty_query(spark):
    postings = _mk_postings(spark, DOCS_WORDS)
    docs = spark.createDataFrame([("u1", "t")], ["doc_id", "title"])
    assert search_bm25(spark, "  ", postings, docs, 3).count() == 0


def test_pagerank_over_crawled_corpus(spark, crawl_result):
    """End-to-end: docs table of the standard fixture crawl -> link-span
    edge extraction (absolutize + canonicalize) -> PageRank. Pins that the
    crawl corpus yields a well-formed graph (no self loops, canonical
    URLs) and a rank distribution summing to ~1 over the doc nodes."""
    from see_spark.operators.linkgraph import edges_from_crawl_docs

    catalog = crawl_result[0]
    docs = catalog.read("docs")
    edges = edges_from_crawl_docs(docs)
    rows = edges.collect()
    assert rows, "fixture crawl produced no link edges"
    assert all(r["src"] != r["dst"] for r in rows)
    assert all(r["dst"].startswith("http://") for r in rows)

    # nodes = crawled docs; rank over the doc-to-doc subgraph
    # (string node ids: pagerank keys on longs; remap via a dense id map)
    doc_urls = {r["doc_id"] for r in docs.select("doc_id").collect()}
    sub = edges.join(
        docs.select(F.col("doc_id").alias("dst")), "dst", "left_semi"
    )
    id_map = {u: i for i, u in enumerate(sorted(doc_urls))}
    mdf = spark.createDataFrame(
        [(u, i) for u, i in id_map.items()], ["url", "nid"]
    )
    n_nodes = mdf.select(F.col("nid").alias("node"))
    n_edges = (
        sub.join(mdf.withColumnRenamed("url", "src_u"), sub["src"] == F.col("src_u"))
        .withColumnRenamed("nid", "src_id")
        .drop("src_u")
        .join(mdf.withColumnRenamed("url", "dst_u"), F.col("dst") == F.col("dst_u"))
        .withColumnRenamed("nid", "dst_id")
        .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
    )
    from see_spark.operators.linkgraph import pagerank

    pr = pagerank(n_nodes, n_edges, n_iter=5)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)


def _hits_ref(edges, n, n_iter=3):
    """Driver-side HITS with L1 normalization, the exact hits() formula."""
    hub = {v: 1.0 for v in range(n)}
    auth = {v: 0.0 for v in range(n)}
    for _ in range(n_iter):
        raw_a = {v: 0.0 for v in range(n)}
        for s, t in edges:
            raw_a[t] += hub[s]
        tot = sum(raw_a.values()) or 1.0
        auth = {v: raw_a[v] / tot for v in range(n)}
        raw_h = {v: 0.0 for v in range(n)}
        for s, t in edges:
            raw_h[s] += auth[t]
        tot_h = sum(raw_h.values()) or 1.0
        hub = {v: raw_h[v] / tot_h for v in range(n)}
    return hub, auth


def test_hits_matches_reference(spark):
    from see_spark.operators.linkgraph import hits

    nodes = spark.createDataFrame([(i,) for i in range(N)], ["node"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(nodes, edges).collect()}
    hub, auth = _hits_ref(EDGES, N)
    for v in range(N):
        assert got[v][0] == pytest.approx(round(hub[v], ROUND_DP), abs=1e-9), v
        assert got[v][1] == pytest.approx(round(auth[v], ROUND_DP), abs=1e-9), v
    # node 3 is a pure sink: authority > 0, hub == 0
    assert got[3][1] > 0 and got[3][0] == 0.0


# ---- bfs_depths (crawl-depth audit) ----------------------------------------

def _bfs_edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst"])


def test_bfs_diamond_takes_min_depth(spark):
    from see_spark.operators.linkgraph import bfs_depths

    edges = _bfs_edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "d"),   # long path a->d = 3
        ("a", "d"),                           # shortcut a->d = 1
        ("d", "e"),
    ])
    seeds = spark.createDataFrame([("a",)], ["url"])
    got = {r["url"]: r["depth"] for r in bfs_depths(edges, seeds).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 1, "e": 2}


def test_bfs_cycle_terminates_and_unreachable_excluded(spark):
    from see_spark.operators.linkgraph import bfs_depths

    edges = _bfs_edges(spark, [
        ("a", "b"), ("b", "a"),       # 2-cycle
        ("x", "y"),                   # disconnected
    ])
    seeds = spark.createDataFrame([("a",)], ["url"])
    got = {r["url"]: r["depth"] for r in bfs_depths(edges, seeds, 10).collect()}
    assert got == {"a": 0, "b": 1}


def test_bfs_max_iters_bounds_depth(spark):
    from see_spark.operators.linkgraph import bfs_depths

    chain = [(f"n{i}", f"n{i+1}") for i in range(10)]
    seeds = spark.createDataFrame([("n0",)], ["url"])
    got = bfs_depths(_bfs_edges(spark, chain), seeds, max_iters=3).collect()
    assert max(r["depth"] for r in got) == 3
    assert len(got) == 4


def test_bfs_multi_seed_and_partitioning_invariance(spark):
    from see_spark.operators.linkgraph import bfs_depths

    chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
    seeds = spark.createDataFrame([("n0",), ("n5",)], ["url"])
    edges = _bfs_edges(spark, chain)
    a = sorted(tuple(r) for r in bfs_depths(edges, seeds, 6).collect())
    b = sorted(
        tuple(r)
        for r in bfs_depths(edges.repartition(5), seeds.repartition(3), 6).collect()
    )
    assert a == b
    got = dict(a)
    # n5..n8 are 0..3 from the n5 seed, never 5..8 from n0
    assert got["n5"] == 0 and got["n6"] == 1 and got["n8"] == 3


def test_anchor_only_match_is_retrievable(spark):
    """A document matched ONLY through anchor text (zero body hits)
    must still rank: df comes from the body field (0 -> idf=ln(N/1)>0)
    and the anchor field supplies the tf (the search_anchor_boost gate
    query pins the full composed pipeline; this pins the semantics)."""
    from see_spark.operators.search import search_fielded

    body = spark.createDataFrame(
        [(1, "pear", 1.0)], ["doc_id", "word", "tf"]
    )
    anchor = spark.createDataFrame(
        [(2, "apple", 1.0)], ["doc_id", "word", "tf"]
    )
    docs = spark.createDataFrame([(1, "one"), (2, "two")], ["doc_id", "title"])
    got = {
        r["url"]: r["score"]
        for r in search_fielded(
            spark, "apple", body, anchor, docs, page_count=2,
            title_weight=1.5,
        ).collect()
    }
    assert set(got) == {2}
    import math

    assert got[2] == pytest.approx(round(1.5 * 1.0 * math.log(2.0), 6))


def test_trustrank_flows_from_seeds_only(spark):
    """A node unreachable from any seed scores exactly 0; seeds retain
    teleport mass; reachable non-seeds inherit discounted trust; total
    mass is conserved (no dangling leak)."""
    from pyspark.sql import functions as F

    from see_spark.operators.linkgraph import trustrank

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    # 0 (seed) -> 1 -> 2 ; 3 -> 4 (island, no seed)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    # 30 iterations: the 0->1->2->(dangling teleport)->0 cycle needs to
    # converge before per-hop decay is monotone (fixpoint 0.389/0.330/0.281)
    ranks = {r["node"]: r["rank"] for r in
             trustrank(nodes, edges, seeds, n_iter=30, round_dp=9).collect()}
    assert ranks[3] == 0.0 and ranks[4] == 0.0  # untrusted island
    assert ranks[0] > ranks[1] > ranks[2] > 0   # trust decays per hop
    # mass conservation: node 2 is dangling, its mass teleports to seed 0
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_trustrank_uniform_seeds_equals_pagerank(spark):
    """With EVERY node a seed the teleport vector is uniform — trustrank
    must reproduce pagerank exactly (same IEEE expression shape)."""
    from see_spark.operators.linkgraph import (
        pagerank, synthetic_edges, trustrank,
    )

    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    nodes = docs.selectExpr("doc_id AS node")
    edges = synthetic_edges(docs, n_nodes=40)
    pr = {r["node"]: r["rank"] for r in
          pagerank(nodes, edges, n_iter=4).collect()}
    tr = {r["node"]: r["rank"] for r in
          trustrank(nodes, edges, nodes, n_iter=4).collect()}
    assert pr == tr


def test_link_farm_scores_flags_concentration_with_evidence(spark):
    from see_spark.operators.linkgraph import link_farm_scores

    edges = []
    edges += [("farm.test", "money.test")] * 9 + [("farm.test", "x.test")]
    edges += [("tiny.test", "money.test")] * 3          # 100% but thin
    edges += [(f"organic.test", f"d{i}.test") for i in range(12)]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    rows = {r["src_host"]: r for r in
            link_farm_scores(df, min_links=10,
                             share_threshold_milli=800).collect()}
    assert rows["farm.test"]["is_suspect"] is True
    assert rows["farm.test"]["top_dst"] == "money.test"
    assert rows["farm.test"]["top_share_milli"] == 900
    assert rows["tiny.test"]["is_suspect"] is False     # min_links guard
    assert rows["organic.test"]["is_suspect"] is False  # spread
    assert rows["organic.test"]["top_share_milli"] == 1000 // 12 * 1


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: nodes 0-3, edges forming two triangles sharing
    edge (1,2); hand-checked degrees/counts/clustering."""
    from see_spark.operators.linkgraph import triangle_counts

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["node"]: r for r in triangle_counts(df).collect()}
    assert rows[0]["triangles"] == 1 and rows[3]["triangles"] == 1
    assert rows[1]["triangles"] == 2 and rows[2]["triangles"] == 2
    # node 1: degree 3, 2 triangles -> 2*2000 div (3*2) = 666
    assert rows[1]["clustering_milli"] == 666
    # node 0: degree 2, 1 triangle -> clustering 1000 (its nbrs are linked)
    assert rows[0]["clustering_milli"] == 1000


def test_triangle_counts_direction_and_dup_invariant(spark):
    """Duplicate and reversed edge rows must not change counts."""
    from see_spark.operators.linkgraph import triangle_counts

    base = [(0, 1), (1, 2), (2, 0)]
    noisy = base + [(1, 0), (2, 1), (0, 2), (0, 1)]
    a = {(r["node"], r["triangles"]) for r in
         triangle_counts(spark.createDataFrame(base, "src long, dst long")).collect()}
    b = {(r["node"], r["triangles"]) for r in
         triangle_counts(spark.createDataFrame(noisy, "src long, dst long")).collect()}
    assert a == b == {(0, 1), (1, 1), (2, 1)}


def test_reciprocity_counts_backlinks(spark):
    from see_spark.operators.linkgraph import reciprocity

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["src"]: r for r in reciprocity(df).collect()}
    assert rows["a"]["out_links"] == 2 and rows["a"]["reciprocated"] == 1
    assert rows["a"]["reciprocity_milli"] == 500
    assert rows["b"]["reciprocity_milli"] == 1000
    assert rows["c"]["reciprocated"] == 0


def test_community_edges_in_range_and_deterministic(spark):
    from see_spark.operators.linkgraph import community_edges

    docs = spark.range(20).withColumnRenamed("id", "doc_id")
    e = community_edges(docs).collect()
    assert all(0 <= r["dst"] < 20 and r["src"] != r["dst"] for r in e)
    # +6 back-stride only for src % 3 == 0
    assert any(r["src"] % 3 == 0 and (r["dst"] - r["src"]) % 8 == 6 for r in e)
    e2 = community_edges(docs).collect()
    assert sorted(map(tuple, e)) == sorted(map(tuple, e2))


def test_kcore_peeling_cascade(spark):
    """Pendant chain hanging off a K5 clique: the chain peels one node
    per round (a genuine cascade), the clique survives as the 4-core."""
    from see_spark.operators.linkgraph import kcore

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    core = {r["node"]: r["degree"] for r in kcore(df, k=4, n_iter=6).collect()}
    assert set(core) == {0, 1, 2, 3, 4}
    assert all(d == 4 for d in core.values())
    # k above the clique degree empties the graph
    assert kcore(df, k=5, n_iter=6).count() == 0


def test_kcore_fixpoint_extra_rounds_noop(spark):
    from see_spark.operators.linkgraph import community_edges, kcore, synthetic_edges

    docs = spark.range(120).withColumnRenamed("id", "doc_id")
    mixed = community_edges(docs).unionAll(synthetic_edges(docs, n_nodes=120))
    a = sorted((r["node"], r["degree"]) for r in kcore(mixed, k=8, n_iter=6).collect())
    b = sorted((r["node"], r["degree"]) for r in kcore(mixed, k=8, n_iter=9).collect())
    assert a == b and len(a) > 0


def test_spam_mass_flags_farm_not_trusted_region(spark):
    """Gyongyi 2006 hand case: a dense farm disjoint from the trusted
    core gets rel_mass exactly 1.0 (its trustrank is 0 — no path from any
    seed) and is flagged when its rank clears the uniform floor; pages
    reached by the core keep rel_mass well below the threshold."""
    from see_spark.operators.linkgraph import spam_mass

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node long")
    # trusted region: 0 (seed) <-> 1 <-> 2 ; farm: 3,4,5 all boost 6,
    # interlinked; 7 isolated (dangling, rank ~ base only)
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0),
         (3, 4), (4, 3), (3, 6), (4, 6), (5, 6), (6, 3), (6, 4), (6, 5),
         (5, 3)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    rows = {
        r["node"]: r
        for r in spam_mass(nodes, edges, seeds, n_iter=20).collect()
    }
    # farm target and members: zero trust -> full relative mass
    for v in (3, 4, 5, 6):
        assert rows[v]["trust"] == 0.0
        assert rows[v]["rel_mass"] == 1.0
    # the boosted target accumulates above-uniform rank -> flagged
    assert rows[6]["rank"] * 8 >= 1.0
    assert rows[6]["spam_candidate"] == 1
    # trusted region: core reaches them, mass stays far from 1
    for v in (0, 1, 2):
        assert rows[v]["trust"] > 0.0
        assert rows[v]["rel_mass"] < 0.9
        assert rows[v]["spam_candidate"] == 0
    # isolated dangling page: pure teleport rank, below the floor ->
    # never flagged even though its rel_mass is high
    assert rows[7]["spam_candidate"] == 0


def test_distance_distribution_star_saturates_at_radius_one(spark):
    """Star (hub -> all leaves): every ball stops growing after r=1, so
    the neighborhood function is flat from there, the distance-2 mass is
    exactly zero, and the effective diameter lands within radius 1."""
    from see_spark.operators.linkgraph import distance_distribution

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, n)], "src long, dst long"
    )
    rows = {
        r["radius"]: r
        for r in distance_distribution(nodes, edges, n_iter=2, p=8).collect()
    }
    assert set(rows) == {0, 1, 2}
    nf = [rows[r]["nf_e4"] for r in (0, 1, 2)]
    assert nf[0] < nf[1] == nf[2]          # growth only at radius 1
    assert rows[2]["delta_e4"] == 0
    assert rows[1]["delta_e4"] == nf[1] - nf[0]
    eff = rows[0]["eff_diameter_milli"]
    assert all(rows[r]["eff_diameter_milli"] == eff for r in rows)
    assert 0 < eff <= 1000
    # the interpolation target is genuinely crossed at the found radius
    target = (900 * nf[2]) // 1000
    assert nf[1] >= target > nf[0]


def test_bowtie_classify_hand_anatomy(spark):
    """Hand graph with every Broder component: core cycle 0<->1, 2 links
    in, core links out to 3, tendril 4 hangs off the in-node, 5 isolated."""
    from see_spark.operators.linkgraph import bowtie_classify

    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0), (0, 3), (2, 4)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in bowtie_classify(nodes, edges, seed=0).collect()
    }
    assert got == {
        0: "scc", 1: "scc", 2: "in", 3: "out", 4: "tendril",
        5: "disconnected",
    }


def test_synthetic_bowtie_fixture_counts(spark):
    """The fixture graph's anatomy at N=100: lim=90, m=23 core nodes,
    23 in, 22 out, 22 tendrils, 10 disconnected — and classification is
    insensitive to which core node seeds it."""
    from see_spark.operators.linkgraph import (
        bowtie_classify, synthetic_bowtie_edges,
    )

    docs = spark.range(100).withColumnRenamed("id", "doc_id")
    nodes = docs.selectExpr("doc_id AS node")
    edges = synthetic_bowtie_edges(docs, n_nodes=100)
    for seed in (0, 44):  # two different core nodes
        counts = {
            r["component"]: r["n"]
            for r in bowtie_classify(nodes, edges, seed=seed, max_iters=40)
            .groupBy("component").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {
            "scc": 23, "in": 23, "out": 22, "tendril": 22,
            "disconnected": 10,
        }


def test_salsa_hand_graph_three_iterations(spark):
    """1->0, 2->0, 2->4: authority side {0,4}, hub side {1,2}. All
    masses are dyadic rationals, so the expected 3-iteration values are
    exact in doubles (hand-unrolled backward/forward walk)."""
    from see_spark.operators.linkgraph import salsa

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (2, 4)], "src long, dst long"
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in salsa(nodes, edges, n_iter=3, round_dp=None).collect()
    }
    assert got[0] == (0.0, 0.6640625)
    assert got[4] == (0.0, 0.3359375)
    assert got[1] == (0.3359375, 0.0)
    assert got[2] == (0.6640625, 0.0)
    assert got[3] == (0.0, 0.0)
    # both walks conserve mass exactly
    assert sum(v[0] for v in got.values()) == 1.0
    assert sum(v[1] for v in got.values()) == 1.0


def test_salsa_star_is_stationary_and_tkc_resistant(spark):
    """Star 1,2,3 -> 0 is already stationary (authority 1.0 on the hub
    target); adding a disjoint 2-clique (5<->6) splits mass by component
    size per the SALSA stationary form — unlike HITS, the clique cannot
    absorb ALL the authority mass (the tightly-knit-community effect)."""
    from see_spark.operators.linkgraph import salsa

    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (5, 6), (6, 5)], "src long, dst long"
    )
    got = {
        r["node"]: r["authority"]
        for r in salsa(nodes, edges, n_iter=5).collect()
    }
    # authority side = {0, 5, 6}, a_0 = 1/3 each; star target keeps its
    # third, the clique splits its two-thirds evenly — nonzero for both
    # communities, which is exactly what HITS does not guarantee.
    assert got[0] == pytest.approx(1 / 3, abs=1e-9)
    assert got[5] == pytest.approx(1 / 3, abs=1e-9)
    assert got[6] == pytest.approx(1 / 3, abs=1e-9)
    assert got[1] == got[2] == got[3] == 0.0


def test_degree_assortativity_matches_numpy(spark):
    """All four directed coefficients vs an independent numpy Pearson on
    the same per-edge endpoint-degree pairs (Foster et al. 2010)."""
    import numpy as np

    from see_spark.operators.linkgraph import degree_assortativity

    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 0), (3, 1), (4, 0),
        (1, 0),  # breaks in-degree regularity so every variance is > 0
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(df, round_dp=None).collect()[0]
    out = {s: 0 for s, _ in edges} | {d: 0 for _, d in edges}
    inn = dict(out)
    for s, d in edges:
        out[s] += 1
        inn[d] += 1
    for name, fx, fy in [
        ("r_out_out", out, out), ("r_out_in", out, inn),
        ("r_in_out", inn, out), ("r_in_in", inn, inn),
    ]:
        x = np.array([fx[s] for s, _ in edges], dtype=float)
        y = np.array([fy[d] for _, d in edges], dtype=float)
        expect = np.corrcoef(x, y)[0, 1]
        assert row[name] == pytest.approx(expect, abs=1e-12), name
    assert row["m"] == len(edges)


def test_degree_assortativity_regular_graph_is_null(spark):
    """A directed cycle is degree-regular — all variances 0, so every
    coefficient is NULL (undefined), never a divide-by-zero error."""
    from see_spark.operators.linkgraph import degree_assortativity

    cyc = spark.createDataFrame(
        [(i, (i + 1) % 4) for i in range(4)], "src long, dst long"
    )
    row = degree_assortativity(cyc).collect()[0]
    assert row["m"] == 4
    assert all(
        row[c] is None
        for c in ("r_out_out", "r_out_in", "r_in_out", "r_in_in")
    )


def test_harmonic_centrality_star_and_idempotence(spark):
    """Star 1,2,3 -> 0: only the hub's in-ball grows (leaves stay h=0),
    and the hub's value equals the sketch estimate of its exact in-ball
    computed directly (sketch-union idempotence, the oracle argument)."""
    from see_spark.functions.sketches import hll_estimate, hll_sketch
    from see_spark.operators.linkgraph import harmonic_centrality

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long"
    )
    got = {
        r["node"]: (r["h_lcm_e4"], r["lcm"])
        for r in harmonic_centrality(nodes, edges, n_iter=2, p=8).collect()
    }
    assert got[1] == (0, 2) and got[2] == (0, 2) and got[3] == (0, 2)

    def ball_e4(members):
        df = spark.createDataFrame(
            [(0, str(m)) for m in members], "node long, v string"
        )
        est = hll_estimate(hll_sketch(df, ["node"], "v", 8), ["node"], 8)
        return int(round(est.collect()[0]["hll_estimate"] * 10000))

    e0, e1 = ball_e4([0]), ball_e4([0, 1, 2, 3])
    # B_in(0,1) already full: radius-2 term is zero
    assert got[0] == ((e1 - e0) * 2, 2)


def test_harmonic_centrality_cycle_symmetry(spark):
    """Directed 5-cycle: every node's truncated harmonic centrality is
    identical (graph automorphism) and strictly positive."""
    from see_spark.operators.linkgraph import harmonic_centrality

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    vals = {
        r["node"]: r["h_lcm_e4"]
        for r in harmonic_centrality(nodes, edges, n_iter=2, p=8).collect()
    }
    assert len(set(vals.values())) == 1 and min(vals.values()) > 0


def test_modularity_two_cliques_hand_values(spark):
    """Two directed 3-cycles joined by one cross edge, communities = the
    cycles: m=7, each community has intra=3; c0: kout=4,kin=3;
    c1: kout=3,kin=4. Q contributions hand-computed."""
    from see_spark.operators.linkgraph import modularity

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)],
        "src long, dst long",
    )
    assign = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "node long, community long"
    )
    got = {
        r["community"]: r
        for r in modularity(edges, assign, round_dp=None).collect()
    }
    assert (got[0]["intra_edges"], got[0]["kout"], got[0]["kin"]) == (3, 4, 3)
    assert (got[1]["intra_edges"], got[1]["kout"], got[1]["kin"]) == (3, 3, 4)
    assert got[0]["q_contrib"] == pytest.approx(3 / 7 - 12 / 49, abs=1e-12)
    assert got[1]["q_contrib"] == pytest.approx(3 / 7 - 12 / 49, abs=1e-12)
    # everything in one community -> Q = 1 - 1 = 0 exactly
    one = spark.createDataFrame(
        [(i, 0) for i in range(6)], "node long, community long"
    )
    only = modularity(edges, one, round_dp=None).collect()
    assert len(only) == 1 and only[0]["q_contrib"] == 0.0


def test_wl_refine_isomorphic_subtrees_and_cycle(spark):
    """Binary tree: the two internal nodes (and the four leaves) have
    isomorphic out-trees -> equal WL labels, root unique; a directed
    cycle is vertex-transitive -> one label for all nodes."""
    from see_spark.operators.linkgraph import wl_refine

    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
    tree = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)],
        "src long, dst long",
    )
    lab = {r["node"]: r["wl_label"] for r in wl_refine(nodes, tree).collect()}
    assert lab[1] == lab[2] and lab[3] == lab[4] == lab[5] == lab[6]
    assert len({lab[0], lab[1], lab[3]}) == 3  # root/internal/leaf distinct

    cyc_nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    cl = {r["wl_label"] for r in wl_refine(cyc_nodes, cyc).collect()}
    assert len(cl) == 1


def test_wl_refine_separates_path_positions(spark):
    """Directed path 0->1->2->3: at 2 iterations WL distinguishes all
    four positions except none — each node's 2-hop out-tree differs."""
    from see_spark.operators.linkgraph import wl_refine

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    lab = [
        r["wl_label"]
        for r in wl_refine(nodes, path, n_iter=3).collect()
    ]
    assert len(set(lab)) == 4
