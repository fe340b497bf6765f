"""Crawl driver: deterministic batch rounds over snapshot tables.

One round = the reference's visit cycle (see_crawler_worker.erl:63-87 +
see_db_srv.erl:68-96) batched (SURVEY §3.2):

  expire leases (O4) -> robots gate + politeness checkout (O1,O24)
  -> fetch mapInPandas (O17) -> route by outcome (O23)
  -> parse text pages to interleaved spans (O18-O21)
  -> MERGE docs (O3) + postings delta (O3/O10)
  -> absolutize/canonicalize/filter/dedup new links (O22,O15,O16,O2)
  -> append frontier, bump hoststats, commit snapshots = checkpoint.

Determinism contract (SURVEY §7.0): every step is a pure function of
(frontier snapshot, round number); ordering keys are total orders; nothing
reads wall clock or partition iteration order — so crawl order and the
URL-seen set are invariant across parallelism levels (asserted by the
parity + scaling tests).

Resume: ``catalog.resume_point()`` rolls tables to the last fully committed
round and returns the next round number; a crashed round replays cleanly
because commits are per-table snapshots published after the round's work.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pandas as pd
from pyspark.sql import types as T

from ..functions import bloom as bloomlib
from ..functions import cuckoo as cuckoolib
from ..functions.udfs import (
    PARSED_TYPE,
    absolute_link_udf,
    parse_html_udf,
    route_response_udf,
)
from ..sources.catalog import SnapshotCatalog
from ..sources.tables import (
    ROBOTS_SCHEMA,
    STATE_BINARY,
    STATE_ERROR,
    STATE_REDIRECT,
    STATE_UNVISITED,
    STATE_VISITED,
)
from ..sources import warc as warc_sink
from . import frontier as frontier_ops
from . import indexer
from . import robots as robots_ops

# links-per-page bound used to build the within-round discovery order key;
# a 10 MB body (see_http.erl:11) cannot hold 2^20 hrefs.
_LINK_POS_BITS = 20


@dataclass
class CrawlConfig:
    domain_filter: Optional[str] = None
    host_budget: int = 2              # max URLs fetched per host per round
    min_gap_rounds: int = 1           # politeness: rounds between host visits
    lease_rounds: int = 2             # O4 visit lease, in rounds
    max_rounds: int = 100
    use_bloom: bool = True
    bloom_bits: int = 1 << 22
    build_index: bool = True          # postings maintenance per round
    # URL-seen bloom topology. The flat bloom is OR-merged through the
    # driver and broadcast — fine for small frontiers, a fixed serial cost
    # that dominates at scale (10^10 URLs => ~12 GB bitmap). Above the
    # threshold the sharded bloom (bloom.build_bloom_shards /
    # seen_filter_sharded) is used: bitmaps stay distributed, candidates
    # meet their shard in a cogroup, nothing flows through the driver.
    use_sharded_bloom: Optional[bool] = None   # None = auto by frontier size
    sharded_bloom_min_frontier: int = 1_000_000
    bloom_shards: int = 64
    # Sharded pre-filter structure (north rule names both): "bloom"
    # (OR-mergeable bitmaps, map-side partial build) or "cuckoo"
    # (fingerprint table; shuffle-built since cuckoo tables don't merge;
    # supports deletion for lease-recovery mode). Either yields the
    # identical URL-seen set — the trailing anti-join is exact.
    seen_structure: str = "bloom"
    # Partition count for the fetch->parse stage (None = 2x task slots).
    # Explicit so AQE's byte-based coalescing can't collapse the round's
    # Python-cost-dominated stage to a handful of tasks (see run_round).
    fetch_partitions: Optional[int] = None
    # RFC 9309 robots mode: fetch http://host/robots.txt (same fetcher)
    # for every host the round it first has unvisited URLs, parse with
    # core/robotstxt (group selection, allow/disallow longest-match,
    # wildcards), and gate via operators/robots.robots_gate_rfc. The
    # robots_rfc dimension is append-only (one parse per host, ever);
    # robots fetches never enter the frontier, visit order, or URL-seen
    # set. Off by default: the legacy pre-supplied prefix table ("robots")
    # remains the parity mode with the prefix-rule oracle.
    robots_rfc: bool = False
    robots_agent: str = "see-spark"
    # Sitemap seeding (requires robots_rfc): sitemap URLs declared by a
    # newly-entered host's robots.txt are fetched through the same fetcher
    # (once ever — ledger table `sitemaps_fetched`, the host-level analogue
    # of robots_rfc), <sitemapindex> nesting is followed breadth-first up
    # to `sitemap_waves` waves within the round, and extracted page URLs
    # enqueue at depth 0 AFTER the round's link discoveries, ordered by
    # (wave, sitemap-url lexicographic, document position). Sitemap
    # fetches — like robots fetches — never enter the frontier, the visit
    # order, or the URL-seen set.
    use_sitemaps: bool = False
    sitemap_waves: int = 3
    # Crawl-delay politeness (requires robots_rfc): a host whose robots
    # declares Crawl-delay gets a per-host checkout gap of
    # max(min_gap_rounds, ceil(crawl_delay / seconds_per_round)) — rounds
    # are the crawl's time unit, so seconds_per_round pins the conversion
    # deterministically (no wall clock anywhere).
    honor_crawl_delay: bool = False
    seconds_per_round: float = 1.0
    # robots cache TTL (requires robots_rfc): RFC 9309 §2.4 caps robots
    # caching (24h standard); with a TTL set, a host whose newest
    # robots_rfc row is >= robots_ttl_rounds old is REFETCHED the next
    # round it has unvisited URLs. Refetches append a newer row to the
    # ledger (provenance kept); reads take latest-per-host. None = cache
    # forever (the once-ever legacy behavior). TTL refetches do NOT
    # re-trigger sitemap seeding (new hosts only; the sitemaps_fetched
    # ledger would dedup anyway).
    robots_ttl_rounds: Optional[int] = None
    # Raw-fetch archiving: when set, every round's fetch results are
    # written as WARC files under {archive_dir}/round-NNNNN/ before
    # parsing (sources/warc.py — deterministic record ids, byte-
    # reproducible across parallelism). Archiving uses the unfused fetch
    # path so bodies exist as a materialized frame exactly once (the
    # archive write and the parse both read the same checkpoint instead
    # of refetching).
    archive_dir: Optional[str] = None
    archive_files_per_round: int = 4
    # Crawler-trap gate (frontier.trap_stats): when enabled, discovered
    # candidates (page links and sitemap URLs — operator-supplied seeds
    # are trusted) whose path shape flags a spider trap are dropped
    # BEFORE URL-seen filtering, so traps never occupy frontier rows or
    # bloom bits. Zero-shuffle narrow map; parity with the oracle
    # crawler's identical rule is pinned by tests/test_crawl_trap.py.
    trap_gate: bool = False
    trap_max_depth: int = 8
    trap_max_seg_repeat: int = 3
    trap_max_url_len: int = 512
    # URL blocklist gate (operators/urlfilter.py, the RefinedWeb shape):
    # discovered candidates whose canonical URL is domain-blocked or
    # whose banned-word soft score reaches the threshold are dropped at
    # the same point as trap candidates — before URL-seen filtering —
    # so blocked URLs never occupy frontier rows, bloom bits, or fetch
    # budget. Applied after the trap gate; operator seeds are never
    # gated. Parity with the oracle crawler's identical rule is pinned
    # by tests/test_crawl_blocklist.py.
    url_blocklist_words: tuple = ()        # ((word, weight_milli), ...)
    url_blocklist_domains: tuple = ()
    url_blocklist_threshold: int = 1000
    # Host-reputation gate (operators/reputation.py — the FineWeb
    # domain-level arm): per-round increments of integer doc quality
    # accumulate in the append-only host_quality table; candidates from
    # hosts with >= min_docs evidence and summed quality below
    # min_avg * n_docs (integer cross-multiply) are dropped at the same
    # discovery point as trap/blocklist candidates. Evidence visible to
    # round r is what rounds < r committed — a page fetched in round r
    # never influences round r's own discoveries, which keeps the gate
    # deterministic and replay-safe. Parity with the oracle crawler's
    # identical rule is pinned by tests/test_crawl_reputation.py.
    reputation_gate: bool = False
    reputation_min_docs: int = 3
    reputation_min_avg_milli: int = 10
    # DUST alias gate (operators/urlalias.py — Bar-Yossef et al. WWW'07):
    # at round start, query-param strippability rules are mined from the
    # docs PRIOR rounds fetched (content fingerprint = md5 over
    # (kind, text, media_ref) of each doc's span sequence, '\\x1e'/'\\x1f'
    # joined), and discovered candidates are rewritten to their alias
    # BEFORE the trap/blocklist/reputation gates and URL-seen filtering —
    # so a known session-id param never occupies a frontier row, bloom
    # bits, or fetch budget. Evidence-as-of-round-start (the host_quality
    # rule): a page fetched in round r never shapes round r's own
    # discoveries, keeping the gate deterministic and replay-safe.
    # Mining here is O(docs-so-far) per round — fine at fixture scale; a
    # production crawl mines per epoch and feeds the materialized rule
    # table. Parity with the oracle crawler's identical rule is pinned by
    # tests/test_crawl_dust.py.
    dust_gate: bool = False
    dust_min_support: int = 2
    # Page-level robots directives (htmlx.robots_meta, the REP meta
    # layer): with meta_robots on, a page declaring noindex is fetched
    # and stored in docs but EXCLUDED from postings/word_stats (the
    # documented "store, don't serve" semantic), and outlink enqueue
    # reads the followable subset — rel=nofollow anchors dropped, all
    # links dropped on a nofollow page. Off by default: `parsed.links`
    # keeps the reference's full-list semantics (see_html.erl:54-78).
    # Parity with the oracle crawler's identical rules is pinned by
    # tests/test_crawl_meta_robots.py.
    meta_robots: bool = False
    # rel=canonical discovery (RFC 6596, htmlx.canonical_href): with
    # follow_canonical on, a fetched page's declared canonical target is
    # (a) enqueued like a link — resolved against the page, ordered LAST
    # within the page's discoveries (link_pos 2^20-1) so anchors keep
    # their positions — and (b) recorded in the append-only
    # canonical_aliases ledger (url, canonical, round), the alias-edge
    # input of operators/urlalias.py and SERP dup-collapse. The
    # canonical is page METADATA, not an anchor: meta-robots nofollow
    # does not suppress it. Parity with the oracle crawler's identical
    # rules is pinned by tests/test_crawl_canonical.py.
    follow_canonical: bool = False


@dataclass
class RoundMetrics:
    round_no: int
    checked_out: int = 0
    fetched_text: int = 0
    fetched_binary: int = 0
    redirects: int = 0
    errors: int = 0
    discovered: int = 0
    frontier_size: int = 0
    archived: int = 0  # WARC records written this round (archive mode)
    # 1 when a zero-checkout round still has unvisited URLs — every
    # eligible host is inside its politeness/crawl-delay gap, so the round
    # is an idle WAIT, not the end of the crawl (run_crawl continues).
    gap_waiting: int = 0


def ingest_seeds(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    seed_urls: list,
    config: CrawlConfig,
) -> DataFrame:
    """O26/§3.3 seed ingestion: canonicalize -> filter -> dedup -> append at
    depth 0 with seq = input order. Returns per-URL three-way status
    (ok / filter_mismatch / url_error), the reference queue() contract."""
    raw = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seed_urls)], "raw_url string, link_rank long"
    )
    cand = frontier_ops.canonicalize_and_filter(
        raw, url_col="raw_url", domain_filter=config.domain_filter
    )
    status = cand.select(F.col("url"), F.col("ingest_status"))
    ok = cand.filter(F.col("ingest_status") == "ok").drop("ingest_status")
    append_ok_candidates(catalog, ok, op="ingest_seeds")
    return status


def append_ok_candidates(
    catalog: SnapshotCatalog, ok: DataFrame, op: str = "ingest"
) -> int:
    """Shared ingestion tail (seed list, streamed URL batches): URL-seen
    dedup against the whole frontier + first-enqueue-wins within the batch,
    stamp dense seq at depth 0, append to the unvisited partition only
    (delta commit; terminal partitions untouched). Returns rows appended.

    Safe to replay the same batch: every URL it added is then caught by
    the seen filter, so a re-run appends nothing — this is what makes the
    streaming foreachBatch sink idempotent without epoch bookkeeping.
    """
    frontier = catalog.read("frontier")
    fresh = frontier_ops.dedup_within_batch(
        frontier_ops.seen_filter(ok, frontier), "link_rank"
    )
    seq_start = _next_seq(catalog, frontier)
    rows = frontier_ops.as_frontier_rows(
        fresh, depth_col=F.lit(0), round_no=0, seq_start=seq_start
    ).localCheckpoint(eager=True)
    n_new = rows.count()
    # seeds only grow the unvisited partition; terminal partitions carry
    # forward untouched
    unvisited_next = frontier.filter(
        F.col("state") == STATE_UNVISITED
    ).unionByName(rows)
    catalog.commit_delta(
        "frontier",
        partition_col="state",
        replaced={STATE_UNVISITED: unvisited_next},
        meta={
            "round": -1,
            "op": op,
            "next_seq": seq_start + n_new,
            "fetched_total": _fetched_total(catalog, frontier),
        },
    )
    return n_new


def _apply_trap_gate(candidates: DataFrame, config: "CrawlConfig") -> DataFrame:
    """Drop trap-shaped discoveries (CrawlConfig.trap_gate) before
    URL-seen filtering. No-op when disabled."""
    if not config.trap_gate:
        return candidates
    return frontier_ops.trap_stats(
        candidates,
        max_depth=config.trap_max_depth,
        max_seg_repeat=config.trap_max_seg_repeat,
        max_len=config.trap_max_url_len,
    ).filter(F.col("is_trap") == 0).drop(
        "depth_segs", "max_repeat", "url_len", "is_trap"
    )


def _apply_reputation_gate(
    candidates: DataFrame, host_rep, config: "CrawlConfig"
) -> DataFrame:
    """Drop discoveries from hosts whose accumulated quality evidence
    fails the reputation rule. ``host_rep`` is the aggregated
    host_quality view read ONCE at round start (None = gate off)."""
    if host_rep is None:
        return candidates
    from .reputation import host_quality_gate

    return host_quality_gate(
        candidates,
        host_rep,
        min_docs=config.reputation_min_docs,
        min_avg_milli=config.reputation_min_avg_milli,
    ).filter(F.col("passed") == 1).drop("n_docs", "sum_q_milli", "passed")


def _span_fingerprint():
    """Cross-engine content fingerprint of a docs row: md5 over the span
    sequence's (kind, text, media_ref) triples — '\\x1e' within a span,
    '\\x1f' between spans, NULLs as ''. Media docs fingerprint to their
    (unique) media_ref, so undecoded content never supplies equal-content
    evidence. Replicated byte-for-byte by oracle/crawler._span_fp."""
    return F.md5(
        F.concat_ws(
            "\x1f",
            F.transform(
                "spans",
                lambda s: F.concat_ws(
                    "\x1e",
                    F.coalesce(s["kind"], F.lit("")),
                    F.coalesce(s["text"], F.lit("")),
                    F.coalesce(s["media_ref"], F.lit("")),
                ),
            ),
        )
    )


def _mine_dust_rules(catalog: SnapshotCatalog, config: "CrawlConfig"):
    """Strippability rules from the docs table at round start (None =
    gate off). The rule relation is dimension-sized (hosts x params)."""
    if not config.dust_gate:
        return None
    from .urlalias import mine_param_rules

    pages = catalog.read("docs").select(
        F.col("doc_id").alias("url"), _span_fingerprint().alias("fp")
    )
    return mine_param_rules(pages, min_support=config.dust_min_support)


def _apply_dust_alias(candidates: DataFrame, dust_rules) -> DataFrame:
    """Rewrite candidate URLs to their DUST alias (None rules = no-op).
    Param stripping never changes the host, so only url_hash needs
    recomputing; the within-batch dedup downstream collapses candidates
    that alias to the same URL (first link_rank wins, as ever)."""
    if dust_rules is None:
        return candidates
    from .urlalias import apply_param_rules

    mapping = apply_param_rules(
        candidates.select("url").distinct(), dust_rules
    ).select("url", "alias_url")
    return (
        candidates.join(mapping, "url", "left")
        .withColumn("url", F.coalesce("alias_url", F.col("url")))
        .drop("alias_url")
        .withColumn("url_hash", F.xxhash64("url"))
    )


def _apply_url_blocklist(candidates: DataFrame, config: "CrawlConfig") -> DataFrame:
    """Drop blocklisted discoveries (CrawlConfig.url_blocklist_*) before
    URL-seen filtering. No-op when both lists are empty."""
    if not (config.url_blocklist_words or config.url_blocklist_domains):
        return candidates
    from .urlfilter import blocklist_keep

    return blocklist_keep(
        candidates,
        list(config.url_blocklist_words),
        list(config.url_blocklist_domains),
        threshold_milli=config.url_blocklist_threshold,
    )


def _next_seq(catalog: SnapshotCatalog, frontier: DataFrame) -> int:
    meta = catalog.snapshot_meta("frontier")
    if "next_seq" in meta:
        return meta["next_seq"]
    row = frontier.agg(F.max("seq").alias("m")).collect()[0]
    return (row["m"] + 1) if row["m"] is not None else 0


def read_hoststats(catalog: SnapshotCatalog) -> DataFrame:
    """Aggregated hoststats view. The table stores append-only per-round
    INCREMENTS — (host, round fetched, n fetched that round) — so a round
    commits O(hosts touched) rows instead of rewriting O(all hosts ever)
    (the full-outer-join rebuild this replaces was a per-round O(hosts)
    write, a scale-killer at web host counts). Both aggregates are
    decomposable (max / sum), so ``commit_delta(compact_agg=...)`` folds
    increments during compaction without changing this view, keeping the
    table O(hosts), not O(hosts x rounds). Reading a legacy full snapshot
    (one row per host) through this aggregate is the identity."""
    return hoststats_agg(catalog.read("hoststats"))


def hoststats_agg(rows: DataFrame) -> DataFrame:
    return rows.groupBy("host").agg(
        F.max("last_fetch_round").alias("last_fetch_round"),
        F.sum("fetched_total").alias("fetched_total"),
    )


def _fetched_total(catalog: SnapshotCatalog, frontier: DataFrame) -> int:
    meta = catalog.snapshot_meta("frontier")
    if "fetched_total" in meta:
        return meta["fetched_total"]
    return frontier.filter(F.col("fetch_order").isNotNull()).count()


def fetch_route_parse(fetcher, batch: DataFrame) -> Optional[DataFrame]:
    """O17+O23+O18-O21 fused into ONE Python stage.

    The unfused pipeline (fetch mapInPandas -> route pandas_udf -> parse
    pandas_udf) moves every HTML body across the JVM<->Python Arrow
    boundary four times and runs three Python-worker stages per round.
    Fusing them composes the fetcher's per-partition frame transformer
    (``fetcher.frame_fn()``) with the routing matrix and the span parser
    inside a single mapInPandas, so bodies live and die inside one Python
    worker and only the parsed result (title/spans/links, kind, location,
    error) ever crosses back. At the bench's 32-thread level the
    fetch+parse family is memory-bandwidth bound; quartering the bytes
    through the boundary attacks exactly that term.

    Returns None when the fetcher predates the frame_fn protocol — the
    caller falls back to the unfused path (identical results; pinned by
    the crawl parity suite).
    """
    if getattr(fetcher, "frame_fn", None) is None:
        return None
    inner = fetcher.frame_fn()
    pass_fields = [f for f in batch.schema.fields if f.name != "url"]
    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            *pass_fields,
            T.StructField("kind", T.StringType()),
            T.StructField("location", T.StringType()),
            T.StructField("error", T.StringType()),
            T.StructField("parsed", PARSED_TYPE),
        ]
    )
    pass_cols = [f.name for f in pass_fields]

    def _run(frames):
        from ..core.fetch import KIND_TEXT, route_response
        from ..functions.udfs import _parse_one

        for got in inner(frames):
            kinds, locs, errs, parsed = [], [], [], []
            for s, ct, b, loc in zip(
                got["status"], got["content_type"], got["body"],
                got["redirect_to"],
            ):
                oc = route_response(
                    int(s) if pd.notna(s) else None, ct, b, loc
                )
                kinds.append(oc.kind)
                locs.append(oc.location)
                errs.append(oc.error)
                if oc.kind == KIND_TEXT:
                    (title, spans, links, noindex, follow,
                     canonical) = _parse_one(oc.body)
                    parsed.append(
                        {
                            "title": title,
                            "spans": spans,
                            "links": links,
                            "noindex": noindex,
                            "follow_links": follow,
                            "canonical": canonical,
                        }
                    )
                else:
                    parsed.append(None)
            out = pd.DataFrame({"url": got["url"].to_numpy()})
            for c in pass_cols:
                out[c] = got[c].to_numpy()
            out["kind"] = kinds
            out["location"] = locs
            out["error"] = errs
            out["parsed"] = parsed
            yield out

    return batch.mapInPandas(_run, schema=out_schema)


def _refresh_robots_rfc(
    catalog: SnapshotCatalog,
    fetcher,
    unvisited: DataFrame,
    config: CrawlConfig,
    round_no: int,
) -> DataFrame:
    """Fetch + parse robots.txt for hosts entering the frontier this round.

    Append-only increment: hosts already in the robots_rfc dimension are
    never refetched (anti-join), so total robots I/O over a crawl's life
    is O(distinct hosts). Robots fetches go through the SAME fetcher as
    pages (one politeness/UA surface) but never touch the frontier, visit
    order, or URL-seen set — a 4xx/absent robots parses to allow-all
    (RFC 9309 §2.3.1.3). Returns (refreshed dimension, this round's
    new-host increment or None) — the increment feeds sitemap seeding."""
    dim = catalog.read("robots_rfc")
    hosts = (
        unvisited.filter(F.col("state") == STATE_UNVISITED)
        .select("host").distinct()
    )
    seen_hosts = dim.select("host").distinct()
    new_hosts = hosts.join(seen_hosts, "host", "left_anti")
    to_fetch_hosts = new_hosts
    if config.robots_ttl_rounds is not None:
        # TTL expiry (RFC 9309 §2.4): refetch hosts whose newest rules row
        # is robots_ttl_rounds old AND that still have unvisited URLs
        stale = hosts.join(
            robots_ops.latest_per_host(dim)
            .filter(
                F.col("fetched_in_round")
                <= round_no - int(config.robots_ttl_rounds)
            )
            .select("host"),
            "host",
            "left_semi",
        )
        to_fetch_hosts = new_hosts.unionByName(stale)
    if to_fetch_hosts.isEmpty():
        return robots_ops.latest_per_host(dim), None
    to_fetch = to_fetch_hosts.select(
        F.concat(F.lit("http://"), F.col("host"), F.lit("/robots.txt")).alias("url"),
        "host",
    )
    fetched = fetcher.fetch(to_fetch)
    inc = robots_ops.robots_dimension(
        fetched.select("host", "status", "body"),
        agent=config.robots_agent,
        round_no=round_no,
    ).localCheckpoint(eager=True)
    catalog.commit_delta(
        "robots_rfc", appended=inc,
        meta={"round": round_no, "op": "robots_refresh"},
    )
    # sitemap seeding keys off genuinely NEW hosts only (oracle parity;
    # the sitemaps_fetched ledger would dedup re-listed sitemaps anyway)
    new_inc = inc.join(seen_hosts, "host", "left_anti").localCheckpoint(
        eager=True
    )
    if new_inc.isEmpty():
        new_inc = None
    return robots_ops.latest_per_host(catalog.read("robots_rfc")), new_inc


# Sitemap-candidate link_rank layout: sorts AFTER every page-link rank
# (page ranks are parent_order << 20 | pos < 2^61), then by (wave,
# sitemap index within wave, loc position) — the pinned enqueue order.
_SITEMAP_RANK_BASE = 1 << 61
_SITEMAP_WAVE_SHIFT = 1 << 50
_SITEMAP_IDX_SHIFT = 1 << 20


def _sitemap_candidates(
    catalog: SnapshotCatalog,
    fetcher,
    rfc_inc: DataFrame,
    config: CrawlConfig,
    round_no: int,
) -> Optional[DataFrame]:
    """Fetch + parse sitemaps declared by this round's new hosts' robots.

    Breadth-first over <sitemapindex> nesting, at most ``sitemap_waves``
    waves; every sitemap URL is fetched at most once over the crawl's life
    (anti-join against the append-only `sitemaps_fetched` ledger — failed
    fetches are recorded too, no retry). Returns the extracted page URLs
    as a candidates frame (abs_link, parent_depth=-1, link_rank) for the
    round's normal canonicalize -> seen-filter -> enqueue tail, or None.

    Scale: waves fire only in rounds that add hosts; each wave's work is
    O(sitemaps this wave) — the per-wave lexicographic index runs over the
    distinct sitemap-URL dimension (dense-seq, distributed), never over
    the extracted page URLs, and the ledger join is an equi-anti-join on
    the sitemap URL."""
    from ..functions.seq import with_dense_sequence

    ledger = catalog.read("sitemaps_fetched").select("url")
    fetched_so_far = ledger
    pending = (
        rfc_inc.select(F.explode("sitemaps").alias("url"))
        .distinct()
        .join(fetched_so_far, "url", "left_anti")
        .localCheckpoint(eager=True)
    )
    cand_frames = []
    ledger_incs = []
    for wave in range(config.sitemap_waves):
        if pending.isEmpty():
            break
        indexed = with_dense_sequence(
            pending, order_cols=["url"], out_col="sm_idx"
        )
        fetched = fetcher.fetch(indexed.select("url")).localCheckpoint(
            eager=True
        )
        parsed = robots_ops.sitemap_seed_urls(
            fetched.filter(
                (F.col("status") == 200) & F.col("body").isNotNull()
            )
        ).join(
            indexed.select(
                F.col("url").alias("source_sitemap"), "sm_idx"
            ),
            "source_sitemap",
        ).localCheckpoint(eager=True)
        rank_base = _SITEMAP_RANK_BASE + wave * _SITEMAP_WAVE_SHIFT
        cand_frames.append(
            parsed.filter(~F.col("is_nested_sitemap")).select(
                F.col("url").alias("abs_link"),
                F.lit(-1).cast("int").alias("parent_depth"),
                (
                    F.lit(rank_base)
                    + F.col("sm_idx") * F.lit(_SITEMAP_IDX_SHIFT)
                    + F.col("pos")
                ).cast("long").alias("link_rank"),
            )
        )
        counts = parsed.groupBy("source_sitemap").agg(
            F.sum(F.when(~F.col("is_nested_sitemap"), 1).otherwise(0))
            .cast("int").alias("n_urls"),
            F.sum(F.when(F.col("is_nested_sitemap"), 1).otherwise(0))
            .cast("int").alias("n_nested"),
        )
        ledger_incs.append(
            indexed.select("url")
            .join(counts.withColumnRenamed("source_sitemap", "url"), "url", "left")
            .select(
                "url",
                F.coalesce("n_urls", F.lit(0)).cast("int").alias("n_urls"),
                F.coalesce("n_nested", F.lit(0)).cast("int").alias("n_nested"),
                F.lit(round_no).cast("int").alias("fetched_in_round"),
            )
        )
        fetched_so_far = fetched_so_far.unionByName(indexed.select("url"))
        pending = (
            parsed.filter(F.col("is_nested_sitemap"))
            .select("url")
            .distinct()
            .join(fetched_so_far, "url", "left_anti")
            .localCheckpoint(eager=True)
        )
    if not ledger_incs:
        return None
    inc = ledger_incs[0]
    for extra in ledger_incs[1:]:
        inc = inc.unionByName(extra)
    catalog.commit_delta(
        "sitemaps_fetched", appended=inc,
        meta={"round": round_no, "op": "sitemap_refresh"},
    )
    out = cand_frames[0]
    for extra in cand_frames[1:]:
        out = out.unionByName(extra)
    return out


def run_round(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    fetcher,
    config: CrawlConfig,
    round_no: int,
) -> RoundMetrics:
    metrics = RoundMetrics(round_no)
    if hasattr(fetcher, "set_round"):
        # round-aware fetchers (PhasedFixtureFetcher): one consistent
        # site per round, for time-dependent behaviors (robots TTL)
        fetcher.set_round(round_no)
    frontier = catalog.read("frontier")
    frontier = frontier_ops.expire_leases(frontier, round_no, config.lease_rounds)

    # state partitions are the storage unit (commit_delta): terminal rows
    # never change, so the robots gate + checkout only touch the mutable
    # unvisited slice — and only that partition is rewritten at commit.
    robots = catalog.read("robots")
    host_rep = None
    if config.reputation_gate:
        from .reputation import host_quality_agg

        host_rep = host_quality_agg(catalog.read("host_quality"))
    dust_rules = _mine_dust_rules(catalog, config)
    unvisited = frontier.filter(F.col("state") == STATE_UNVISITED)
    gated = frontier_ops.robots_block(unvisited, robots)
    rfc_active = False
    sitemap_cands = None
    rfc_dim = None
    if config.robots_rfc:
        rfc_dim, rfc_inc = _refresh_robots_rfc(
            catalog, fetcher, gated, config, round_no
        )
        gated = robots_ops.robots_gate_rfc(gated, rfc_dim)
        rfc_active = True
        if config.use_sitemaps and rfc_inc is not None:
            sitemap_cands = _sitemap_candidates(
                catalog, fetcher, rfc_inc, config, round_no
            )
    newly_blocked = gated.filter(F.col("state") != STATE_UNVISITED)
    still_unvisited = gated.filter(F.col("state") == STATE_UNVISITED)

    hoststats = read_hoststats(catalog)
    host_gap = None
    if rfc_dim is not None and config.honor_crawl_delay:
        host_gap = rfc_dim.filter(F.col("crawl_delay").isNotNull()).select(
            "host",
            F.ceil(
                F.col("crawl_delay") / F.lit(float(config.seconds_per_round))
            ).cast("int").alias("gap_rounds"),
        )
    batch = frontier_ops.checkout(
        still_unvisited, hoststats, round_no, config.host_budget,
        config.min_gap_rounds, host_gap=host_gap,
    )
    # fetch_order is global across rounds for crawl-order parity
    prior_fetches = _fetched_total(catalog, frontier)
    batch = batch.withColumn(
        "fetch_order", F.col("fetch_order") + F.lit(prior_fetches)
    ).localCheckpoint(eager=True)
    metrics.checked_out = batch.count()
    if metrics.checked_out == 0:
        # usually nothing changed, so no frontier commit (the round
        # checkpoint alone records completion) — unless the robots gate
        # just blocked freshly discovered rows, or sitemap seeding just
        # produced new URLs (possible with zero checkout: e.g. every
        # unvisited URL robots-blocked but the robots declared a sitemap),
        # which must still persist so the crawl continues next round.
        unvisited_out = still_unvisited
        new_rows = None
        if sitemap_cands is not None:
            seq_start = _next_seq(catalog, frontier)
            cand = frontier_ops.canonicalize_and_filter(
                sitemap_cands, url_col="abs_link",
                domain_filter=config.domain_filter,
            ).filter(F.col("ingest_status") == "ok").drop("ingest_status")
            cand = _apply_dust_alias(cand, dust_rules)
            cand = _apply_trap_gate(cand, config)
            cand = _apply_url_blocklist(cand, config)
            cand = _apply_reputation_gate(cand, host_rep, config)
            fresh = frontier_ops.dedup_within_batch(
                frontier_ops.seen_filter(cand, frontier), "link_rank"
            )
            new_rows = frontier_ops.as_frontier_rows(
                fresh, depth_col=F.col("parent_depth") + 1,
                round_no=round_no, seq_start=seq_start,
            ).drop("parent_depth", "link_rank").localCheckpoint(eager=True)
            metrics.discovered = new_rows.count()
            unvisited_out = still_unvisited.unionByName(new_rows)
        if metrics.discovered > 0 or (
            (rfc_active or not robots.isEmpty())
            and not newly_blocked.isEmpty()
        ):
            meta = _frontier_meta(round_no, catalog, frontier)
            meta["next_seq"] += metrics.discovered
            catalog.commit_delta(
                "frontier",
                partition_col="state",
                replaced={STATE_UNVISITED: unvisited_out},
                appended=newly_blocked,
                meta=meta,
            )
        if not unvisited_out.isEmpty():
            # all remaining unvisited hosts are gap-blocked this round
            # (possible only under min_gap_rounds > 1 or crawl-delay)
            metrics.gap_waiting = 1
        catalog.commit_round(round_no, {"done": True})
        return metrics

    # ---- fetch + route (O17, O23) -------------------------------------
    # The fetch->parse pipeline is one stage whose cost is per-ROW Python
    # work (I/O + tolerant HTML parse), invisible to AQE's byte-based
    # coalescing: a checked-out batch of bare URLs is a few MB on the
    # wire, so `repartition("host")` alone gets AQE-merged to a handful
    # of tasks and most cores sit idle through the round's heaviest
    # stage (measured: 15 tasks on 32 cores, machine 57% idle, 2x wall
    # regression vs 8 cores). An EXPLICIT partition count is exempt from
    # AQE coalescing; size it to the cluster's task slots so parse
    # parallelism is set by compute, not shuffle bytes. Hash-partitioning
    # by host within that count still keeps a host's URLs together for
    # connection reuse/politeness.
    fetch_parts = config.fetch_partitions or (
        spark.sparkContext.defaultParallelism * 2
    )
    to_fetch = batch.select(
        "url", "url_hash", "host", "depth", "seq", "fetch_order",
        "discovered_in_round",
    ).repartition(fetch_parts, "host")

    archived_fetch = None
    if config.archive_dir is not None:
        # archive mode: materialize raw responses ONCE; the WARC write and
        # the parse both read this checkpoint (no refetch, no second body
        # transfer). This forgoes the fused single-Python-stage path —
        # archiving inherently needs bodies as data.
        import os as _os

        archived_fetch = fetcher.fetch(to_fetch).localCheckpoint(eager=True)
        manifest = warc_sink.write_warc(
            archived_fetch,
            _os.path.join(config.archive_dir, f"round-{round_no:05d}"),
            date="2026-01-01T00:00:00Z",
            n_files=config.archive_files_per_round,
        )
        metrics.archived = int(
            manifest.agg(F.sum("n_records")).collect()[0][0] or 0
        )

    fused = None if archived_fetch is not None else fetch_route_parse(
        fetcher, to_fetch
    )
    if fused is not None:
        parsed = fused.localCheckpoint(eager=True)
    else:
        # unfused fallback for fetchers without frame_fn(): same kernels,
        # three Python stages; bodies dropped before the checkpoint so the
        # round barrier never materializes raw HTML.
        fetched = (
            archived_fetch
            if archived_fetch is not None
            else fetcher.fetch(to_fetch)
        )
        routed = fetched.withColumn(
            "routed",
            route_response_udf(
                F.col("status"), F.col("content_type"), F.col("body"),
                F.col("redirect_to"),
            ),
        ).select(
            "url", "url_hash", "host", "depth", "seq", "fetch_order",
            "discovered_in_round",
            F.col("routed.kind").alias("kind"),
            F.col("routed.body").alias("ok_body"),
            F.col("routed.location").alias("location"),
            F.col("routed.error").alias("error"),
        )
        parsed = routed.withColumn(
            "parsed",
            F.when(F.col("kind") == "text", parse_html_udf(F.col("ok_body"))),
        ).drop("ok_body").localCheckpoint(eager=True)

    # ---- docs upsert (O3) ----------------------------------------------
    text_docs = parsed.filter(F.col("kind") == "text").select(
        F.col("url").alias("doc_id"),
        F.col("parsed.title").alias("title"),
        F.col("parsed.spans").alias("spans"),
        F.lit(round_no).cast("int").alias("fetched_in_round"),
    )
    media_docs = parsed.filter(F.col("kind") == "binary").select(
        F.col("url").alias("doc_id"),
        F.lit(None).cast("string").alias("title"),
        F.array(
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.col("url").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
        F.lit(round_no).cast("int").alias("fetched_in_round"),
    )
    # Each URL is fetched exactly once (unvisited -> terminal, and the
    # URL-seen filter blocks re-enqueue), so docs and postings are pure
    # appends — the existing table is never read or rewritten at commit.
    # No checkpoint here: new_docs derives from the already-checkpointed
    # `parsed` and is consumed by exactly one write job (the docs commit),
    # so a barrier would just add a full extra materialization per round.
    new_docs = text_docs.unionByName(media_docs)

    # ---- postings delta (O3 index maintenance + O10 tf precompute) -----
    # lazy localCheckpoint: materialized by the postings commit's write job,
    # then the word_stats increment reuses the checkpointed blocks instead
    # of re-tokenizing the round's docs (no extra eager barrier).
    if config.meta_robots:
        # noindex pages are stored but never indexed (REP meta layer)
        index_docs = parsed.filter(
            (F.col("kind") == "text")
            & ~F.coalesce(F.col("parsed.noindex"), F.lit(False))
        ).select(
            F.col("url").alias("doc_id"),
            F.col("parsed.title").alias("title"),
            F.col("parsed.spans").alias("spans"),
            F.lit(round_no).cast("int").alias("fetched_in_round"),
        )
    else:
        index_docs = text_docs
    fresh_postings = (
        indexer.postings_from_docs(index_docs).localCheckpoint(eager=False)
        if config.build_index
        else None
    )

    # ---- new links (O22 -> O15 -> O16 -> O2) ----------------------------
    link_field = "parsed.follow_links" if config.meta_robots else "parsed.links"
    page_links = parsed.filter(
        (F.col("kind") == "text") & (F.size(link_field) > 0)
    ).select(
        F.col("url").alias("base_url"),
        F.col("depth").alias("parent_depth"),
        F.col("fetch_order").alias("parent_order"),
        F.posexplode(link_field).alias("link_pos", "raw_link"),
    )
    redirect_links = parsed.filter(
        (F.col("kind") == "redirect") & F.col("location").isNotNull()
    ).select(
        F.col("url").alias("base_url"),
        F.col("depth").alias("parent_depth"),
        F.col("fetch_order").alias("parent_order"),
        F.lit(0).alias("link_pos"),
        F.col("location").alias("raw_link"),
    )
    if config.follow_canonical:
        # canonical target enqueues LAST within the page's discoveries
        # (anchors keep their positions); page metadata, so meta-robots
        # nofollow does not suppress it
        canonical_links = parsed.filter(
            (F.col("kind") == "text") & F.col("parsed.canonical").isNotNull()
        ).select(
            F.col("url").alias("base_url"),
            F.col("depth").alias("parent_depth"),
            F.col("fetch_order").alias("parent_order"),
            F.lit((1 << _LINK_POS_BITS) - 1).alias("link_pos"),
            F.col("parsed.canonical").alias("raw_link"),
        )
        page_links = page_links.unionByName(canonical_links)
    all_links = page_links.unionByName(redirect_links).withColumn(
        # already-absolute links pass through verbatim in the kernel
        # (see_crawler_worker.erl:92, pattern "[^/]+://" searched) — the
        # same rlike keeps the Python resolver off the common case
        "abs_link",
        F.when(
            F.col("raw_link").rlike(r"[^/]+://"), F.col("raw_link")
        ).otherwise(absolute_link_udf(F.col("base_url"), F.col("raw_link"))),
    ).withColumn(
        "link_rank",
        F.shiftleft(F.col("parent_order"), _LINK_POS_BITS) + F.col("link_pos"),
    )
    link_cands = all_links.select("abs_link", "parent_depth", "link_rank")
    if sitemap_cands is not None:
        # sitemap-extracted URLs join the SAME enqueue batch: their
        # link_rank sorts after every page link (rank base 2^61), so
        # first-enqueue-wins dedup and seq assignment need no special case
        link_cands = link_cands.unionByName(sitemap_cands)
    candidates = frontier_ops.canonicalize_and_filter(
        link_cands,
        url_col="abs_link",
        domain_filter=config.domain_filter,
    ).filter(F.col("ingest_status") == "ok").drop("ingest_status")
    candidates = _apply_dust_alias(candidates, dust_rules)
    candidates = _apply_trap_gate(candidates, config)
    candidates = _apply_url_blocklist(candidates, config)
    candidates = _apply_reputation_gate(candidates, host_rep, config)

    seq_start = _next_seq(catalog, frontier)
    # next_seq counts every URL ever enqueued == frontier row count (rows
    # are never deleted), so it is a free frontier-size estimate for the
    # bloom-topology switch.
    sharded = (
        config.use_sharded_bloom
        if config.use_sharded_bloom is not None
        else seq_start >= config.sharded_bloom_min_frontier
    )
    if config.use_bloom and sharded and config.seen_structure == "cuckoo":
        buckets_per_shard = max(
            1 << 10,
            cuckoolib.buckets_for(max(seq_start, 1) // config.bloom_shards + 1),
        )
        shard_tables = cuckoolib.build_cuckoo_shards(
            frontier.select("url_hash"),
            n_shards=config.bloom_shards,
            buckets_per_shard=buckets_per_shard,
        )
        deduped = cuckoolib.seen_filter_sharded_cuckoo(
            candidates, frontier, shard_tables,
            n_shards=config.bloom_shards, buckets_per_shard=buckets_per_shard,
        )
    elif config.use_bloom and sharded:
        bits_per_shard = max(
            1 << 16, bloomlib.bits_for(max(seq_start, 1)) // config.bloom_shards
        )
        shard_bitmaps = bloomlib.build_bloom_shards(
            frontier.select("url_hash"),
            n_shards=config.bloom_shards,
            bits_per_shard=bits_per_shard,
        )
        deduped = bloomlib.seen_filter_sharded(
            candidates, frontier, shard_bitmaps,
            n_shards=config.bloom_shards, bits_per_shard=bits_per_shard,
        )
    elif config.use_bloom:
        bloom = bloomlib.build_bloom(
            frontier.select("url_hash"), n_bits=config.bloom_bits
        )
        deduped = frontier_ops.seen_filter(
            candidates, frontier, bloomlib.maybe_seen_udf(spark, bloom)
        )
    else:
        deduped = frontier_ops.seen_filter(candidates, frontier)
    fresh = frontier_ops.dedup_within_batch(deduped, "link_rank")
    new_rows = frontier_ops.as_frontier_rows(
        fresh,
        depth_col=F.col("parent_depth") + 1,
        round_no=round_no,
        seq_start=seq_start,
    ).drop("parent_depth", "link_rank").localCheckpoint(eager=True)

    # ---- frontier state transitions (terminal rows are append-only) -----
    # parsed carries the checked-out row's full identity, so the terminal
    # row is built directly from the fetch outcome — no join back against
    # the frontier, and the untouched terminal partitions are never read
    # or rewritten (commit_delta carries their files forward).
    terminal = parsed.select(
        "url", "url_hash", "host", "depth", "seq",
        F.when(F.col("kind") == "text", F.lit(STATE_VISITED))
        .when(F.col("kind") == "binary", F.lit(STATE_BINARY))
        .when(F.col("kind") == "redirect", F.lit(STATE_REDIRECT))
        .otherwise(F.lit(STATE_ERROR))
        .alias("state"),
        F.coalesce(
            F.when(
                F.col("kind") == "redirect",
                absolute_link_udf(F.col("url"), F.col("location")),
            ),
            F.col("error"),
        ).alias("detail"),
        "discovered_in_round",
        F.lit(round_no).cast("int").alias("fetched_in_round"),
        "fetch_order",
        F.lit(None).cast("int").alias("checkout_round"),
    )
    unvisited_next = still_unvisited.join(
        batch.select("url_hash"), "url_hash", "left_anti"
    ).unionByName(new_rows)

    # ---- hoststats increments (see read_hoststats: O(hosts touched)
    # append per round, never an O(all hosts) rewrite) ---------------------
    hoststats_inc = (
        parsed.groupBy("host")
        .agg(F.count("*").cast("long").alias("fetched_total"))
        .withColumn("last_fetch_round", F.lit(round_no).cast("int"))
    )

    # ---- metrics + commits (one writer per table per round) -------------
    kinds = {r["kind"]: r["n"] for r in parsed.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    metrics.fetched_text = kinds.get("text", 0)
    metrics.fetched_binary = kinds.get("binary", 0)
    metrics.redirects = kinds.get("redirect", 0)
    metrics.errors = kinds.get("error", 0)
    metrics.discovered = new_rows.count()

    frontier_meta = {
        "round": round_no,
        "next_seq": seq_start + metrics.discovered,
        "fetched_total": prior_fetches + metrics.checked_out,
    }
    # Content tables (docs/postings/word_stats/hoststats — pure appends)
    # commit BEFORE the frontier flips the batch to terminal states: a
    # crash between the two leaves fetched content committed but the URLs
    # still unvisited, and resume_point() rolls every table with round >
    # last-checkpointed back anyway, so replay is clean from either side
    # of the gap. The reverse order had a window where terminal frontier
    # rows (never refetched) existed without their content.
    #
    # The four content commits target INDEPENDENT tables (separate meta
    # files, separate snapshot dirs), so their write jobs run CONCURRENTLY
    # from driver threads — Spark schedules jobs from multiple threads
    # fine, and overlapping them collapses the round's serialized commit
    # tail (a per-round fixed cost that caps N->4N scaling efficiency à la
    # Amdahl; profiled at ~10-20% of round wall at bench sizes). The
    # postings -> word_stats dependency stays ordered inside one thread so
    # the lazy fresh_postings checkpoint is materialized exactly once.
    # The frontier commit joins ALL of them first, keeping the crash
    # invariant; any partially-committed subset rolls back on resume.
    def _commit_docs():
        catalog.commit_delta("docs", appended=new_docs, meta={"round": round_no})

    def _commit_postings():
        if fresh_postings is None:
            return
        # physically bucketed by word hash (the parquet mirror of the
        # Iceberg DDL's bucket(word) partitioning): the search read path
        # opens only the query words' bucket dirs via read_parts. The
        # repartition co-locates each bucket's rows before partitionBy —
        # without it every write task emits up to one file PER bucket
        # (tasks x 64 small files per round); with it the round adds
        # ~one file per bucket.
        catalog.commit_delta(
            "postings",
            partition_col="word_bucket",
            appended=fresh_postings.repartition(F.col("word_bucket")),
            meta={"round": round_no},
        )
        catalog.commit_delta(
            "word_stats",
            partition_col="word_bucket",
            appended=indexer.word_stats_increment(
                fresh_postings
            ).repartition(F.col("word_bucket")),
            meta={"round": round_no},
            # sum is decomposable: folding increments at compaction keeps
            # the table O(vocabulary) without changing the summed read
            # (word_bucket is functional on word, so grouping by both
            # preserves it through the fold)
            compact_agg=lambda df: df.groupBy("word", "word_bucket").agg(
                F.sum("df").alias("df")
            ),
        )
        # corpus-length scalars (avgdl for BM25-family ranking): same
        # append-only delta pattern — the read path sums O(rounds) rows
        # instead of ever aggregating the postings table per query
        catalog.commit_delta(
            "corpus_stats",
            appended=indexer.corpus_stats_increment(
                fresh_postings
            ).unionByName(indexer.title_stats_increment(index_docs)),
            meta={"round": round_no},
            compact_agg=lambda df: df.groupBy("field").agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("sum_len").alias("sum_len"),
            ),
        )

    def _commit_host_quality():
        if not config.reputation_gate:
            return
        from .reputation import (
            doc_quality_milli,
            host_quality_agg,
            host_quality_stats,
        )

        qdocs = parsed.filter(F.col("kind") == "text").select(
            F.col("url").alias("doc_id"),
            "host",
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("parsed.spans"), lambda sp: sp["kind"] == "text"
                    ),
                    lambda sp: sp["text"],
                ),
                " ",
            ).alias("text"),
        )
        catalog.commit_delta(
            "host_quality",
            appended=host_quality_stats(doc_quality_milli(qdocs)),
            meta={"round": round_no},
            compact_agg=host_quality_agg,
        )

    def _commit_hoststats():
        catalog.commit_delta(
            "hoststats",
            appended=hoststats_inc,
            meta={"round": round_no},
            compact_agg=hoststats_agg,
        )

    def _commit_canonical():
        if not config.follow_canonical:
            return
        ledger = all_links.where(
            F.col("link_pos") == (1 << _LINK_POS_BITS) - 1
        ).select(
            F.col("base_url").alias("url"),
            F.col("abs_link").alias("canonical"),
            F.lit(round_no).cast("int").alias("declared_in_round"),
        )
        catalog.commit_delta(
            "canonical_aliases", appended=ledger, meta={"round": round_no}
        )

    with ThreadPoolExecutor(max_workers=5) as pool:
        futures = [
            pool.submit(fn)
            for fn in (
                _commit_docs, _commit_postings, _commit_hoststats,
                _commit_host_quality, _commit_canonical,
            )
        ]
        for fut in futures:
            fut.result()  # re-raise any commit failure BEFORE the flip
    catalog.commit_delta(
        "frontier",
        partition_col="state",
        replaced={STATE_UNVISITED: unvisited_next},
        appended=terminal.unionByName(newly_blocked),
        meta=frontier_meta,
    )
    catalog.commit_round(round_no, {"metrics": metrics.__dict__})
    metrics.frontier_size = None  # filled by caller if wanted
    return metrics


def run_crawl(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    fetcher,
    config: CrawlConfig,
    seeds: Optional[list] = None,
    robots: Optional[dict] = None,
) -> list:
    """Full crawl loop; resumable. Returns per-round metrics."""
    if robots:
        rows = [(h, list(p), -1) for h, p in robots.items()]
        catalog.commit(
            "robots",
            spark.createDataFrame(rows, ROBOTS_SCHEMA),
            {"round": -1},
        )
    if seeds:
        ingest_seeds(spark, catalog, seeds, config).collect()
    start_round = catalog.resume_point()
    history = []
    for round_no in range(start_round, config.max_rounds):
        metrics = run_round(spark, catalog, fetcher, config, round_no)
        history.append(metrics)
        # a zero-checkout round that still DISCOVERED URLs (sitemap seeding
        # under a fully-blocked frontier) or that is an idle politeness
        # WAIT (every unvisited host inside its gap) must not end the crawl
        if (
            metrics.checked_out == 0
            and not metrics.discovered
            and not metrics.gap_waiting
        ):
            break
    return history


def _frontier_meta(round_no: int, catalog: SnapshotCatalog, frontier: DataFrame) -> dict:
    return {
        "round": round_no,
        "next_seq": _next_seq(catalog, frontier),
        "fetched_total": _fetched_total(catalog, frontier),
    }
