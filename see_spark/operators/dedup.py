"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's URL-level dedup (O2), these are content-level
dedup strategies over a document corpus — first-class engine capabilities
for the 100 TB design point:

- exact dedup: hash-groupBy on the full text (one shuffle, map-side combine)
- n-gram Jaccard: shingle self-join (bounded by shingle frequency cap)
- MinHash + LSH: signature via k universal hashes over shingle hashes;
  banding turns all-pairs into an equi-join on (band, band_hash) buckets —
  the only strategy that survives 10^9+ docs
- SimHash: weighted bit-vote fingerprint, hamming-adjacent buckets
- embedding cosine near-dup: exact all-pairs (small) — the LSH-bucketed
  scale path lives in operators/similarity.py

Determinism: every hash derives from md5(text) hex (identical in Spark and
DuckDB), so each operator has an exact SQL oracle. 60-bit hash =
conv(substr(md5(x),1,15),16,10); MinHash uses (a*h+b) mod p with
p = 2^31-1 and h,a,b < 2^31 so products fit in a signed 64-bit integer in
BOTH engines (no silent overflow divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1


def hash60(col):
    """60-bit deterministic hash shared bit-for-bit with the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) groupBy; canonical = min(doc_id).
    Returns (doc_id, text_hash, group_size, is_canonical)."""
    hashed = docs.select(F.col(id_col).alias("doc_id"), F.md5(text_col).alias("text_hash"))
    w = Window.partitionBy("text_hash")
    return (
        hashed.withColumn("group_size", F.count("*").over(w))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_canonical", (F.col("doc_id") == F.col("canonical_id")).cast("int"))
        .select("doc_id", "text_hash", "group_size", "is_canonical")
    )


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle): distinct n-word shingles by whitespace tokens.
    Built JVM-side: split -> transform(sequence) -> explode; no UDF."""
    toks = F.split(F.col(text_col), " ")
    # docs shorter than n words yield one (short) shingle — sequence bound
    # clamps at 0 so the index list never goes negative/descending
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles).alias("shingle")
    ).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8,
    text_col: str = "text", id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs with n-gram Jaccard >= threshold.

    Self-join on shingle; |A ∪ B| = |A| + |B| - |A ∩ B|. The join fan-out
    per shingle is its document frequency SQUARED, so one boilerplate
    shingle shared by 10^6 docs would emit 10^12 join rows —
    ``max_shingle_df`` drops shingles whose df exceeds the cap before the
    join (and from the sizes, so Jaccard is computed consistently over the
    capped shingle vocabulary — the standard stop-shingle cut). With the
    cap, per-key fan-out is bounded by max_shingle_df^2 regardless of
    corpus skew. None = exact over all shingles (the oracle-checked
    default at sandbox scale).
    """
    sh = word_shingles(docs, n, text_col, id_col)
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_seeds(num_hashes: int) -> list:
    """Deterministic (a, b) with 0 < a,b < 2^31-1 — same closed form the
    oracle SQL generates with range()."""
    return [
        (
            (1103515245 * (i + 1) + 12345) % MERSENNE31 + 1,
            (i * 7919 + 13) % MERSENNE31,
        )
        for i in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 32, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, seed_id, minhash): MinHash signature rows.

    h(shingle) reduced mod 2^31-1, then k universal hashes (a*h+b) mod p.
    The k mins are computed as k parallel min-aggregates over projected
    columns of the ONE shingle row — no shingles x seeds row blow-up, no
    crossJoin; the shuffle carries one k-wide row per doc per map
    partition (map-side combine). The (doc_id, seed_id, minhash) row shape
    is restored afterwards by exploding |docs| x k rows (tiny)."""
    sh = word_shingles(docs, n, text_col, id_col).withColumn(
        "h", hash60(F.col("shingle")) % MERSENNE31
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE31).alias(f"m{i}")
        for i, (a, b) in enumerate(_minhash_seeds(num_hashes))
    ]
    wide = sh.groupBy("doc_id").agg(*mins)
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{i}") for i in range(num_hashes)])),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("seed_id"),
        F.col("col").alias("minhash"),
    )


def lsh_candidates(
    docs: DataFrame, num_hashes: int = 32, bands: int = 8, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs from MinHash banding — the
    pre-verification bucket join ``minhash_lsh_pairs`` verifies. Exposed
    separately so ``lsh_eval`` can audit candidate efficiency."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    band_keys = (
        sig.withColumn("band", (F.col("seed_id") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seed_id", "minhash"))
                        ),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_key")
        )
    )
    return (
        band_keys.alias("a")
        .join(band_keys.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 32, bands: int = 8, n: int = 3,
    threshold: float = 0.5, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate pairs verified by exact Jaccard.

    Band key = md5 of the band's ordered minhash values; docs sharing any
    band bucket become candidates (equi-join on (band, key) — THE scalable
    move: no all-pairs). Candidates are then verified with exact shingle
    Jaccard so false positives never escape.
    """
    cands = lsh_candidates(docs, num_hashes, bands, n, text_col, id_col)
    # verify ONLY the candidate pairs (the whole point of LSH): intersect
    # the two docs' shingle sets via two joins pinned to the candidate list,
    # never the all-pairs shingle self-join.
    sh = word_shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cands.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])  # equi-join: shingle in BOTH docs
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    docs: DataFrame, num_bits: int = 48,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simhash): weighted bit-vote fingerprint.

    Token-frequency-weighted votes per bit of the token's 60-bit hash;
    bit set iff the vote sum is positive. 48 bits so the assembled
    fingerprint stays well inside a signed 64-bit int in both engines.
    Shape: ONE groupBy (doc_id, tok) for counts, then the 48 bit-votes as
    48 parallel sum-aggregates over projected columns of the same row —
    no tokens x bits row blow-up, one map-side-combinable shuffle; the
    fingerprint assembles in a final projection.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    hashed = toks.withColumn("h", hash60(F.col("tok")))
    votes = [
        F.sum(F.expr(f"((shiftright(h, {b}) % 2) * 2 - 1) * cnt")).alias(f"v{b}")
        for b in range(num_bits)
    ]
    wide = hashed.groupBy("doc_id").agg(*votes)
    fingerprint = None
    for b in range(num_bits):
        bit = F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return wide.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, num_bits: int = 48,
    bands: int | None = None,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — EXACT at scale.

    Banding with the pigeonhole guarantee: split the ``num_bits``
    fingerprint into ``bands`` equal slices (default ``max_hamming + 1``).
    Two fingerprints within Hamming ``max_hamming`` differ in at most
    ``max_hamming`` bits, so with ``bands > max_hamming`` at least one
    slice is IDENTICAL — candidates sharing any band slice (equi-join on
    (band, slice value), never all-pairs) have 100% recall, and the
    bit_count(xor) verification keeps precision exact. The same
    banding-then-verify shape as MinHash-LSH but with a recall proof
    instead of a probability.

    Returns (doc_a, doc_b, hamming).
    """
    if bands is None:
        bands = max_hamming + 1
    if num_bits % bands:
        raise ValueError("num_bits must divide evenly into bands")
    bandw = num_bits // bands
    mask = (1 << bandw) - 1
    fp = simhash(docs, num_bits, text_col, id_col)
    slices = F.array(*[
        F.shiftright(F.col("simhash"), b * bandw).bitwiseAND(F.lit(mask))
        for b in range(bands)
    ])
    banded = fp.select(
        "doc_id", "simhash",
        F.posexplode(slices).alias("band", "band_key"),
    )
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame, threshold: float = 0.95,
    n_planes: int = 6, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed cosine near-dup pairs — the scale path for
    ``embedding_near_dup_pairs``: candidates are only pairs sharing a
    sign-bit hyperplane bucket (equi-join on bucket, never all-pairs), so
    the corpus shuffles once by bucket and per-bucket fan-out is ~N/2^b.
    Recall < 1 by design (near-dups that straddle a hyperplane are
    missed); the all-pairs variant is the exact baseline. The bucketing
    uses the deterministic integer hyperplanes of
    ``similarity.lsh_bucket``, so with integer-quantized vectors the
    bucket ids — and therefore the result — are bit-exact in any engine.
    """
    from .similarity import lsh_bucket

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    e = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", lsh_bucket(F.col("vec"), n_planes, dim)).withColumn(
        "norm", F.sqrt(dot(F.col("vec"), F.col("vec")))
    )
    pairs = (
        e.alias("a")
        .join(e.alias("b"), "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            (dot(F.col("a.vec"), F.col("b.vec"))
             / (F.col("a.norm") * F.col("b.norm"))).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs (all-pairs — correctness baseline; the
    LSH-bucketed scale path is similarity.knn_lsh_bucketed)."""
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    e = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn("norm", F.sqrt(dot(F.col("vec"), F.col("vec"))))
    pairs = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            (dot(F.col("a.vec"), F.col("b.vec"))
             / (F.col("a.norm") * F.col("b.norm"))).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected edge list — the operator
    that turns near-dup PAIRS into duplicate CLUSTERS.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014): each phase is one
    groupBy-min plus one join back (two shuffles), intermediate edge
    count never exceeds the input, and the round count is O(log^2 n) on
    ANY graph shape — plain min-label propagation needs O(diameter)
    rounds, fine for near-dup cliques but pathological for chain-shaped
    graphs at 10^10 nodes. Convergence is detected with a count+checksum
    aggregate (never a driver-side collect of rows); each round is
    localCheckpoint'ed so the iterative plan does not grow.

    Returns (node, component) for every node incident to a non-self-loop
    edge, component = the minimum node id in the component. Deterministic
    at any parallelism.
    """
    def canon(df, a, b):
        # undirected canonical form: (u < v), self-loops dropped
        return (
            df.filter(F.col(a) != F.col(b))
            .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
            .distinct()
        )

    cur = canon(
        edges.select(
            F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
        ),
        "a", "b",
    ).localCheckpoint(eager=True)

    def signature(df):
        # one cheap aggregate: (edge count, order-insensitive hash sum).
        # pmod bounds each term so the sum stays inside a long even at
        # 10^10+ edges under ANSI arithmetic.
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1_000_003))),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = signature(cur)
    for _ in range(max_iter):
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: connect every strictly-larger neighbor of u to
        # min(N(u) ∪ {u})
        lmin = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", F.col("u")).alias("m")
        )
        large = canon(
            sym.join(lmin, "u").filter(F.col("v") > F.col("u")),
            "v", "m",
        )
        # small-star: orient edges larger→smaller; connect each smaller
        # neighbor AND u itself to the minimum neighbor
        oriented = large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        smin = oriented.groupBy("u").agg(F.min("v").alias("m"))
        nxt = canon(
            oriented.join(smin, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(smin.select(F.col("u").alias("a"), F.col("m").alias("b"))),
            "a", "b",
        ).localCheckpoint(eager=True)
        nsig = signature(nxt)
        cur = nxt
        if nsig == sig:  # fixpoint: edges form stars rooted at minima
            break
        sig = nsig
    members = cur.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = cur.select(
        F.col("u").alias("node"), F.col("u").alias("component")
    ).distinct()
    return members.union(roots)


def dedup_clusters(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3,
    threshold: float = 0.5, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-LSH verified pairs → connected
    components → one canonical doc (min id) per cluster.

    This is the step a training-data pipeline actually runs after pair
    finding — keep `is_canonical = 1`, drop the rest. Singleton docs keep
    their own id as cluster_id. Columns: (doc_id, cluster_id,
    cluster_size, is_canonical) — all scalars (driver-gate rule: no
    ArrayType in gated results).
    """
    pairs = minhash_lsh_pairs(
        docs, num_hashes, bands, n, threshold, text_col, id_col
    )
    comp = connected_components(pairs, "doc_a", "doc_b").withColumnRenamed(
        "node", "doc_id"
    )
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    labeled = (
        base.join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        labeled.join(sizes, "cluster_id")
        .select(
            "doc_id", "cluster_id", "cluster_size",
            (F.col("doc_id") == F.col("cluster_id"))
            .cast("long").alias("is_canonical"),
        )
    )


def exact_substring_stats(
    docs: DataFrame, window: int = 10,
    text_col: str = "text", id_col: str = "doc_id",
    prescreen_bits: int | None = None,
) -> DataFrame:
    """Exact-substring duplication audit (the ExactSubstr shape of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models Better"):
    mark every token position whose `window`-token sliding window occurs
    more than once ANYWHERE in the corpus (cross-doc or self-repetition),
    merge overlapping/adjacent duplicated windows into ranges, and report
    per-doc totals.

    The paper builds a corpus-wide suffix array; the Spark-native
    equivalent is a sliding window-hash join — same duplicated-span
    semantics at fixed minimum match length `window`, expressed as three
    shuffles that all carry fixed-width integer payloads:

    1. explode ~n_tokens window rows per doc, but ONLY (doc_id, pos,
       hash60(window_text)) — 24 B/row at 100 TB, never the text;
    2. groupBy(hash) count (map-side combinable) → the >1 dup set,
       left-semi joined back on the 8-byte hash;
    3. per-doc island merge: lag + cumsum over (doc_id, pos), one
       doc_id-keyed shuffle; positions p and q (p<q) merge iff
       q <= p + window (their coverage [p,p+w) and [q,q+w) overlaps or
       touches).

    Returns one row per input doc — (doc_id, n_tokens, dup_tokens,
    n_dup_ranges), all integers (exact across engines); dup_tokens is the
    size of the union of duplicated-window coverage, the quantity the
    paper's dedup step would cut.

    ``prescreen_bits``: optional scale knob for corpora whose
    DISTINCT-window count per mapper is itself too large a shuffle (the
    post-combine size of step 2). When set, a first-pass count on the
    NARROW key ``h % 2^bits`` — whose post-combine size is bounded by
    2^bits rows per mapper no matter the corpus — screens windows first:
    a window whose narrow-key count is 1 cannot be a duplicate (no false
    negatives, the counting-filter property), and narrow-key collisions
    are false positives the exact full-hash count then removes, so the
    OUTPUT IS IDENTICAL with or without prescreening (pinned by test).
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    wins = (
        toks.filter(F.size("t") >= window)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - window + 1)
            ).alias("p"),
            "t",
        )
        .select(
            "doc_id",
            "p",
            hash60(F.array_join(F.slice("t", F.col("p"), window), " ")).alias("h"),
        )
    )
    if prescreen_bits:
        narrowed = wins.withColumn("h2", F.col("h") % (1 << prescreen_bits))
        dup_narrow = (
            narrowed.groupBy("h2").count()
            .filter(F.col("count") > 1).select("h2")
        )
        wins = narrowed.join(dup_narrow, "h2", "left_semi").drop("h2")
    dup_hashes = wins.groupBy("h").count().filter(F.col("count") > 1).select("h")
    wdup = wins.join(dup_hashes, "h", "left_semi")
    order = Window.partitionBy("doc_id").orderBy("p")
    islands = (
        wdup.withColumn("prev", F.lag("p").over(order))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("p") > F.col("prev") + window), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(order))
    )
    ranges = islands.groupBy("doc_id", "island").agg(
        F.min("p").alias("fp"), F.max("p").alias("lp")
    )
    per_doc = ranges.groupBy("doc_id").agg(
        F.sum(F.col("lp") - F.col("fp") + window).cast("long").alias("dup_tokens"),
        F.count("*").cast("long").alias("n_dup_ranges"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("n_dup_ranges", F.lit(0)).cast("long").alias("n_dup_ranges"),
    )


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    train_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering then within-cluster cosine.

    The method's scale point: instead of the O(N^2) cosine matrix, cluster
    the corpus into k cells (reusing ``similarity.ivf_train_centroids`` —
    deterministic first-N init + Lloyd refinement, exact rational means on
    integer-quantized vectors) and compare only WITHIN a cell — an
    equi-join on centroid_id, so candidate fan-out is ~(N/k)^2 per cell
    and the corpus shuffles once by centroid. A document is a semantic
    duplicate iff some same-cluster document with a SMALLER id has cosine
    >= threshold (min-id canonical — the same deterministic keep rule as
    ``exact_dedup``; the paper keeps the point farthest from the centroid,
    any pinned rule gives the paper's dedup rate).

    Returns one row per vector: (vec_id, centroid_id, keep) with keep in
    {1, 0} — 1 = retained in the deduplicated corpus. With milli-quantized
    vectors (the engine's vector-oracle convention) every arithmetic step
    is bit-exact in any engine, so the operator has an exact SQL oracle.
    """
    from .similarity import ivf_assign, ivf_train_centroids

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    cents = ivf_train_centroids(e, n_clusters, iters=train_iters)
    assigned = ivf_assign(e, cents, nprobe=1).select("vec_id", "vec", "centroid_id")
    a = assigned.withColumn("norm", F.sqrt(dot(F.col("vec"), F.col("vec"))))
    dups = (
        a.alias("x")
        .join(a.alias("y"), "centroid_id")
        .filter(F.col("x.vec_id") > F.col("y.vec_id"))
        .withColumn(
            "cosine",
            dot(F.col("x.vec"), F.col("y.vec")) / (F.col("x.norm") * F.col("y.norm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("x.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dups.withColumn("__dup", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.when(F.col("__dup").isNull(), 1).otherwise(0).cast("long").alias("keep"),
        )
    )


def elect_canonical(
    members: DataFrame,
    scores: DataFrame,
    score_col: str = "q_milli",
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Quality-aware canonical election for duplicate clusters: instead
    of min-id (the exact_dedup / dedup_clusters default), keep the
    HIGHEST-scoring member of each cluster (score desc, doc_id asc ties)
    — the curation pipelines' "best of cluster wins" rule, so dedup
    never throws away the cleanest copy of a page.

    ``members``: (doc_id, cluster_id) from any cluster producer;
    ``scores``: (doc_id, score_col) from any scorer (e.g.
    reputation.doc_quality_milli). Returns (cluster_id, doc_id, score,
    is_kept). One doc_id-keyed join plus one window over cluster rows —
    cluster cardinality is the dup-group size, never the corpus."""
    joined = members.select(
        F.col(cluster_col).alias("cluster_id"), F.col(id_col).alias("doc_id")
    ).join(
        scores.select(
            F.col(id_col).alias("doc_id"),
            F.col(score_col).cast("long").alias("score"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return joined.withColumn(
        "is_kept",
        (F.row_number().over(w) == 1).cast("long"),
    ).select("cluster_id", "doc_id", "score", "is_kept")


def lsh_eval(
    docs: DataFrame, num_hashes: int = 32, bands: int = 8, n: int = 3,
    threshold: float = 0.5, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """One-row quality audit of the MinHash-LSH banding vs exact
    all-pairs Jaccard at the same threshold — the measurement that
    justifies (or rejects) a (num_hashes, bands) configuration before
    pointing it at 100 TB.

    Because ``minhash_lsh_pairs`` verifies candidates with exact Jaccard,
    its output precision is 1.0 by construction; the two numbers that
    actually vary are

      recall_milli              — found / exact true pairs (banding can
                                  MISS pairs whose signatures never agree
                                  on a full band),
      candidate_precision_milli — found / candidates (how much of the
                                  verification work was wasted on false
                                  bucket collisions).

    Integer milli division (exact ``div``). This is an OFFLINE audit run
    at fixture scale — the exact all-pairs side is the O(df²) join the
    banded path exists to avoid, so never run it on the full corpus.
    """
    exact = ngram_jaccard_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, id_col=id_col
    )
    cands = lsh_candidates(docs, num_hashes, bands, n, text_col, id_col)
    found = minhash_lsh_pairs(
        docs, num_hashes=num_hashes, bands=bands, n=n, threshold=threshold,
        text_col=text_col, id_col=id_col,
    )
    n_exact = exact.agg(F.count("*").cast("long").alias("n_exact"))
    n_cands = cands.agg(F.count("*").cast("long").alias("n_candidates"))
    n_found = found.agg(F.count("*").cast("long").alias("n_found"))
    return (
        n_exact.crossJoin(n_cands)
        .crossJoin(n_found)
        .select(
            "n_exact",
            "n_candidates",
            "n_found",
            F.expr("(n_found * 1000) div n_exact").alias("recall_milli"),
            F.expr("(n_found * 1000) div n_candidates")
            .alias("candidate_precision_milli"),
        )
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    key_col: str,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sorted-neighborhood dedup blocking (Hernández & Stolfo 1995
    merge/purge): sort the corpus by a blocking key, slide a window of
    ``window`` rows, and verify ONLY pairs that fall inside a window —
    the third classic blocking family next to LSH banding
    (minhash_lsh_pairs) and shingle-df-capped shingle joins
    (ngram_jaccard_pairs). Where LSH recall depends on banding
    probability, SNM recall depends on the key: near-duplicates whose
    keys sort adjacently are always compared.

    Distributed shape: the global sort rank comes from
    ``seq.with_dense_sequence`` (range partition + per-partition offsets
    — never a single-partition window), and the slide is ``window−1``
    EQUI-joins on rank+j (never an inequality/range join), so window
    pairs that span range-partition boundaries are found by the join —
    the classic SNM parallelization pitfall handled by construction.
    Verification computes exact distinct-token Jaccard per candidate
    (two bounded joins through the token key; cost O(pairs·doc_len),
    never corpus-quadratic).

    Returns (a, b, key_a, key_b, inter, size_a, size_b, jaccard_milli)
    for every in-window candidate pair, a < b by sort rank. Tokens are
    single-space splits of ``text_col`` (engine-portable; swap in the
    tokenizer upstream if needed).
    """
    from ..functions.seq import with_dense_sequence

    keyed = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(key_col).alias("key"),
    )
    ranked = with_dense_sequence(keyed, ["key", "id"], out_col="rank")
    ranked = ranked.localCheckpoint(eager=False)
    left = ranked.select(
        F.col("id").alias("a"), F.col("key").alias("key_a"), "rank"
    )
    shifted = None
    for j in range(1, int(window)):
        r = ranked.select(
            F.col("id").alias("b"),
            F.col("key").alias("key_b"),
            (F.col("rank") - F.lit(j)).alias("rank"),
        )
        part = left.join(r, "rank").drop("rank")
        shifted = part if shifted is None else shifted.unionByName(part)
    toks = (
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = toks.groupBy("id").agg(F.count("*").cast("long").alias("sz"))
    inter = (
        shifted.join(
            toks.select(F.col("id").alias("a"), "word"), "a"
        )
        .join(toks.select(F.col("id").alias("b"), "word"), ["b", "word"])
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        shifted.join(inter, ["a", "b"], "left")
        .join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("size_a")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("size_b")), "b")
        .select(
            "a",
            "b",
            "key_a",
            "key_b",
            F.coalesce("inter", F.lit(0)).cast("long").alias("inter"),
            "size_a",
            "size_b",
            F.expr(
                "coalesce(inter, 0) * 1000"
                " div (size_a + size_b - coalesce(inter, 0))"
            )
            .cast("long")
            .alias("jaccard_milli"),
        )
    )
    return out


def lsh_p_expr(bands: int, rows: int, var: str) -> str:
    """SQL text of the MinHash-LSH s-curve P(detect) = 1 − (1 − s^r)^b
    for s = ``var``/1000.0 — built as EXPLICIT left-associated
    multiplication chains (never pow()), so Spark and any ANSI engine
    parse the identical expression and produce bit-identical doubles.
    Shared by the operator and its oracle."""
    # cast first: Spark parses a bare 1000.0 literal as DECIMAL, DuckDB
    # as DOUBLE — casting the operand pins both engines to double math
    s = f"(cast({var} as double) / 1000.0)"
    sr = s
    for _ in range(rows - 1):
        sr = f"({sr} * {s})"
    q = f"(1.0 - {sr})"
    qb = q
    for _ in range(bands - 1):
        qb = f"({qb} * {q})"
    return f"(1.0 - {qb})"


def lsh_recall_curve(
    sims: DataFrame,
    num_hashes: int = 16,
    sim_col: str = "jaccard_milli",
) -> DataFrame:
    """LSH parameter planner (the banding s-curve, Leskovec/Rajaraman/
    Ullman MMDS ch.3) evaluated against the corpus's OWN similarity
    distribution: for every (bands, rows) split of the signature, the
    detection probability P = 1 − (1 − s^r)^b at each observed integer
    similarity level. This is how a pipeline owner picks banding before
    a 10^10-doc run — from the measured near-dup profile of a sample,
    not from a textbook threshold.

    Input: one row per verified pair with integer milli similarity
    ``sim_col`` (exact, so grouping is exact). Output one row per
    (config, similarity level): (bands, rows_per_band, jaccard_milli,
    n_pairs, p_detect) with p rounded to 9dp — expected recall for a
    config = Σ n_pairs·p / Σ n_pairs, exactly derivable downstream.

    Scale: one combinable aggregate over the similarity level (≤1001
    groups), then a constant-size projection per config.
    """
    configs = [
        (b, num_hashes // b)
        for b in (1, 2, 4, 8, 16, 32)
        if b <= num_hashes and num_hashes % b == 0
    ]
    base = sims.groupBy(F.col(sim_col).cast("long").alias("jaccard_milli")).agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    base = base.localCheckpoint(eager=False)
    out = None
    for b, r in configs:
        row = base.select(
            F.lit(b).cast("long").alias("bands"),
            F.lit(r).cast("long").alias("rows_per_band"),
            "jaccard_milli",
            "n_pairs",
            F.round(F.expr(lsh_p_expr(b, r, "jaccard_milli")), 9).alias(
                "p_detect"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


def containment_pairs(
    new_docs: DataFrame,
    old_docs: DataFrame,
    n: int = 3,
    threshold_milli: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC containment (Broder 1997's second resemblance measure):
    c(A, B) = |S(A) ∩ S(B)| / |S(A)| — how much of NEW document A is
    already inside OLD document B. The incremental-crawl novelty test
    Jaccard gets wrong: a short quote-page embedded in a long article
    has low Jaccard (sizes differ) but containment ≈ 1, and it's
    containment that decides "nothing new here, skip reindexing".

    Same scale shape as ngram_jaccard_pairs — shingle equi-join with the
    optional stop-shingle df cap bounding fan-out — but across TWO
    relations (new × old), and normalized by the new side only.

    Returns (new_id, old_id, inter, size_new, containment_milli) for
    pairs ≥ ``threshold_milli``.
    """
    sh_new = word_shingles(new_docs, n, text_col, id_col).select(
        F.col("doc_id").alias("new_id"), "shingle"
    )
    sh_old = word_shingles(old_docs, n, text_col, id_col).select(
        F.col("doc_id").alias("old_id"), "shingle"
    )
    if max_shingle_df is not None:
        df_all = (
            sh_new.select("shingle")
            .unionAll(sh_old.select("shingle"))
            .groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_shingle_df)
            .select("shingle")
        )
        sh_new = sh_new.join(df_all, "shingle")
        sh_old = sh_old.join(df_all, "shingle")
    sizes = sh_new.groupBy("new_id").agg(
        F.count("*").cast("long").alias("size_new")
    )
    inter = (
        sh_new.join(sh_old, "shingle")
        .groupBy("new_id", "old_id")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    return (
        inter.join(sizes, "new_id")
        .withColumn(
            "containment_milli",
            F.expr("inter * 1000 div size_new").cast("long"),
        )
        .where(F.col("containment_milli") >= F.lit(int(threshold_milli)))
        .select("new_id", "old_id", "inter", "size_new", "containment_milli")
    )
