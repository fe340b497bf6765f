"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline, one crossJoin + windowed
  rank — correct at any scale that can afford |Q| x |N| work (queries are
  broadcast, so the big side never shuffles);
- LSH-bucketed ANN: sign-bit bucketing with deterministic integer-weight
  hyperplanes; candidates only within the query's bucket (+ optional
  multi-probe neighbors) — the 10^9-vector scale path. Recall is traded for
  the crossJoin disappearing into an equi-join on bucket.

Dot products run JVM-side via zip_with/aggregate (whole-stage codegen),
not Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan shape: broadcast(queries) nested-loop against the corpus — the
    corpus scan never shuffles; per-partition partial top-k then the final
    window only sees |Q| x k x P rows. Tie-break pinned (cosine desc,
    vec_id asc) for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        ).withColumn("qnorm", _norm(F.col("qvec")))
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("vnorm", _norm(F.col("vec")))
    scored = q.crossJoin(e).select(
        "query_id",
        "vec_id",
        (_dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_plane_weight(i, j):
    """Deterministic integer hyperplane weight in {-1, 0, 1} for element i
    of plane j — pure integer arithmetic so any engine reproduces the
    bucketing bit-for-bit (no libm divergence)."""
    return ((i + 1) * (j + 7) % 3) - 1


def lsh_bucket(vec_col, n_planes: int, dim: int):
    """Bucket id = sign bits of <vec, plane_j> packed into an int."""
    acc = F.lit(0).cast("long")
    for j in range(n_planes):
        weights = [lsh_plane_weight(i, j) for i in range(dim)]
        proj = F.lit(0.0)
        for i, w in enumerate(weights):
            if w:
                proj = proj + F.element_at(vec_col, i + 1).cast("double") * F.lit(float(w))
        acc = acc + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return acc


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (tie-break pinned: cosine desc, centroid_id asc). Centroids are a tiny
    broadcast dimension, so assignment is a map-side nested loop — the big
    side never shuffles until the window, which AQE coalesces."""
    c = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col("cvec")
        ).withColumn("cnorm", _norm(F.col("cvec")))
    )
    scored = (
        vectors.withColumn("__vnorm", _norm(F.col(vec_col)))
        .crossJoin(c)
        .withColumn(
            "centroid_cosine",
            _dot(F.col(vec_col), F.col("cvec")) / (F.col("__vnorm") * F.col("cnorm")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("centroid_cosine"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("__cr", F.row_number().over(w))
        .filter(F.col("__cr") <= nprobe)
        .drop("cvec", "cnorm", "__vnorm", "__cr")
    )


def ivf_train_centroids(
    vectors: DataFrame,
    n_centroids: int,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Deterministic Lloyd (k-means) refinement for the IVF coarse
    quantizer. Init = the first ``n_centroids`` vectors by id (a
    deterministic seed, no RNG); each iteration assigns every vector to
    its nearest centroid by cosine (pinned tie-break) and moves each
    centroid to its members' element-wise mean; an emptied cluster keeps
    its previous position.

    Determinism across engines/summation orders: with integer-quantized
    inputs (the engine's vector-oracle convention, ``_qvecs``) the mean is
    an exact rational — integer SUM (order-independent) / COUNT — so the
    DuckDB oracle reproduces the centroids bit-for-bit. Float inputs
    train fine but are only reproducible up to float-sum ordering.

    Cost per iteration: one broadcast-centroid assignment pass over the
    corpus + one (centroid, dim)-keyed aggregate of the exploded elements
    (map-side combinable) — no all-pairs, no driver-side math.
    """
    e = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("vec").cast("array<double>").alias("cvec"),
    )
    for _ in range(iters):
        assigned = ivf_assign(
            e, cents, id_col="vec_id", vec_col="vec", nprobe=1
        )
        means = (
            assigned.select("centroid_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg((F.sum("x") / F.count("*")).alias("val"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda s: s["val"],
                ).alias("new_cvec")
            )
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("new_cvec", "cvec").alias("cvec"),
            )
            .localCheckpoint(eager=False)  # cut the growing lineage per iter
        )
    return cents


def knn_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    train_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-style ANN: corpus vectors are inverted-listed under their nearest
    centroid; a query probes its ``nprobe`` nearest centroids and ranks
    exactly within those lists only.

    Centroids are k-means-trained (``ivf_train_centroids``: deterministic
    first-N init + ``train_iters`` Lloyd refinements; 0 = raw first-N
    seeds). At 10^9 vectors the corpus shuffles once by centroid_id; each
    query touches ~nprobe/n_centroids of the data instead of all of it.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    centroids = ivf_train_centroids(
        e, n_centroids, iters=train_iters, id_col="vec_id", vec_col="vec"
    )
    lists = ivf_assign(e, centroids, id_col="vec_id", vec_col="vec", nprobe=1).select(
        "vec_id", "vec", "centroid_id"
    ).withColumn("vnorm", _norm(F.col("vec")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    probes = F.broadcast(
        ivf_assign(q, centroids, id_col="query_id", vec_col="qvec", nprobe=nprobe)
        .select("query_id", "qvec", "centroid_id")
        .withColumn("qnorm", _norm(F.col("qvec")))
    )
    scored = probes.join(lists, "centroid_id").select(
        "query_id",
        "vec_id",
        (_dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def pq_codebooks(
    vectors: DataFrame,
    m: int,
    n_codes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> list:
    """Product-quantization codebooks: subspace ``s``'s codebook is the
    first ``n_codes`` vectors' s-th subvector slices (the same
    deterministic first-N seeding convention as ``ivf_train_centroids``).
    Keeping codebook entries as ACTUAL (integer-quantized) data points —
    rather than Lloyd-refined float means — makes every downstream
    distance pure integer arithmetic, bit-exact in any engine and any
    summation order; Lloyd refinement of a coarse quantizer is
    demonstrated by ``ivf_train_centroids`` and composes in front of this
    (IVF-PQ) unchanged.

    Returns ``codebooks[sub][code] = [dsub ints]``. Driver-side data is
    O(n_codes) rows — a constant like a broadcast literal, never O(N).
    """
    assert dim % m == 0, "dim must divide into m subspaces"
    dsub = dim // m
    rows = (
        vectors.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .orderBy("vec_id")
        .collect()
    )
    assert len(rows) == n_codes, "first n_codes vec ids must be present"
    return [
        [list(r["vec"][s * dsub : (s + 1) * dsub]) for r in rows]
        for s in range(m)
    ]


def _pq_subdists_expr(vec_col, offset: int, codebook: list):
    """array of Σ_i (vec[offset+i] - c_i)^2 for every codebook entry —
    expressed with array higher-order functions (zip_with/aggregate over a
    nested array LITERAL) rather than unrolled per-element arithmetic:
    unrolling m x k x dsub squares blows the JVM's 64 KB method limit at
    dim 64 and knocks the whole stage out of codegen (measured); the HOF
    form compiles to compact loops and stays in whole-stage codegen."""
    dsub = len(codebook[0])
    sub = F.transform(
        F.slice(vec_col, offset + 1, dsub), lambda x: x.cast("long")
    )
    cb_lit = F.lit([[int(c) for c in row] for row in codebook]).cast(
        "array<array<long>>"
    )
    return F.transform(
        cb_lit,
        lambda c: F.aggregate(
            F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: list,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    keep: tuple = (),
) -> DataFrame:
    """(vec_id, codes array<int>, *keep): per subspace, the nearest
    codebook entry by squared L2 (tie -> lowest code id, the first-min
    position). ``keep`` passes extra columns through (e.g. the IVF list
    id for the IVF-PQ composition).

    Pure projection: the codebooks are expression literals, so encoding is
    whole-stage codegen with ZERO shuffle — the 10^9-vector side is read
    once and reduced to m small ints per row (the PQ memory win)."""
    m = len(codebooks)
    dsub = dim // m
    codes = []
    for s, cb in enumerate(codebooks):
        dists = _pq_subdists_expr(F.col(vec_col), s * dsub, cb)
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.array(*codes).alias("codes"),
        *[F.col(c) for c in keep],
    )


def knn_pq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Product-quantization ANN (the Jégou et al. ADC shape): corpus
    vectors are encoded once to ``m`` sub-codes; a query ranks candidates
    by the sum of per-subspace distances to each code's centroid —
    distances to full vectors are never computed at query time.

    Scale shape: the corpus side carries only the m-byte code array (the
    memory reduction that makes 10^9+ vectors fit), NEVER shuffles, and
    scoring is a broadcast-queries nested loop where the per-row work is
    m array lookups into the query's distance table (codegen literals) —
    then the same partial-top-k window as knn_bruteforce. With integer-
    quantized inputs every adc_dist is exact (no floats anywhere).
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    codebooks = pq_codebooks(e, m=m, n_codes=n_codes, dim=dim)
    codes_df = pq_encode(e, codebooks, dim=dim)
    dsub = dim // m
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        )
    )
    # per-subspace distance table for the row's query, indexed by the
    # corpus row's code: element_at(table_sub, code_sub + 1)
    score = F.lit(0).cast("long")
    for s, cb in enumerate(codebooks):
        table = _pq_subdists_expr(F.col("qvec"), s * dsub, cb)
        score = score + F.element_at(
            table, F.element_at(F.col("codes"), s + 1) + 1
        )
    scored = q.crossJoin(codes_df).select(
        "query_id", "vec_id", score.alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def knn_ivfpq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    train_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-PQ: the standard billion-scale composition (Faiss IVF-PQ
    shape) of the two ANN structures above — coarse inverted lists
    (k-means centroids, ``ivf_assign``) bound WHICH codes a query
    touches, and PQ ADC bounds the PER-CODE cost and memory.

    Scale shape: the corpus is list-assigned and PQ-encoded once (the
    encode is a zero-shuffle projection; the list assignment is the IVF
    broadcast pass), stores only (centroid_id, m codes) per vector, and a
    query equi-joins its ``nprobe`` probed lists — touching
    ~nprobe/n_centroids of the code table — then ranks by the same
    integer ADC distance as ``knn_pq``. With nprobe = n_centroids the
    result equals ``knn_pq`` exactly (pinned by tests)."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    centroids = ivf_train_centroids(
        e, n_centroids, iters=train_iters, id_col="vec_id", vec_col="vec"
    )
    lists = ivf_assign(e, centroids, id_col="vec_id", vec_col="vec", nprobe=1)
    codebooks = pq_codebooks(e, m=m, n_codes=n_codes, dim=dim)
    codes_df = pq_encode(
        lists, codebooks, dim=dim, keep=("centroid_id",)
    )
    dsub = dim // m
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qvec"),
    )
    probes = F.broadcast(
        ivf_assign(q, centroids, id_col="query_id", vec_col="qvec", nprobe=nprobe)
        .select("query_id", "qvec", "centroid_id")
    )
    score = F.lit(0).cast("long")
    for s, cb in enumerate(codebooks):
        table = _pq_subdists_expr(F.col("qvec"), s * dsub, cb)
        score = score + F.element_at(
            table, F.element_at(F.col("codes"), s + 1) + 1
        )
    scored = probes.join(codes_df, "centroid_id").select(
        "query_id", "vec_id", score.alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def knn_lsh_bucketed(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    The crossJoin becomes an equi-join on bucket (2^n_planes buckets), so
    the corpus side shuffles once by bucket and each query touches ~N/2^b
    candidates. Recall < 1 by design; the exact baseline is knn_bruteforce.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("bucket", lsh_bucket(F.col("vec"), n_planes, dim)).withColumn(
        "vnorm", _norm(F.col("vec"))
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qvec"),
        )
        .withColumn("bucket", lsh_bucket(F.col("qvec"), n_planes, dim))
        .withColumn("qnorm", _norm(F.col("qvec")))
    )
    scored = q.join(e, "bucket").select(
        "query_id",
        "vec_id",
        (_dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_audit(emb: DataFrame, vec_col: str = "embedding",
                    zero_norm2_micro: int = 1000) -> DataFrame:
    """One-row pre-ANN corpus audit — the gate a 100 TB embedding table
    passes BEFORE building IVF/LSH structures over it, because every
    degenerate row poisons downstream math silently (zero vectors make
    cosine undefined, NaNs propagate through every dot product, mixed
    dims break the kernels):

      n_vectors / dim_min / dim_max   — dimension consistency,
      n_nonfinite                     — rows containing NaN/Inf,
      n_zero_norm                     — finite rows with ||v||^2 below
                                        ``zero_norm2_micro`` micro units,
      mean_norm2_micro                — mean squared norm over FINITE
                                        rows (micro-quantized per row
                                        BEFORE the sum, so the corpus
                                        aggregate is exact integer math).

    Zero shuffle up to the one-row aggregate (map-side combinable); the
    fold over the vector is the same sequential list_sum both engines
    evaluate identically (the embedding_near_dup convention).
    """
    v = F.col(vec_col)
    nonfinite = F.exists(
        v, lambda x: F.isnan(x) | (F.abs(x) > F.lit(float(1e30)))
    )
    norm2 = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    rows = emb.select(
        F.size(v).alias("__dim"),
        nonfinite.alias("__bad"),
        F.when(
            ~nonfinite, F.round(norm2 * 1e6, 0).cast("long")
        ).alias("__n2"),
    )
    return rows.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.min("__dim").cast("long").alias("dim_min"),
        F.max("__dim").cast("long").alias("dim_max"),
        F.sum(F.when(F.col("__bad"), 1).otherwise(0)).cast("long")
        .alias("n_nonfinite"),
        F.sum(
            F.when(F.col("__n2") < zero_norm2_micro, 1).otherwise(0)
        ).cast("long").alias("n_zero_norm"),
        F.sum("__n2").cast("long").alias("__tot"),
        F.sum(F.when(~F.col("__bad"), 1).otherwise(0)).cast("long")
        .alias("__fin"),
    ).select(
        "n_vectors", "dim_min", "dim_max", "n_nonfinite", "n_zero_norm",
        F.expr("__tot div __fin").cast("long").alias("mean_norm2_micro"),
    )


def mutual_nearest_neighbors(
    vecs: DataFrame,
    left_label: int = 0,
    right_label: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Mutual nearest neighbors between two labeled vector sets — the
    standard alignment/mining primitive (bitext mining, cross-modal
    pairing, embedding-space translation): keep (a, b) iff b is a's
    single nearest neighbor AND a is b's, under cosine with the pinned
    (cosine desc, id asc) tie-break. MNN filtering kills the hub
    mismatches a one-directional kNN keeps.

    Exactness: use integer-quantized vectors (the _qvecs contract) —
    dot products are integer-valued doubles summed exactly, so argmax
    is engine- and order-independent without rounding.

    Scale shape: the left set broadcasts (alignment sets are the small
    side); the right set never shuffles for scoring; the two argmaxes
    are windows partitioned by each side's id over the scored relation;
    mutuality is one equi-join of the two picks. For set sizes beyond
    broadcast, swap the scoring stage for knn_lsh_bucketed and keep the
    same mutuality join.

    Returns (vec_a, vec_b, cosine) with vec_a from the left set.
    """
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    base = vecs.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).alias("vec"),
        F.col(label_col).cast("long").alias("lab"),
    ).withColumn("norm", F.sqrt(dot(F.col("vec"), F.col("vec"))))
    left = base.where(F.col("lab") == int(left_label)).select(
        F.col("vid").alias("a"), F.col("vec").alias("va"),
        F.col("norm").alias("na"),
    )
    right = base.where(F.col("lab") == int(right_label)).select(
        F.col("vid").alias("b"), F.col("vec").alias("vb"),
        F.col("norm").alias("nb"),
    )
    scored = right.crossJoin(F.broadcast(left)).select(
        "a",
        "b",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
            "cosine"
        ),
    )
    scored = scored.localCheckpoint(eager=False)
    wa = Window.partitionBy("a").orderBy(F.desc("cosine"), F.asc("b"))
    wb = Window.partitionBy("b").orderBy(F.desc("cosine"), F.asc("a"))
    best_for_a = (
        scored.withColumn("__r", F.row_number().over(wa))
        .where(F.col("__r") == 1)
        .select("a", "b", "cosine")
    )
    best_for_b = (
        scored.withColumn("__r", F.row_number().over(wb))
        .where(F.col("__r") == 1)
        .select("a", "b")
    )
    return best_for_a.join(best_for_b, ["a", "b"]).select(
        F.col("a").alias("vec_a"), F.col("b").alias("vec_b"), "cosine"
    )
