"""Distributed k-means (Lloyd's) over an embedding column, plus the
trained-IVF ANN path it unlocks.

Execution model (the Spark MLlib shape): centroids are METADATA — k·dim
doubles — and live on the driver between iterations; the corpus never
reshuffles for assignment. Each Lloyd iteration is ONE job:

    scan → argmin-distance assignment (pure map: centroids are parsed
    literal expressions, no join) → 64 micro-unit integer sums + count
    per cluster (map-side partial agg, one metadata-scale shuffle) →
    collect k rows to the driver.

Bit-stability contract (what makes the DuckDB oracle hash-match):
- component sums are EXACT integers (round(x·1e6) as BIGINT — the q9
  integer-cents trick), so partial-agg order can't change them;
- the mean divides back as ``(s / 1e6) / n`` in Python — the identical
  two-division sequence the oracle writes as
  ``CAST(s AS DOUBLE)/1000000.0/n`` — and doubles round-trip through
  ``repr`` exactly, so the literals the next iteration embeds are
  bit-identical to what the oracle's unrolled CTE computes;
- distance is a sequential left-to-right double accumulation
  (zip_with + aggregate ↔ DuckDB list_sum(list_transform), the
  established lockstep pattern), ties broken by lowest cluster id.

Empty clusters keep their previous centroid (standard Lloyd fallback),
mirrored by the oracle's LEFT JOIN + COALESCE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import vector as V
from distributed_file_system_with_stream_processing_spark.operators._util import cache_bounded, spread as _spread

_MICRO = 1_000_000


def _lit_arr(vals: list[float]) -> str:
    """Double-array literal whose repr round-trips exactly."""
    return "array(" + ",".join(f"CAST({v!r} AS DOUBLE)" for v in vals) + ")"


def _dist_sq(vec_col: str, cent: list[float]) -> str:
    """Squared-L2 expr string: sequential accumulation over dims."""
    return (
        f"aggregate(zip_with({vec_col}, {_lit_arr(cent)}, (x, c) -> (x - c) * (x - c)), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _argmin_expr(vec_col: str, cents: list[list[float]]) -> str:
    """Nearest-centroid id: array_min over (dist, cluster) structs —
    struct ordering = dist asc then cluster asc, the deterministic
    tie-break the oracle mirrors with ORDER BY d, c."""
    structs = ",".join(
        f"named_struct('d', {_dist_sq(vec_col, c)}, 'c', {j})"
        for j, c in enumerate(cents)
    )
    return f"array_min(array({structs})).c"


# Above this many centroids the interpreted-HOF argmin becomes the
# dominant cost (k struct subtrees × dim HOF ops per row ≈ 100 ns/op;
# measured 17.9 s for ONE pass over 20k rows at k=142), so assignment
# switches to the numpy kernel below. Below it, the HOF plan is fast
# enough and keeps small-SF plans byte-identical to earlier rounds.
_NP_ASSIGN_MIN_K = 33


def _assign_np(df: DataFrame, cents: list[list[float]], out: str) -> DataFrame:
    """Nearest-centroid assignment as an Arrow-batched numpy kernel —
    BIT-IDENTICAL to ``_argmin_expr`` by construction:

    - squared distance accumulates per-dim LEFT TO RIGHT — the numpy
      loop adds one elementwise column at a time, so every row's fold
      order equals the HOF's sequential ``aggregate`` (0.0 + t0 ≡ t0
      for the non-negative squares, then (..+t_i)+t_{i+1});
    - ties break to the LOWEST centroid id — np.argmin returns the
      first minimum, matching the (d, c) struct ordering.

    Vectorizing ACROSS ROWS instead of across dims preserves the
    per-row IEEE order while recovering numpy speed: the same 20k×142
    assignment that costs ~18 s interpreted runs in well under a
    second. Equality with the HOF path is pinned in
    tests/test_ann.py::test_np_assignment_matches_hof.
    """
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    carr = [np.asarray(c, dtype=np.float64) for c in cents]
    schema = StructType(list(df.schema.fields) + [StructField(out, IntegerType())])

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf["v"].tolist(), dtype=np.float64)
            dists = np.empty((len(carr), vm.shape[0]), dtype=np.float64)
            for j, c in enumerate(carr):
                sq = vm - c
                sq *= sq
                acc = sq[:, 0].copy()
                for d in range(1, sq.shape[1]):
                    acc += sq[:, d]
                dists[j] = acc
            res = pdf.copy()
            res[out] = np.argmin(dists, axis=0).astype("int32")
            yield res

    return df.mapInPandas(gen, schema)


def assign_cells(df: DataFrame, cents: list[list[float]], out: str = "cell") -> DataFrame:
    """Nearest-centroid assignment for a (…, v) frame: the parsed HOF
    expression below ``_NP_ASSIGN_MIN_K`` centroids (plan unchanged
    from earlier rounds), the bit-identical numpy kernel above it —
    the kernel choice never changes a single output bit, only the
    wall clock, so oracles and driver hashes are invariant to it."""
    if len(cents) >= _NP_ASSIGN_MIN_K:
        return _assign_np(df, cents, out)
    cols = [c for c in df.columns]
    return df.selectExpr(
        *cols, f"CAST({_argmin_expr('v', cents)} AS INT) AS {out}"
    )


def _init_centroids(e: DataFrame, k: int) -> list[list[float]]:
    """Deterministic seed: the k lowest-id vectors (metadata-scale
    collect — k·dim doubles, the MLlib centroid-on-driver model)."""
    rows = e.orderBy("id").limit(k).select("v").collect()
    return [list(r["v"]) for r in rows]


def _update_centroids(
    e: DataFrame, cents: list[list[float]], dim: int
) -> list[list[float]]:
    """One Lloyd update: assignment (pure map) + per-cluster exact
    integer component sums; means computed driver-side with the
    oracle-identical division sequence."""
    assigned = assign_cells(e.select("v"), cents, out="c").select("c", "v")
    sums = assigned.groupBy("c").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.round(F.element_at("v", i + 1) * _MICRO).cast("long")
            ).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    got = {r["c"]: r for r in sums.collect()}
    out = []
    for j, prev in enumerate(cents):
        r = got.get(j)
        if r is None:
            out.append(prev)  # empty cluster keeps its centroid
        else:
            out.append([(r[f"s{i}"] / float(_MICRO)) / r["n"] for i in range(dim)])
    return out


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> list[list[float]]:
    """Train k centroids with ``iters`` Lloyd updates; returns plain
    Python floats (engine-portable literals)."""
    e = _spread(
        emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    )
    # Lloyd's makes iters+1 full passes (seed + one per update);
    # persist the prepared vectors so each pass reads executor-local
    # columnar batches instead of re-scanning parquet and re-casting —
    # the standard MLlib k-means stance (its .fit caches the input).
    # At 100 TB this is MEMORY_AND_DISK on the cluster; training
    # inputs are usually a sample anyway.
    e = e.persist()
    try:
        cents = _init_centroids(e, k)
        for _ in range(iters):
            cents = _update_centroids(e, cents, dim)
    finally:
        e.unpersist()
    return cents


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """(vec_id, cluster) after ``iters`` Lloyd updates — integer-only
    output, so the oracle hash is float-free by construction."""
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    cents = kmeans_fit(emb, id_col, vec_col, k, iters, dim)
    return assign_cells(_spread(e), cents, out="cluster").selectExpr(
        "id AS vec_id", "CAST(cluster AS BIGINT) AS cluster"
    )


def semdedup_kmeans(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 2,
    threshold: float = 0.35,
    dim: int = 64,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """The FULL SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
    k-means-cluster the embeddings, then compare pairs only WITHIN a
    cluster and drop every vector that has a higher-priority (lower
    id) semantic duplicate in its cell.

    This is the complement of ``semantic_dedup`` (banded-LSH → CC):
    there the candidate bound comes from hash collisions; here it
    comes from the trained partition of the space — per-cell pairwise
    work is (n/k)² per cell, and at 100 TB k scales with the corpus
    (SemDeDup used 50k clusters on LAION) so cells stay bounded and
    the cluster equi-join key has enough cardinality to spread. The
    trained cells are the SAME deterministic Lloyd pipeline the
    kmeans/IVF ops prove (centroids-as-literals: assignment is a pure
    map, no centroid join).

    Shuffle census: Lloyd metadata shuffles (k rows each) + ONE
    corpus shuffle on `cluster` for the self-join + the dup-id
    distinct. Norms are hoisted per vector (computed once, carried
    through the join) — per candidate pair only the dot product runs.

    Output covers the whole table: (vec_id, cluster, keep) — integer
    + bool, float-free value hash; the threshold compare itself is
    bit-stable (sequential zip_with/aggregate dot ↔ DuckDB list_sum,
    same association).
    """
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    if cents is None:
        # callers that run more than once per session pass pre-trained
        # centroids (plans/_backbones.kmeans_centroids) — same Lloyd
        # pipeline, trained once per (session, sf_dir, params)
        cents = kmeans_fit(emb, id_col, vec_col, k, iters, dim)
    assigned = _spread(e).selectExpr(
        "id", "v", f"CAST({_argmin_expr('v', cents)} AS BIGINT) AS cluster"
    ).withColumn("nrm", F.sqrt(V.sq_norm(F.col("v"))))
    a = assigned.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "cluster",
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "cluster",
    )
    sim = V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dup_ids = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(sim >= threshold)
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.select(F.col("id").alias("vec_id"), "cluster")
        .join(dup_ids, F.col("vec_id") == F.col("dup_id"), "left")
        .select("vec_id", "cluster", F.col("dup_id").isNull().alias("keep"))
    )


def semdedup_prepare_index(
    emb: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The static side of the streaming SemDeDup gate: indexed vectors
    with their trained cell and hoisted norm, ready to persist as a
    (cell-partitionable) table the stream joins against."""
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    return e.selectExpr(
        "id", "v", f"CAST({_argmin_expr('v', cents)} AS BIGINT) AS cluster"
    ).withColumn("nrm", F.sqrt(V.sq_norm(F.col("v"))))


def semdedup_gate(
    vecs: DataFrame,
    cents: list[list[float]],
    index: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup as an ONLINE GATE: flag each arriving vector whose
    cell (assigned by the trained centroid literals — pure map, no
    join) contains an already-indexed vector with a LOWER id and
    cosine ≥ threshold. Works identically on a batch DataFrame and a
    structured stream: cell assignment is stateless column math, and
    the index probe is two stream-static joins (left_semi for dups,
    left_anti for keeps) — per-micro-batch, NO state store, append
    mode. With index = the full table, the output equals
    ``semdedup_kmeans``'s (vec_id, cluster, keep) exactly (the parity
    test's oracle).

    100 TB shape: the static index re-reads per micro-batch pruned to
    the arriving cells when persisted cell-partitioned; the join is an
    equi-join on cluster with the cosine verify on candidates only —
    the same per-cell bound as the batch recipe.
    """
    e = vecs.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    assigned = e.selectExpr(
        "id", "v", f"CAST({_argmin_expr('v', cents)} AS BIGINT) AS cluster"
    ).withColumn("nrm", F.sqrt(V.sq_norm(F.col("v"))))
    idx = index.select(
        F.col("id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("cluster").alias("cb"),
        F.col("nrm").alias("nb"),
    )
    cond = (
        (F.col("cluster") == F.col("cb"))
        & (F.col("ib") < F.col("id"))
        & (V.dot(F.col("v"), F.col("vb")) / (F.col("nrm") * F.col("nb")) >= threshold)
    )
    dups = assigned.join(idx, cond, "left_semi").withColumn("keep", F.lit(False))
    keeps = assigned.join(idx, cond, "left_anti").withColumn("keep", F.lit(True))
    return dups.unionByName(keeps).select(
        F.col("id").alias("vec_id"), "cluster", "keep"
    )


def ivf_trained_ann(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 2,
    probe_cells: int = 3,
    query_ids_below: int = 10,
    k: int = 5,
    dim: int = 64,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """ANN via IVF with TRAINED (k-means) cells — the production IVF
    shape, upgrading ``similarity.ivf_ann``'s seeded cells.

    Because centroids are literals, BOTH cell assignments are pure
    maps (no centroid join at all): base vectors take their argmin
    cell; queries sort the (dist, cell) struct array and explode the
    first ``probe_cells`` entries. Candidates come from the cell
    equi-join, then exact cosine re-rank + top-k window. Shuffle
    census at any scale: the cell join (query side broadcast) and the
    per-query window — the assignment stage shuffles nothing.
    """
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    base = e.filter(F.col("id") >= query_ids_below)
    if cents is None:
        # see semdedup_kmeans: pre-trained centroids come from the
        # session backbone cache when a caller re-runs per session
        cents = kmeans_fit(
            base, id_col="id", vec_col="v", k=n_cells, iters=iters, dim=dim
        )
    base_cells = _spread(base).selectExpr(
        "id AS neighbor_id", "v AS bv", f"{_argmin_expr('v', cents)} AS cell"
    )
    structs = ",".join(
        f"named_struct('d', {_dist_sq('v', c)}, 'c', {j})"
        for j, c in enumerate(cents)
    )
    probe = (
        f"transform(slice(array_sort(array({structs})), 1, {probe_cells}), s -> s.c)"
    )
    query_cells = (
        e.filter(F.col("id") < query_ids_below)
        .selectExpr("id AS query_id", "v AS qv", f"explode({probe}) AS cell")
    )
    sim = V.cosine(F.col("qv"), F.col("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        base_cells.join(broadcast(query_cells), "cell")
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )


def _pq_fit_codebooks(
    e: DataFrame,
    m: int,
    sub: int,
    codes: int,
    iters: int,
    init_books: list[list[list[float]]] | None = None,
) -> list[list[list[float]]]:
    """Train all m per-subspace codebooks with ONE Spark job per Lloyd
    pass (not m): every vector explodes into m (subspace, code,
    subvector) rows — an m-fold fan-out of metadata-width rows — and a
    single groupBy(subspace, code) computes every codebook's exact
    integer component sums at once. Training a separate kmeans_fit per
    subspace costs m·(iters+1) driver-synchronized jobs; fused, it is
    1 seed job + ``iters`` update jobs regardless of m (measured 8.4 s
    → 4.4 s end-to-end at sf0.1 for m=8/iters=2, query incl. training
    and re-rank). Same arithmetic contract as
    kmeans_fit: micro-unit integer sums, driver-side mean division,
    empty code keeps its previous centroid.

    ``init_books`` WARM-STARTS: skip the seed job and refine the given
    codebooks — the Ge-et-al. OPQ alternation's codebook half-step is
    exactly k-means updates initialized from the current books (one
    update per alternation in the paper), NOT a from-scratch retrain,
    so opq_train's loop passes the previous books here (saves the
    seed collect + lets iters=1 per alternation stay faithful)."""
    if init_books is not None:
        books = init_books
    else:
        seed_rows = e.orderBy("id").limit(codes).select("v").collect()
        books = [
            [list(r["v"])[j * sub : (j + 1) * sub] for r in seed_rows]
            for j in range(m)
        ]
    e = e.persist()
    try:
        for _ in range(iters):
            structs = ",".join(
                f"named_struct('j', {j}, "
                f"'c', {_argmin_expr(f'slice(v, {j * sub + 1}, {sub})', books[j])}, "
                f"'sv', slice(v, {j * sub + 1}, {sub}))"
                for j in range(m)
            )
            ex = e.selectExpr(f"explode(array({structs})) AS x").select(
                F.col("x.j").alias("j"), F.col("x.c").alias("c"), F.col("x.sv").alias("sv")
            )
            sums = ex.groupBy("j", "c").agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.round(F.element_at("sv", i + 1) * _MICRO).cast("long")
                    ).alias(f"s{i}")
                    for i in range(sub)
                ],
            )
            got = {(r["j"], r["c"]): r for r in sums.collect()}
            books = [
                [
                    (
                        [
                            (got[(j, c)][f"s{i}"] / float(_MICRO)) / got[(j, c)]["n"]
                            for i in range(sub)
                        ]
                        if (j, c) in got
                        else prev
                    )
                    for c, prev in enumerate(books[j])
                ]
                for j in range(m)
            ]
    finally:
        e.unpersist()
    return books


def pq_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    codes: int = 16,
    iters: int = 2,
    query_ids_below: int = 10,
    k: int = 5,
    rerank_factor: int = 12,
    dim: int = 64,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """ANN via PRODUCT QUANTIZATION (Jégou et al. 2011) + exact
    re-rank — the highest-compression member of the ANN family
    (brute / sign-LSH / seeded-IVF / trained-IVF / int8-SQ / PQ).

    Train: the vector splits into ``m`` subspaces of dim/m; each
    subspace gets its own ``codes``-entry codebook via the SAME
    deterministic Lloyd trainer every k-means path shares (kmeans_fit
    on sliced vectors — centroids are driver metadata, the corpus
    never reshuffles for training beyond Lloyd's metadata sums).

    Encode: each base vector stores only m small ints (argmin code
    per subspace, pure map with codebooks as parsed literals). At
    dim=64/m=8 that is 8 code bytes against 512 vector bytes — the
    64× memory/scan compression that makes a 100 TB index
    RAM-resident. Defaults (m=8, rerank_factor=12) measure 0.86
    recall@5 vs brute force on the sf0.001 fixture — the
    compression/recall trade the sweep test documents.

    Search (ADC — asymmetric distance): per query, the m×codes table
    of ||q_sub − codebook[code]||² distances is METADATA (computed
    driver-side from the collected query rows — same metadata class
    as the Lloyd centroid collect) and broadcasts as per-query LUT
    array columns; a candidate's approximate distance is then m
    element_at lookups + adds — no float vector math on the base side
    at all. Coarse top k·rerank_factor per query, then exact cosine
    re-rank on the pruned pool (the quantized_topk ending: candidate
    list broadcast back onto the float table).

    Shuffle census at any scale: zero for encode (map), zero for the
    coarse pass (queries+LUTs broadcast, per-query window on the
    candidate heap), the re-rank joins are candidate-side broadcasts.
    Rows-only correctness (recall pinned vs brute force in
    tests/test_ann.py) — the standard lot of the compressed paths.
    """
    sub = dim // m
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    # ``books`` (r9): session-persisted pre-trained codebooks
    # (_backbones.pq_codebooks) skip the Lloyd passes entirely —
    # training is deterministic, so the literals are bit-identical to
    # an inline retrain and the search result is unchanged.
    return _pq_search(
        e, m, sub, codes, iters, query_ids_below, k, rerank_factor, books=books
    )


def _pq_search(
    e: DataFrame,
    m: int,
    sub: int,
    codes: int,
    iters: int,
    query_ids_below: int,
    k: int,
    rerank_factor: int,
    e_rerank: DataFrame | None = None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The PQ pipeline on a prepared (id, v) frame — shared by the
    plain path (pq_topk) and the rotated path (opq_topk, which hands
    in PCA-rotated vectors for train/encode/coarse but re-ranks on
    ``e_rerank`` = the ORIGINAL vectors: rotation preserves cosine
    exactly, so the re-rank is semantically identical and skips a
    full rotated-table recomputation). Pre-trained ``books`` skip the
    Lloyd passes (the alternating-OPQ path trains its own)."""
    if e_rerank is None:
        e_rerank = e
    if books is None:
        books = _pq_fit_codebooks(_spread(e), m, sub, codes, iters)
    code_exprs = [
        f"CAST({_argmin_expr(f'slice(v, {j * sub + 1}, {sub})', books[j])} AS INT) AS c{j}"
        for j in range(m)
    ]
    base = _spread(e.filter(F.col("id") >= query_ids_below)).selectExpr(
        "id AS neighbor_id", *code_exprs
    )
    qrows = e.filter(F.col("id") < query_ids_below).collect()
    lut_rows = []
    for r in qrows:
        qv = list(r["v"])
        luts = []
        for j in range(m):
            qs = qv[j * sub : (j + 1) * sub]
            luts.append(
                [float(sum((a - b) * (a - b) for a, b in zip(qs, c))) for c in books[j]]
            )
        lut_rows.append((r["id"], *luts))
    spark = e.sparkSession
    qlut = spark.createDataFrame(
        lut_rows,
        "query_id long, " + ", ".join(f"lut{j} array<double>" for j in range(m)),
    )
    adist = None
    for j in range(m):
        term = F.element_at(F.col(f"lut{j}"), F.col(f"c{j}") + 1)
        adist = term if adist is None else adist + term
    wq = Window.partitionBy("query_id").orderBy(F.asc("_ad"), F.asc("neighbor_id"))
    cand = (
        base.crossJoin(broadcast(qlut))
        .select("query_id", "neighbor_id", adist.alias("_ad"))
        .withColumn("_qr", F.row_number().over(wq))
        .filter(F.col("_qr") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )
    base_full = e_rerank.select(F.col("id").alias("neighbor_id"), F.col("v").alias("bv"))
    q_full = e_rerank.filter(F.col("id") < query_ids_below).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    sim = V.cosine(F.col("qv"), F.col("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        base_full.join(broadcast(cand), "neighbor_id")
        .join(broadcast(q_full), "query_id")
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("_sim"), 6).alias("sim"), "rank")
    )


# ---------------------------------------------------------------------------
# OPQ: PCA rotation + eigenvalue-balanced subspace allocation ahead of
# the PQ codebooks (Ge et al. 2014, "Optimized Product Quantization",
# the non-parametric R_init of §4: rotate to the principal axes, then
# assign directions to subspaces balancing the PRODUCT of eigenvalues
# so no subspace hoards the variance the codebook must quantize).


def _second_moment(e: DataFrame, dim: int):
    """Uncentered second-moment matrix E[x xᵀ] (and n), computed as
    per-partition numpy Gram matrices via Arrow ``mapInPandas`` — the
    classic distributed-PCA reduction: each partition emits ONE
    dim×dim partial (a few KB), the driver sums partials. No shuffle
    at all; the only cross-node traffic is n_partitions × dim² doubles.
    Uncentered ON PURPOSE: the eigenbasis of the energy (not the
    covariance) keeps the rotation a pure linear map, so inner
    products, norms, L2 distances and cosines are EXACTLY preserved —
    the re-rank and recall semantics of the PQ family are untouched.
    (Arrow batch path is the repo's accepted non-JVM lane, same as
    operators/multimodal.py.)"""
    import numpy as np
    import pandas as pd

    def part(it):
        g = np.zeros((dim, dim), dtype=np.float64)
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.float64)
            g += mat.T @ mat
            n += mat.shape[0]
        yield pd.DataFrame({"g": [g.reshape(-1).tolist()], "n": [n]})

    rows = e.select("v").mapInPandas(part, "g array<double>, n long").collect()
    g = np.zeros((dim, dim), dtype=np.float64)
    n = 0
    for r in rows:
        g += np.array(r["g"], dtype=np.float64).reshape(dim, dim)
        n += r["n"]
    return g, n


def eigenvalue_allocation(eigvals, m: int, sub: int):
    """Greedy balanced allocation (OPQ §4.1): balance the PRODUCT of
    eigenvalues per subspace = LPT scheduling on log-eigenvalues.
    Raw logs can be negative (λ < 1), which inverts the "least loaded
    bucket" signal and collapses the greedy into the contiguous PCA
    split — so shift every log by the spectrum minimum first. All
    buckets receive exactly ``sub`` directions, so the constant shift
    cancels and balancing shifted sums balances the true products.
    Returns ``m`` lists of direction indices — the permutation that
    snakes strong and weak directions across subspaces instead of
    letting PCA order dump all the energy into subspace 0."""
    import math

    logs = [math.log(max(float(v), 1e-12)) for v in eigvals]
    lo = min(logs)
    shifted = [l - lo for l in logs]
    order = sorted(range(len(eigvals)), key=lambda i: -shifted[i])
    buckets = [[] for _ in range(m)]
    load = [0.0] * m
    for d in order:
        j = min(
            (j for j in range(m) if len(buckets[j]) < sub),
            key=lambda j: (load[j], j),
        )
        buckets[j].append(d)
        load[j] += shifted[d]
    return buckets


def opq_rotation(e: DataFrame, dim: int, m: int) -> list[list[float]]:
    """Train the OPQ rotation: eigh of the distributed second moment
    (driver-side on a dim×dim matrix — metadata, like centroids), then
    eigenvalue-balanced row permutation. Returns the rotation matrix R
    as row lists; y = R·x is the rotated vector whose contiguous
    dim/m slices are the balanced subspaces."""
    import numpy as np

    g, n = _second_moment(e, dim)
    vals, vecs = np.linalg.eigh(g / max(n, 1))  # ascending; columns = directions
    buckets = eigenvalue_allocation(vals, m, dim // m)
    rows = []
    for bucket in buckets:
        for d in bucket:
            rows.append(vecs[:, d].tolist())
    return rows


def rotate_expr(rot: list[list[float]]) -> str:
    """SQL expression rotating array column ``v`` by the literal
    matrix: one sequential zip_with/aggregate dot product per output
    component — d² multiply-adds per row, the same staged-expression
    budget as the PQ encode pass, zero joins/shuffles."""
    comps = ",".join(
        f"aggregate(zip_with(v, {_lit_arr(r)}, (a, b) -> a * b), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        for r in rot
    )
    return f"array({comps})"


def rotate_apply(e: DataFrame, rot: list[list[float]]) -> DataFrame:
    """(id, v) → (id, R·v) via ONE Arrow ``mapInPandas`` numpy matmul
    per batch — the vectorized twin of :func:`rotate_expr`. The SQL
    expression is d² INTERPRETED multiply-adds per row (higher-order
    functions don't codegen); at 64 dims that made each
    materialization of the rotated table ~3-4 s at sf0.1, and OPQ
    training materializes it once per alternation — the exact "hand
    the map stage to a native kernel" swap the rotate_expr docstring
    reserves. Pure map: zero joins/shuffles. Values match rotate_expr
    up to float64 accumulation order (BLAS may block the dot product);
    deterministic run-to-run for a fixed build, and every OPQ consumer
    is rows-only/recall-pinned — nothing downstream hashes these
    floats against an oracle."""
    import numpy as np
    import pandas as pd

    R_T = [list(col) for col in zip(*rot)]  # serialize transpose once

    def part(it):
        Rt = np.array(R_T, dtype=np.float64)
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            Y = X @ Rt
            yield pd.DataFrame({"id": pdf["id"], "v": list(Y.tolist())})

    return e.select("id", "v").mapInPandas(part, "id long, v array<double>")


def opq_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    codes: int = 16,
    iters: int = 2,
    query_ids_below: int = 10,
    k: int = 5,
    rerank_factor: int = 12,
    dim: int = 64,
    opt_iters: int = 0,
    model: tuple[list[list[float]], list[list[list[float]]] | None] | None = None,
) -> DataFrame:
    """ANN via OPTIMIZED product quantization: PCA-rotate every vector
    into an eigenvalue-balanced basis, then run the identical PQ
    pipeline (_pq_search) on the rotated coordinates. The rotation is
    orthonormal, so L2 / inner products / cosine are exactly preserved
    — recall can only change through QUANTIZATION error, which the
    balanced subspaces reduce (the OPQ claim; the sweep test pins
    recall ≥ the plain-PQ floor on the fixture). ``opt_iters`` > 0
    adds full Ge-et-al. alternations (Procrustes rotation ↔ codebook
    retrain, opq_train) — quantization error is then monotone
    non-increasing per alternation (pinned in tests/test_ann.py); the
    registered ann_opq_topk runs opt_iters=1 (promoted in r5; ~1
    extra mapInPandas encode pass + one codebook retrain per
    alternation, bench delta recorded in SHUFFLES.md).

    100 TB shape: rotation TRAINING is one shuffle-free scan emitting
    dim² partials per partition; rotation APPLY is a pure map (matrix
    literals, d² multiply-adds per row — at petabyte scale this is the
    one stage you would hand to codegen or a native kernel, and the
    map shape makes that swap local); everything downstream is the
    documented PQ census (zero-shuffle encode, broadcast LUT coarse
    pass, candidate-broadcast re-rank)."""
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    # ``model`` (r9): a session-persisted (rotation, codebooks) pair
    # (_backbones.opq_model) skips the alternation training entirely —
    # the trainer is deterministic, so the literals are bit-identical
    # to an inline retrain and the search result is unchanged.
    if model is not None:
        rot, books = model
    elif opt_iters > 0:
        rot, books, _trace = opq_train(
            _spread(e), dim, m, codes, iters, opt_iters=opt_iters
        )
    else:
        rot = opq_rotation(_spread(e), dim, m)
        books = None
    # persist the rotated table: codebook training (iters+1 passes) and
    # the encode pass all read it, and each recomputation would redo
    # the d² interpreted matmul per row (measured 7.7 s → the PQ-family
    # baseline at sf0.1 without it). cache_bounded's FIFO unpersists it
    # after newer entries arrive, so repeated invocations in a
    # long-lived session can't accumulate cached blocks.
    re_ = cache_bounded(rotate_apply(e, rot))
    return _pq_search(
        re_, m, dim // m, codes, iters, query_ids_below, k, rerank_factor,
        e_rerank=e, books=books,
    )


def _procrustes_pass(re_: DataFrame, rot, books, dim: int, m: int, sub: int):
    """One OPQ ALTERNATION (Ge et al. 2014 §3.2, the non-parametric
    solver): with codebooks fixed, the optimal orthonormal rotation
    minimizing Σ‖R·x − x̂‖² is the orthogonal-Procrustes solution
    R = U·Vᵀ from SVD(Σ x̂ xᵀ). The correlation matrix accumulates
    DISTRIBUTED over the CACHED rotated table (one Arrow
    ``mapInPandas`` pass encoding each partition in numpy, emitting a
    dim×dim partial + the partition's quantization-error sum — the
    same shuffle-free reduction as the second-moment pass): since
    x = Rᵀ·y, Σ x̂ xᵀ = (Σ ŷ yᵀ)·R, so the pass needs neither the
    raw table (avoids a second scan) nor a per-row matmul — the
    driver applies ·R once to the dim×dim total before the SVD.
    Returns (R_new, total_sq_err, n)."""
    import numpy as np
    import pandas as pd

    B = [np.array(b) for b in books]

    def part(it):
        c = np.zeros((dim, dim), dtype=np.float64)
        err = 0.0
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            Y = np.array(pdf["v"].tolist(), dtype=np.float64)  # rotated
            Yhat = np.empty_like(Y)
            for j in range(m):
                S = Y[:, j * sub : (j + 1) * sub]
                d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                Yhat[:, j * sub : (j + 1) * sub] = B[j][d2.argmin(axis=1)]
            c += Yhat.T @ Y  # Σ ŷ yᵀ (rotated frame)
            err += float(((Y - Yhat) ** 2).sum())
            n += Y.shape[0]
        yield pd.DataFrame({"c": [c.reshape(-1).tolist()], "e": [err], "n": [n]})

    rows = re_.select("v").mapInPandas(part, "c array<double>, e double, n long").collect()
    Cy = np.zeros((dim, dim), dtype=np.float64)
    err = 0.0
    n = 0
    for r in rows:
        Cy += np.array(r["c"], dtype=np.float64).reshape(dim, dim)
        err += r["e"]
        n += r["n"]
    C = Cy @ np.array(rot)  # back to Σ x̂ xᵀ in original coordinates
    U, _, Vt = np.linalg.svd(C)
    return (U @ Vt).tolist(), err, n


def opq_train(
    e: DataFrame,
    dim: int,
    m: int,
    codes: int,
    iters: int,
    opt_iters: int = 0,
):
    """Full OPQ training: eigenvalue-allocation PCA init (opq_rotation)
    + ``opt_iters`` alternations of [Procrustes rotation update ↔
    codebook retrain on the re-rotated vectors]. Each half-step
    minimizes the SHARED objective Σ‖R·x − x̂‖² with the other half
    fixed, so the quantization error is monotone non-increasing — the
    paper's convergence argument, pinned as a test. Returns
    (rotation, codebooks, error_trace); error_trace[i] is the total
    squared quantization error entering alternation i (length
    opt_iters, measured before each rotation update)."""
    sub = dim // m
    rot = opq_rotation(e, dim, m)
    re_ = rotate_apply(e, rot).persist()
    books = _pq_fit_codebooks(re_, m, sub, codes, iters)
    trace = []
    for _ in range(opt_iters):
        rot_new, err, _n = _procrustes_pass(re_, rot, books, dim, m, sub)
        trace.append(err)
        rot = rot_new
        re_.unpersist()
        re_ = rotate_apply(e, rot).persist()
        # codebook half-step: ONE warm-started k-means update (the
        # paper's alternation), not a cold retrain — the rotation
        # half-step kept assignments/books feasible in the new frame
        # (Procrustes minimizes against the FIXED encoding), so the
        # objective stays monotone and each alternation costs 1 update
        # job + 1 encode pass instead of seed + iters updates
        books = _pq_fit_codebooks(re_, m, sub, codes, 1, init_books=books)
    re_.unpersist()
    return rot, books, trace


def ivf_index_prepare(
    vecs: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, cell) — trained-IVF cell assignment for INDEX rows, the
    pure-map half shared by ``ivf_trained_ann``'s base side and the
    streaming serving twin (streaming/rainstorm.ann_indexed_stream):
    centroids are literals, so assignment shuffles nothing and the
    prepared rows upsert straight into a cell-bucketed index."""
    e = vecs.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    return assign_cells(_spread(e), cents, out="cell")


def ivf_index_query(
    queries: DataFrame,
    cents: list[list[float]],
    index: DataFrame,
    k: int = 5,
    probe_cells: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``k`` LOWER-id neighbors of every query vector from a
    prepared (id, v, cell) index, probing ``probe_cells`` nearest
    cells — the serve half of the train-offline/serve-online IVF
    split. The ``base_id < query_id`` predicate makes the result a
    pure function of the (queries ∪ index) id set regardless of how
    rows arrived, which is exactly what makes the streaming twin's
    final state equal this batch recipe when ids arrive
    non-decreasing (the semdedup_indexed_stream parity argument).

    Deterministic: cosine is the bit-lockstep sequential dot; ties
    break (sim desc, neighbor_id asc); sim rounds once at 6 dp.

    100 TB shape: query cells explode ``probe_cells``-fold (a map),
    then ONE cell equi-join against the index (micro-batch-sized
    query side broadcast) + a per-query top-k window on the candidate
    set. The index never reshuffles.
    """
    e = queries.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    structs = ",".join(
        f"named_struct('d', {_dist_sq('v', c)}, 'c', {j})"
        for j, c in enumerate(cents)
    )
    probe = (
        f"transform(slice(array_sort(array({structs})), 1, {probe_cells}), s -> s.c)"
    )
    qc = e.selectExpr(
        "id AS query_id", "v AS qv", f"explode(CAST({probe} AS array<int>)) AS cell"
    )
    idx = index.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("bv"), "cell"
    )
    sim = V.cosine(F.col("qv"), F.col("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        idx.join(broadcast(qc), "cell")
        .filter(F.col("neighbor_id") < F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )
