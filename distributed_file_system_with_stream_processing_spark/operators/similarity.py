"""Embedding similarity search operators.

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Queries are broadcast (small side); the base table streams through
  executors, cosine runs in whole-stage codegen, and per-query top-k
  is a window over (query, -sim). At 100 TB the base side stays
  partitioned; nothing ever collects to the driver.
- ``lsh_ann``: random-hyperplane LSH bucketing — the scale path.
  Hyperplanes are derived deterministically from md5, so results are
  reproducible without a seeded RNG. Candidates = bucket equi-join;
  exact cosine re-rank on candidates only.
- ``cosine_neardup_pairs``: all pairs above a cosine threshold
  (embedding near-duplicate detection for dedup pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.operators._util import spread as _spread
from distributed_file_system_with_stream_processing_spark.functions import vector as V
from distributed_file_system_with_stream_processing_spark.functions.text import hash32


def cosine_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids_below: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Deterministic: rank by raw similarity desc, then neighbor id.
    """
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    q = e.filter(F.col("id") < query_ids_below).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    base = e.filter(F.col("id") >= query_ids_below).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("bv")
    )
    sim = V.cosine(F.col("qv"), F.col("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        base.crossJoin(broadcast(q))
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("_sim"), 6).alias("sim"), "rank")
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    id_cap: int | None = None,
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold (id_a < id_b).

    Brute-force O(n²) verification — correct by definition; the LSH
    variant below is the scale path that prunes candidates first.
    """
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    if id_cap is not None:
        e = e.filter(F.col("id") < id_cap)
    # hoist sqrt(|v|²) out of the O(n²) pair loop: computed once per
    # vector, carried through the join — per pair only the dot remains
    # (same expression values as cosine(): dot / (sqrt·sqrt))
    e = e.withColumn("nrm", F.sqrt(V.sq_norm(F.col("v"))))
    a = _spread(e).select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = e.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("_sim"))
        .filter(F.col("_sim") >= threshold)
        .select("id_a", "id_b", F.round("_sim", 6).alias("sim"))
    )


def hyperplane_matrix(dim: int, planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix as PYTHON floats:
    component (p, d) = (hash32('p|{p}|d|{d}') % 2001 - 1000) / 1000,
    with hash32 the same md5-prefix formula as functions.text.hash32.
    Exposed so oracle SQL can embed the IDENTICAL literals — the plane
    family is engine-portable by construction (3-decimal values parse
    to the same doubles everywhere)."""
    import hashlib

    out = []
    for p in range(planes):
        comps = []
        for d in range(dim):
            h = int(hashlib.md5(f"p|{p}|d|{d}".encode()).hexdigest()[:8], 16)
            comps.append((h % 2001 - 1000) / 1000.0)
        out.append(comps)
    return out


def _hyperplanes(dim: int, planes: int):
    """hyperplane_matrix as ONE parsed array literal, evaluated in
    PYTHON so the driver ships a single constant expression instead of
    building dim×planes md5 expression trees through py4j (which
    dominated wall time: ~4s of plan construction per query
    invocation)."""
    rows = [
        "array(" + ",".join(f"{c}D" for c in comps) + ")"
        for comps in hyperplane_matrix(dim, planes)
    ]
    return F.expr("array(" + ",".join(rows) + ")")


def lsh_ann(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = 8,
    query_ids_below: int = 10,
    k: int = 5,
) -> DataFrame:
    """ANN via random-hyperplane LSH: sign-bucket vectors, equi-join
    buckets, exact cosine re-rank within candidates.

    Recall < 1 by construction (bucketing prunes); at scale you raise
    recall with multiple tables (union of plane sets). Deterministic
    output for a fixed plane set.
    """
    planes_col = _hyperplanes(dim, planes)
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    bucket = F.aggregate(
        F.sequence(F.lit(0), F.lit(planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(
            F.aggregate(
                F.zip_with(
                    F.element_at(planes_col, p.cast("int") + 1),
                    F.col("v"),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            >= 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(0),
    )
    eb = _spread(e).withColumn("bucket", bucket)
    q = eb.filter(F.col("id") < query_ids_below).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    base = eb.filter(F.col("id") >= query_ids_below).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("bv"), F.col("bucket").alias("bb")
    )
    sim = V.cosine(F.col("qv"), F.col("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        base.join(broadcast(q), F.col("bb") == F.col("qb"))
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )


def _seq_dot_np(A, B):
    """Per-row dot of two (n, d) float64 matrices with the EXACT fold
    order of ``V.dot`` (zip_with + aggregate): products elementwise,
    then per-dim accumulation LEFT TO RIGHT — vectorized across rows,
    sequential across dims (the ``clustering._assign_np`` pattern).
    (0.0 + t0) ≡ t0 in IEEE double (only a -0.0/+0.0 sign can differ,
    and the fold's 0.0 + -0.0 = +0.0 only matters for an ALL-ZERO
    product row, where every downstream ≥-comparison result is
    identical either way). Zero-width input folds to 0.0 exactly like
    aggregate over an empty zip_with."""
    import numpy as np

    t = A * B
    if t.shape[1] == 0:
        return np.zeros(t.shape[0], dtype=np.float64)
    acc = t[:, 0].copy()
    for d in range(1, t.shape[1]):
        acc += t[:, d]
    return acc


def _neardup_sig_np(
    e: DataFrame, mat: list[list[float]], bands: int, rows_per_band: int, dim: int
) -> DataFrame:
    """Sign-LSH signature (id, v, nrm, _k0.._k{bands-1}) as an
    Arrow-batched numpy kernel, BIT-IDENTICAL to the interpreted HOF
    fold it replaces (r7/r8 sweep — HOF lambdas never reach codegen;
    the fold burned most of embedding_neardup's 45 s sf1 wall, and the
    4096-term scalar-expansion alternative dies in Janino inside the
    Generate/Sort consume methods):

    - every plane dot and the self-dot under ``nrm`` accumulate
      per-dim left-to-right — ``_seq_dot_np`` — matching aggregate's
      sequential association exactly;
    - ``sqrt`` is correctly rounded in IEEE 754, so numpy == JVM;
    - band_key(b) = Σ_r 2^r·[dot ≥ 0] in int64, order-free;
    - zip_with PADDING semantics are mirrored exactly: a vector whose
      length ≠ ``dim`` gets every band_key = 0 (the padded plane dot
      is NULL, IF(NULL ≥ 0) → 0) but keeps its REAL nrm (sq_norm pads
      nothing — v against itself); a NULL vector or NULL element
      poisons everything it touches (keys 0, nrm NaN — the HOF's
      NULL; a NULL sim never passes the verify threshold — NULL ≥ t
      is NULL in both engines);
    - a NaN ELEMENT is masked the same way (keys 0, nrm NaN) as
      defense-in-depth, but since r9 NaN rows never reach this
      kernel on the ``banded_neardup_pairs`` path: both Spark and
      DuckDB evaluate ``NaN >= t`` as TRUE (r8 advice — verified in
      both engines), so a NaN cosine WOULD pass the verify, and the
      kernel's key-0 routing diverged from the oracle's all-ones
      band keys. The caller filters NaN-bearing vectors up front
      (``~F.exists(v, F.isnan)``; oracle mirrors), so the mask only
      matters for direct kernel callers.

    The kernel widens float32 → float64 itself (exact), replacing the
    per-element ``as_double`` transform."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    planes = np.asarray(mat, dtype=np.float64)
    n_planes = bands * rows_per_band
    schema = StructType(
        [
            e.schema["id"],
            StructField("v", ArrayType(DoubleType())),
            StructField("nrm", DoubleType()),
        ]
        + [StructField(f"_k{b}", LongType()) for b in range(bands)]
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = pdf["v"].to_numpy()
            n = len(rows)
            nrm = np.full(n, np.nan, dtype=np.float64)
            keys = np.zeros((n, bands), dtype=np.int64)
            out_v = list(rows)  # passthrough; Arrow widens to double

            def _band_keys(vm: "np.ndarray") -> "np.ndarray":
                kk = np.zeros((vm.shape[0], bands), dtype=np.int64)
                for p in range(n_planes):
                    dots = _seq_dot_np(vm, planes[p][None, :])
                    b, r = divmod(p, rows_per_band)
                    kk[:, b] += (dots >= 0).astype(np.int64) << r
                return kk

            done = False
            # fast path: every row a width-`dim` float vector → ONE
            # stacked fold, no per-row Python
            try:
                vm = np.stack(rows)
                if vm.dtype.kind == "f" and vm.shape[1] == dim:
                    vm = vm.astype(np.float64, copy=False)
                    nrm = np.sqrt(_seq_dot_np(vm, vm))
                    keys = _band_keys(vm)
                    bad = np.isnan(vm).any(axis=1)
                    if bad.any():
                        keys[bad] = 0  # NaN mask — see docstring
                    out_v = list(vm)  # exact float32→float64 widening
                    done = True
            except (ValueError, TypeError):
                pass
            if not done:
                # slow path: NULLs / ragged rows — group well-formed
                # rows by length: nrm is real for EVERY length
                # (sq_norm pads nothing), band keys only at == dim
                by_len: dict[int, list[int]] = {}
                for i, r in enumerate(rows):
                    if r is None:
                        continue
                    # float ndarrays cannot hold None; only scan others
                    if (
                        isinstance(r, np.ndarray) and r.dtype.kind == "f"
                    ) or not any(x is None for x in r):
                        by_len.setdefault(len(r), []).append(i)
                for length, idxs in by_len.items():
                    vm = np.array([rows[i] for i in idxs], dtype=np.float64)
                    nrms = np.sqrt(_seq_dot_np(vm, vm))
                    for j, i in enumerate(idxs):
                        nrm[i] = nrms[j]
                        out_v[i] = vm[j]
                    if length == dim:
                        kk = _band_keys(vm)
                        kk[np.isnan(vm).any(axis=1)] = 0  # NaN mask
                        keys[np.asarray(idxs)] = kk
            out = pd.DataFrame({"id": pdf["id"].to_numpy()})
            out["v"] = out_v
            out["nrm"] = nrm
            for b in range(bands):
                out[f"_k{b}"] = keys[:, b]
            yield out

    return e.mapInPandas(gen, schema)


def _pair_dot_expr(a: str, b: str, dim: int) -> str:
    """Verify-side ``V.dot(a, b)`` as a PARSED SCALAR 64-term sum —
    bit-identical to the zip_with/aggregate fold (same products, same
    left-to-right association starting at 0.0D; ``element_at`` past
    either array's end yields NULL exactly like zip_with's padding,
    and NULL poisons the sum the same way) and, unlike the fold,
    whole-stage-codegen'd. The candidate-pair volume is why this must
    stay JVM-side twice over: the interpreted HOF burned ~µs × 4.9M
    pairs × 64 elements at sf1, and a numpy kernel would ship 4.9M ×
    two 64-double vectors (~5 GB) through Arrow just to multiply them.
    A single 64-term expression compiles fine — it was the 4096-term
    signature expansion that broke Janino, not this.

    The expression truncates at exactly ``dim`` terms where the old
    fold ran over max(len(a), len(b)) — observable only for a pair
    where BOTH vectors are LONGER than dim (r8 advice). Since r8 the
    divergence is unreachable: ``banded_neardup_pairs`` filters
    len(v) ≠ dim rows out of the signature stream before any pair can
    form (see the filter note there)."""
    terms = "".join(
        f" + (element_at({a}, {i}) * element_at({b}, {i}))"
        for i in range(1, dim + 1)
    )
    return f"(0.0D{terms})"


def banded_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    bands: int = 8,
    rows_per_band: int = 8,
    dim: int = 64,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Scale-safe embedding near-duplicate pairs: sign-LSH banding →
    band equi-join candidates → exact cosine verify (id_a < id_b).

    Semantics are EXACT and deterministic for a fixed plane family:
    a pair is emitted iff it collides in ≥1 of the ``bands`` sign-bit
    bands AND its true cosine ≥ ``threshold`` — the pigeonhole pattern
    proven in dedup.simhash_pairs. Output ⊆ the brute-force pair set;
    recall on genuinely-near pairs rises with cosine (identical
    vectors share every band, so recall 1.0 on true duplicates) and is
    pinned vs brute force in tests/test_ann.py.

    ``bucket_cap`` (the shingle df≤50 stance applied to sign-LSH band
    buckets): when set, a bucket pair is generated only if its
    LOWER-id member ranks ≤ cap in the bucket's id order — i.e. the
    cap lowest-id members act as the bucket's representatives and
    pair with EVERYONE, everyone else pairs only with them. Per-bucket
    fan-out drops from C(|bucket|,2) (quadratic — the sf1 rehearsal
    measured a 311× pair inflation when mirrored replicas flooded
    buckets) to ≤ cap·|bucket| (linear, the minimum that keeps every
    member attached), and CC connectivity on true-duplicate floods is
    PRESERVED: every member still pairs with representative #1 at
    cosine 1. Deterministic (id order), mirrored by the oracle's
    row_number CTE; recall vs the uncapped twin is pinned on planted
    fixtures in tests/test_ann.py.

    100 TB shape: per-vector signature is a narrow map (bands ×
    rows_per_band dot products, Arrow-batched numpy); candidates come
    from an equi-join on (band_id, band_key) — high-cardinality keys
    (``rows_per_band`` bits per band; raise to 16 bits at petabyte
    corpus sizes), no crossJoin / broadcast of the table, per-bucket
    fan-out C(bucket,2) bounded by band width (and hard-capped at
    C(bucket_cap,2) when set — the rank window shuffles on the same
    (band_id, band_key) key the self-join needs, so the cap adds no
    extra corpus Exchange). The brute-force twin
    ``cosine_neardup_pairs`` stays registered as
    ``embedding_neardup_exact`` — the correctness baseline.
    """
    n_planes = bands * rows_per_band
    mat = hyperplane_matrix(dim, n_planes)
    # Rows whose vector length ≠ dim are excluded UP FRONT (r8
    # advice): they can never form a legitimate sign-LSH match (every
    # plane dot NULL-pads, so they'd all collide in the key-0 bucket
    # — quadratic junk-candidate generation in a dirty corpus) and
    # the codegen'd verify dot is only defined at exactly `dim`
    # terms. NaN-bearing vectors are excluded too (r9, per the r8
    # advice): both Spark AND DuckDB evaluate ``NaN >= threshold`` as
    # TRUE, so a NaN cosine would sail through the verify and emit
    # spurious pairs against every bucket-mate — and the kernel's
    # key-0 routing diverged from the oracle's all-ones band keys
    # (dot >= 0 is true for NaN dots in SQL). Dropping them up front
    # makes both engines emit the identical pair set on dirty
    # corpora. isnan(NULL) is false in both engines, so NULL-element
    # rows survive THIS filter — harmless: their verify dot is NULL
    # (element_at NULL poisons the sum) and NULL >= t filters out.
    # Both filters are JVM predicates ahead of the Arrow stage;
    # size(NULL) is never == dim, so NULL vectors drop here too. The
    # oracle mirrors with len(embedding) = dim AND NOT
    # list_contains(list_transform(embedding, x -> isnan(x)), true).
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).filter(
        (F.size(F.col("v")) == dim) & ~F.exists("v", F.isnan)
    )

    # Signature shapes tried, in order of abandonment (r7/r8 HOF
    # sweep): per-bit Column expressions embedding 64 copies of the
    # 4096-element plane literal (~5s plan build + codegen at sf0.1);
    # hoisted-dots Column form (~1.4s py4j chatter); ONE parsed
    # transform/aggregate HOF fold (~30ms build — but HOF lambdas
    # evaluate INTERPRETED, ~µs per element: the fold burned most of
    # embedding_neardup's 45s sf1 wall); scalar 64-term expansions of
    # every dot (Janino InternalCompilerException — the 4096-term
    # expression lands in Generate/Sort consume methods that codegen
    # cannot split). What works: the Arrow-batched numpy kernel,
    # bit-identical to the fold by construction (sequential per-dim
    # accumulation — see _neardup_sig_np), the assign_cells precedent.
    sig_keys = _neardup_sig_np(_spread(e), mat, bands, rows_per_band, dim)
    # band rows via a SMALL explode over the key columns (the Generate
    # consume stays tiny; explode_outer keeps InferFiltersFromGenerate
    # from re-inlining band keys as a pushed scan predicate — see
    # dedup._exploded_shingles for the same guard)
    bands_arr = F.expr(
        "array("
        + ",".join(
            f"named_struct('band_id', {b}, 'band_key', _k{b})"
            for b in range(bands)
        )
        + ")"
    )
    sig = (
        sig_keys.select("id", "v", "nrm", F.explode_outer(bands_arr).alias("bk"))
        .filter(F.col("bk").isNotNull())
        .select("id", "v", "nrm", "bk.band_id", "bk.band_key")
    )
    sig_a = sig
    if bucket_cap is not None:
        # Lower-id side only: rank within the bucket shuffles on the
        # SAME (band_id, band_key) key the self-join uses, so the cap
        # costs no extra corpus Exchange. The b-side stays full —
        # every member keeps its link to the representatives.
        wb = Window.partitionBy("band_id", "band_key").orderBy("id")
        sig_a = (
            sig.withColumn("_rnk", F.row_number().over(wb))
            .filter(F.col("_rnk") <= bucket_cap)
            .drop("_rnk")
        )
    a = sig_a.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"),
        "band_id", "band_key",
    )
    b = sig.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"),
        "band_id", "band_key",
    )
    sim = F.expr(_pair_dot_expr("va", "vb", dim)) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        # a pair colliding in k bands appears k times with identical
        # payloads — dedupe BEFORE the cosine verify so the dot runs
        # once per candidate pair
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= threshold)
        .select("id_a", "id_b", F.round("_sim", 6).alias("sim"))
    )


def ivf_ann(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    probe_cells: int = 3,
    query_ids_below: int = 10,
    k: int = 5,
) -> DataFrame:
    """ANN via IVF-flat: partition vectors into cells around seed
    centroids, search only the query's nearest ``probe_cells`` cells.

    Centroids are a deterministic one-shot seed set (the ``n_cells``
    lowest-id base vectors — no Lloyd iterations, so results are
    reproducible and the whole operator stays declarative). Base
    vectors are assigned to their nearest centroid; queries probe
    several cells to recover recall lost to cell-boundary effects.
    At 100 TB: centroids broadcast (metadata-scale), assignment is a
    narrow map, candidate generation is an equi-join on cell id —
    the same shuffle shape as the LSH path, with tunable recall via
    ``probe_cells``.
    """
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    base = _spread(e.filter(F.col("id") >= query_ids_below)).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("bv")
    )
    queries = e.filter(F.col("id") < query_ids_below).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    cents = (
        e.filter(F.col("id") >= query_ids_below)
        .orderBy("id")
        .limit(n_cells)
        .select(F.col("id").alias("cell_id"), F.col("v").alias("cv"))
    )

    def assign(df: DataFrame, vec: str, out: str, top: int) -> DataFrame:
        sim = V.cosine(F.col(vec), F.col("cv"))
        w = Window.partitionBy(df.columns[0]).orderBy(
            F.desc("_csim"), F.asc("cell_id")
        )
        return (
            df.crossJoin(broadcast(cents))
            .withColumn("_csim", sim)
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= top)
            .select(*df.columns, F.col("cell_id").alias(out))
        )

    base_cells = assign(base, "bv", "cell", 1)
    query_cells = assign(queries, "qv", "cell", probe_cells)
    sim = V.cosine(F.col("qv"), F.col("bv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        base_cells.join(broadcast(query_cells), "cell")
        .select("query_id", "neighbor_id", sim.alias("_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )


def quantized_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids_below: int = 10,
    k: int = 5,
    rerank_factor: int = 4,
) -> DataFrame:
    """ANN via int8 scalar quantization + exact re-rank — the
    memory-bandwidth scale path.

    Each vector is quantized by its OWN absmax to int8
    (``q_i = round(127 · v_i / absmax)``). Cosine is scale-invariant,
    so per-vector scaling cancels exactly and no global statistics
    pass (or driver collect) is needed; the only error is the ±0.5
    rounding noise. The coarse pass scores candidates on the int8
    arrays — at 100 TB that is 4-8× less scan/shuffle byte-width than
    float vectors, which is the entire cost of a brute-force pass —
    then the top ``k·rerank_factor`` per query are re-ranked at full
    precision (a hash join back to the float table on neighbor_id,
    candidate side broadcast since it is queries·k·factor rows).

    Output schema matches ``cosine_topk``; recall vs the exact
    baseline is pinned in tests/test_ann.py.
    """
    e = emb.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    # quantization as chained parsed expr strings (3 py4j calls, not
    # ~30 lambda-conversion round trips — the same plan-build lever as
    # banded_neardup_pairs' signature). Values unchanged:
    # _am = absmax or 1.0 when absmax == 0 (abs values ≥ 0, so
    # nullif/coalesce is exactly the old when/otherwise);
    # q8  = round(v_i/_am*127) as int; n8 hoists the int-norm out of
    # the pair loop (one per vector).
    qz = (
        e.selectExpr(
            "id", "v",
            "coalesce(nullif(array_max(transform(v, x -> abs(x))), 0D), 1.0D) AS _am",
        )
        .selectExpr(
            "id", "v",
            "transform(v, x -> cast(round(x / _am * 127) AS int)) AS q8",
        )
        .selectExpr(
            "id", "v", "q8",
            "sqrt(cast(aggregate(zip_with(q8, q8, (a, b) -> a * b), 0L,"
            " (acc, x) -> acc + x) AS double)) AS n8",
        )
    )
    base8 = _spread(qz.filter(F.col("id") >= query_ids_below)).select(
        F.col("id").alias("neighbor_id"), F.col("q8").alias("bq"), F.col("n8").alias("bn")
    )
    q8 = qz.filter(F.col("id") < query_ids_below).select(
        F.col("id").alias("query_id"), F.col("q8").alias("qq"), F.col("n8").alias("qn")
    )
    dot8 = F.aggregate(
        F.zip_with(F.col("qq"), F.col("bq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    wq = Window.partitionBy("query_id").orderBy(F.desc("_qs"), F.asc("neighbor_id"))
    cand = (
        base8.crossJoin(broadcast(q8))
        .select(
            "query_id",
            "neighbor_id",
            (dot8 / (F.col("qn") * F.col("bn"))).alias("_qs"),
        )
        .withColumn("_qr", F.row_number().over(wq))
        .filter(F.col("_qr") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank on the pruned pool, full-precision vectors
    base_full = e.select(F.col("id").alias("neighbor_id"), F.col("v").alias("bv"))
    q_full = e.filter(F.col("id") < query_ids_below).select(
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
