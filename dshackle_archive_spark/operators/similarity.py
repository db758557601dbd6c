"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline, and an LSH-bucketed
variant (random-hyperplane signs) as the scale path — both pure Catalyst
expressions (unrolled or HOF dot products; no UDFs).

Scale design
------------
Brute force is O(Q·N) — fine when the query set is small (broadcast the
queries, scan the corpus once, per-partition top-k via window). For N×N
all-pairs at 100 TB use ``hyperplane_lsh`` buckets: candidates share a
sign-pattern bucket, turning the similarity join into an equi join; recall
is tuned by ``n_tables`` independent hash tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..core.checkpoint import reliable_checkpoint


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Vector dot product (HOF fold; ``dim`` accepted for signature
    stability but ignored). A fixed-dim UNROLLED 64-term product-add tree
    was tried and measured SLOWER at every scale once norms were hoisted
    out of the per-pair expression (3.3 s vs 0.9 s at a 100k corpus): the
    ~190-node tree overflows codegen limits into interpreted tree-walks
    and pays 64 py4j round-trips per plan build. The fold sums in index
    order, so results are bit-stable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Per-pair cosine. Callers that score MANY pairs should hoist
    ``_norm`` into a column on each join side and divide a lone ``_dot``
    by the norm product — N+Q norm evaluations instead of 2·N·Q (the
    pattern cosine_topk / ann_topk / ivf_topk / reranked_topk use)."""
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


# NOTE on plan-build cost: constructing vector expressions element-by-element
# with F.lit() costs one py4j round-trip per element — thousands of calls for
# a 64-dim × 48-plane signature (~4 s of pure driver time). Constant arrays
# are therefore built as ONE ``F.expr("array(...)")`` string (single JVM
# parse). Fully unrolling per-row arithmetic into flat Add/Multiply trees
# was measured SLOWER at both tested sizes (one 64-term dot AND the 48-plane
# signature projection): large expression trees overflow codegen limits into
# interpreted tree-walks — the per-row math stays in the HOF forms above,
# with norms hoisted to per-side columns so each pair pays ONE fold.


def const_array(values: list[float]) -> Column:
    """A constant double-array column from one parsed SQL literal."""
    return F.expr("array(" + ",".join(f"{v!r}D" for v in values) + ")")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector the k nearest corpus
    vectors (excluding itself). Queries are broadcast; ranking has a total
    tiebreak (sim desc, neighbor id asc) for determinism.

    Norms are PRECOMPUTED as columns on each side before the pair join —
    N+Q norm evaluations instead of 2·N·Q (the inlined ``cosine`` form
    re-derived both norms per pair, measured ~2× slower end-to-end), and
    the per-pair expression shrinks to one dot product."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("c_nrm"),
    )
    sim = _dot(F.col("q_vec"), F.col("c_vec"), dim) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def hard_negative_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector the k most-similar corpus vectors with a DIFFERENT label —
    the near-misses a contrastive loss learns the most from (the
    in-batch-negatives / ANCE-style mining step of embedding-model
    pipelines). Same shape as :func:`cosine_topk` (broadcast queries,
    hoisted norms, windowed top-k) with the label inequality folded into
    the broadcast join condition, so the label filter costs nothing
    extra: the nested loop is still O(N·Q) against a handful of query
    rows, and same-label rows (including the query itself) never reach
    the ranking window."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("q_nrm"),
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("c_nrm"),
    )
    sim = _dot(F.col("q_vec"), F.col("c_vec"), dim) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = c.join(
        F.broadcast(q), F.col("query_label") != F.col("neighbor_label")
    ).select("query_id", "query_label", "neighbor_id", "neighbor_label", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label", "rank", "sim"
        )
    )


def _seed_row(
    vectors: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> DataFrame:
    """The K seed vectors folded into ONE row as a sorted array-of-structs.

    Broadcasting this 1-row table lets every downstream cell scoring happen
    map-side (a BroadcastNestedLoopJoin against one row is a projection, not
    a shuffle) — the K-row global agg shuffles only K rows."""
    seeds = vectors.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"),
        F.col(vec_col).alias("seed_vec"),
        _norm(F.col(vec_col)).alias("seed_nrm"),
    )
    return seeds.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("cell_id", "seed_vec", "seed_nrm"))
        ).alias("_seeds")
    )


def _probe_cells(
    scope: Column, vec: Column, nprobe: int, vec_nrm: Column | None = None
) -> Column:
    """Top-``nprobe`` cells for ``vec`` against the ``_seeds`` array, entirely
    map-side: score every seed in one projection, sort by (sim desc, cell_id
    asc) via struct ordering on (-sim, cell_id), slice the prefix.

    Norm hoisting (round 8): seed norms ride IN the seed structs and the
    vector's own norm should be passed as a precomputed column
    (``vec_nrm``) — the inlined ``cosine`` form re-derived both norms per
    (vector, seed) pair, tripling the fold work of the assign stage and
    dominating at large K (measured 105 s → 23 s for K=128 × 38k
    vectors). Values are bit-identical: same dot fold, same
    ``norm(vec) * norm(seed)`` operand order, same round-6 grid."""
    vn = vec_nrm if vec_nrm is not None else _norm(vec)
    scored = F.transform(
        scope,
        lambda s: F.struct(
            (
                -F.round(
                    _dot(vec, s["seed_vec"]) / (vn * s["seed_nrm"]), 6
                )
            ).alias("neg_sim"),
            s["cell_id"].alias("cell_id"),
        ),
    )
    if nprobe == 1:
        # argmax only: min-by-struct-order ≡ slice(array_sort(·), 1, 1)
        # without materializing and sorting a K-struct array per row —
        # the assign stage runs this on every corpus vector, where the
        # O(K log K) sort was pure overhead at large K.
        return F.array(F.array_min(scored))
    return F.slice(F.array_sort(scored), 1, nprobe)


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _seed: DataFrame | None = None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """IVF coarse quantization: every vector joins the cell of its nearest
    seed vector (sampled coarse quantizer — the first ``n_cells`` vectors by
    id; deterministic, no trained centroids to drift between engines).

    Scale shape: the K seeds collapse into ONE broadcast row of
    array<struct>; each corpus vector scores all K cells in a single
    projection and picks the argmax with ``array_max`` — zero shuffle on the
    corpus side (round 2 ranked through a ``Window.partitionBy(vec_id)``,
    which shuffled N·K rows). Output: ``vec_id, cell_id``.

    ``keep`` names extra input columns carried through unchanged — the
    assignment is map-side, so a consumer that needs the vector alongside
    its cell (semantic dedup) rides the same projection instead of
    re-joining the corpus on ``vec_id`` afterwards (guide §2.4: that join
    was a removable corpus-scale shuffle of both sides).
    """
    best = F.element_at(
        _probe_cells(F.col("_seeds"), F.col(vec_col), 1, F.col("_vnrm")), 1
    )
    seed = _seed if _seed is not None else F.broadcast(
        _seed_row(vectors, n_cells, id_col, vec_col)
    )
    return (
        vectors.withColumn("_vnrm", _norm(F.col(vec_col)))
        .crossJoin(seed)
        .select(
            F.col(id_col).alias("vec_id"),
            best["cell_id"].alias("cell_id"),
            *[F.col(c) for c in keep],
        )
    )


def ivf_candidates(
    vectors: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF candidate-generation half on its own: each query probes its
    ``nprobe`` nearest cells, candidates = members of probed cells →
    ``(query_id, neighbor_id)``. Shared by IVF-flat top-k (exact rerank)
    and IVF+PQ (ADC rerank) — the coarse quantizer is the same either way.

    One broadcast seed row feeds assign AND probe ranking (ReusedExchange);
    the only join is the ``cell_id`` equi join; only ids shuffle."""
    seed = F.broadcast(_seed_row(vectors, n_cells, id_col, vec_col))
    assign = ivf_assign(vectors, n_cells, id_col, vec_col, _seed=seed)
    probes = (
        queries.withColumn("_vnrm", _norm(F.col(vec_col)))
        .crossJoin(seed)
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(
                _probe_cells(
                    F.col("_seeds"), F.col(vec_col), nprobe, F.col("_vnrm")
                )
            ).alias("_p"),
        )
        .select("query_id", F.col("_p.cell_id").alias("cell_id"))
    )
    return probes.join(assign, "cell_id").filter(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", F.col("vec_id").alias("neighbor_id"))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: each query probes its ``nprobe`` nearest
    cells and runs exact cosine only against their members — the classic
    inverted-file ANN shape (scan cost N·nprobe/n_cells instead of N).

    Both stages reuse the SAME 1-row broadcast seed array (built once — one
    K-row agg, one broadcast; Catalyst emits a ReusedExchange for the second
    consumer); candidates come from an equi join on ``cell_id``, never an
    all-pairs product. Probe ranking is the same map-side array sort as the
    assign stage (no window shuffle)."""
    cand = ivf_candidates(vectors, queries, n_cells, nprobe, id_col, vec_col)
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("q_nrm"),
    )
    cv = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("c_nrm"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"), dim)
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _hyperplane(dim: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a splitmix64-style hash —
    reproducible across engines and runs without RNG state."""
    out = []
    for i in range(dim):
        x = (table * 1_000_003 + bit * 10_007 + i * 97 + 0x9E3779B9) & 0xFFFFFFFF
        x ^= x >> 16
        x = (x * 0x85EBCA6B) & 0xFFFFFFFF
        x ^= x >> 13
        x = (x * 0xC2B2AE35) & 0xFFFFFFFF
        x ^= x >> 16
        out.append((x / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def hyperplane_signatures(
    vectors: DataFrame,
    dim: int,
    n_tables: int = 2,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: per (table) a ``n_bits``-char sign bucket.

    The whole signature (all tables × bits, plane weights inlined as double
    literals) is ONE ``F.expr`` string — a single JVM parse instead of
    ~100 py4j-built lambda columns, which costs seconds of pure driver time
    at 48+ planes. The arithmetic is the same zip_with/aggregate fold as
    ``_dot`` (identical summation order → identical sign bits)."""
    structs = []
    for t in range(n_tables):
        bits = []
        for b in range(n_bits):
            arr = "array(" + ",".join(f"{w!r}D" for w in _hyperplane(dim, t, b)) + ")"
            dot = (
                f"aggregate(zip_with({vec_col}, {arr}, "
                "(x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
            )
            bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
        structs.append(
            f"named_struct('table_id', {t}, 'bucket', concat({','.join(bits)}))"
        )
    sig = F.expr("array(" + ",".join(structs) + ")")
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.explode(sig).alias("s")
    ).select("vec_id", F.col("s.table_id").alias("table_id"), F.col("s.bucket").alias("bucket"))


def ann_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Vectors sharing any (table, bucket) — the ANN candidate equi join."""
    a = signatures.alias("a")
    b = signatures.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


def ann_topk(
    vectors: DataFrame,
    dim: int,
    k: int = 3,
    n_tables: int = 4,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """LSH-bucketed approximate top-k: exact cosine only within buckets.

    ``materialize`` (default) checkpoints the signature table before the
    self-join: the n_tables×n_bits-dot signature projection is the dominant
    cost, and the self-join's two sides would otherwise each recompute it —
    materializing N·n_tables tiny (id, table, bucket) rows once measures
    ~40% faster end-to-end at sf0.1. At 100 TB the signature table would be
    persisted as its own dataset for exactly this reason (and reused across
    queries)."""
    sigs = hyperplane_signatures(vectors, dim, n_tables, n_bits, id_col, vec_col)
    if materialize:
        sigs = sigs.transform(reliable_checkpoint)
    cands = ann_candidate_pairs(sigs)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col), dim).alias("nrm"),
    )
    va = v.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    vb = v.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    both = (
        cands.unionByName(
            cands.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"))
        )
        .join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            F.col("vec_a").alias("query_id"),
            F.col("vec_b").alias("neighbor_id"),
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"), dim)
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_train(
    vectors: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means for a TRAINED IVF coarse quantizer — the upgrade
    path from ``ivf_assign``'s sampled quantizer. Deterministic init (the
    first ``n_cells`` vectors by id), then ``iters`` rounds of assignment +
    mean update.

    Scale shape per round:
    - assign: centroids fold into ONE broadcast row; every vector scores
      all K cells in a single map-side projection (same zero-corpus-shuffle
      plan as ``ivf_assign``);
    - update: ``posexplode`` to (cell, dim) with partially-aggregated
      ``avg`` — the shuffle carries K·d partial sums per map task, never
      N·d raw rows;
    - centroids are ``localCheckpoint``ed each round so the iterative plan
      stays flat.

    Component means round to 6 decimals (mirrored by the SQL oracle) so
    float summation order cannot leak into assignments. Returns
    ``(assignments, centroids)``: the FINAL round's ``(vec_id, cell_id)``
    and ``(cell_id, cvec)`` updated from it."""
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    cents = v.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("vec").alias("cvec")
    )
    assign = None
    v = v.withColumn("_vnrm", _norm(F.col("vec")))  # invariant across rounds
    for _ in range(iters):
        seed = F.broadcast(
            cents.groupBy().agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("cell_id"),
                            F.col("cvec").alias("seed_vec"),
                            _norm(F.col("cvec")).alias("seed_nrm"),
                        )
                    )
                ).alias("_seeds")
            )
        )
        best = F.element_at(
            _probe_cells(F.col("_seeds"), F.col("vec"), 1, F.col("_vnrm")), 1
        )
        assign = v.crossJoin(seed).select(
            "vec_id", "vec", best["cell_id"].alias("cell_id")
        )
        comp = (
            assign.select("cell_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
        )
        cents = (
            comp.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cx"))).alias("_ps"))
            .select("cell_id", F.transform("_ps", lambda s: s["cx"]).alias("cvec"))
            .transform(reliable_checkpoint)
        )
    return assign.select("vec_id", "cell_id"), cents


def quantized_vectors(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = round(max|x|/127, 6),
    q[i] = round(x[i]/scale). The scale is materialized in its own
    projection before the transform consumes it (HOFs run interpreted —
    an inlined scale would recompute the array-max per element).

    An all-zero embedding yields scale 0; x/0 would be NULL in Spark but
    inf in DuckDB, so that case is pinned explicitly: scale 0 → zero qvec
    (exact — the vector has no magnitude to encode)."""
    mx = F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
    scaled = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.round(mx / 127.0, 6).alias("scale"),
    )
    return scaled.select(
        id_col,
        vec_col,
        "scale",
        F.transform(
            vec_col,
            lambda x: F.when(F.col("scale") == 0.0, F.lit(0))
            .otherwise(F.round(x.cast("double") / F.col("scale")).cast("int"))
            .cast("int"),
        ).alias("qvec"),
    )


def reranked_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Two-stage retrieval: an int8-quantized first pass shortlists
    ``shortlist`` candidates per query, then exact float cosine re-ranks
    the shortlist to top-``k``.

    This is the memory-bandwidth play every large ANN deployment makes: at
    100 TB the first pass streams 4×-smaller int8 vectors (and its dot
    products are exact integer arithmetic — bit-deterministic), while the
    expensive float math touches only ``shortlist`` rows per query.

    Determinism: integer dots are exact; the approx score multiplies in a
    fixed order (dot × query-scale × corpus-scale); both rankings carry a
    total tiebreak (score desc, neighbor id asc).
    """
    c = quantized_vectors(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("scale").alias("c_scale"),
        F.col("qvec").alias("c_q"),
        _norm(F.col(vec_col), dim).alias("c_nrm"),
    )
    q = quantized_vectors(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("scale").alias("q_scale"),
        F.col("qvec").alias("q_q"),
        _norm(F.col(vec_col), dim).alias("q_nrm"),
    )
    intdot = F.aggregate(
        F.zip_with("q_q", "c_q", lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    ap = intdot.cast("double") * F.col("q_scale") * F.col("c_scale")
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", "q_vec", "c_vec", "q_nrm", "c_nrm",
        ap.alias("ap"),
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("ap"), F.asc("neighbor_id"))
    short = (
        pairs.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= shortlist)
        .drop("r1")
    )
    sim = F.round(
        _dot(F.col("q_vec"), F.col("c_vec"), dim)
        / (F.col("q_nrm") * F.col("c_nrm")),
        6,
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        short.select("query_id", "neighbor_id", "ap", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            "sim",
            F.round("ap", 6).alias("approx_sim"),
        )
    )


def pq_codebook_row(
    vectors: DataFrame,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebook folded into ONE broadcastable row:
    the first ``n_codes`` vectors as a k-sorted array of (k, cvec) structs
    (the same sampled-deterministic move as ``ivf_assign``'s seeds — no
    trained codebook to drift between engines)."""
    codes = vectors.filter(F.col(id_col) < n_codes).select(
        F.col(id_col).alias("k"), F.col(vec_col).alias("cvec")
    )
    return codes.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("k", "cvec"))).alias("_codes")
    )


def _sub_l2(a: Column, b: Column) -> Column:
    """Rounded squared-L2 between two equal-length array slices (map-side
    fold in array order; rounded to 6 so the argmin tiebreak is identical
    across engines — the ``_probe_cells`` precedent)."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_encode(
    vectors: DataFrame,
    n_codes: int = 16,
    n_sub: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _codebook: DataFrame | None = None,
) -> DataFrame:
    """PQ encoding: each vector → ``n_sub`` small codes (nearest codeword
    per subspace, L2, ties to the smaller k) → ``(vec_id, code0..code{M-1})``.

    Scale shape: the codebook is ONE broadcast row; every subspace argmin
    is a map-side ``array_min`` over rounded (dist, k) structs — zero
    shuffle on the corpus, and the output is dim/UInt8-sized per vector
    (the whole point of PQ: a 64-float vector compresses to M bytes of
    codes for memory-resident ANN over billions of vectors)."""
    sub_dim = dim // n_sub
    seed = _codebook if _codebook is not None else F.broadcast(
        pq_codebook_row(vectors, n_codes, id_col, vec_col)
    )
    cols = [F.col(id_col).alias("vec_id")]

    def _scorer(m, sub):
        # factory, not default-arg binding: Spark reads a Python lambda's
        # PARAMETER COUNT as the higher-order-function arity, so defaults
        # would make transform() look 3-ary
        return lambda c: F.struct(
            _sub_l2(sub, F.slice(c["cvec"], m * sub_dim + 1, sub_dim)).alias("d"),
            c["k"].alias("k"),
        )

    for m in range(n_sub):
        sub = F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim)
        scored = F.transform(F.col("_codes"), _scorer(m, sub))
        cols.append(F.array_min(scored)["k"].alias(f"code{m}"))
    return vectors.crossJoin(seed).select(*cols)


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_codes: int = 16,
    n_sub: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """PQ/ADC approximate top-k: queries precompute a per-subspace
    dot-product table against the codebook (M·K entries), then every
    corpus vector is scored by M table lookups on its codes — the
    asymmetric-distance-computation scan (Jégou et al., PAMI'11) that
    makes billion-scale ANN memory-resident.

    Plan: ONE codebook row broadcast to both stages (encode + ADC
    tables); the scan is corpus-codes × broadcast query tables (the same
    small-non-equi broadcast class as ``cosine_topk``), windowed top-k
    per query. No shuffle touches raw vectors — only (vec_id, M codes)."""
    sub_dim = dim // n_sub
    seed = F.broadcast(pq_codebook_row(vectors, n_codes, id_col, vec_col))
    codes = pq_encode(vectors, n_codes, n_sub, dim, id_col, vec_col, _codebook=seed)
    qcols = [F.col(id_col).alias("query_id")]

    def _adc(m, sub):
        return lambda c: F.round(
            F.aggregate(
                F.zip_with(
                    sub,
                    F.slice(c["cvec"], m * sub_dim + 1, sub_dim),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    for m in range(n_sub):
        sub = F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim)
        qcols.append(F.transform(F.col("_codes"), _adc(m, sub)).alias(f"adc{m}"))
    qtab = queries.crossJoin(seed).select(*qcols)
    if candidates is None:
        cand = codes.crossJoin(F.broadcast(qtab)).filter(
            F.col("vec_id") != F.col("query_id")
        )
    else:
        # IVF-restricted ADC: score only the coarse quantizer's candidate
        # list (query_id, neighbor_id) — the IVF-PQ composition. Codes join
        # by id (equi), ADC tables still broadcast.
        cand = (
            candidates.withColumnRenamed("neighbor_id", "vec_id")
            .join(codes, "vec_id")
            .join(F.broadcast(qtab), "query_id")
        )
    approx = F.round(
        sum(
            F.element_at(f"adc{m}", (F.col(f"code{m}") + 1).cast("int"))
            for m in range(n_sub)
        ),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            approx.alias("approx_dot"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "approx_dot")
    )


def semantic_dedup(
    vectors: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    with a coarse quantizer, then mark near-identical pairs WITHIN each
    cluster — the semantic upgrade over MinHash dedup (catches paraphrases
    with no token overlap). Keep-lowest-id greedy semantics as in the
    MinHash/exact dedup family: a vector is removed when some smaller-id
    cluster-mate has cosine >= ``threshold``.

    Returns ``(vec_id, cell_id, kept_by, max_sim)`` for removed vectors
    (kept_by = smallest such partner, max_sim = rounded max cosine).

    Scale shape: the quantizer is the SAME map-side broadcast-seed argmax
    as IVF assign (zero corpus shuffle); the pairwise stage is an equi
    self-join on ``cell_id`` — cost Σ|cell|², the SemDeDup contract (cells
    are bounded by the quantizer's balance, never the corpus), and norms
    are hoisted to per-side columns so each pair pays one fold. Cross-
    cluster duplicates are missed by design — that is the documented
    SemDeDup approximation that makes it linear-ish at 100 TB.

    Sizing ``n_cells``: keep K ∝ N (fixed K makes the pair stage N²/K).
    The measured trade-off (PERF.md round-8 K-sweep) is
    K* ≈ √(c_pair·N / 2c_assign), and in this HOF reference
    implementation a per-seed assign score costs ~10× a pair dot — at
    production K (10³+) swap the assign stage for the v12-style
    Arrow/BLAS ``mapInPandas`` seam (one GEMM per partition against the
    broadcast seed matrix); the dataflow around it is unchanged."""
    # cell ids ride the map-side assign projection itself (keep=) — the old
    # ``vectors ⋈ assign`` on vec_id re-joined the corpus with a projection
    # of itself, a corpus-scale shuffle of BOTH sides that carried the full
    # vectors (guide §2.4 "remove shuffles outright"); the cell_id
    # expression is unchanged, so assignments are bit-identical
    v = (
        ivf_assign(vectors, n_cells, id_col, vec_col, keep=(vec_col,))
        .select("vec_id", "cell_id", F.col(vec_col).alias("_vec"))
        .withColumn("_nrm", _norm(F.col("_vec"), dim))
    )
    a = v.select(
        F.col("vec_id").alias("_ida"),
        "cell_id",
        F.col("_vec").alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = v.select(
        F.col("vec_id").alias("_idb"),
        "cell_id",
        F.col("_vec").alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    cos = F.round(
        _dot(F.col("_va"), F.col("_vb"), dim)
        / (F.col("_na") * F.col("_nb")),
        6,
    )
    return (
        a.join(b, "cell_id")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .groupBy(F.col("_idb").alias("vec_id"), F.col("cell_id"))
        .agg(F.min("_ida").alias("kept_by"), F.max("cos").alias("max_sim"))
    )


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Radius retrieval (FAISS ``range_search``): ALL corpus vectors with
    cosine >= ``tau`` per query — the dedup-threshold twin of top-k, and
    structurally cheaper at scale: the scored stream filters on the
    threshold map-side, so there is NO per-query window/sort and the
    result shuffle carries only the (typically sparse) survivors. Same
    norm-hoisting as ``cosine_topk`` (N+Q norm evaluations, one dot per
    pair)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("c_nrm"),
    )
    sim = _dot(F.col("q_vec"), F.col("c_vec"), dim) / (
        F.col("q_nrm") * F.col("c_nrm")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .filter(F.col("sim") >= tau)
    )


def covariance_cells(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Upper-triangle covariance cells of an embedding column →
    ``(i, j, cov)`` with ``i <= j`` — the distributed PCA/whitening
    front-end (collect the dim²-sized result, eigendecompose driver-side,
    broadcast the rotation back).

    Scale design: each PARTITION reduces to one partial Gramian before
    anything shuffles — an Arrow-batched ``mapInPandas`` stage folds its
    batches into ``Xᵀ·X`` (one float64 BLAS call per batch), the
    per-dimension sums, and the row count, and emits exactly
    dim·(dim+1)/2 + dim + 1 rows per partition. The ONE shuffle then
    reduces partitions×cells rows, so corpus size never appears in
    shuffle volume. This is the canonical Pandas-UDF case: an earlier
    all-Catalyst version expanded every vector into its 2,080
    upper-triangle products via nested ``transform`` lambdas — higher-
    order functions evaluate interpreted, outside codegen, and the
    measured cost was 15.4 s at sf0.1 (2,000 vectors) vs <1 s for the
    vectorized partial-Gramian doing the same float64 arithmetic.
    Assumes one row per ``vec_id`` (the count is the row count)."""

    def _gram(batches):
        import numpy as np
        import pandas as pd

        g = np.zeros((dim, dim), dtype=np.float64)
        s = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(pdf)
        if n == 0:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(dim), [dim]]).astype("int32"),
                "j": np.concatenate([ju, np.full(dim, dim), [dim]]).astype(
                    "int32"
                ),
                "val": np.concatenate([g[iu, ju], s, [float(n)]]),
            }
        )

    red = (
        emb.select("embedding")
        .mapInPandas(_gram, "i int, j int, val double")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
    )
    prods = red.filter(F.col("j") < dim).select(
        "i", "j", F.col("val").alias("sxy")
    )
    sums = red.filter((F.col("j") == dim) & (F.col("i") < dim)).select(
        "i", F.col("val").alias("sx")
    )
    nn = red.filter(F.col("i") == dim).select(F.col("val").alias("n"))
    si = sums.select(F.col("i").alias("i"), F.col("sx").alias("sx_i"))
    sj = sums.select(F.col("i").alias("j"), F.col("sx").alias("sx_j"))
    return (
        prods.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("i").cast("bigint").alias("i"),
            F.col("j").cast("bigint").alias("j"),
            (
                F.col("sxy") / F.col("n")
                - (F.col("sx_i") / F.col("n")) * (F.col("sx_j") / F.col("n"))
            ).alias("cov"),
        )
    )


def top_eigenvector(cov_cells: DataFrame, iters: int = 4) -> DataFrame:
    """Leading eigenvector of a symmetric matrix given as upper-triangle
    cells ``(i, j, cov)`` via fixed-count power iteration →
    ``(i, w, lam)``: the unit eigenvector entries and the Rayleigh
    quotient λ = vᵀCv (the variance explained by the first principal
    component). Deterministic: starts from e₀ and runs exactly ``iters``
    matvec+normalize rounds — a pure, replayable dataflow (the same
    fixed-iteration discipline as ``dedup.pagerank``).

    Scale design — the Spark MLlib split (RowMatrix.computePrincipalComponents
    is built the same way: the Gramian reduces DISTRIBUTED, the
    eigensolve runs LOCAL on the driver): ``covariance_cells`` collapses
    the corpus to dim² cells in one pass; those cells are metadata (64
    dims → 2,080 rows regardless of corpus size), so the power iteration
    itself runs driver-side in numpy. An earlier all-DataFrame version
    ran each matvec as a broadcast join + 64-row grouped agg with a
    localCheckpoint per round — semantically identical but 8 sequential
    job barriers deep, measured 24 s at sf0.1 where this form is <1 s
    after the covariance pass; scheduling dim-row jobs is pure overhead
    the driver shouldn't pay. Iteration count, e₀ start, and
    normalize-per-round numerics are unchanged (the round-6 outputs are
    insensitive to float summation order on a spiked spectrum — the
    DataFrame, DuckDB-CTE, and numpy forms all agree, unit-tested)."""
    import numpy as np

    rows = cov_cells.select("i", "j", "cov").collect()
    dims = sorted({r["i"] for r in rows} | {r["j"] for r in rows})
    idx = {d: n for n, d in enumerate(dims)}
    k = len(dims)
    c = np.zeros((k, k), dtype=np.float64)
    for r in rows:
        a, b = idx[r["i"]], idx[r["j"]]
        c[a, b] = r["cov"]
        c[b, a] = r["cov"]  # symmetrize the strict-upper cells
    v = np.zeros(k, dtype=np.float64)
    v[0] = 1.0
    for _ in range(iters):
        mv = c @ v
        v = mv / float(np.sqrt(np.sum(mv * mv)))
    lam = float(v @ (c @ v))
    spark = cov_cells.sparkSession
    return spark.createDataFrame(
        [(int(d), float(v[idx[d]]), lam) for d in dims],
        "i long, w double, lam double",
    )


def cluster_quality(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Davies-Bouldin-style quality audit of an IVF partitioning — the
    health check you run on the coarse quantizer BEFORE trusting its
    recall (compare FAISS's index stats; reference has no vector surface,
    this extends SURVEY §2.11's retrieval family).

    Per cell: member count, scatter (mean cosine DISTANCE of members to
    the cell seed), and the Davies-Bouldin component
    ``max_{j≠i} (scatter_i + scatter_j) / d(seed_i, seed_j)`` — low is
    good (tight cells, far apart). Uses the same deterministic
    first-K-by-id seeds as :func:`ivf_assign`, so the audit grades the
    exact index the retrieval queries use.

    Scale shape: ONE corpus pass — the broadcast 1-row seed table assigns
    every vector map-side (zero corpus shuffle) and the per-cell reduce
    emits K rows. Everything after is K-row metadata: the K×K seed
    separation grid is a self-join of a K-row table (broadcast, bounded
    by the cell-count knob — the documented IVF contract, never corpus
    data). Degenerate duplicate seeds (separation 0) are excluded from
    the max rather than emitting infinities.
    """
    seed = F.broadcast(_seed_row(vectors, n_cells, id_col, vec_col))
    best = F.element_at(
        _probe_cells(F.col("_seeds"), F.col(vec_col), 1, F.col("_vnrm")), 1
    )
    assigned = (
        vectors.withColumn("_vnrm", _norm(F.col(vec_col)))
        .crossJoin(seed)
        .select(
            best["cell_id"].alias("cell_id"),
            (-best["neg_sim"]).alias("sim"),
        )
    )
    # per-member distances are already on the round-6 grid, so summing them
    # as DECIMAL keeps the cell mean exact and order-independent (a double
    # sum's value would depend on partial-agg order). The mean itself stays
    # UNROUNDED: decimal→double conversion and integer-operand division are
    # both correctly-rounded IEEE ops — bit-identical on any engine —
    # whereas a final round(·, 6) can land on an exact half-grid boundary
    # (n members dividing the micro-sum to ·.5) where HALF_UP vs scaled
    # nearest-int implementations legitimately disagree.
    cells = assigned.groupBy("cell_id").agg(
        F.count("*").alias("n"),
        (
            F.sum(
                F.round(F.lit(1.0) - F.col("sim"), 6).cast("decimal(18,6)")
            ).cast("double")
            / F.count("*")
        ).alias("scatter"),
    )
    seeds = seed.select(F.explode("_seeds").alias("s")).select(
        F.col("s.cell_id").alias("cell_id"), F.col("s.seed_vec").alias("vec")
    )
    sa = seeds.select(F.col("cell_id").alias("ca"), F.col("vec").alias("va"))
    sb = seeds.select(F.col("cell_id").alias("cb"), F.col("vec").alias("vb"))
    sep = (
        sa.join(F.broadcast(sb), F.col("ca") != F.col("cb"))
        .select(
            "ca",
            "cb",
            (F.lit(1.0) - F.round(cosine(F.col("va"), F.col("vb")), 6)).alias(
                "d"
            ),
        )
        .filter(F.col("d") > 0)
    )
    ci = cells.select(
        F.col("cell_id").alias("ca"), F.col("n"), F.col("scatter")
    )
    cj = cells.select(
        F.col("cell_id").alias("cb"), F.col("scatter").alias("scatter_j")
    )
    return (
        sep.join(F.broadcast(ci), "ca")
        .join(F.broadcast(cj), "cb")
        .groupBy(F.col("ca").alias("cell_id"))
        .agg(
            F.any_value(F.col("n")).alias("n"),
            F.any_value(F.col("scatter")).alias("scatter"),
            F.max((F.col("scatter") + F.col("scatter_j")) / F.col("d")).alias(
                "db_component"
            ),
        )
    )


def ivf_topk_curve(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF top-k at SEVERAL nprobe settings in one pass → adds an
    ``nprobe`` column to the ``ivf_topk`` output. Because probed cells
    nest (the nprobe=1 cell is the first of the nprobe=4 list), the
    corpus assign, the candidate join, and the exact rerank all run ONCE
    at max(nprobes); each setting is then a filter on the candidate's
    probe rank plus its own top-k window. Three separate ``ivf_topk``
    calls would re-assign the whole corpus per setting — this form is
    what a recall-vs-nprobe audit (v15) should pay: one index pass.

    Scores and tiebreaks match ``ivf_topk`` exactly (round-6 sim desc,
    neighbor id asc), so each nprobe slice equals the standalone run."""
    max_np = max(nprobes)
    seed = F.broadcast(_seed_row(vectors, n_cells, id_col, vec_col))
    assign = ivf_assign(vectors, n_cells, id_col, vec_col, _seed=seed)
    probes = (
        queries.withColumn("_vnrm", _norm(F.col(vec_col)))
        .crossJoin(seed)
        .select(
            F.col(id_col).alias("query_id"),
            F.posexplode(
                _probe_cells(
                    F.col("_seeds"), F.col(vec_col), max_np, F.col("_vnrm")
                )
            ).alias("probe_pos", "_p"),
        )
        .select(
            "query_id",
            (F.col("probe_pos") + 1).alias("probe_rank"),
            F.col("_p.cell_id").alias("cell_id"),
        )
    )
    cand = probes.join(assign, "cell_id").filter(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", "probe_rank", F.col("vec_id").alias("neighbor_id"))
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col), dim).alias("q_nrm"),
    )
    cv = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col), dim).alias("c_nrm"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "probe_rank",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"), dim)
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("sim"),
        )
        .transform(reliable_checkpoint)  # one rerank feeds every nprobe slice
    )
    out = None
    for np_ in nprobes:
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id")
        )
        sliced = (
            scored.filter(F.col("probe_rank") <= np_)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                F.lit(np_).cast("bigint").alias("nprobe"),
                "query_id",
                "neighbor_id",
                "rank",
                "sim",
            )
        )
        out = sliced if out is None else out.unionByName(sliced)
    return out
