"""Approximate similarity search — the scale path beyond brute force.

The production ANN shapes over the `embeddings` table, each with the
candidate-generation/approximation step expressed identically in Spark
and in the DuckDB oracle (the approximation is *part of the declared
semantics*, so the hash-check verifies the full blocked pipeline, not
just the exact rerank):

* ``dedup_embedding_cosine`` — banded sign-LSH (4 bands × 3 hyperplanes)
  for candidate pairs, exact cosine rerank at a threshold. The embedding
  analogue of MinHash-LSH text dedup (same band/bucket/rerank skeleton as
  plans/analytics.py dedup_minhash_lsh).
* ``knn_ivf`` — IVF: a coarse quantizer (per-label centroid vectors =
  the codebook), inverted-list assignment by nearest centroid, nprobe=2
  probing, exact top-k within the probed lists.
* ``knn_ivf_trained`` — the same serving path with a 3-iteration
  Lloyd-trained codebook (unrolled-CTE oracle).
* ``knn_pq_scan`` — product quantization: corpus compressed to PQ_M
  sub-codebook ids, asymmetric-distance LUT scoring over code columns.
* ``knn_ivf_pq`` — the FAISS-style composition: IVF probing bounds WHICH
  vectors are scored, PQ bounds WHAT is read to score them.

Scale posture: candidate generation is always equi-join-on-bucket (shuffle
keyed on a small bucket id, never an all-pairs cross join); centroids and
probe tables are tiny → broadcast. At 100 TB the inverted lists would be
written bucket-partitioned so a probe touches only its partitions.
"""

from __future__ import annotations

from functools import reduce

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.deterministic import limb_sums, sum_from_limbs
from ..sources.readers import table
from .catalog import memo_plan, query, register_cache

LSH_BANDS = 4
LSH_PLANES_PER_BAND = 3  # sign bits per band → 8 buckets per band
NEARDUP_COSINE = 0.35
IVF_NPROBE = 2
IVF_TOPK = 5
N_QUERIES = 20


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product — accumulation order is fixed, so the
    double result is bit-identical to the oracle's sequential loop."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _dot_expr(a: str, b: str) -> str:
    """SQL rendering of :func:`_dot` over column NAMES — parsed once in the
    JVM instead of ~20 py4j lambda round-trips per call site (guide §5:
    measured ~0.45 s of pure driver build time per knn_ivf bench iteration
    before the hot helpers moved to expression strings). `0.0D` is the
    same double literal as F.lit(0.0); the lambdas are identical."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"


def _vectors(spark: SparkSession, sf_dir: str, widen: bool = True) -> DataFrame:
    # r16: guarded widen (see analytics._widen_if_narrow) — the knn
    # family's corpus passes (k×-amplifying centroid cross joins, dot
    # products) inherit the scan's split count, and the fixture's single
    # parquet split serialized them on one core. On a production-sized
    # corpus the guard leaves the scan partitioning alone.
    # ``widen=False`` is for QUERY-side branches that collapse to a
    # bounded handful of broadcast rows — routing those through the widen
    # would add an exchange stage for nothing (same reasoning as the
    # bruteforce query side, analytics.knn_cosine_bruteforce).
    from .analytics import _widen_if_narrow

    def build() -> DataFrame:
        v = table(spark, sf_dir, "embeddings")
        if widen:
            v = _widen_if_narrow(spark, v, "vec_id", amp=10)
        return v.selectExpr(
            "vec_id", "label", "cast(embedding AS array<double>) AS e"
        ).selectExpr("vec_id", "label", "e", f"sqrt({_dot_expr('e', 'e')}) AS nrm")

    return memo_plan(spark, sf_dir, ("embeddings",), f"vectors_w{int(widen)}", build)


def _band_bucket(b: int) -> Column:
    """Bucket id of band ``b``: 3 sign bits of dims 3b..3b+2 (axis-aligned
    hyperplanes — deterministic, no RNG, same arithmetic in the oracle)."""
    bits = [
        F.when(F.element_at("e", 3 * b + i + 1) >= 0, F.lit(1 << (2 - i))).otherwise(0)
        for i in range(LSH_PLANES_PER_BAND)
    ]
    return (bits[0] + bits[1] + bits[2]).cast("int")


def _band_bucket_sql(b: int) -> str:
    bits = " + ".join(
        f"CASE WHEN e[{3 * b + i + 1}] >= 0 THEN {1 << (2 - i)} ELSE 0 END"
        for i in range(LSH_PLANES_PER_BAND)
    )
    return f"CAST({bits} AS INTEGER)"


_BANDS_SQL = "\nUNION ALL\n".join(
    f"SELECT vec_id, {b} AS band, {_band_bucket_sql(b)} AS bucket FROM v"
    for b in range(LSH_BANDS)
)


@query(
    "dedup_embedding_cosine",
    tags=("dedup", "similarity", "lsh"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
), norms AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
), bands AS (
{_BANDS_SQL}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT c.vec_a AS vec_a, c.vec_b AS vec_b,
       ROUND(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 6) AS cosine
FROM cand c
JOIN norms x ON x.vec_id = c.vec_a
JOIN norms y ON y.vec_id = c.vec_b
WHERE ROUND(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 6) >= {NEARDUP_COSINE}
ORDER BY vec_a, vec_b
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-LSH: 4 bands
    of 3 axis hyperplanes each; a pair is a candidate iff it collides in
    ANY band; candidates are exactly reranked and kept at cosine ≥ 0.35.

    Scale: each vector emits 4 (band, bucket) rows → self-join keyed on the
    (band, bucket) pair is the only candidate-generation shuffle; DISTINCT
    collapses multi-band collisions before the (more expensive) rerank join
    fetches the vectors. No cross join anywhere.
    """
    v = _vectors(spark, sf_dir)
    bands = v.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _band_bucket(b).alias("bucket"))
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bucket")
    other = bands.select(
        F.col("vec_id").alias("vec_b"), F.col("band").alias("band_r"), F.col("bucket").alias("bucket_r")
    )
    cand = (
        bands.join(
            other,
            (F.col("band") == F.col("band_r"))
            & (F.col("bucket") == F.col("bucket_r"))
            & (F.col("vec_id") < F.col("vec_b")),
        )
        .select(F.col("vec_id").alias("vec_a"), "vec_b")
        .distinct()
    )
    x = v.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    y = v.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    cosine = F.expr(f"round({_dot_expr('ea', 'eb')} / (na * nb), 6)")
    return (
        cand.join(x, "vec_a")
        .join(y, "vec_b")
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= NEARDUP_COSINE)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


_CENTROID_SQL = """
expanded AS (
  SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
), cent AS (
  SELECT label, pos,
         CAST(SUM(CAST(val AS DECIMAL(30,8))) AS DOUBLE) / COUNT(val) AS c
  FROM expanded GROUP BY label, pos
), centv AS (
  SELECT label, list(c ORDER BY pos) AS ce FROM cent GROUP BY label
), centn AS (
  SELECT label, ce, sqrt(list_dot_product(ce, ce)) AS cnrm FROM centv
)"""


_KNN_IVF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), norms AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
),{_CENTROID_SQL}
, affinity AS (
  SELECT n.vec_id, c.label,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY ROUND(list_dot_product(n.e, c.ce) / (n.nrm * c.cnrm), 6) DESC, c.label
         ) AS rn
  FROM norms n CROSS JOIN centn c
), assign AS (
  SELECT vec_id, label AS bucket FROM affinity WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, label AS bucket FROM affinity
  WHERE rn <= {IVF_NPROBE} AND vec_id < {N_QUERIES}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON p.bucket = a.bucket
  WHERE a.vec_id <> p.query_id
), scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_dot_product(q.e, n.e) / (q.nrm * n.nrm), 6) AS cosine
  FROM cand c
  JOIN norms q ON q.vec_id = c.query_id
  JOIN norms n ON n.vec_id = c.neighbor_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {IVF_TOPK}
ORDER BY query_id, rank
"""


@query(
    "knn_ivf",
    headline=True,
    tags=("similarity", "knn", "ivf"),
    oracle=_KNN_IVF_ORACLE,
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: per-label centroids form the coarse codebook
    (k=10); every vector is assigned to its nearest centroid's inverted
    list; each query (vec_id < 20) probes its nprobe=2 nearest lists and
    exact-reranks only those candidates (cosine rounded to 6 dp, ties by
    neighbor_id — fully deterministic).

    Scale: the codebook is k×dim doubles → broadcast to every task, so
    assignment is a map-only pass over the corpus (no shuffle). Candidate
    fetch shuffles on the bucket id; with bucket-partitioned inverted-list
    storage this becomes partition pruning (read nprobe/k of the data).
    The same plan shape holds for trained k-means codebooks — training is
    orthogonal to the serving path implemented here.

    r16 (guide §1.2/§2.4): the codebook subtree (posexplode → exact mean →
    array assembly, a full corpus pass) used to be REBUILT for every
    consumer — the assignment pass and the probe pass each held their own
    copy, so the explode+aggregate ran twice per run. The k-row codebook
    is now persisted (register_cache lifecycle, released by the harness),
    so it is computed once and both broadcasts read the cached rows. The
    exact mean also sums through two long limbs instead of decimal(30,8)
    (|component| < 10^6 by construction at any corpus size — embeddings
    are unit-scale; functions/deterministic.py proves bit-identity).
    """
    v = _vectors(spark, sf_dir)

    # Codebook: per-label mean vector, assembled in dimension order.
    # r17: the codebook sub-plan (posexplode → limb mean → array assembly)
    # is a memoized lazy handle — building+analyzing it cost ~90 ms of
    # driver time per invocation (plans/catalog.py::memo_plan; the
    # persisted ROWS still release via release_caches, and persist()
    # re-arms the same handle afterwards).
    def build_codebook() -> DataFrame:
        expanded = v.select("label", F.posexplode("e").alias("pos", "val"))
        cent = expanded.groupBy("label", "pos").agg(
            *limb_sums(F.col("val"), "_c"),
            F.count("val").alias("_n"),
        ).select("label", "pos", (sum_from_limbs("_c", 8) / F.col("_n")).alias("c"))
        return (
            cent.groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("label", F.transform("pc", lambda s: s["c"]).alias("ce"))
            .withColumn("cnrm", F.expr(f"sqrt({_dot_expr('ce', 'ce')})"))
            .select(F.col("label").alias("clabel"), "ce", "cnrm")
        )

    centv = register_cache(
        memo_plan(
            spark, sf_dir, ("embeddings",), "ivf_codebook", build_codebook
        ).persist()
    )

    return _ivf_serve(
        v,
        centv,
        vq=_vectors(spark, sf_dir, widen=False),
        memo=(spark, sf_dir, "ivf_candidates"),
    )


def _ivf_candidates(v: DataFrame, centv: DataFrame, vq: DataFrame | None = None) -> DataFrame:
    """Inverted-list candidate generation: assign every vector to its
    nearest centroid's list, probe the nprobe nearest lists per query —
    (query_id, neighbor_id) pairs, scoring-agnostic (exact rerank and PQ
    rerank both consume this). ``vq`` (default ``v``) feeds the
    query-side probe branch — pass an un-widened frame so the ≤|Q| probe
    rows skip the corpus widen exchange."""
    if vq is None:
        vq = v
    # Affinity to every centroid (k rows per vector; the codebook side is
    # broadcast → map-side only).
    aff_cos = F.expr(f"round({_dot_expr('e', 'ce')} / (nrm * cnrm), 6)")
    w_aff = Window.partitionBy("vec_id").orderBy(F.desc("acos"), "clabel")

    def _rank_affinity(side: DataFrame) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(centv))
            .withColumn("acos", aff_cos)
            .withColumn("rn", F.row_number().over(w_aff))
        )

    # Corpus pass scores every vector ONCE (assignment); the probe pass
    # scores only the 20 query vectors — filtering the corpus affinity for
    # probes would score the whole corpus a second time. Assignment is a
    # map-side-partial min_by aggregate (max cosine, ties to lowest label)
    # rather than a window: no per-partition sort, and the exchange carries
    # one short row per vector instead of k.
    assign = (
        v.crossJoin(F.broadcast(centv))
        .withColumn("acos", aff_cos)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "clabel", F.struct((-F.col("acos")).alias("neg"), F.col("clabel"))
            ).alias("bucket")
        )
    )
    probes = (
        _rank_affinity(vq.filter(F.col("vec_id") < N_QUERIES))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("clabel").alias("bucket"))
    )
    # r16 (guide §3.1): probes is |queries|×nprobe rows — the serving
    # batch, bounded at any corpus size — so broadcast it explicitly.
    # The planner otherwise shuffles BOTH sides on bucket (k distinct
    # values: a 2-exchange sort-merge join over a 10-key hash layout);
    # with the broadcast, assignment streams map-side off its aggregate.
    return (
        F.broadcast(probes).join(assign, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )


def _ivf_serve(
    v: DataFrame,
    centv: DataFrame,
    vq: DataFrame | None = None,
    memo: tuple | None = None,
) -> DataFrame:
    """The IVF serving path given a codebook (clabel, ce, cnrm): assign
    every vector to its nearest centroid's inverted list, probe the
    nprobe nearest lists per query, exact-rerank within them.

    The codebook is k×dim doubles → broadcast; assignment is a map-only
    corpus pass. The serving plan is identical for any codebook (per-label
    or Lloyd-trained) — training is upstream of this function.

    r16 (guide §3.1/§5): the broadcast query side ``q`` is now filtered to
    the query batch (vec_id < N_QUERIES) BEFORE the broadcast — it used to
    broadcast the whole corpus projection and rely on the inner join to
    drop non-queries, which is an executor-memory liability at corpus
    scale (the join result is identical: every cand.query_id is < N_QUERIES
    by construction of the probe branch). ``vq`` (default ``v``) feeds the
    bounded query-side branches so they can skip the corpus widen exchange.
    """
    if vq is None:
        vq = v
    # r17: callers whose codebook plan is itself stable per (session,
    # fixture) — NOT the Lloyd loop, whose codebook embeds an eager
    # localCheckpoint — pass a memo key so the candidate-generation
    # sub-plan (crossJoin + window + min_by construction, ~80 ms of
    # driver time) is a memoized lazy handle (plans/catalog.py).
    if memo is not None:
        m_spark, m_sf, m_tag = memo
        cand = memo_plan(
            m_spark, m_sf, ("embeddings",), m_tag,
            lambda: _ivf_candidates(v, centv, vq),
        )
    else:
        cand = _ivf_candidates(v, centv, vq)
    q = vq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qnrm")
    )
    n = v.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne"), F.col("nrm").alias("nnrm"))
    # r16 (guide §3.1): build side flipped. For the corpus join the planner
    # used to BROADCAST THE CORPUS (BuildRight on n) — fine at fixture
    # size, an OOM at 100 TB. Broadcasting the two bounded sides (candidate
    # pairs, query batch) and streaming the corpus is the posture that
    # scales, and locally it keeps the corpus scan map-side with no
    # exchange. The two broadcasts are INDEPENDENT (n ⋈ cand, then ⋈ q)
    # rather than chained (cand ⋈ q first), so their build jobs overlap
    # instead of serializing the stage chain.
    scored = (
        n.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine",
            F.expr(f"round({_dot_expr('qe', 'ne')} / (qnrm * nnrm), 6)"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOPK)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


IVF_ITERS = 3


def _lloyd_sql(iters: int) -> str:
    """Unrolled Lloyd iterations as chained CTEs — each round assigns by
    rounded cosine (ties to lowest centroid id) and recomputes centroids
    as exact-decimal dimension means, the same arithmetic as the Spark
    loop. Empty clusters keep their previous centroid (COALESCE)."""
    parts = ["cent0 AS (\n  SELECT label AS cid, pos, c FROM cent\n)"]
    for i in range(1, iters + 1):
        parts.append(f"""centn{i - 1} AS (
  SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cnrm
  FROM (SELECT cid, list(c ORDER BY pos) AS ce FROM cent{i - 1} GROUP BY cid)
), asg{i} AS (
  SELECT vec_id, cid AS bucket FROM (
    SELECT n.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id
             ORDER BY ROUND(list_dot_product(n.e, c.ce) / (n.nrm * c.cnrm), 6) DESC, c.cid) AS rn
    FROM norms n CROSS JOIN centn{i - 1} c
  ) WHERE rn = 1
), means{i} AS (
  SELECT a.bucket AS cid, i - 1 AS pos,
         CAST(SUM(CAST(n.e[i] AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) AS m
  FROM asg{i} a JOIN norms n ON a.vec_id = n.vec_id,
       UNNEST(generate_series(1, len(n.e))) AS s(i)
  GROUP BY 1, 2
), cent{i} AS (
  SELECT p.cid, p.pos, COALESCE(m.m, p.c) AS c
  FROM cent{i - 1} p LEFT JOIN means{i} m ON p.cid = m.cid AND p.pos = m.pos
)""")
    parts.append(f"""centn{iters} AS (
  SELECT cid, ce, sqrt(list_dot_product(ce, ce)) AS cnrm
  FROM (SELECT cid, list(c ORDER BY pos) AS ce FROM cent{iters} GROUP BY cid)
)""")
    return ",\n".join(parts)


@query(
    "knn_ivf_trained",
    tags=("similarity", "knn", "ivf"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), norms AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
),{_CENTROID_SQL}
, {_lloyd_sql(IVF_ITERS)}
, affinity AS (
  SELECT n.vec_id, c.cid AS label,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY ROUND(list_dot_product(n.e, c.ce) / (n.nrm * c.cnrm), 6) DESC, c.cid
         ) AS rn
  FROM norms n CROSS JOIN centn{IVF_ITERS} c
), assign AS (
  SELECT vec_id, label AS bucket FROM affinity WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, label AS bucket FROM affinity
  WHERE rn <= {IVF_NPROBE} AND vec_id < {N_QUERIES}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON p.bucket = a.bucket
  WHERE a.vec_id <> p.query_id
), scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_dot_product(q.e, n.e) / (q.nrm * n.nrm), 6) AS cosine
  FROM cand c
  JOIN norms q ON q.vec_id = c.query_id
  JOIN norms n ON n.vec_id = c.neighbor_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {IVF_TOPK}
ORDER BY query_id, rank
""",
)
def knn_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a Lloyd-trained codebook: 3 k-means iterations (spherical
    assignment by rounded cosine, exact-decimal centroid means) seeded
    from the per-label centroids, then the identical serving path as
    ``knn_ivf``.

    Training loop discipline matches ``dedup_cluster_assign``: each round
    is bounded DataFrame work — assignment is a broadcast-codebook
    map-only pass + one (vec_id)-keyed min_by aggregate, the centroid
    update is one (cid, pos)-keyed mean — and the k×dim codebook is
    ``localCheckpoint``-ed so iteration N+1 never replays iteration N's
    lineage. Nothing but the codebook ever leaves the executors, and the
    iteration count is fixed (k-means convergence is monotone; a fixed
    small budget is the deterministic, oracle-expressible choice).
    """
    v = _vectors(spark, sf_dir)
    expanded = v.select(F.col("label").alias("cid"), F.posexplode("e").alias("pos", "val"))
    cent_long = (
        expanded.groupBy("cid", "pos")
        .agg(
            (F.sum(F.col("val").cast("decimal(30,8)")).cast("double") / F.count("val")).alias("c")
        )
        .localCheckpoint()
    )

    def _codebook(long: DataFrame) -> DataFrame:
        return (
            long.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select(F.col("cid").alias("clabel"), F.transform("pc", lambda s: s["c"]).alias("ce"))
            .withColumn("cnrm", F.expr(f"sqrt({_dot_expr('ce', 'ce')})"))
        )

    for _ in range(IVF_ITERS):
        centv = _codebook(cent_long)
        assign = (
            v.crossJoin(F.broadcast(centv))
            .withColumn(
                "acos",
                F.expr(f"round({_dot_expr('e', 'ce')} / (nrm * cnrm), 6)"),
            )
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    "clabel", F.struct((-F.col("acos")).alias("neg"), F.col("clabel"))
                ).alias("bucket")
            )
        )
        means = (
            assign.join(v, "vec_id")
            .select(F.col("bucket").alias("cid"), F.posexplode("e").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(30,8)")).cast("double") / F.count("val")
                ).alias("m")
            )
        )
        cent_long = (
            cent_long.join(means, ["cid", "pos"], "left")
            .select("cid", "pos", F.coalesce("m", "c").alias("c"))
            .localCheckpoint()
        )

    return _ivf_serve(v, _codebook(cent_long), vq=_vectors(spark, sf_dir, widen=False))


_NEARDUP_PAIRS_SQL = f"""
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
), norms AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
), bands AS (
{_BANDS_SQL}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), pairs AS (
  SELECT c.vec_a, c.vec_b
  FROM cand c
  JOIN norms x ON x.vec_id = c.vec_a
  JOIN norms y ON y.vec_id = c.vec_b
  WHERE ROUND(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 6) >= {NEARDUP_COSINE}
)"""


@query(
    "dedup_cluster_assign",
    tags=("dedup", "similarity", "graph"),
    oracle=f"""
WITH RECURSIVE {_NEARDUP_PAIRS_SQL},
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL
  SELECT vec_b AS src, vec_a AS dst FROM pairs
),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
),
assign AS (
  SELECT node, MIN(label) AS cluster_rep FROM reach GROUP BY node
)
SELECT a.node AS vec_id, a.cluster_rep AS cluster_rep, c.n AS cluster_size
FROM assign a
JOIN (SELECT cluster_rep, COUNT(*) AS n FROM assign GROUP BY cluster_rep) c
  USING (cluster_rep)
ORDER BY vec_id
""",
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph: every document in
    any LSH-confirmed pair is assigned its component's minimum vec_id as
    cluster representative — the canonical "keep one per duplicate
    cluster" finishing step of large-scale dedup (pairs alone under-merge:
    a~b, b~c must collapse to ONE cluster even when a~c was never scored).

    Spark side runs Pregel-style min-label propagation to a fixpoint: each
    round, every node takes the min of its own label and its neighbors';
    rounds = graph diameter (near-dup clusters are shallow — single
    digits even at corpus scale). Each round is one shuffle keyed on node
    id; the driver only reads the 1-row convergence count. The oracle
    reproduces the same fixpoint with a recursive reachability CTE
    (n_reachable doubles as a sanity check on closure size).
    """
    pairs = dedup_embedding_cosine(spark, sf_dir).select("vec_a", "vec_b")
    labels = min_label_components(pairs, "vec_a", "vec_b")
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node").alias("vec_id"),
            F.col("label").alias("cluster_rep"),
            "cluster_size",
        )
        .orderBy("vec_id")
    )


def min_label_components(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Pregel-style min-label propagation to a fixpoint over an undirected
    pair graph → (node, label) with label = component minimum id.

    Each round is one shuffle keyed on node id; ``localCheckpoint``
    truncates lineage so every iteration's cost stays constant instead of
    replaying the upstream pipeline per round; the driver only reads a
    1-row convergence count. Rounds = graph diameter (near-dup clusters
    are shallow — single digits even at corpus scale)."""
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.unionByName(rev).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    while True:
        prop = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "node")
        )
        updated = labels.join(prop, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            F.col("label").alias("old_label"),
        ).localCheckpoint()
        changed = updated.filter(F.col("label") < F.col("old_label")).count()
        labels = updated.select("node", "label")
        if changed == 0:
            break
    return labels


FUZZY_BLOCK_CHARS = 16
FUZZY_PREFIX_CHARS = 120
FUZZY_MAX_EDITS = 30


@query(
    "dedup_fuzzy_levenshtein",
    tags=("dedup", "similarity", "join"),
    oracle=f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substr(a.text, 1, {FUZZY_PREFIX_CHARS}),
                        substr(b.text, 1, {FUZZY_PREFIX_CHARS})) AS BIGINT) AS edit_distance
FROM documents a JOIN documents b
  ON substr(a.text, 1, {FUZZY_BLOCK_CHARS}) = substr(b.text, 1, {FUZZY_BLOCK_CHARS})
 AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, {FUZZY_PREFIX_CHARS}),
                  substr(b.text, 1, {FUZZY_PREFIX_CHARS})) <= {FUZZY_MAX_EDITS}
ORDER BY doc_a, doc_b
""",
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance near-dup pairs: block on the 16-char text
    prefix (equi-join — candidate generation is a hash join on the block
    key, never all-pairs), then exact Levenshtein over the 120-char prefix
    within each block. The classic record-linkage blocking skeleton; both
    engines implement the same textbook edit distance, so the check is
    exact.

    Scale: the expensive O(len^2) distance only runs on within-block
    candidate pairs; block cardinality is bounded by prefix entropy
    (measured max block size 3 on these fixtures). Skewed blocks (boiler-
    plate prefixes) would hit AQE's skew-join split; a production corpus
    would block on a cheap fingerprint (simhash band — see dedup_simhash)
    instead of a raw prefix.
    """
    d = table(spark, sf_dir, "documents")
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, FUZZY_BLOCK_CHARS).alias("blk"),
        F.substring("text", 1, FUZZY_PREFIX_CHARS).alias("pref_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, FUZZY_BLOCK_CHARS).alias("blk"),
        F.substring("text", 1, FUZZY_PREFIX_CHARS).alias("pref_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "edit_distance",
            F.levenshtein("pref_a", "pref_b").cast("bigint"),
        )
        .filter(F.col("edit_distance") <= FUZZY_MAX_EDITS)
        .select("doc_a", "doc_b", "edit_distance")
        .orderBy("doc_a", "doc_b")
    )


PQ_M = 4  # subspaces; sub-dimension = dim / PQ_M, derived from the data


@query(
    "knn_pq_scan",
    tags=("similarity", "knn", "pq"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), norms AS (
  SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm,
         CAST(len(e) // {PQ_M} AS INTEGER) AS sd
  FROM v
), subs AS (
  SELECT vec_id, label, nrm, m.m AS m, e[(m.m * sd + 1):((m.m + 1) * sd)] AS x
  FROM norms, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) m
), subexp AS (
  SELECT label, m, i AS pos, CAST(x[i] AS DOUBLE) AS val
  FROM subs, UNNEST(generate_series(1, len(x))) AS s(i)
), subcent_long AS (
  SELECT label, m, pos,
         CAST(SUM(CAST(val AS DECIMAL(30,8))) AS DOUBLE) / COUNT(val) AS c
  FROM subexp GROUP BY label, m, pos
), subcent AS (
  SELECT label AS clabel, m, list(c ORDER BY pos) AS ce
  FROM subcent_long GROUP BY label, m
), codes AS (
  SELECT vec_id, m, clabel AS code FROM (
    SELECT s.vec_id, s.m, c.clabel,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY ROUND(list_dot_product(c.ce, c.ce)
                            - 2 * list_dot_product(s.x, c.ce), 6), c.clabel) AS rn
    FROM subs s JOIN subcent c ON s.m = c.m
  ) WHERE rn = 1
), lut AS (
  SELECT q.vec_id AS query_id, c.m, c.clabel,
         list_dot_product(q.x, c.ce) AS ldot
  FROM subs q JOIN subcent c ON q.m = c.m
  WHERE q.vec_id < {N_QUERIES}
), adot AS (
  SELECT l.query_id, k.vec_id AS neighbor_id,
         CAST(SUM(CAST(l.ldot AS DECIMAL(30,12))) AS DOUBLE) AS approx_dot
  FROM codes k JOIN lut l ON l.m = k.m AND l.clabel = k.code
  WHERE k.vec_id <> l.query_id
  GROUP BY 1, 2
), scored AS (
  SELECT a.query_id, a.neighbor_id,
         ROUND(a.approx_dot / (qn.nrm * nn.nrm), 6) AS approx_cosine
  FROM adot a
  JOIN norms qn ON qn.vec_id = a.query_id
  JOIN norms nn ON nn.vec_id = a.neighbor_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY approx_cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, approx_cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {IVF_TOPK}
ORDER BY query_id, rank
""",
)
def knn_pq_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN scan: vectors compress to PQ_M sub-codebook
    ids; queries score the whole corpus by asymmetric-distance lookup
    (per-subspace dot against the coded sub-centroid) — the compressed-
    domain counterpart of knn_cosine_bruteforce, and the third point of
    the ANN cost/recall spectrum (brute force → IVF probing → PQ scan).

    Sub-codebooks are per-label sub-centroids (exact-decimal means, same
    determinism as the IVF codebook); encoding minimizes rounded L2
    (‖c‖² − 2·x·c, ties to lowest label); the ADC sum runs in decimal so
    subspace order can't perturb the rounded cosine.

    Scale: codes are PQ_M small ints per vector (512 B of floats → 4
    codes), computed map-side against a broadcast 40-row codebook; the
    query LUT (|Q|×k×PQ_M dots) is also broadcast, so corpus scoring
    reads ONLY the code columns — the scan-side I/O reduction is the
    whole point of PQ at 100 TB; top-k is the one |Q|-keyed window.
    """
    v = _vectors(spark, sf_dir)
    codes, lut = _pq_model(v)
    adot = (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m) & (codes.code == lut.clabel),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum(F.col("ldot").cast("decimal(30,12)")).cast("double").alias("approx_dot"))
    )
    return _pq_rank(v, adot)


def _pq_model(v: DataFrame):
    """(codes, lut): the PQ encoding of the corpus and the query lookup
    table. Sub-codebooks are per-label sub-centroids over PQ_M subspaces
    (sub-dimension len/PQ_M, derived from the data); encoding minimizes
    rounded L2 against a broadcast codebook, map-side."""
    sd = (F.size("e") / PQ_M).cast("int")
    msubs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda m: F.struct(
                m.alias("m"), F.slice("e", m * sd + 1, sd).alias("x")
            ),
        )
    ).alias("ms")
    subs = v.select("vec_id", "label", "nrm", msubs).select(
        "vec_id", "label", "nrm", "ms.m", "ms.x"
    )
    subexp = subs.select("label", "m", F.posexplode("x").alias("pos", "val"))
    subcent_long = subexp.groupBy("label", "m", "pos").agg(
        (F.sum(F.col("val").cast("decimal(30,8)")).cast("double") / F.count("val")).alias("c")
    )
    subcent = (
        subcent_long.groupBy(F.col("label").alias("clabel"), "m")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("clabel", "m", F.transform("pc", lambda s: s["c"]).alias("ce"))
    )
    l2_score = F.round(
        _dot(F.col("ce"), F.col("ce")) - 2 * _dot(F.col("x"), F.col("ce")), 6
    )
    codes = (
        subs.join(F.broadcast(subcent), "m")
        .withColumn("score", l2_score)
        .groupBy("vec_id", "m")
        .agg(
            F.min_by("clabel", F.struct("score", "clabel")).alias("code")
        )
    )
    lut = (
        subs.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(subcent), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "clabel",
            _dot(F.col("x"), F.col("ce")).alias("ldot"),
        )
    )
    return codes, lut


def _pq_rank(v: DataFrame, adot: DataFrame) -> DataFrame:
    """Approx-cosine from the ADC dot (true stored norms), top-k window."""
    qn = v.select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("qnrm"))
    nn = v.select(F.col("vec_id").alias("neighbor_id"), F.col("nrm").alias("nnrm"))
    scored = (
        adot.join(F.broadcast(qn), "query_id")
        .join(nn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("approx_dot") / (F.col("qnrm") * F.col("nnrm")), 6).alias(
                "approx_cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF_TOPK)
        .orderBy("query_id", "rank")
    )


@query(
    "knn_ivf_pq",
    tags=("similarity", "knn", "ivf", "pq"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), norms AS (
  SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm,
         CAST(len(e) // {PQ_M} AS INTEGER) AS sd
  FROM v
),{_CENTROID_SQL}
, affinity AS (
  SELECT n.vec_id, c.label,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY ROUND(list_dot_product(n.e, c.ce) / (n.nrm * c.cnrm), 6) DESC, c.label
         ) AS rn
  FROM norms n CROSS JOIN centn c
), assign AS (
  SELECT vec_id, label AS bucket FROM affinity WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, label AS bucket FROM affinity
  WHERE rn <= {IVF_NPROBE} AND vec_id < {N_QUERIES}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON p.bucket = a.bucket
  WHERE a.vec_id <> p.query_id
), subs AS (
  SELECT vec_id, label, nrm, m.m AS m, e[(m.m * sd + 1):((m.m + 1) * sd)] AS x
  FROM norms, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) m
), subexp AS (
  SELECT label, m, i AS pos, CAST(x[i] AS DOUBLE) AS val
  FROM subs, UNNEST(generate_series(1, len(x))) AS s(i)
), subcent_long AS (
  SELECT label, m, pos,
         CAST(SUM(CAST(val AS DECIMAL(30,8))) AS DOUBLE) / COUNT(val) AS c
  FROM subexp GROUP BY label, m, pos
), subcent AS (
  SELECT label AS clabel, m, list(c ORDER BY pos) AS ce
  FROM subcent_long GROUP BY label, m
), codes AS (
  SELECT vec_id, m, clabel AS code FROM (
    SELECT s.vec_id, s.m, c.clabel,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY ROUND(list_dot_product(c.ce, c.ce)
                            - 2 * list_dot_product(s.x, c.ce), 6), c.clabel) AS rn
    FROM subs s JOIN subcent c ON s.m = c.m
  ) WHERE rn = 1
), lut AS (
  SELECT q.vec_id AS query_id, c.m, c.clabel,
         list_dot_product(q.x, c.ce) AS ldot
  FROM subs q JOIN subcent c ON q.m = c.m
  WHERE q.vec_id < {N_QUERIES}
), adot AS (
  SELECT cd.query_id, cd.neighbor_id,
         CAST(SUM(CAST(l.ldot AS DECIMAL(30,12))) AS DOUBLE) AS approx_dot
  FROM cand cd
  JOIN codes k ON k.vec_id = cd.neighbor_id
  JOIN lut l ON l.query_id = cd.query_id AND l.m = k.m AND l.clabel = k.code
  GROUP BY 1, 2
), scored AS (
  SELECT a.query_id, a.neighbor_id,
         ROUND(a.approx_dot / (qn.nrm * nn.nrm), 6) AS approx_cosine
  FROM adot a
  JOIN norms qn ON qn.vec_id = a.query_id
  JOIN norms nn ON nn.vec_id = a.neighbor_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY approx_cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, approx_cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {IVF_TOPK}
ORDER BY query_id, rank
""",
)
def knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ — the production ANN shape: inverted-list probing bounds
    WHICH vectors are scored (nprobe of k lists), product quantization
    bounds WHAT is read to score them (code columns + a broadcast LUT,
    never the float vectors). Composition of knn_ivf's candidate
    generation with knn_pq_scan's asymmetric-distance scoring; both
    codebooks are the deterministic per-label centroids.

    Scale: candidate fetch shuffles on the bucket id (partition pruning
    with bucket-partitioned lists); scoring joins candidates to the
    4-codes-per-vector table and a |Q|×k×PQ_M broadcast LUT — I/O per
    scored candidate is bytes, not the vector; the exact-float read
    happens for ZERO corpus rows.
    """
    v = _vectors(spark, sf_dir)

    # Coarse codebook: per-label centroids (same as knn_ivf).
    expanded = v.select("label", F.posexplode("e").alias("pos", "val"))
    cent = expanded.groupBy("label", "pos").agg(
        (F.sum(F.col("val").cast("decimal(30,8)")).cast("double") / F.count("val")).alias("c")
    )
    centv = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s["c"]).alias("ce"))
        .withColumn("cnrm", F.expr(f"sqrt({_dot_expr('ce', 'ce')})"))
        .select(F.col("label").alias("clabel"), "ce", "cnrm")
    )
    cand = _ivf_candidates(v, centv)

    codes, lut = _pq_model(v)
    adot = (
        cand.join(codes, cand.neighbor_id == codes.vec_id)
        .join(
            F.broadcast(lut.withColumnRenamed("query_id", "q_id")),
            (F.col("q_id") == F.col("query_id"))
            & (lut.m == codes.m)
            & (F.col("clabel") == F.col("code")),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("ldot").cast("decimal(30,12)")).cast("double").alias("approx_dot"))
    )
    return _pq_rank(v, adot)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic corpus pruning (Abbas et al. 2023: cluster the
# embedding space, deduplicate within clusters only). Distinct from
# dedup_embedding_cosine (sign-LSH pair FINDER): this is the corpus
# PRUNER — every vector gets a keep/drop decision, blocked by a learned
# coarse codebook instead of hash buckets.
# ---------------------------------------------------------------------------

SEMDEDUP_COSINE = 0.35  # within-cluster similarity above this ⇒ semantic dup (= NEARDUP_COSINE)
SEMDEDUP_TARGET_POP = 64  # constant target block population — the scale knob
SEMDEDUP_MAX_BITS = 8  # sub-split depth cap (target pop holds to 64·2^8 rows/cluster)

# Residual-sign sub-bucket bits, emitted once for Spark and once for SQL so
# the blocking arithmetic is literally the same expression in both engines:
# bit d (1-based dim) is set iff e[d]/nrm > ce[d]/cnrm — compared as
# e[d]*cnrm > ce[d]*nrm (norms are positive; products are single IEEE
# multiplications, bit-identical across engines).
_SUB_BITS_SQL = " + ".join(
    f"(CASE WHEN {d} <= b AND n.e[{d}] * c.cnrm > c.ce[{d}] * n.nrm"
    f" THEN {1 << (d - 1)} ELSE 0 END)"
    for d in range(1, SEMDEDUP_MAX_BITS + 1)
)


# Shared CTE chain: nearest-centroid assignment + population-derived
# residual-sign blocks — consumed by dedup_semantic_prune AND
# knn_mutual_graph so the blocking semantics stay one definition.
_RESIDUAL_BLOCKS_SQL = f""", affinity AS (
  SELECT n.vec_id, c.label,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY ROUND(list_dot_product(n.e, c.ce) / (n.nrm * c.cnrm), 6) DESC, c.label
         ) AS rn
  FROM norms n CROSS JOIN centn c
), assign AS (
  SELECT vec_id, label AS cluster FROM affinity WHERE rn = 1
), depth AS (
  SELECT cluster,
         CAST(GREATEST(0, LEAST({SEMDEDUP_MAX_BITS},
              CEIL(LOG2(COUNT(*) / {SEMDEDUP_TARGET_POP}.0)))) AS INTEGER) AS b
  FROM assign GROUP BY cluster
), blocks AS (
  SELECT a.vec_id, a.cluster, {_SUB_BITS_SQL} AS subbucket
  FROM assign a
  JOIN depth d ON a.cluster = d.cluster
  JOIN norms n ON n.vec_id = a.vec_id
  JOIN centn c ON c.label = a.cluster
)"""


def _label_codebook(v: DataFrame) -> DataFrame:
    """Per-label mean-vector codebook (clabel, ce, cnrm) — the same
    construction as knn_ivf's coarse quantizer."""
    expanded = v.select("label", F.posexplode("e").alias("pos", "val"))
    # r16: exact mean via two-limb long sums (bit-identical to the
    # decimal(30,8) route, primitive-long aggregate updates — see knn_ivf).
    cent = expanded.groupBy("label", "pos").agg(
        *limb_sums(F.col("val"), "_c"), F.count("val").alias("_n")
    ).select("label", "pos", (sum_from_limbs("_c", 8) / F.col("_n")).alias("c"))
    return (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s["c"]).alias("ce"))
        .withColumn("cnrm", F.expr(f"sqrt({_dot_expr('ce', 'ce')})"))
        .select(F.col("label").alias("clabel"), "ce", "cnrm")
    )


def _residual_blocks(v: DataFrame, centv: DataFrame) -> DataFrame:
    """Nearest-centroid assignment + population-derived residual-sign
    sub-blocks: (vec_id, cluster, subbucket, e, nrm). The Spark rendering
    of _RESIDUAL_BLOCKS_SQL — one definition of the blocking, two
    engines. Everything is map-side against the broadcast codebook plus
    one tiny per-cluster depth table.

    Domain contract (ADVICE r16): zero-norm vectors and zero-norm
    centroids are OUT OF DOMAIN.  x/0.0 gives ±Inf/NaN, and NaN ordering
    differs between the historical row_number window (NaN ranked first —
    picked) and this min_by aggregate (NaN sorts greatest — never
    picked).  The embeddings fixture contains no zero-norm vectors at
    any SF and both engines agree on every in-domain row; a production
    corpus must filter nrm > 0 upstream."""
    aff_cos = F.expr(f"round({_dot_expr('e', 'ce')} / (nrm * cnrm), 6)")
    # r16: nearest-centroid pick via a map-side-partial min_by aggregate
    # instead of a row_number window — no per-partition sort of the k×
    # affinity rows, and the aggregate reuses the scan's vec_id
    # partitioning (same rewrite as _ivf_candidates' assign; identical
    # winner: max rounded cosine, ties to lowest label).
    assign = (
        v.crossJoin(F.broadcast(centv))
        .withColumn("acos", aff_cos)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("clabel", "e", "nrm", "ce", "cnrm"),
                F.struct((-F.col("acos")).alias("neg"), F.col("clabel")),
            ).alias("_s")
        )
        .select(
            "vec_id",
            F.col("_s.clabel").alias("cluster"),
            F.col("_s.e").alias("e"),
            F.col("_s.nrm").alias("nrm"),
            F.col("_s.ce").alias("ce"),
            F.col("_s.cnrm").alias("cnrm"),
        )
    )
    depth = assign.groupBy("cluster").agg(
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(SEMDEDUP_MAX_BITS),
                F.ceil(F.log2(F.count(F.lit(1)) / float(SEMDEDUP_TARGET_POP))),
            ),
        )
        .cast("int")
        .alias("b")
    )
    sub_bits = reduce(
        lambda acc, d: acc
        + F.when(
            (F.lit(d) <= F.col("b"))
            & (F.element_at("e", d) * F.col("cnrm") > F.element_at("ce", d) * F.col("nrm")),
            F.lit(1 << (d - 1)),
        ).otherwise(0),
        range(1, SEMDEDUP_MAX_BITS + 1),
        F.lit(0),
    )
    return (
        assign.join(F.broadcast(depth), "cluster")
        .withColumn("subbucket", sub_bits)
        .select("vec_id", "cluster", "subbucket", "e", "nrm")
    )



@query(
    "dedup_semantic_prune",
    tags=("dedup", "similarity", "embedding"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), norms AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
),{_CENTROID_SQL}
{_RESIDUAL_BLOCKS_SQL}, lower_sims AS (
  SELECT hi.vec_id,
         MAX(ROUND(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 6)) AS max_cos_lower
  FROM blocks hi
  JOIN blocks lo ON hi.cluster = lo.cluster AND hi.subbucket = lo.subbucket
                AND lo.vec_id < hi.vec_id
  JOIN norms x ON x.vec_id = hi.vec_id
  JOIN norms y ON y.vec_id = lo.vec_id
  GROUP BY hi.vec_id
)
SELECT a.vec_id,
       CAST(a.cluster AS INTEGER) AS cluster,
       COALESCE(s.max_cos_lower, -1.0) AS max_cos_lower,
       (s.max_cos_lower IS NULL OR s.max_cos_lower < {SEMDEDUP_COSINE}) AS keep
FROM assign a LEFT JOIN lower_sims s ON a.vec_id = s.vec_id
ORDER BY a.vec_id
""",
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: assign every embedding to its nearest coarse centroid,
    then drop a vector iff some lower-id vector IN THE SAME BLOCK has
    cosine ≥ 0.35 with it (greedy keep-first — the deterministic version
    of the paper's keep-one-per-ε-ball policy). Returns every vector with
    its cluster, its max similarity to any lower-id block-mate (−1.0
    when none), and the keep/drop verdict — the corpus-pruning endpoint
    for training-data curation.

    Scale (the default IS the scale-safe configuration): production
    SemDeDup raises k with corpus size (50 k clusters for LAION) so
    cluster populations stay constant; with an oracle-expressible fixed
    codebook the same invariant is enforced by sub-splitting each coarse
    cluster with residual-sign bits — bit d set iff the vector sits
    above its centroid along dim d (e[d]/nrm > ce[d]/cnrm). The split
    depth is derived from the cluster's population,
    b = clamp(ceil(log2(pop / 64)), 0, 8), so the expected block
    population is pinned at SEMDEDUP_TARGET_POP regardless of corpus
    size and the pairwise stage does Σ|block|² ≈ n·64 work — measured
    corpus-linear at the sf1/sf3 probes (SCALE.md) where the previous
    fixed-k default grew 10.6× per 10× data. Everything before the
    pairwise join is map-side against broadcast centroids + one tiny
    per-cluster count; no cross-block pair is ever formed. Clusters at
    or below the target population get b=0 — identical semantics to
    plain SemDeDup; near-dup pairs whose residual flips a selected sign
    bit land in sibling blocks (the recall trade every LSH-refined
    blocker makes, cf. dedup_embedding_cosine's banding).
    """
    v = _vectors(spark, sf_dir)
    # r16 (guide §2.4/§5): the blocking pipeline feeds BOTH sides of the
    # within-block self-join — persist it so assignment + depth run once
    # per run instead of once per side.
    blocks = register_cache(
        _residual_blocks(v, _label_codebook(v)).persist(StorageLevel.MEMORY_AND_DISK)
    )

    hi = blocks.select(
        "cluster", "subbucket", "vec_id", F.col("e").alias("e_hi"), F.col("nrm").alias("n_hi")
    )
    lo = blocks.select(
        "cluster",
        "subbucket",
        F.col("vec_id").alias("lo_id"),
        F.col("e").alias("e_lo"),
        F.col("nrm").alias("n_lo"),
    )
    pair_cos = F.round(_dot(F.col("e_hi"), F.col("e_lo")) / (F.col("n_hi") * F.col("n_lo")), 6)
    lower_sims = (
        hi.join(lo, ["cluster", "subbucket"])
        .filter(F.col("lo_id") < F.col("vec_id"))
        .groupBy("vec_id")
        .agg(F.max(pair_cos).alias("max_cos_lower"))
    )
    return (
        blocks.select("vec_id", F.col("cluster").cast("int").alias("cluster"))
        .join(lower_sims, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce("max_cos_lower", F.lit(-1.0)).alias("max_cos_lower"),
            (
                F.col("max_cos_lower").isNull()
                | (F.col("max_cos_lower") < SEMDEDUP_COSINE)
            ).alias("keep"),
        )
        .orderBy("vec_id")
    )


# --- distributed PCA: fixed-size moment aggregation + in-plan power iteration

PCA_ITERS = 6  # fixed budget: the 6-step iterate IS the declared semantics
_PCA_DEC = "decimal(30,12)"  # ≤13 sig digits — portable double→decimal zone

# The corpus-sized moments pass sums in FIXED-POINT LONGS instead of
# decimal: each product rounds to an integer at 1e10 scale, so the hash
# aggregate updates a compact bigint (measured ~2× the decimal(30,12)
# rate — decimal precision >18 loses the compact-long representation).
# Exactness window: |term| ≤ ~1.5 → |sum| ≤ n·1.5e10, and the final
# cast-to-double is exact below 2^53 ≈ 9e15 — good to ~600k corpus rows;
# beyond that, drop the scale a decade per 10× rows (or promote back to
# decimal): the 1e-10 quantization is 4 orders below the 6-dp output.
_PCA_FIX = 1e10


def _pca_oracle() -> str:
    """Unrolled-CTE oracle: raw second moments from a positional self-join,
    means, covariance, then PCA_ITERS normalized matvec steps, then the
    centered projection — every sum decimal-exact, every division/sqrt a
    deterministic double op, mirroring the Spark plan step for step."""
    dec = "DECIMAL(30,12)"
    ctes = [
        f"""x AS MATERIALIZED (
  SELECT vec_id, label, u.i, CAST(u.x AS DOUBLE) AS x
  FROM embeddings,
  LATERAL (SELECT unnest(generate_series(0, len(embedding) - 1)) AS i,
                  unnest(embedding) AS x) u
)""",
        f"""n AS (SELECT COUNT(DISTINCT vec_id) AS n FROM x)""",
        f"""m1 AS (
  SELECT i, CAST(SUM(CAST(round(x * {_PCA_FIX:.0f}) AS BIGINT)) AS DOUBLE)
              / {_PCA_FIX:.0f} AS s1
  FROM x GROUP BY i
)""",
        f"""mu AS (SELECT i, s1 / n.n AS mu FROM m1, n)""",
        f"""m2 AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j,
         CAST(SUM(CAST(round(a.x * b.x * {_PCA_FIX:.0f}) AS BIGINT)) AS DOUBLE)
           / {_PCA_FIX:.0f} AS s2
  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2
)""",
        f"""cov AS MATERIALIZED (
  SELECT m2.i, m2.j, m2.s2 / n.n - mi.mu * mj.mu AS c
  FROM m2 JOIN mu mi ON mi.i = m2.i JOIN mu mj ON mj.i = m2.j, n
)""",
        f"""v0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS v FROM m1)""",
    ]
    for k in range(1, PCA_ITERS + 1):
        ctes.append(
            f"""u{k} AS MATERIALIZED (
  SELECT cov.i, CAST(SUM(CAST(cov.c * v{k - 1}.v AS {dec})) AS DOUBLE) AS u
  FROM cov JOIN v{k - 1} ON v{k - 1}.i = cov.j GROUP BY cov.i
)"""
        )
        ctes.append(
            f"""n{k} AS (
  SELECT sqrt(CAST(SUM(CAST(u * u AS {dec})) AS DOUBLE)) AS nrm FROM u{k}
)"""
        )
        ctes.append(f"""v{k} AS (SELECT i, u / nrm AS v FROM u{k}, n{k})""")
    vf = f"v{PCA_ITERS}"
    ctes.append(
        f"""proj AS (
  SELECT x.vec_id,
         CAST(SUM(CAST(x.x * {vf}.v AS {dec})) AS DOUBLE) AS xv
  FROM x JOIN {vf} ON {vf}.i = x.i GROUP BY x.vec_id
)"""
    )
    ctes.append(
        f"""bias AS (
  SELECT CAST(SUM(CAST(mu.mu * {vf}.v AS {dec})) AS DOUBLE) AS b
  FROM mu JOIN {vf} ON {vf}.i = mu.i
)"""
    )
    return ",\n".join(ctes)


@query(
    "embedding_pca_project",
    tags=("embedding", "ml", "iterative"),
    oracle=f"""
WITH {_pca_oracle()}
SELECT e.vec_id, e.label, ROUND(p.xv - bias.b, 6) AS pc1
FROM proj p JOIN embeddings e USING (vec_id), bias
ORDER BY vec_id
""",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA first-component projection of the embedding corpus — the
    dimensionality step before clustering-based corpus curation (and the
    building block of PCA-whitened ANN indexes).

    The 100 TB pattern: the data-sized work is ONE pass that reduces the
    corpus to a FIXED-size sufficient statistic — per-row outer products
    (built inside the row by an indexed double transform, dim² structs)
    flow into a partial+final hash aggregate keyed (i, j), so the exchange
    carries at most dim²·partitions rows no matter the corpus size; first
    moments and the row count ride the same explode with sentinel keys
    (j = -1), so the scan happens ONCE. The dim×dim covariance is then
    ``localCheckpoint``-ed (iterations must not replay the corpus pass)
    and 6 power-iteration steps run as tiny broadcast matvec joins; the
    final projection is one broadcast join + per-vector exact-decimal dot.
    Determinism: every sum is decimal(30,12)-exact, every divide/sqrt a
    pointwise double op — bit-identical to the oracle's unrolled CTEs.
    """
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    # one scan → (i, j, value) contributions: outer products, first
    # moments (j = -1), and the row counter (i = j = -1)
    outer = F.flatten(
        F.transform(
            "e",
            lambda xi, i: F.transform(
                "e", lambda xj, j: F.struct(i.alias("i"), j.alias("j"), (xi * xj).alias("v"))
            ),
        )
    )
    firsts = F.transform(
        "e", lambda xi, i: F.struct(i.alias("i"), F.lit(-1).alias("j"), xi.alias("v"))
    )
    counter = F.array(
        F.struct(F.lit(-1).alias("i"), F.lit(-1).alias("j"), F.lit(1.0).alias("v"))
    )
    from .analytics import _widen_if_narrow

    # widen before the dim² fan-out: a narrow scan would cap the whole
    # moments pass at a handful of tasks (measured 6 tasks / 108 s at the
    # 10× probe; widened + fixed-point it is the same pass at full
    # parallelism) — guarded so a production-sized table never pays a
    # pointless raw-row shuffle
    moments = (
        _widen_if_narrow(spark, emb, "vec_id", amp=256)
        .select(F.explode(F.concat(outer, firsts, counter)).alias("m"))
        .select("m.i", "m.j", "m.v")
        .groupBy("i", "j")
        .agg(
            (
                F.sum(F.round(F.col("v") * F.lit(_PCA_FIX)).cast("bigint")).cast(
                    "double"
                )
                / F.lit(_PCA_FIX)
            ).alias("s")
        )
        .localCheckpoint()
    )
    n_df = moments.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    mu = (
        moments.filter((F.col("j") == -1) & (F.col("i") >= 0))
        .crossJoin(F.broadcast(n_df))
        .select("i", (F.col("s") / F.col("n")).alias("mu"))
    )
    cov = (
        moments.filter((F.col("i") >= 0) & (F.col("j") >= 0))
        .crossJoin(F.broadcast(n_df))
        .join(F.broadcast(mu.select(F.col("i").alias("ii"), F.col("mu").alias("mi"))),
              F.col("i") == F.col("ii"))
        .join(F.broadcast(mu.select(F.col("i").alias("jj"), F.col("mu").alias("mj"))),
              F.col("j") == F.col("jj"))
        .select("i", "j", (F.col("s") / F.col("n") - F.col("mi") * F.col("mj")).alias("c"))
        .localCheckpoint()
    )
    v = mu.select("i", F.lit(0.125).alias("v"))
    # r16: the norm rides a global (unpartitioned) window over the dim-row
    # iterate instead of a separate aggregate job + 1-row broadcast per
    # iteration — same exact decimal sum, two fewer jobs per power step.
    w_all = Window.partitionBy()
    for _ in range(PCA_ITERS):
        # localCheckpoint per iterate: u feeds BOTH the norm and the next
        # vector — left lazy, each level doubles the replayed subtree
        # (2^ITERS cov-join replays); checkpointed, each level is one tiny job
        u = (
            cov.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
            .groupBy("i")
            .agg(F.sum((F.col("c") * F.col("v")).cast(_PCA_DEC)).cast("double").alias("u"))
            .localCheckpoint()
        )
        nrm = F.sqrt(
            F.sum((F.col("u") * F.col("u")).cast(_PCA_DEC)).over(w_all).cast("double")
        )
        v = u.select("i", (F.col("u") / nrm).alias("v"))
    x_long = emb.select("vec_id", F.posexplode("e").alias("i", "x"))
    proj = (
        x_long.join(F.broadcast(v), "i")
        .groupBy("vec_id")
        .agg(F.sum((F.col("x") * F.col("v")).cast(_PCA_DEC)).cast("double").alias("xv"))
    )
    bias = (
        mu.join(F.broadcast(v), "i")
        .agg(F.sum((F.col("mu") * F.col("v")).cast(_PCA_DEC)).cast("double").alias("b"))
    )
    return (
        proj.join(emb.select("vec_id", "label"), "vec_id")
        .crossJoin(F.broadcast(bias))
        .select("vec_id", "label", F.round(F.col("xv") - F.col("b"), 6).alias("pc1"))
        .orderBy("vec_id")
    )


# --- index-quality evaluation: recall of the approximate index against
#     the exact scan, as a query over the two serving paths

def _recall_oracle() -> str:
    """Compose the IVF and brute-force oracles as nested CTEs (DuckDB
    permits a full WITH...SELECT inside a CTE body), then score
    recall@k per query — the oracle evaluates BOTH serving paths and
    the overlap in one statement."""
    from .catalog import REGISTRY

    ivf_sql = REGISTRY["knn_ivf"].oracle
    exact_sql = REGISTRY["knn_cosine_bruteforce"].oracle
    return f"""
WITH ivf AS ({ivf_sql}),
exact AS ({exact_sql}),
per_query AS (
  SELECT query_id, COUNT(*) AS k_exact FROM exact GROUP BY query_id
),
hits AS (
  SELECT e.query_id, COUNT(*) AS n_hit
  FROM exact e JOIN ivf i
    ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
  GROUP BY e.query_id
)
SELECT p.query_id AS query_id, p.k_exact AS k_exact,
       COALESCE(h.n_hit, 0) AS n_hit,
       ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / p.k_exact, 6) AS recall
FROM per_query p LEFT JOIN hits h ON p.query_id = h.query_id
ORDER BY query_id
"""


@query(
    "knn_recall_eval",
    tags=("similarity", "knn", "eval"),
    oracle=_recall_oracle(),
)
def knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against the exact brute-force scan —
    the index-quality gate every ANN deployment runs before swapping an
    approximate path in front of production traffic (FAISS's recall
    sweep, expressed relationally).

    Composes the two serving paths ALREADY in the catalog (knn_ivf,
    knn_cosine_bruteforce) and joins their top-k sets per query:
    recall = |approx ∩ exact| / k. Both paths broadcast their small
    side and stay blocked (their own plan tests); the overlap join keys
    on (query_id, neighbor_id) — queries-×-k rows, trivially
    broadcastable at any corpus size since k and the query set are
    fixed. A recall row below 1.0 localizes exactly which query's
    neighborhood the probe bound missed.
    """
    from .analytics import knn_cosine_bruteforce

    ivf = knn_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    exact = knn_cosine_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    per_query = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("k_exact"))
    hits = (
        exact.join(ivf, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        per_query.join(hits, "query_id", "left")
        .select(
            "query_id",
            "k_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("k_exact"), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


MUTUAL_K = 5  # neighbors considered per vector for the mutual-kNN graph


@query(
    "knn_mutual_graph",
    tags=("similarity", "knn", "graph"),
    oracle=f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), norms AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
),{_CENTROID_SQL}{_RESIDUAL_BLOCKS_SQL}, pairs AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         ROUND(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 6) AS cosine
  FROM blocks a
  JOIN blocks b ON a.cluster = b.cluster AND a.subbucket = b.subbucket
               AND a.vec_id <> b.vec_id
  JOIN norms x ON x.vec_id = a.vec_id
  JOIN norms y ON y.vec_id = b.vec_id
), ranked AS (
  SELECT qa, qb, cosine,
         ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cosine DESC, qb) AS rk
  FROM pairs
), top AS (
  SELECT * FROM ranked WHERE rk <= {MUTUAL_K}
)
SELECT t1.qa AS id_a, t1.qb AS id_b, t1.cosine AS cosine,
       CAST(t1.rk AS INTEGER) AS rank_ab, CAST(t2.rk AS INTEGER) AS rank_ba
FROM top t1 JOIN top t2 ON t1.qa = t2.qb AND t1.qb = t2.qa
WHERE t1.qa < t1.qb
ORDER BY id_a, id_b
""",
)
def knn_mutual_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph construction — undirected edges (a, b) where each
    vector ranks the other inside its top-MUTUAL_K (5) within its
    residual block. The graph-building primitive under density-based
    corpus clustering (mutual-kNN is the standard symmetrization that
    suppresses hub vertices), emitted with the cosine and both directed
    ranks so downstream clustering can threshold either.

    Scale: candidate generation reuses the SemDeDup residual blocking
    (_residual_blocks — ONE definition shared with dedup_semantic_prune):
    block populations are pinned at ~SEMDEDUP_TARGET_POP (64) by the
    population-derived split depth, so the per-block self-join does
    Σ|block|² ≈ n·64 work — corpus-linear, never
    all-pairs (the same probe-backed posture, SCALE.md). Top-k is one
    per-vector window over ≤|block| candidates; the mutuality check is a
    self-equi-join of the top-k edge list on the reversed key — O(n·k)
    rows. Neighbors in sibling blocks are invisible (the recall trade of
    every blocked kNN-graph build; raise SEMDEDUP_TARGET_POP to widen).
    """
    v = _vectors(spark, sf_dir)
    # r16 (guide §2.4/§5): blocks feeds both self-join sides and top feeds
    # both sides of the mutuality join — without the persists the blocking
    # pipeline ran 4× and the blocked scoring+top-k 2× per run. top is
    # n×k rows (bounded); blocks is the standard blocked-join
    # materialization (MEMORY_AND_DISK).
    blocks = register_cache(
        _residual_blocks(v, _label_codebook(v)).persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = blocks.select(
        "cluster", "subbucket", F.col("vec_id").alias("qa"),
        F.col("e").alias("ea"), F.col("nrm").alias("na"),
    )
    b = blocks.select(
        "cluster", "subbucket", F.col("vec_id").alias("qb"),
        F.col("e").alias("eb"), F.col("nrm").alias("nb"),
    )
    pair_cos = F.expr(f"round({_dot_expr('ea', 'eb')} / (na * nb), 6)")
    w = Window.partitionBy("qa").orderBy(F.desc("cosine"), "qb")
    top = register_cache(
        a.join(b, ["cluster", "subbucket"])
        .filter(F.col("qa") != F.col("qb"))
        .select("qa", "qb", pair_cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MUTUAL_K)
        .select("qa", "qb", "cosine", "rk")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rev = top.select(
        F.col("qa").alias("qb"), F.col("qb").alias("qa"), F.col("rk").alias("rk_rev")
    )
    return (
        top.join(rev, ["qa", "qb"])
        .filter(F.col("qa") < F.col("qb"))
        .select(
            F.col("qa").alias("id_a"),
            F.col("qb").alias("id_b"),
            "cosine",
            F.col("rk").cast("int").alias("rank_ab"),
            F.col("rk_rev").cast("int").alias("rank_ba"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "embedding_quantize_int8",
    tags=("similarity", "embedding", "quantization"),
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), dims AS (
  SELECT i - 1 AS pos, MIN(e[i]) AS mn, MAX(e[i]) AS mx
  FROM v, UNNEST(generate_series(1, len(e))) AS t(i)
  GROUP BY 1
), stats AS (
  SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM dims
), errs AS (
  SELECT v.vec_id, len(v.e) AS dim,
         list_transform(generate_series(1, len(v.e)), i ->
           CASE WHEN s.mx[i] = s.mn[i] THEN 0.0
                ELSE v.e[i] - (s.mn[i]
                     + LEAST(255.0, GREATEST(0.0,
                         floor((v.e[i] - s.mn[i]) / ((s.mx[i] - s.mn[i]) / 255.0) + 0.5)))
                       * ((s.mx[i] - s.mn[i]) / 255.0))
           END) AS err
  FROM v CROSS JOIN stats s
)
SELECT vec_id,
       ROUND(list_dot_product(err, err) / dim, 6) AS mse,
       ROUND(list_max(list_transform(err, x -> abs(x))), 6) AS max_abs_err
FROM errs ORDER BY vec_id
""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding corpus — per-dimension
    affine codes (code = round((v−min)/scale), scale = (max−min)/255,
    round-half-up as floor(x+0.5) so both engines agree) with per-vector
    reconstruction error reported: the compression step every vector
    store applies before ANN serving, and the fidelity audit that
    decides whether int8 is safe for a given corpus. Constant dims
    (max == min) quantize losslessly to code 0.

    Scale: the calibration pass is one posexplode → per-dim min/max —
    a hash aggregate carrying |dims| rows; the 1-row (mins, maxs)
    calibration table broadcasts, and coding/decoding/error is a pure
    map stage (nested zip_with, no UDF, no second shuffle). Error sums
    run left-to-right via F.aggregate ≡ list_dot_product, the same
    bit-portability contract as every cosine in this module. At corpus
    scale this is the textbook two-pass quantizer: tiny stats exchange,
    then map-only.
    """
    v = _vectors(spark, sf_dir)
    dims = (
        v.select(F.posexplode("e").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    )
    stats = dims.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("pos", "mn"))).alias("pmn"),
        F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("pmx"),
    ).select(
        F.transform("pmn", lambda s: s["mn"]).alias("mns"),
        F.transform("pmx", lambda s: s["mx"]).alias("mxs"),
    )

    def _err(x: Column, m: Column, mx: Column) -> Column:
        scale = (mx - m) / 255.0
        code = F.least(
            F.lit(255.0), F.greatest(F.lit(0.0), F.floor((x - m) / scale + 0.5))
        )
        return F.when(mx == m, F.lit(0.0)).otherwise(x - (m + code * scale))

    paired = F.zip_with(
        F.col("e"), F.col("mns"), lambda x, m: F.struct(x.alias("x"), m.alias("m"))
    )
    errs = F.zip_with(
        paired,
        F.col("mxs"),
        lambda s, mx: _err(s.getField("x"), s.getField("m"), mx),
    )
    return (
        v.crossJoin(F.broadcast(stats))
        .select("vec_id", F.size("e").alias("dim"), errs.alias("err"))
        .select(
            "vec_id",
            F.round(_dot(F.col("err"), F.col("err")) / F.col("dim"), 6).alias("mse"),
            F.round(
                F.array_max(F.transform("err", lambda x: F.abs(x))), 6
            ).alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )


@query(
    "knn_ivf_partitioned",
    tags=("similarity", "knn", "ivf", "index"),
    oracle=_KNN_IVF_ORACLE,
)
def knn_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF serving path against a PERSISTED index (operators/
    ann_index.py): inverted lists written once, partitioned on disk by
    list id, then the probe step joins the query batch to the
    assignments scan on the partition column — Spark's dynamic partition
    pruning compiles the probe list into a runtime partition filter, so
    the scan physically reads only the probed list directories. Results
    are value-identical to the in-plan ``knn_ivf`` (same codebook,
    nprobe=2, top-5 — one oracle serves both), which is the point: the
    index changes WHAT IS READ, never the answer.

    This cashes SCALE.md's 100 TB claim ("inverted lists bucket-
    partitioned so a probe touches only its partitions") as an actual
    layout + pruned scan, witnessed by
    tests/test_ann_index.py::test_serve_scan_is_partition_pruned.

    Build discipline mirrors era5_grid_anomaly_pipeline: one index tree
    per Spark session and fixture (keyed by applicationId + full-path/
    mtime fingerprint, ``catalog.session_cache_suffix``), so repeated runs serve
    from the already-built index — build once, serve many, the vector-
    store lifecycle.
    """
    import atexit
    import os
    import shutil
    import tempfile

    from ..operators.ann_index import build_ivf_index, serve_knn
    from .catalog import session_cache_suffix

    v = _vectors(spark, sf_dir)
    base = os.path.join(
        tempfile.gettempdir(),
        f"mdi_ivf_index_{session_cache_suffix(spark, sf_dir)}",
    )
    complete = os.path.join(base, "_built")
    if not os.path.exists(complete):
        shutil.rmtree(base, ignore_errors=True)
        build_ivf_index(v.select("vec_id", "e", "nrm"), _label_codebook(v), base)
        open(complete, "w").close()
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    queries_df = v.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "e", "nrm")
    return serve_knn(spark, base, queries_df, nprobe=IVF_NPROBE, topk=IVF_TOPK)
