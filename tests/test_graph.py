"""Hand-computed small-graph witnesses for the co-purchase graph family.

The catalog queries are oracle-checked against DuckDB, but both engines
run the SAME formulas — if the orientation rule or the integer-PageRank
update were subtly wrong, they would agree on the wrong answer. These
tests pin the helpers against answers computed by hand (K4, the 5-wheel,
a path) and against an independent pure-Python integer PageRank.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.plans import graph_q as G


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "u bigint, v bigint"
    )


def _triangle_rows(spark, pairs):
    edges = _edges_df(spark, pairs)
    deg = G._degrees(edges)
    tri = G._oriented_triangles(edges, deg)
    return {tuple(sorted((r.a, r.b, r.c))) for r in tri.collect()}


def test_k4_has_four_triangles(spark):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tris = _triangle_rows(spark, k4)
    assert tris == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}


def test_wheel_triangles_each_counted_once(spark):
    # 5-wheel: hub 0 + cycle 1-2-3-4-1 → exactly the 4 hub triangles.
    wheel = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (1, 4)]
    tris = _triangle_rows(spark, wheel)
    assert tris == {(0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 1, 4)}


def test_path_has_no_triangles(spark):
    assert _triangle_rows(spark, [(1, 2), (2, 3), (3, 4)]) == set()


def test_degrees_on_wheel(spark):
    wheel = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (1, 4)]
    deg = {r.node: r.deg for r in G._degrees(_edges_df(spark, wheel)).collect()}
    assert deg == {0: 4, 1: 3, 2: 3, 3: 3, 4: 3}


def _python_integer_pagerank(pairs, iters=G.PR_ITERS, scale=G.RANK_SCALE):
    """Independent reference: same integer-arithmetic spec, plain Python."""
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    n = len(adj)
    base = scale // n
    teleport = (15 * base) // 100
    r = {node: base for node in adj}
    for _ in range(iters):
        inflow = {node: 0 for node in adj}
        for node, neigh in adj.items():
            c = r[node] // len(neigh)
            for m in neigh:
                inflow[m] += c
        r = {node: teleport + (85 * inflow[node]) // 100 for node in adj}
    return r


def test_integer_pagerank_matches_python_model(spark):
    # Asymmetric graph (star + tail) so ranks differ by node.
    pairs = [(1, 2), (1, 3), (1, 4), (4, 5)]
    expected = _python_integer_pagerank(pairs)

    edges = _edges_df(spark, pairs)
    und = G._und(edges).localCheckpoint()
    deg = G._degrees(edges).localCheckpoint()
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    base = G._idiv(F.lit(G.RANK_SCALE), F.col("n"))
    teleport = G._idiv(15 * base, 100)
    ranks = deg.crossJoin(F.broadcast(nn)).select("node", base.alias("r"))
    for _ in range(G.PR_ITERS):
        contrib = ranks.join(deg, "node").select(
            F.col("node").alias("src"), G._idiv(F.col("r"), F.col("deg")).alias("c")
        )
        inflow = (
            und.join(contrib, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            deg.crossJoin(F.broadcast(nn))
            .join(inflow, "node", "left")
            .select(
                "node",
                (teleport + G._idiv(85 * F.coalesce(F.col("inflow"), F.lit(0)), 100)).alias("r"),
            )
        )
    got = {r_.node: r_.r for r_ in ranks.collect()}
    assert got == expected


def test_idiv_matches_python_floor_division(spark):
    rows = [(a, b) for a in (0, 1, 7, 509, 10**12, 85 * 10**12) for b in (1, 3, 7, 100)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    out = df.select("a", "b", G._idiv(F.col("a"), F.col("b")).alias("q")).collect()
    for r in out:
        assert r.q == r.a // r.b


def test_kcore_peels_tail_keeps_clique(spark):
    # K4 (nodes 1-4) plus a pendant chain 4-5-6: the 3-core is exactly K4.
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    edges = _edges_df(spark, pairs)
    und = G._und(edges).localCheckpoint()
    alive = G._degrees(edges)
    for _ in range(3):
        keep = alive.filter(F.col("deg") >= 3).select("node")
        sub = und.join(
            keep.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        alive = (
            sub.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .withColumnRenamed("src", "node")
            .localCheckpoint()
        )
    core = {r.node: r.deg for r in alive.filter(F.col("deg") >= 3).collect()}
    assert core == {1: 3, 2: 3, 3: 3, 4: 3}


def test_idiv_law_hypothesis(spark):
    """Property: _idiv equals Python floor division for every nonnegative
    bigint pair in the PageRank envelope (a ≤ 85·RANK_SCALE, the largest
    intermediate the update ever produces)."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover
        import pytest

        pytest.skip("hypothesis not installed")

    import pyspark.sql.functions as SF

    cases = []

    @settings(max_examples=200, deadline=None)
    @given(
        a=st.integers(min_value=0, max_value=85 * G.RANK_SCALE),
        b=st.integers(min_value=1, max_value=10**6),
    )
    def collect(a, b):
        cases.append((a, b))

    collect()
    df = spark.createDataFrame(cases, "a bigint, b bigint")
    out = df.select("a", "b", G._idiv(SF.col("a"), SF.col("b")).alias("q")).collect()
    for r in out:
        assert r.q == r.a // r.b, (r.a, r.b)


def test_imuldiv_matches_python_exact(spark):
    """_imuldiv must equal Python's exact (a*mult)//den on the HITS
    envelope, where the product exceeds _idiv's 2^53 double limit."""
    from pyspark.sql import functions as SF

    rows = [
        (999999937, 999999999),
        (10**9, 10**9),
        (1, 10**9),
        (10**9 - 1, 3),
        (7, 13),
        (123456789, 987654321),
    ]
    df = spark.createDataFrame(rows, "a bigint, t bigint")
    out = df.select(
        "a", "t", G._imuldiv(SF.col("a"), G.HITS_SCALE, SF.col("t")).alias("q")
    ).collect()
    for r in out:
        assert r.q == r.a * G.HITS_SCALE // r.t, (r.a, r.t)


def test_imuldiv_exact_past_1e12_denominator(spark):
    """ADVICE r6: the old decimal(12,0) casts overflowed to NULL once the
    HITS half-step total passed 10^12. Verify exact floor(a*mult/den) at
    bigint-extreme operands against Python's arbitrary-precision ints."""
    from monitoring_data_ingestion_spark.plans.graph_q import HITS_SCALE, _imuldiv

    cases = [
        (912_345_678, HITS_SCALE, 4_000_000_000_000),   # den past 1e12
        (1, HITS_SCALE, 10**18),                        # tiny/huge
        (10**18, HITS_SCALE, 10**18 + 7),               # both near 2^63
        (999_999_999, HITS_SCALE, 10**9 + 1),
    ]
    df = spark.createDataFrame([(a, d) for a, _, d in cases], "a long, d long")
    got = [
        r["q"]
        for r in df.select(_imuldiv(F.col("a"), HITS_SCALE, F.col("d")).alias("q"))
        .collect()
    ]
    want = [(a * m) // d for a, m, d in cases]
    assert got == want


def test_customer_similarity_budget_collapse_keeps_rarest_part(spark, monkeypatch):
    """ADVICE r6: a pair budget smaller than every part's n_buyers² must
    degrade to the single rarest part, not silently return zero rows."""
    from .conftest import SF_SMOKE

    monkeypatch.setattr(G, "CF_PAIR_BUDGET", 0)
    monkeypatch.setattr(G, "CF_MIN_SHARED", 1)
    out = G.graph_customer_similarity(spark, SF_SMOKE)
    # With budget 0 the rank-1 part is still candidate-generating: any
    # part bought by >=2 customers yields at least one pair.
    assert out.count() > 0
