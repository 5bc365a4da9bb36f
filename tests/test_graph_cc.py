"""Connected components (large-star/small-star) + dedup cluster resolution.

Correctness model: a pure-Python union-find over the same edge list — the
Spark result must match it exactly on every topology, including the chain
graphs where naive label propagation needs O(n) rounds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_processor_spark.io import Catalog
from etl_data_processor_spark.ops.dedup import minhash_lsh_pairs
from etl_data_processor_spark.ops.graph import (
    connected_components,
    dedup_clusters,
    dedup_keep,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node -> min id of its component
    roots: dict[int, int] = {}
    for node in list(parent):
        r = find(node)
        roots.setdefault(r, min(n for n in parent if find(n) == r))
    return {node: roots[find(node)] for node in parent}


def _cc_spark(
    spark, edges: list[tuple[int, int]], small_graph_edges: int = 10**6
) -> dict[int, int]:
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(
        df, small_graph_edges=small_graph_edges
    ).collect()
    got = {r["node"]: r["component"] for r in out}
    assert len(got) == len(out), "duplicate node labels emitted"
    return got


TOPOLOGIES = {
    "two_triangles_bridge": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)],
    "separate_components": [(1, 2), (5, 6), (6, 7), (100, 101)],
    "star": [(50, i) for i in range(10)],
    "duplicate_and_reversed_edges": [(4, 2), (2, 4), (4, 2), (9, 9), (2, 1)],
}


@pytest.mark.parametrize("path", ["single_task", "star_rounds"])
@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_cc_matches_union_find(spark, name, path):
    # small_graph_edges=0 forces the distributed star rounds; the default
    # takes the single-task union-find — both must match the Python model
    edges = TOPOLOGIES[name]
    expected = _union_find([e for e in edges if e[0] != e[1]])
    thr = 0 if path == "star_rounds" else 10**6
    assert _cc_spark(spark, edges, small_graph_edges=thr) == expected


def test_cc_long_chain_converges(spark):
    # Path graph 0-1-2-...-63: diameter 63. Label propagation would need 63
    # rounds; star-contraction must finish within the default max_iter=30
    # (O(log^2 n)) and still label every node with the chain minimum.
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_spark(spark, edges, small_graph_edges=0)
    assert got == {i: 0 for i in range(64)}


@pytest.mark.slow
def test_cc_paths_agree_on_random_graphs(spark):
    """The single-task union-find and the distributed star rounds are two
    physical strategies for ONE logical operator: exact agreement on random
    multigraphs (dups, reversed edges, self-loops, skewed components)."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = rng.randrange(30, 120)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 150))
        ]
        fast = _cc_spark(spark, edges)
        slow = _cc_spark(spark, edges, small_graph_edges=0)
        assert fast == slow, f"trial {trial}: paths diverge"


def test_cc_partition_invariance(spark):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(i, i + 2) for i in range(0, 20, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {(r["node"], r["component"]) for r in connected_components(df.repartition(1)).collect()}
    b = {(r["node"], r["component"]) for r in connected_components(df.repartition(13)).collect()}
    assert a == b


def test_dedup_clusters_closes_pairs(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    pairs = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    ]
    expected = _union_find(pairs)
    rows = dedup_clusters(docs, threshold=0.8).collect()
    got = {r["doc_id"]: r["component"] for r in rows}
    assert got == expected
    # cluster_size is the component population; exactly one canonical each
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        assert all(m["cluster_size"] == len(members) for m in members)
        assert sum(m["is_canonical"] for m in members) == 1
        assert min(m["doc_id"] for m in members) == comp


def test_dedup_keep_is_corpus_minus_non_canonical(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    clusters = dedup_clusters(docs, threshold=0.8)
    n_docs = docs.count()
    n_dupes = clusters.filter(F.col("is_canonical") == 0).count()
    kept = dedup_keep(docs, threshold=0.8)
    assert kept.count() == n_docs - n_dupes
    assert kept.columns == docs.columns
    # every cluster still has its canonical representative
    canon = {r["component"] for r in clusters.collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert canon <= kept_ids


def test_decontaminate_matches_exact_cross_join(spark, sf_dir):
    from etl_data_processor_spark.ops.dedup import (
        decontaminate,
        minhash_lsh_pairs_between,
        with_shingles,
    )

    docs = Catalog(spark, sf_dir).documents
    bench_srcs = ["src0", "src1", "src2", "src3"]
    train = docs.filter(~F.col("source").isin(bench_srcs))
    bench = docs.filter(F.col("source").isin(bench_srcs))

    # exact model: brute-force cross Jaccard on collected shingle sets
    tsh = {
        r["doc_id"]: set(r["shingles"])
        for r in with_shingles(train).select("doc_id", "shingles").collect()
    }
    bsh = {
        r["doc_id"]: set(r["shingles"])
        for r in with_shingles(bench).select("doc_id", "shingles").collect()
    }
    contaminated = {
        t
        for t, ts in tsh.items()
        if any(len(ts & bs) / len(ts | bs) >= 0.8 for bs in bsh.values())
    }
    assert contaminated, "fixture plants cross-source near-dups"

    pairs = minhash_lsh_pairs_between(train, bench, threshold=0.8)
    assert {r["id_l"] for r in pairs.collect()} == contaminated

    kept = {r["doc_id"] for r in decontaminate(train, bench).collect()}
    assert kept == set(tsh) - contaminated


def test_pagerank_matches_python_model(spark, sf_dir):
    """pagerank_exact vs a pure-Python mirror of the same integer
    arithmetic: EVERY node's rank must be identical (not approximately) —
    the integer-division design is what makes the distributed result
    reproducible. Also pins partition invariance."""
    from pyspark.sql import functions as F

    from etl_data_processor_spark.ops.graph import pagerank_exact

    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edge_rows = [(r["c"], r["s"]) for r in pairs.collect()]
    sym = edge_rows + [(b, a) for a, b in edge_rows]

    # pure-Python mirror
    deg: dict[int, int] = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    n = len(deg)
    init = 10**12 // n
    base = 15 * init // 100
    rank = {v: init for v in deg}
    for _ in range(5):
        s: dict[int, int] = {v: 0 for v in deg}
        for a, b in sym:
            s[b] += rank[a] // deg[a]
        rank = {v: base + s[v] * 85 // 100 for v in deg}

    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    got = {
        r["src"]: r["rank_q"] for r in pagerank_exact(edges, iters=5).collect()
    }
    assert got == rank

    # partition invariance: a different physical layout, identical ranks
    got2 = {
        r["src"]: r["rank_q"]
        for r in pagerank_exact(edges.repartition(7), iters=5).collect()
    }
    assert got2 == rank


def test_dedup_best_keeps_highest_quality(spark, sf_dir):
    """dedup_keep_best vs pure-Python model: union-find over the engine's
    own (oracle-verified) pair list, then keep argmax-quality per component
    (ties → lowest id) plus all singletons. Runs at any SF — this is the
    sf0.1 verification path where the recursive-CTE oracle is infeasible."""
    from pyspark.sql import functions as F

    from etl_data_processor_spark.ops import text as T
    from etl_data_processor_spark.ops.dedup import minhash_lsh_pairs
    from etl_data_processor_spark.ops.graph import dedup_keep_best

    docs = Catalog(spark, sf_dir).documents
    pairs = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    ]
    quality = {
        r["doc_id"]: (r["q"], r["doc_id"])
        for r in docs.select(
            "doc_id", T.quality_score(F.col("text")).alias("q")
        ).collect()
    }
    comp = _union_find(pairs)
    best: dict[int, int] = {}
    for node, c in comp.items():
        if c not in best or (quality[node][0], -node) > (
            quality[best[c]][0],
            -best[c],
        ):
            best[c] = node
    paired = set(comp)
    keep_expected = (set(quality) - paired) | set(best.values())

    got = {
        r["doc_id"]
        for r in dedup_keep_best(
            docs, score=T.quality_score(F.col("text")), threshold=0.8
        ).collect()
    }
    assert got == keep_expected
