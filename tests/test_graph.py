"""operators.graph invariants the oracle differential cannot see:
the catalog's trading graph is symmetric, so sink-node handling and
mass accounting need direct tests on asymmetric inputs (the r6
code-review found nodes derived from src only — a plain directed
graph silently dropped pure sinks and their received mass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from epe_data_wrangling_spark.operators.graph import pagerank


def _toy_directed(spark):
    # 0→1, 0→2, 1→2, 3→2 : node 2 is a PURE SINK (never a src),
    # node 3 is a source-only node
    return spark.createDataFrame(
        [("0", "1"), ("0", "2"), ("1", "2"), ("3", "2")], "src string, dst string"
    )


def test_pagerank_includes_pure_sink_nodes(spark):
    for mode in ("broadcast", "partitioned"):
        out = {r.node: r.pagerank for r in _toy_directed(spark).select("src", "dst")
               .transform(lambda df: pagerank(df, iters=2, mode=mode)).collect()}
        assert set(out) == {"0", "1", "2", "3"}, mode
        # the sink receives every walk: it must dominate
        assert out["2"] == max(out.values()), mode
        # source-only nodes still hold teleport mass
        assert out["3"] > 0, mode


def test_pagerank_symmetric_graph_conserves_mass(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    sym = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    for mode in ("broadcast", "partitioned"):
        total = sum(r.pagerank for r in pagerank(sym, iters=3, mode=mode).collect())
        # no dangling nodes on a symmetric graph ⇒ rank mass conserved
        assert abs(total - 1.0) < 1e-6, (mode, total)


def test_pagerank_rejects_unknown_mode(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown pagerank mode"):
        pagerank(_toy_directed(spark), mode="magic")
