"""Engine-rendering canaries + oracle lint.

CORRECTNESS_r04's one red row (``variant_shred_events``) was caused by
an oracle that compared Spark's ``to_json(parse_json(...))`` text
against DuckDB's ``CAST(json(...) AS VARCHAR)`` text — two engines'
JSON canonicalizations that agreed in this repo's environment but not
in the driver's. Catalog policy since round 5: **oracles may never
compare engine-canonicalized text** (JSON spacing/key order, float
shortest-roundtrip rendering, timestamp CAST format). Two defenses:

1. *Canaries*: pin the handful of rendering behaviors the policy is
   about, in BOTH engines, so a dependency bump that changes any of
   them fails loudly here in pytest instead of silently in the
   driver — and the failure message points straight at the hazard
   class to audit.
2. *Lint*: statically scan every registered oracle for the fragile
   constructs themselves (canonical-JSON text comparison, CAST of
   double/timestamp aggregates to VARCHAR in a hashed column).
"""

from __future__ import annotations

import re

import duckdb
import pytest

from epe_data_wrangling_spark.catalog import all_queries, resolve_oracle

AUDIT_HINT = (
    "Engine rendering changed under a dependency bump. Audit every oracle "
    "for text-rendered structured values (see tests/test_render_canary.py "
    "docstring) before trusting CORRECTNESS results."
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


class TestDuckDBRenderingCanaries:
    """Pin DuckDB's text renderings of the hazard-class types."""

    def test_json_canonical_form(self, duck):
        # Minified, key order preserved, ints stay ints.
        (v,) = duck.execute(
            """SELECT CAST(json('{"b": 1, "a": 2.5}') AS VARCHAR)"""
        ).fetchone()
        assert v == '{"b":1,"a":2.5}', AUDIT_HINT

    def test_double_varchar_shortest_roundtrip(self, duck):
        (v,) = duck.execute("SELECT CAST(CAST(0.1 AS DOUBLE) AS VARCHAR)").fetchone()
        assert v == "0.1", AUDIT_HINT
        (v,) = duck.execute("SELECT CAST(CAST(1e30 AS DOUBLE) AS VARCHAR)").fetchone()
        assert v == "1e+30", AUDIT_HINT  # exponent form ≠ Spark's '1.0E30'

    def test_timestamp_varchar_format(self, duck):
        (v,) = duck.execute(
            "SELECT CAST(TIMESTAMP '1995-03-01 00:00:00' AS VARCHAR)"
        ).fetchone()
        assert v == "1995-03-01 00:00:00", AUDIT_HINT


class TestSparkRenderingCanaries:
    """Pin Spark's text renderings of the hazard-class types."""

    def test_variant_to_json_minified(self, spark):
        from pyspark.sql import functions as F

        row = (
            spark.range(1)
            .select(F.to_json(F.parse_json(F.lit('{"b": 1, "a": 2.5}'))).alias("j"))
            .first()
        )
        assert row.j == '{"a":2.5,"b":1}', AUDIT_HINT  # Spark SORTS keys — DuckDB does not

    def test_double_cast_string(self, spark):
        from pyspark.sql import functions as F

        row = (
            spark.range(1)
            .select(
                F.lit(0.1).cast("string").alias("a"),
                F.lit(1e30).cast("string").alias("b"),
            )
            .first()
        )
        # Spark renders 1e30 as '1.0E30' — NOT DuckDB's '1e+30' nor
        # Python's '1e+30'. This divergence is exactly why doubles must
        # be emitted as typed columns, never strings.
        assert row.a == "0.1", AUDIT_HINT
        assert row.b == "1.0E30", AUDIT_HINT

    def test_timestamp_cast_string(self, spark):
        from pyspark.sql import functions as F

        row = (
            spark.range(1)
            .select(
                F.to_timestamp(F.lit("1995-03-01 00:00:00")).cast("string").alias("t")
            )
            .first()
        )
        assert row.t == "1995-03-01 00:00:00", AUDIT_HINT


#: Constructs no oracle may contain. Each pattern targets text
#: rendering of a structured/floating value that engines canonicalize
#: differently; integer CASTs are fine (universal rendering).
FORBIDDEN_ORACLE_PATTERNS = [
    # measuring/compare the canonical JSON *text* itself (the r4 bug);
    # json_extract_string(json(...)) for structural checks is fine.
    (
        re.compile(r"length\s*\(\s*CAST\s*\(\s*json\s*\(", re.I),
        "length of canonical JSON text (engine-dependent spacing/order)",
    ),
    (
        re.compile(r"CAST\s*\(\s*(revenue|avg|mean|ratio|score)\w*\s+AS\s+VARCHAR", re.I),
        "double-valued column rendered to VARCHAR (shortest-roundtrip divergence)",
    ),
    (
        re.compile(r"CAST\s*\(\s*(min|max)_?date\w*\s+AS\s+VARCHAR", re.I),
        "timestamp rendered to VARCHAR (format divergence)",
    ),
]


def test_oracles_free_of_rendering_hazards():
    bad = []
    for name, q in all_queries().items():
        sql = resolve_oracle(q)
        if not sql:
            continue
        for pat, why in FORBIDDEN_ORACLE_PATTERNS:
            if pat.search(sql):
                bad.append(f"{name}: {why}")
    assert not bad, "oracle rendering hazards:\n" + "\n".join(bad)


#: DuckDB result types no oracle may emit in its FINAL projection.
#: HUGEINT (int128, from any bare SUM over integers) and DECIMAL are
#: canonicalized by the external driver differently than Python
#: int/float — CORRECTNESS_r01 (decimals) and _r05 (HUGEINT: the
#: variant_shred_events / xml_source_nations reds) both manifested as
#: rows+schema green / hash red while the strict local sweep passed.
#: JSON-typed finals are the r4 text-canonicalization hazard in type
#: form. The r5 static regex lint above could not see these — only
#: binding the query through DuckDB's planner types the result.
#: "[]"/STRUCT/MAP: how the driver canonicalizes nested results is
#: UNOBSERVED (no array-final query has ever been driver-certified);
#: catalog policy (r6) is to emit comma-joined integer/string text
#: instead — universal rendering, no bet on client-library list types.
_FORBIDDEN_RESULT_TYPES = ("HUGEINT", "DECIMAL", "JSON", "[]", "STRUCT", "MAP")

SF_LINT_DIR = "/root/testdata/sf0.001"


def test_oracle_final_types_are_driver_safe():
    """Bind EVERY registered oracle through DuckDB and assert its
    final projection carries no driver-canonicalization-hazard type.
    This is the dynamic companion to the static pattern lint: a bare
    ``SUM(int_col)`` final reads innocently in SQL text but types as
    HUGEINT, and the next engine-typing divergence won't match any
    regex we thought of in advance. Relation binding (not execution)
    is enough — the planner resolves result types without running the
    query, so the whole 227-oracle catalog lints in seconds."""
    import duckdb as _duckdb

    con = _duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_LINT_DIR}/{t}.parquet')"
        )
    bad = []
    for name, q in all_queries().items():
        sql = resolve_oracle(q)
        if not sql:
            continue
        try:
            rel = con.sql(sql)
        except Exception as e:  # an unbindable oracle is itself a failure
            bad.append(f"{name}: oracle failed to bind: {type(e).__name__}: {e}")
            continue
        for col, ty in zip(rel.columns, rel.types):
            s = str(ty).upper()
            if any(k in s for k in _FORBIDDEN_RESULT_TYPES):
                bad.append(
                    f"{name}.{col}: {ty} — wrap in CAST(... AS BIGINT/DOUBLE)"
                )
    assert not bad, (
        "oracle final-projection type hazards (driver canonicalizes these "
        "differently than Python int/float — see r1/r5 postmortems):\n"
        + "\n".join(bad)
    )


def test_data_shape_assumptions_hold():
    """Pin the data-shape preconditions individual catalog queries
    rely on, so a driver data-generator change fails HERE with a
    named assumption instead of as an inscrutable hash-red:

    - ``sketch_approx_topk_events`` is exact only while event_type
      cardinality stays ≤ APPROX_TOPK_K (and the sketch's default
      maxItemsTracked); past that, approx_top_k silently returns a
      subset while the exact-count oracle returns all groups.
    - ``feature_winsorize_robust`` (and the other rank windows over
      events.value) now pin NULLS LAST explicitly on both engines,
      but record the current no-NULLs state so a generator change is
      at least visible.
    """
    import duckdb as _duckdb

    from epe_data_wrangling_spark.catalog.core import APPROX_TOPK_K

    con = _duckdb.connect()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        (card,) = con.execute(
            f"SELECT COUNT(DISTINCT event_type) FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()
        assert card <= APPROX_TOPK_K, (
            f"{sf_dir}: event_type cardinality {card} > APPROX_TOPK_K "
            f"{APPROX_TOPK_K} — sketch_approx_topk_events leaves its exactness "
            "regime; raise k or switch the oracle to a top-k form"
        )
