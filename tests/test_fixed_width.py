"""Typed fixed-width layout engine: render→parse round-trips for every
field kind (overpunch signs, zero-padded ints, dates), layout-fit
guards, and the gap check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from epe_data_wrangling_spark.sources.fixed_width import (
    OVERPUNCH_NEG,
    OVERPUNCH_POS,
    FwField,
    fw_parse,
    fw_render_expr,
)

LAYOUT = (
    FwField("k", 1, 10, "int"),
    FwField("d", 11, 8, "date"),
    FwField("amt", 19, 12, "zoned", scale=2),
    FwField("tag", 31, 6, "text"),
)

#: The awkward amounts: zero (renders '{'), ±1, sign boundaries, the
#: widest magnitude the 12-byte field holds, and every final digit in
#: both signs (exercising the full overpunch alphabets).
EDGE_AMOUNTS = (
    [0, 1, -1, 10, -10, 99999999999 * 10 + 9, -(10**11 - 1)]
    + list(range(100, 110))
    + [-(200 + i) for i in range(10)]
)


def test_round_trip_every_kind(spark):
    import datetime

    rows = [
        (i + 1, datetime.date(1995, 1 + (i % 12), 1 + (i % 28)), a, f"t{i}")
        for i, a in enumerate(EDGE_AMOUNTS)
    ]
    df = spark.createDataFrame(rows, "k BIGINT, d DATE, amt BIGINT, tag STRING")
    rendered = df.select(fw_render_expr(LAYOUT).alias("value"))
    # every line is exactly the layout's total width
    widths = rendered.select(F.length("value").alias("w")).distinct().collect()
    assert [r["w"] for r in widths] == [36]
    back = fw_parse(rendered, LAYOUT)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_overpunch_last_byte_is_never_a_digit(spark):
    """The defining property of the zoned field: the final byte
    carries the sign, so it must come from the overpunch alphabets —
    a plain trailing digit would mean the encoder silently dropped
    the sign channel."""
    df = spark.createDataFrame([(a,) for a in EDGE_AMOUNTS], "amt BIGINT")
    one = (FwField("amt", 1, 12, "zoned", scale=2),)
    lasts = {
        r["c"]
        for r in df.select(fw_render_expr(one).alias("v"))
        .select(F.substring("v", 12, 1).alias("c"))
        .distinct()
        .collect()
    }
    assert lasts <= set(OVERPUNCH_POS + OVERPUNCH_NEG)
    neg = {
        r["c"]
        for r in df.filter(F.col("amt") < 0)
        .select(fw_render_expr(one).alias("v"))
        .select(F.substring("v", 12, 1).alias("c"))
        .distinct()
        .collect()
    }
    assert neg <= set(OVERPUNCH_NEG)


def test_render_rejects_layout_gaps():
    with pytest.raises(ValueError, match="layout gap"):
        fw_render_expr((FwField("a", 1, 4, "int"), FwField("b", 6, 4, "int")))


def test_unknown_kind_rejected(spark):
    with pytest.raises(ValueError, match="unknown fixed-width field kind"):
        fw_parse(
            spark.createDataFrame([("x",)], "value STRING"),
            (FwField("a", 1, 1, "packed"),),
        )


def test_ledger_layout_fits_the_data(spark):
    """Every orders row must FIT FW_LEDGER_LAYOUT (lpad silently
    TRUNCATES an overwide value from the left, so a too-narrow field
    would corrupt data rather than fail) — the guard that turns a
    data-shape change into a named failure."""
    from epe_data_wrangling_spark.catalog.core import FW_LEDGER_LAYOUT
    from epe_data_wrangling_spark.sources.tables import load_table

    widths = {f.name: f.width for f in FW_LEDGER_LAYOUT}
    o = load_table(spark, "/root/testdata/sf0.01", "orders")
    m = o.select(
        F.max(F.length(F.col("o_orderkey").cast("string"))).alias("k"),
        F.max(
            F.length(
                F.abs(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast(
                    "string"
                )
            )
        ).alias("c"),
        F.max(F.length("o_orderstatus")).alias("s"),
    ).collect()[0]
    assert m["k"] <= widths["o_orderkey"]
    assert m["c"] <= widths["balance_cents"]  # digits incl. overpunch byte
    assert m["s"] <= widths["o_orderstatus"]


def test_render_raises_on_field_overflow(spark):
    """lpad/rpad silently truncate — the render must instead FAIL on a
    value wider than its field, for every kind, so a bad layout can
    never corrupt an extract."""
    import pytest
    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.sources.fixed_width import (
        FwField,
        fw_render_expr,
    )

    layout = (
        FwField("k", 1, 3, "int"),
        FwField("t", 4, 2, "text"),
        FwField("z", 6, 4, "zoned", scale=2),
    )
    ok = spark.createDataFrame([(123, "ab", -999)], "k INT, t STRING, z BIGINT")
    assert ok.select(fw_render_expr(layout).alias("v")).collect()[0]["v"] == "123ab099R"
    for bad in (
        spark.createDataFrame([(1234, "ab", 0)], "k INT, t STRING, z BIGINT"),
        spark.createDataFrame([(1, "abc", 0)], "k INT, t STRING, z BIGINT"),
        spark.createDataFrame([(1, "ab", -99999)], "k INT, t STRING, z BIGINT"),
    ):
        with pytest.raises(Exception, match="fixed-width overflow"):
            bad.select(fw_render_expr(layout).alias("v")).collect()

    # a NULL field null-propagates (no spurious overflow raise)
    withnull = spark.createDataFrame([(None, "ab", 7)], "k INT, t STRING, z BIGINT")
    assert withnull.select(fw_render_expr(layout).alias("v")).collect()[0]["v"] is None

    with pytest.raises(ValueError, match="width 8"):
        fw_render_expr((FwField("d", 1, 6, "date"),))


def test_int_render_rejects_negative(spark):
    """PIC 9(n) is unsigned: lpad('-5', w, '0') would yield '0…0-5',
    pass the width guard, and fw_parse's cast would round-trip it to
    NULL — silent corruption. The render must raise instead and point
    at 'zoned' (the signed kind)."""
    one = (FwField("k", 1, 6, "int"),)
    bad = spark.createDataFrame([(-5,)], "k BIGINT")
    with pytest.raises(Exception, match="unsigned"):
        bad.select(fw_render_expr(one).alias("v")).collect()
    # boundary: zero is fine and still zero-pads
    zero = spark.createDataFrame([(0,)], "k BIGINT")
    assert zero.select(fw_render_expr(one).alias("v")).collect()[0]["v"] == "000000"


def test_date_render_rejects_out_of_range_year(spark):
    """yyyyMMdd is 8 bytes only for years 1..9999; a year 10000+
    renders 9 chars and would silently shift every later field — the
    date kind must fail the job through the same overflow guard as
    text/int/zoned."""
    import datetime

    layout = (FwField("d", 1, 8, "date"), FwField("t", 9, 2, "text"))
    ok = spark.createDataFrame(
        [(datetime.date(9999, 12, 31), "ab")], "d DATE, t STRING"
    )
    assert (
        ok.select(fw_render_expr(layout).alias("v")).collect()[0]["v"]
        == "99991231ab"
    )
    # python's datetime caps at year 9999; build the year-10000 date
    # engine-side (Spark dates are plain days-since-epoch ints)
    bad = spark.sql("SELECT date_add(DATE'9999-12-31', 1) AS d, 'ab' AS t")
    with pytest.raises(Exception, match="fixed-width overflow"):
        bad.select(fw_render_expr(layout).alias("v")).collect()
    # NULL date still null-propagates through the guard
    withnull = spark.createDataFrame(
        [(None, "ab")], "d DATE, t STRING"
    )
    assert (
        withnull.select(fw_render_expr(layout).alias("v")).collect()[0]["v"]
        is None
    )
