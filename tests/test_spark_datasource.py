"""Python Data Source API integration (sources.spark_datasource).

Truth source: the in-memory grids the fixture workbooks are written
from. The Spark read path (executor-side parse → cell relation) must
reproduce every non-blank cell of every sheet, for both container
formats, for directory/glob multi-file loads.
"""

import pytest

from epe_data_wrangling_spark.plans.epe_demo import workbook_grids
from epe_data_wrangling_spark.sources.spark_datasource import register
from epe_data_wrangling_spark.sources.xls_biff import write_xls
from epe_data_wrangling_spark.sources.xlsx import write_xlsx


def _expected_cells(file: str, grids=None) -> set:
    """Truth = the stdlib reader's view of the FILE (the container
    writers legitimately trim trailing all-blank rows, so the raw
    in-memory grids are not the contract — the file is)."""
    from epe_data_wrangling_spark.sources.workbook import read_workbook_grids

    out = set()
    for sheet_idx, (sheet, grid) in enumerate(read_workbook_grids(file).items()):
        n_rows = len(grid)
        n_cols = max((len(r) for r in grid), default=0)
        out.add((file, sheet, sheet_idx, -1, -1, None, n_rows, n_cols))
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if v is not None:
                    out.add((file, sheet, sheet_idx, r, c, str(v), n_rows, n_cols))
    return out


@pytest.fixture(scope="module")
def workbook_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wb_drop")
    grids = workbook_grids()
    write_xlsx(str(d / "drop_a.xlsx"), grids)
    write_xls(str(d / "drop_b.xls"), grids)
    return d, grids


def _read(spark, path):
    register(spark)
    return spark.read.format("workbook").load(str(path))


def test_single_xlsx_cells_match_grid_truth(spark, workbook_dir):
    d, grids = workbook_dir
    path = str(d / "drop_a.xlsx")
    got = {tuple(r) for r in _read(spark, path).collect()}
    assert got == _expected_cells(path, grids)


def test_single_xls_cells_match_grid_truth(spark, workbook_dir):
    d, grids = workbook_dir
    path = str(d / "drop_b.xls")
    got = {tuple(r) for r in _read(spark, path).collect()}
    assert got == _expected_cells(path, grids)


def test_directory_load_mixes_formats_one_partition_per_file(spark, workbook_dir):
    d, grids = workbook_dir
    df = _read(spark, d)
    assert df.rdd.getNumPartitions() == 2  # one InputPartition per file
    got = {tuple(r) for r in df.collect()}
    want = _expected_cells(str(d / "drop_a.xlsx"), grids) | _expected_cells(
        str(d / "drop_b.xls"), grids
    )
    assert got == want


def test_glob_load(spark, workbook_dir):
    d, grids = workbook_dir
    df = _read(spark, str(d / "*.xls"))
    got = {tuple(r) for r in df.collect()}
    assert got == _expected_cells(str(d / "drop_b.xls"), grids)


def test_missing_path_raises(spark, workbook_dir):
    d, _ = workbook_dir
    with pytest.raises(Exception, match="no workbook files"):
        _read(spark, str(d / "nope_dir")).collect()


def test_header_row_reconstructs_readxl_names(spark, workbook_dir):
    """Row 0 of each sheet is the header row under read_xls semantics;
    the cell relation must let downstream rebuild the exact names the
    driver-side ingester produces (``...k`` for blank header cells)."""
    from epe_data_wrangling_spark.sources.workbook import readxl_names

    d, grids = workbook_dir
    df = _read(spark, str(d / "drop_a.xlsx"))
    hdr = df.where("row_idx = 0").collect()
    by_sheet: dict[str, dict[int, str]] = {}
    for row in hdr:
        by_sheet.setdefault(row.sheet, {})[row.col_idx] = row.value
    for sheet, grid in grids.items():
        width = len(grid[0])
        cells = by_sheet.get(sheet, {})
        rebuilt = [cells.get(i) for i in range(width)]
        assert readxl_names(rebuilt) == readxl_names(grid[0])


def test_streaming_landing_zone_exactly_once(spark, tmp_path):
    """Drops land between two availableNow runs over ONE checkpoint:
    each file's cells are emitted exactly once (offset = seen-file
    set), so the cumulative sink holds both drops without dups."""
    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    grids = workbook_grids()
    write_xlsx(str(land / "drop1.xlsx"), grids)

    register(spark)
    df = spark.readStream.format("workbook").load(str(land))
    n_cells = len(_expected_cells(str(land / "drop1.xlsx")))  # incl. markers

    def run() -> int:
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).count()

    assert run() == n_cells
    write_xls(str(land / "drop2.xls"), grids)  # second drop, other format
    assert run() == 2 * n_cells
    files = {
        r.file.rsplit("/", 1)[-1]
        for r in spark.read.parquet(out).select("file").distinct().collect()
    }
    assert files == {"drop1.xlsx", "drop2.xls"}


def test_geometry_survives_sparse_encoding(spark, tmp_path):
    """Empty sheets and trailing all-blank rows/columns must survive
    the sparse cell encoding (the 13-column dispatch depends on an
    EMPTY 13th column still being 13th): the marker rows + carried
    dims make grids_from_cells an exact inverse."""
    from epe_data_wrangling_spark.sources.spark_datasource import grids_from_cells

    grids = {
        "S1": [["h1", "h2", None], ["a", None, None], [None, None, None]],
        "EMPTY": [[None, None]],
        "S3": [["x"]],
    }
    path = str(tmp_path / "geo.xlsx")
    write_xlsx(path, grids)
    register(spark)
    cells = spark.read.format("workbook").load(path)
    rebuilt = grids_from_cells(cells)
    # xlsx write/read round-trip itself trims nothing: compare to the
    # driver-side reader's view of the same file
    from epe_data_wrangling_spark.sources.workbook import read_workbook_grids

    assert rebuilt == read_workbook_grids(path)
    assert list(rebuilt) == ["S1", "EMPTY", "S3"]


def test_ragged_grid_rejected_at_emission():
    """The cell relation's sparse encoding is only lossless for
    rectangular grids (every read_workbook_grids engine emits them);
    a ragged grid must fail loudly at the emission boundary — padded
    short rows could otherwise flip the header-width Shape-A/B
    dispatch downstream (r4 advice)."""
    import pytest

    from epe_data_wrangling_spark.sources.spark_datasource import _emit_sheet_cells

    with pytest.raises(ValueError, match="ragged grid"):
        _emit_sheet_cells("f.xlsx", 0, "S1", [["h1", "h2"], ["a", "b", "JUNK"]])
    # rectangular grids (incl. all-None rows) still emit fine
    rows = _emit_sheet_cells("f.xlsx", 0, "S1", [["h1", "h2"], [None, None]])
    assert rows[0][3] == -1 and rows[0][6:] == (2, 2)


def test_workbook_writer_round_trip_and_commit_protocol(spark, tmp_path):
    """The write twin: df.write.format('workbook') must (1) publish
    one real .xlsx shard per non-empty partition with a _SUCCESS
    manifest and no _temporary leftovers (two-phase commit), and
    (2) round-trip content through the workbook READER under the
    all-text contract."""
    import json
    import os

    from pyspark.sql import functions as F

    from epe_data_wrangling_spark.sources.spark_datasource import grids_from_cells

    register(spark)
    out = str(tmp_path / "export")
    df = (
        spark.range(0, 20)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        )
        .repartition(3)
    )
    df.write.format("workbook").mode("overwrite").save(out)

    files = sorted(os.listdir(out))
    shards = [f for f in files if f.startswith("part-") and f.endswith(".xlsx")]
    assert shards and "_SUCCESS" in files and "_temporary" not in files
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["n_rows"] == 20
    assert set(manifest["shards"]) == set(shards)

    # grids_from_cells reassembles ONE workbook (keyed by sheet name),
    # so read each shard separately — every shard carries the same
    # 'data' sheet by design
    rows = []
    for shard in shards:
        cells = spark.read.format("workbook").load(os.path.join(out, shard))
        [grid] = grids_from_cells(cells).values()
        assert grid[0] == ["k", "s"]  # header row = schema names
        rows += grid[1:]
    assert sorted(rows) == sorted([[str(i), f"v{i}"] for i in range(20)])

    # overwrite replaces prior shards, never appends to them
    df.limit(5).repartition(1).write.format("workbook").mode("overwrite").save(out)
    manifest2 = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest2["n_rows"] == 5
    shards2 = [f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".xlsx")]
    assert set(manifest2["shards"]) == set(shards2)

    # append numbers new shards AFTER the existing max and merges the
    # manifest — never clobbers published shards (r5 review finding)
    df.limit(3).repartition(1).write.format("workbook").mode("append").save(out)
    manifest3 = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest3["n_rows"] == 8
    shards3 = [f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".xlsx")]
    assert set(manifest3["shards"]) == set(shards3) and len(shards3) == 2
    assert set(manifest2["shards"]) < set(manifest3["shards"])


def test_workbook_writer_null_cells_round_trip(spark, tmp_path):
    """NULLs must come back as the reader's None (blank cell), not ''
    — and the header row pins the grid width even when an entire
    column is null."""
    import os

    from epe_data_wrangling_spark.sources.spark_datasource import grids_from_cells

    register(spark)
    out = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [("a", None, None), (None, "b", None), ("c", "d", None)],
        "x string, y string, all_null string",
    ).coalesce(1)
    df.write.format("workbook").mode("overwrite").save(out)
    [shard] = [f for f in os.listdir(out) if f.endswith(".xlsx")]
    cells = spark.read.format("workbook").load(os.path.join(out, shard))
    [grid] = grids_from_cells(cells).values()
    assert grid[0] == ["x", "y", "all_null"]
    key = lambda r: [("" if v is None else "\x01" + v) for v in r]  # noqa: E731
    assert sorted(grid[1:], key=key) == [
        [None, "b", None],
        ["a", None, None],
        ["c", "d", None],
    ]


def test_stream_reader_plans_one_partition_per_new_drop(tmp_path):
    """The distributed-parse contract (r13): `WorkbookStreamReader`
    is a FULL DataSourceStreamReader whose `partitions(start, end)`
    plans ONE partition per file that joined between the offsets —
    the unit of executor-side parse parallelism for a fleet of
    concurrent drops. Unknown/already-seen files must not be
    re-planned."""
    import os

    from epe_data_wrangling_spark.sources.spark_datasource import (
        WorkbookStreamReader,
    )

    d = str(tmp_path / "landing")
    os.makedirs(d)
    files = []
    for i in range(3):
        p = os.path.join(d, f"drop_{i}.xlsx")
        open(p, "wb").close()  # listing-only: partitions never opens files
        files.append(p)
    r = WorkbookStreamReader({"path": d})
    assert r.initialOffset() == {"seen": []}
    assert r.latestOffset() == {"seen": sorted(files)}
    parts = r.partitions({"seen": []}, {"seen": sorted(files)})
    assert sorted(p.file for p in parts) == sorted(files)
    # incremental: only the unseen file is planned
    parts2 = r.partitions(
        {"seen": sorted(files[:2])}, {"seen": sorted(files)}
    )
    assert [p.file for p in parts2] == [files[2]]
    # no new files -> no partitions (an empty poll plans nothing)
    assert r.partitions({"seen": sorted(files)}, {"seen": sorted(files)}) == []


def test_stream_reader_offsets_are_monotone(tmp_path):
    """latestOffset must never REGRESS below what was already seen:
    a bare directory listing is not monotone — retention cleanup (or
    a transient listing blip on an object store) removes a landed
    file, and a listing-only offset would shrink, so a file re-landed
    under the same name would be re-planned and its cells duplicated
    downstream. Seen-file sets only grow; the committed offsets seed
    the accumulator across reader re-creation (restart)."""
    import os

    from epe_data_wrangling_spark.sources.spark_datasource import (
        WorkbookStreamReader,
    )

    d = str(tmp_path / "landing")
    os.makedirs(d)
    f1 = os.path.join(d, "drop_1.xlsx")
    open(f1, "wb").close()
    r = WorkbookStreamReader({"path": d})
    off1 = r.latestOffset()
    assert off1 == {"seen": [f1]}
    # retention cleanup removes the landed file -> offset must NOT shrink
    os.remove(f1)
    assert r.latestOffset() == {"seen": [f1]}
    # the file re-lands under the same name: still seen, never re-planned
    open(f1, "wb").close()
    off2 = r.latestOffset()
    assert off2 == {"seen": [f1]}
    assert r.partitions(off1, off2) == []
    # restart path: a FRESH reader (empty accumulator) is seeded by the
    # committed offsets Spark hands to partitions(); a later listing
    # that misses the file cannot regress below them
    r2 = WorkbookStreamReader({"path": d})
    assert r2.partitions({"seen": [f1]}, {"seen": [f1]}) == []
    os.remove(f1)
    assert r2.latestOffset() == {"seen": [f1]}


def test_stream_reader_offsets_dir_survives_restart_ordering(tmp_path):
    """The restart-ordering window the in-memory accumulator cannot
    close: Spark may call latestOffset() on a FRESH reader instance
    BEFORE partitions() seeds it from the committed offsets. With the
    ``offsets_dir`` option the seen-file set persists (atomic JSON)
    and re-seeds on construction, so a retention-removed file cannot
    regress the very first offset after restart. Also pins the
    planned-but-missing witness: a file due for first emission that
    vanished between listing and planning raises with the cause,
    instead of an executor FileNotFoundError or silent duplicates."""
    import os

    from epe_data_wrangling_spark.sources.spark_datasource import (
        WorkbookStreamReader,
    )

    d = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    os.makedirs(d)
    f1 = os.path.join(d, "drop_1.xlsx")
    open(f1, "wb").close()
    r = WorkbookStreamReader({"path": d, "offsets_dir": state})
    off = r.latestOffset()
    assert off == {"seen": [f1]}
    # retention removes the file; a FRESH reader (restart) calls
    # latestOffset FIRST — the persisted state must hold the line
    os.remove(f1)
    r2 = WorkbookStreamReader({"path": d, "offsets_dir": state})
    assert r2.latestOffset() == {"seen": [f1]}
    assert r2.partitions(off, {"seen": [f1]}) == []
    # planned-but-missing witness: a NEW file vanishing between
    # listing and planning is a raised corruption report
    f2 = os.path.join(d, "drop_2.xlsx")
    open(f2, "wb").close()
    off2 = r2.latestOffset()
    os.remove(f2)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="no longer exist"):
        r2.partitions(off, off2)
