"""Z-order layout (operators/layout.py): key correctness vs a pure-Python
twin, and the data-skipping property measured from real Parquet footer
stats — range predicates on EITHER dimension overlap few z-ordered files,
while a single-column sort only skips for its own column."""

import pyspark.sql.functions as F

from filtered_ads_vector_search_spark.operators import layout as LY


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_zorder_key_matches_python_twin(spark):
    rows = [(i, (i * 37) % 1024, (i * 101) % 1024) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.zk
        for r in df.select(
            "id", LY.zorder_key_col(F.col("x"), F.col("y")).alias("zk")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == _morton_py(x, y), (i, x, y)
    assert _morton_py(0, 0) == 0
    assert _morton_py(1, 0) == 1 and _morton_py(0, 1) == 2


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """4096-point uniform grid written as 16 files. A thin y-slab overlaps
    EVERY x-sorted file (each spans all of y) but only a corner of the
    z-ordered ones; same for a thin x-slab — z-order skips on both axes."""
    n = 64
    rows = [(x * n + y, x * 16, y * 16) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long").repartition(8)

    zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
    LY.write_zordered(df, zpath, "x", "y", n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def overlap(path, col, lo, hi):
        stats = LY.parquet_minmax(path, col)
        assert len(stats) >= 12  # ~16 files materialized
        return sum(1 for mn, mx in stats if not (mx < lo or mn > hi)), len(stats)

    # thin y-slab: y in [0, 64)
    z_hit, z_total = overlap(zpath, "y", 0, 63)
    x_hit, x_total = overlap(xpath, "y", 0, 63)
    assert x_hit == x_total  # x-sorted layout cannot skip on y
    assert z_hit <= z_total // 2, (z_hit, z_total)
    # thin x-slab: z-order skips here too (and so does the x-sort)
    zx_hit, _ = overlap(zpath, "x", 0, 63)
    assert zx_hit <= z_total // 2, (zx_hit, z_total)
    # nothing lost: full round trip
    assert spark.read.parquet(zpath).count() == len(rows)


def _morton_py_n(vals: tuple, bits: int = 16) -> int:
    n = len(vals)
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (n * b + i)
    return out


def test_zorder_3col_key_and_twins(spark):
    """n-column generalization: Spark key == pure-Python twin == DuckDB SQL
    twin on a 3-column layout, and the width guard rejects keys that would
    spill past int64's 63 usable bits."""
    import duckdb
    import pytest

    rows = [
        (i, (i * 37) % 1024, (i * 101) % 1024, (i * 7) % 1024)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    got = {
        r.id: r.zk
        for r in df.select(
            "id",
            LY.zorder_key_col(F.col("x"), F.col("y"), F.col("z")).alias("zk"),
        ).collect()
    }
    for i, x, y, z in rows:
        assert got[i] == _morton_py_n((x, y, z)), (i, x, y, z)
    # 2-col rule is the n=2 special case (round-5 keys unchanged)
    assert _morton_py_n((3, 5)) == _morton_py(3, 5)

    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, x BIGINT, y BIGINT, z BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    sql = f"SELECT id, {LY.zorder_key_sql('x', 'y', 'z')} AS zk FROM t"
    for i, zk in con.sql(sql).fetchall():
        assert got[i] == zk, i

    with pytest.raises(ValueError, match="63 usable bits"):
        LY.zorder_key_sql("a", "b", "c", "d")  # 4 x 16 = 64 bits
    with pytest.raises(ValueError, match=">= 2 columns"):
        LY.zorder_key_col(F.col("x"))


def test_zorder_3col_layout_skips_on_every_dimension(spark, tmp_path):
    """8x8x8-cell cube (4096 points) written z-ordered on (x, y, z): a thin
    slab on ANY single axis overlaps only a fraction of the files, where an
    x-sorted layout cannot skip on y or z at all."""
    n = 16
    rows = [
        (x * n * n + y * n + z, x * 64, y * 64, z * 64)
        for x in range(n)
        for y in range(n)
        for z in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long").repartition(8)
    zpath = str(tmp_path / "z3")
    LY.write_zordered(df, zpath, "x", "y", "z", n_files=16)

    def overlap(col, lo, hi):
        stats = LY.parquet_minmax(zpath, col)
        assert len(stats) >= 12
        return sum(1 for mn, mx in stats if not (mx < lo or mn > hi)), len(stats)

    for col in ("x", "y", "z"):
        hit, total = overlap(col, 0, 127)  # thin 2-cell slab on this axis
        assert hit <= total * 3 // 4, (col, hit, total)
    assert spark.read.parquet(zpath).count() == len(rows)


def test_zorder_sql_twin_matches(spark):
    """The generated DuckDB SQL computes the identical key."""
    import duckdb

    rows = [(i, (i * 7) % 512, (i * 13) % 512) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.zk
        for r in df.select(
            "id", LY.zorder_key_col(F.col("x"), F.col("y")).alias("zk")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = f"SELECT id, {LY.zorder_key_sql('x', 'y')} AS zk FROM t"
    for i, zk in con.sql(sql).fetchall():
        assert got[i] == zk, i
