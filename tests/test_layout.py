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
