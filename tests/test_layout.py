"""Z-order layout: key correctness + the actual file-skipping win.

The point of Morton clustering is measurable from parquet footers: a
2-D box predicate admits far fewer files under a Z-ordered layout
than under a single-column sort, because each Z-range file covers a
small rectangle in BOTH dimensions.
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_misc_tools_spark.operators.layout import zorder_key, zorder_write
from data_misc_tools_spark.session import read_parquet_table


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (255, 255), (170, 85), (1, 128)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave_py(x, y, 8)


def test_zorder_key_validations(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match=">= 2"):
        zorder_key([df.x], bits=8)
    with pytest.raises(ValueError, match="overflows"):
        zorder_key([df.x, df.y], bits=32)


def _file_stats(path: str) -> list[dict[str, tuple]]:
    """Per-file {col: (min, max)} from parquet footers."""
    ds = pq.ParquetDataset(path)
    out = []
    for frag in ds.fragments:
        md = frag.metadata
        stats: dict[str, tuple] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for j in range(g.num_columns):
                c = g.column(j)
                s = c.statistics
                if s is None:
                    continue
                name = c.path_in_schema
                lo, hi = s.min, s.max
                if name in stats:
                    lo = min(lo, stats[name][0])
                    hi = max(hi, stats[name][1])
                stats[name] = (lo, hi)
        out.append(stats)
    return out


def _admitted(stats: list[dict], box: dict[str, tuple[float, float]]) -> int:
    n = 0
    for st in stats:
        if all(
            col in st and not (hi < st[col][0] or lo > st[col][1])
            for col, (lo, hi) in box.items()
        ):
            n += 1
    return n


def test_zorder_layout_skips_files_on_any_dimension(spark, sf_dir, tmp_path):
    """The multi-dim skipping property, measured from parquet footers:
    under a user_id-only sort, a value-selective filter admits ~every
    file (each file spans the full value range); under Z-order BOTH a
    value-selective filter and a user-selective filter skip most
    files. Rank bucketing keeps the value dimension informative
    despite its heavy tail (min-max bucketing would collapse it)."""
    ev = read_parquet_table(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "events_z")
    spath = str(tmp_path / "events_sorted")
    n_files = 16
    zorder_write(ev, zpath, ["user_id", "value"], bits=8, n_files=n_files)
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    zstats = [s for s in _file_stats(zpath) if s]
    sstats = [s for s in _file_stats(spath) if s]
    assert len(zstats) >= n_files // 2  # layout actually split

    # value-selective: top 5% of values (selective in rows AND range)
    p95, vmax = ev.approxQuantile("value", [0.95, 1.0], 0.0)
    val_box = {"value": (p95, vmax)}
    z_val = _admitted(zstats, val_box)
    s_val = _admitted(sstats, val_box)
    assert s_val >= len(sstats) - 1, (s_val, len(sstats))  # sort can't prune value
    assert z_val <= len(zstats) // 2, (z_val, len(zstats))  # z-order can

    # user-selective: bottom quarter of users — z-order still prunes
    lo_u, hi_u = ev.agg(F.min("user_id"), F.max("user_id")).first()
    usr_box = {"user_id": (lo_u, lo_u + (hi_u - lo_u) / 4)}
    z_usr = _admitted(zstats, usr_box)
    assert z_usr <= 3 * len(zstats) // 4, (z_usr, len(zstats))

    # the sort-free 'quantile' bucketing (the 100 TB writer) must
    # deliver the same skew-robust pruning as exact ntile ranks
    qpath = str(tmp_path / "events_zq")
    zorder_write(
        ev, qpath, ["user_id", "value"], bits=8, n_files=n_files,
        bucketize="quantile",
    )
    qstats = [s for s in _file_stats(qpath) if s]
    assert _admitted(qstats, val_box) <= len(qstats) // 2
    assert _admitted(qstats, usr_box) <= 3 * len(qstats) // 4


def test_compact_parquet_reduces_files_preserves_content(spark, tmp_path):
    from data_misc_tools_spark.operators.etl import dataset_fingerprint
    from data_misc_tools_spark.operators.layout import compact_parquet

    src = f"file://{tmp_path}/frag"
    dst = f"file://{tmp_path}/compact"
    df = spark.range(10_000).selectExpr("id", "id % 97 AS k", "cast(id AS string) AS s")
    df.repartition(64).write.parquet(src)  # 64 tiny files
    stats = compact_parquet(spark, src, dst, target_file_mb=128)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1  # well under one 128MB target
    assert stats["rows"] == 10_000
    # order-invariant content equality
    fp_a = dataset_fingerprint(spark.read.parquet(src), ["id", "k", "s"]).collect()
    fp_b = dataset_fingerprint(spark.read.parquet(dst), ["id", "k", "s"]).collect()
    assert [tuple(r) for r in fp_a] == [tuple(r) for r in fp_b]


def test_compact_parquet_sorted_layout_skips(spark, tmp_path):
    import pyarrow.parquet as pq

    from data_misc_tools_spark.operators.layout import compact_parquet

    src = f"file://{tmp_path}/frag2"
    dst = f"file://{tmp_path}/sorted"
    spark.range(40_000).selectExpr("id", "id % 1000 AS k").repartition(
        16
    ).write.parquet(src)
    # force >1 output file by a tiny target? 40k rows is small; instead
    # verify the sort-cols path produces non-overlapping k ranges per file
    compact_parquet(spark, src, dst, target_file_mb=1, sort_cols=["k"])
    files = sorted(
        str(p) for p in (tmp_path / "sorted").glob("*.parquet")
    )
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # range-partitioned: files do not overlap on k


def test_clusteredness_report_discriminates_layouts(spark, tmp_path):
    from data_misc_tools_spark.operators.layout import (
        clusteredness_report,
        compact_parquet,
    )

    frag = f"file://{tmp_path}/rr"
    # md5 payload: incompressible bytes so the 1MB target yields
    # multiple output files after compaction
    df = spark.range(200_000).selectExpr(
        "id", "id % 1000 AS k", "md5(cast(id AS string)) AS pad"
    )
    # round-robin: every file spans the whole k domain
    df.repartition(8).write.parquet(frag)
    rr = clusteredness_report(spark, frag, "k")
    assert rr["files"] == 8
    assert rr["avg_overlap"] > 0.9
    assert rr["admit_fraction_mid"] == 1.0
    # range-partitioned rewrite: disjoint files, midpoint admits few
    compact_parquet(spark, frag, f"file://{tmp_path}/sorted",
                    target_file_mb=1, sort_cols=["k"])
    cl = clusteredness_report(spark, f"file://{tmp_path}/sorted", "k")
    assert cl["files"] > 1
    assert cl["avg_overlap"] < 0.2
    assert cl["admit_fraction_mid"] <= 2 / cl["files"] + 1e-9


def test_parquet_bloom_filters_written_and_queries_exact(spark, tmp_path):
    """Point-lookup data skipping: writing with parquet bloom filters
    on the key column must actually persist the filters (footer-level
    proof via pyarrow: bloom_filter_offset set per row group) and the
    bloomed files must answer point queries identically to the plain
    ones. Bloom filters are the parquet-native complement to Z-order
    min/max skipping: min/max prunes RANGES, blooms prune point IN
    probes on high-cardinality unsorted keys."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(20_000).selectExpr(
        "id", "cast(id % 97 AS string) AS grp", "id * 2 AS val"
    )
    plain = str(tmp_path / "plain")
    bloomed = str(tmp_path / "bloomed")
    df.coalesce(2).write.parquet(plain)
    (
        df.coalesce(2)
        .write.option("parquet.bloom.filter.enabled#id", "true")
        .option("parquet.bloom.filter.expected.ndv#id", "20000")
        .parquet(bloomed)
    )
    # persistence proof: the bloom bitsets are physically in the
    # bloomed files (this pyarrow predates the bloom_filter_offset
    # metadata accessor, so measure the stored bytes: identical data +
    # encoding, so the size delta IS the filters — ~20k-ndv bitsets
    # are tens of KB), and the row data itself is identical
    def _bytes(path_glob):
        return sum(
            __import__("os").path.getsize(f)
            for f in glob.glob(path_glob + "/*.parquet")
        )

    assert _bytes(bloomed) > _bytes(plain) + 4096
    assert (
        pq.ParquetDataset(bloomed).read().num_rows
        == pq.ParquetDataset(plain).read().num_rows
    )
    # behavior proof: point-IN probes agree exactly with the plain copy
    probe = [3, 4444, 19_999, 777]
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(bloomed).where(F.col("id").isin(probe)).collect()
    )
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(plain).where(F.col("id").isin(probe)).collect()
    )
    assert a == b and len(a) == len(probe)


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_python_reference_and_is_bijective(spark):
    from data_misc_tools_spark.operators.layout import hilbert_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.d
        for r in df.select(
            "x", "y", hilbert_key([F.col("x"), F.col("y")], bits=4).alias("d")
        ).collect()
    }
    assert got == {(x, y): _xy2d(16, x, y) for x, y in rows}
    assert sorted(got.values()) == list(range(256))  # a space-filling walk


def test_hilbert_clustering_beats_zorder(spark):
    """The reason to prefer Hilbert — the Moon et al. clustering
    metric: a query RECTANGLE decomposes into fewer contiguous index
    runs than under Morton order (each run is one contiguous scan /
    one admitted file range), because the Hilbert walk never
    teleports across the grid. NOTE mean adjacent-pair |Δindex| is
    NOT the right metric (Morton actually wins that one — measured);
    runs-per-rectangle is what footer pruning sees."""
    from data_misc_tools_spark.operators.layout import hilbert_key, zorder_key

    n = 32
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    keys = {
        (r.x, r.y): (r.h, r.z)
        for r in df.select(
            "x", "y",
            hilbert_key([F.col("x"), F.col("y")], bits=5).alias("h"),
            zorder_key([F.col("x"), F.col("y")], bits=5).alias("z"),
        ).collect()
    }

    def runs(which, x0, y0, w, h):
        idx = sorted(
            keys[(x, y)][which]
            for x in range(x0, x0 + w)
            for y in range(y0, y0 + h)
        )
        return 1 + sum(1 for a, b in zip(idx, idx[1:]) if b != a + 1)

    th = tz = 0
    for w, h in [(4, 4), (8, 8), (4, 8)]:
        for x0 in range(0, n - w, 3):
            for y0 in range(0, n - h, 3):
                th += runs(0, x0, y0, w, h)
                tz += runs(1, x0, y0, w, h)
    assert th < tz * 0.7  # decisively fewer runs (measured ~5.6 vs ~9.8)


def test_hilbert_key_validations(spark):
    from data_misc_tools_spark.operators.layout import hilbert_key, hilbert_write

    df = spark.createDataFrame([(1, 2, 3)], "x long, y long, z long")
    with pytest.raises(ValueError):
        hilbert_key([df.x], bits=8)
    with pytest.raises(ValueError):
        hilbert_key([df.x, df.y, df.z], bits=8)
    with pytest.raises(ValueError):
        hilbert_key([df.x, df.y], bits=32)
    with pytest.raises(ValueError):
        hilbert_write(df, "/tmp/nope", ["x", "y", "z"])


def test_hilbert_layout_skips_files_on_both_dimensions(spark, sf_dir, tmp_path):
    """Same footer-proven skipping as the zorder test, on the Hilbert
    layout: a filter on EITHER clustered column admits well under all
    files."""
    from data_misc_tools_spark.operators.layout import hilbert_write
    from data_misc_tools_spark.session import read_parquet_table

    ev = read_parquet_table(spark, f"{sf_dir}/events.parquet").select(
        "user_id", "value", "event_id"
    )
    n_files = 16
    path = str(tmp_path / "hilbert_ev")
    hilbert_write(ev, path, ["user_id", "value"], bits=8, n_files=n_files)

    import pyarrow.parquet as pq
    import glob as g

    def admitted(col_idx_name, lo, hi):
        admit = 0
        files = [f for f in g.glob(path + "/*.parquet")]
        for f in files:
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col_idx_name)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) <= hi and lo <= max(maxs):
                admit += 1
        return admit, len(files)

    users = sorted(r.user_id for r in ev.select("user_id").distinct().collect())
    mid_u = users[len(users) // 2]
    a_u, n_u = admitted("user_id", mid_u, mid_u)
    vals = sorted(r.value for r in ev.select("value").collect())
    mid_v = vals[len(vals) // 2]
    a_v, n_v = admitted("value", mid_v, mid_v)
    assert n_u == n_files and n_v == n_files
    # a point filter on either dimension must prune over half the files
    assert a_u <= n_files // 2
    assert a_v <= n_files // 2
