"""Shared operator primitives: skew tools are semantics-preserving, and
keep-latest dedup honors its contract on adversarial input (hypothesis)."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databricks_incremental_lakehouse_spark.operators import (
    dedup_latest,
    round_dbl,
    salted_count_distinct,
    salted_join,
)
from databricks_incremental_lakehouse_spark.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_smoke):
    """Salted fact-dim join == plain join on a real skewed-ish key
    (orders.o_custkey), for inner and left."""
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    for how in ("inner", "left"):
        plain = orders.join(cust, ["o_custkey"], how)
        salted = salted_join(orders, cust, ["o_custkey"], n_salts=4, how=how)
        assert sorted(salted.columns) == sorted(plain.columns)
        assert salted.count() == plain.count()
        assert (
            salted.exceptAll(plain).count() == 0
            and plain.exceptAll(salted).count() == 0
        )


def test_salted_count_distinct_matches_exact(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    exact = {
        r.l_orderkey: r.d
        for r in li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_partkey").alias("d"))
        .collect()
    }
    salted = {
        r.l_orderkey: r.distinct_l_partkey
        for r in salted_count_distinct(
            li, ["l_orderkey"], "l_partkey", n_salts=4
        ).collect()
    }
    assert salted == exact


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=0, max_value=3),  # version
            st.text(alphabet="abc", max_size=3),  # payload
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_latest_property(spark, rows):
    """Exactly one survivor per key; the survivor is the minimal row under
    the ASC (version, payload) tiebreak ordering."""
    df = spark.createDataFrame(rows, "k int, v int, p string")
    out = dedup_latest(df, keys=["k"], tiebreak_cols=["v", "p"]).collect()
    by_key = {}
    for k, v, p in rows:
        by_key.setdefault(k, []).append((v, p))
    assert len(out) == len(by_key)
    for r in out:
        assert (r.v, r.p) == min(by_key[r.k])


def test_cent_grid_faithfully_represents_decimal_money(spark):
    """The double+cent-round compute contract vs the reference's DECIMAL
    storage types: DECIMAL(15,2) -> double -> portable cent-grid round
    -> DECIMAL(15,2) is lossless across the full money range (13 integer
    digits; cents stay below 2^53 so the double grid is exact). This is
    the property that lets bronze carry the reference's DECIMAL(15,2)
    columns while silver/gold arithmetic stays on the portable double
    grid with identical results."""
    import random
    from decimal import Decimal

    rng = random.Random(42)
    vals = [Decimal(rng.randrange(-10**15, 10**15)) / 100 for _ in range(5000)]
    vals += [Decimal("0.005"), Decimal("-0.005"), Decimal("0.01"),
             Decimal("9999999999999.99"), Decimal("-9999999999999.99")]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string").select(
        F.col("s").cast("decimal(15,2)").alias("d")
    )
    bad = (
        df.select(
            "d",
            round_dbl(F.col("d").cast("double"), 2)
            .cast("decimal(15,2)")
            .alias("r"),
        )
        .filter(F.col("r") != F.col("d"))
        .count()
    )
    assert bad == 0


def test_salted_join_left_outer_matches_naive(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, payload string"
    )
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, dim string")
    got = sorted(
        (r.k, r.payload, r.dim)
        for r in salted_join(big, small, ["k"], how="left").collect()
    )
    want = sorted(
        (r.k, r.payload, r.dim) for r in big.join(small, ["k"], "left").collect()
    )
    assert got == want


def test_salted_join_rejects_small_side_preserving_types(spark):
    """right/full outer would duplicate unmatched small rows per salt
    replica — the API must refuse instead of corrupting."""
    big = spark.createDataFrame([(1, "a")], "k int, payload string")
    small = spark.createDataFrame([(1, "x"), (9, "z")], "k int, dim string")
    import pytest as _pytest

    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with _pytest.raises(ValueError, match="salt replica"):
            salted_join(big, small, ["k"], how=how)


def test_zorder_layout_tightens_file_stats(spark, sf_correct, tmp_path):
    """Z-ordered files must cover small hyper-rectangles of the column
    space: per-file min/max span fractions on BOTH z-columns well under
    the hash layout's (~1.0), and — unlike a single-column sort — under
    1.0 on the non-leading column too. Measured from real parquet footers
    (exactly the statistics Delta's file skipping uses).

    De-flake (VERDICT r6 #2): the session is shared suite-wide, so the
    confs that steer file geometry (AQE advisory sizes, scan split size)
    may carry state from earlier tests — pin them for the duration, and
    assert the z/sort spans RELATIVE to the measured hash baseline
    instead of against absolute constants."""
    import glob

    import pyarrow.parquet as pq

    from databricks_incremental_lakehouse_spark.operators import zorder_write
    from databricks_incremental_lakehouse_spark.tables import load_table

    pinned = {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "134217728",
    }
    saved = {k: spark.conf.get(k, None) for k in pinned}
    for k, v in pinned.items():
        spark.conf.set(k, v)

    orders = load_table(spark, sf_correct, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo_c, hi_c, lo_t, hi_t = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()

    def spans(path):
        out = {"o_custkey": [], "o_totalprice": []}
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            md = pq.read_metadata(f)
            mins = {c: None for c in out}
            maxs = {c: None for c in out}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in out and col.statistics is not None:
                        st = col.statistics
                        mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                        maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
            dom = {
                "o_custkey": (lo_c, hi_c),
                "o_totalprice": (float(lo_t), float(hi_t)),
            }
            for c in out:
                lo, hi = dom[c]
                out[c].append((float(maxs[c]) - float(mins[c])) / (float(hi) - float(lo)))
        return {c: sum(v) / len(v) for c, v in out.items()}

    try:
        zpath = str(tmp_path / "z")
        zorder_write(orders, zpath, ["o_custkey", "o_totalprice"], num_files=8)
        hpath = str(tmp_path / "h")
        orders.repartition(8).write.parquet(hpath)
        spath = str(tmp_path / "s")
        orders.repartitionByRange(8, "o_custkey").sortWithinPartitions(
            "o_custkey"
        ).write.parquet(spath)
        z, h, s = spans(zpath), spans(hpath), spans(spath)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    for c in ("o_custkey", "o_totalprice"):
        assert h[c] > 0.8, (c, h)  # hash layout: every file ~spans the domain
        # z-order: sub-rectangles on BOTH columns, measured vs the hash
        # baseline (8 files on a 2-col 16-bit Morton grid split the top 3
        # z-bits -> expected spans ~0.5/0.25; 0.75*h leaves range-sampling
        # boundary noise room without ever accepting an untightened layout)
        assert z[c] < 0.75 * h[c], (c, z, h)
    # single-column sort: leading column tight (~1/8 of the domain)...
    assert s["o_custkey"] < 0.5 * h["o_custkey"], (s, h)
    # ...but the non-leading column stays unpruned (near the hash span)
    assert s["o_totalprice"] > 0.8, s
    # and z-order beats the single-column sort on that other column by a
    # wide margin — the whole point of multi-column layout
    assert z["o_totalprice"] < s["o_totalprice"] - 0.25, (z, s)


def _sfskew_dir():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench",
        "sfskew",
    )


def test_funnel_aggjoin_equals_window_form(spark, sf_correct):
    """The skew-safe agg+join-back funnel must produce EXACTLY the window
    form's rows (same oracle contract), salted or not."""
    from databricks_incremental_lakehouse_spark.streaming.temporal import (
        events_funnel,
        events_funnel_aggjoin,
    )

    base = events_funnel(spark, sf_correct)
    for salted in (False, True):
        alt = events_funnel_aggjoin(spark, sf_correct, salted=salted)
        assert alt.columns == base.columns
        assert alt.exceptAll(base).count() == 0
        assert base.exceptAll(alt).count() == 0


def test_funnel_adaptive_dispatch_and_skew_plan(spark, sf_correct):
    """The histogram dispatch: near-uniform corpora stay on the window
    plan; the skewed 10x corpus (one user = 40% of events) must (a) trip
    the threshold, (b) plan the salted agg form — no whole-partition
    Window over user_id, salted exchange present — and (c) agree with the
    window form row-for-row on the skewed corpus too."""
    import pytest

    from databricks_incremental_lakehouse_spark.operators.skew import (
        SKEW_SHARE_THRESHOLD,
        top_key_share,
    )
    from databricks_incremental_lakehouse_spark.streaming.temporal import (
        events_funnel,
        events_funnel_adaptive,
    )

    ev = load_table(spark, sf_correct, "events")
    assert top_key_share(ev, "user_id") < SKEW_SHARE_THRESHOLD
    plan_uniform = events_funnel_adaptive(spark, sf_correct)._jdf.queryExecution().toString()
    assert "Window" in plan_uniform  # uniform corpus keeps the window plan

    skew_dir = _sfskew_dir()
    if not os.path.isdir(skew_dir):
        pytest.skip("skewed corpus not generated (scripts/make_sfskew.py)")
    ev_skew = load_table(spark, skew_dir, "events")
    assert top_key_share(ev_skew, "user_id") >= SKEW_SHARE_THRESHOLD
    adaptive = events_funnel_adaptive(spark, skew_dir)
    plan_skew = adaptive._jdf.queryExecution().toString()
    assert "Window" not in plan_skew  # no whole-partition window stage
    assert "_salt" in plan_skew  # join-backs are salted
    base = events_funnel(spark, skew_dir)
    assert adaptive.exceptAll(base).count() == 0
    assert base.exceptAll(adaptive).count() == 0


def test_optimize_compact_binpacks_and_preserves_rows(spark, tmp_path):
    """Compaction must reduce a fragmented table to the bin-packed file
    count, preserve every row/value and the partition layout, and be a
    no-op when re-run (idempotent maintenance)."""
    from databricks_incremental_lakehouse_spark.operators.layout import (
        optimize_compact,
        table_file_stats,
    )

    path = str(tmp_path / "t")
    df = spark.range(10_000).selectExpr(
        "id", "id % 3 AS p", "CAST(id * 7 AS DOUBLE) AS v"
    )
    # fragment: 16 shuffle files inside each of 3 partition dirs
    df.repartition(16).write.partitionBy("p").parquet(path)
    before = {rel: n for rel, n, _b in table_file_stats(path)}
    assert all(n > 4 for n in before.values())
    expect = sorted(df.collect())

    done = optimize_compact(spark, path, target_file_bytes=1 << 30, min_files=2)
    after = {rel: n for rel, n, _b in table_file_stats(path)}
    assert set(done) == set(before)  # every partition dir was rewritten
    assert all(n == 2 for n in after.values())  # bin-packed to min_files
    assert set(after) == set(before)  # partition layout untouched
    got = sorted(
        spark.read.parquet(path).select("id", "p", "v").collect(),
        key=lambda r: r.id,
    )
    assert [tuple(r) for r in got] == [
        (r.id, r.p, r.v) for r in sorted(expect, key=lambda r: r.id)
    ]
    assert optimize_compact(spark, path, target_file_bytes=1 << 30) == {}


def test_vacuum_removes_debris_never_live_data(spark, tmp_path):
    """vacuum_table removes crashed-writer staging (sibling and nested)
    and stale swap backups, RESTORES an orphan backup whose destination
    is missing instead of deleting it, leaves table rows byte-identical,
    and is idempotent."""
    import os
    import shutil

    from databricks_incremental_lakehouse_spark.operators import vacuum_table
    from databricks_incremental_lakehouse_spark.streaming import (
        merge_upsert,
        read_merge_target,
    )

    t = str(tmp_path / "tbl")
    cl = str(tmp_path / "feed")
    merge_upsert(
        spark,
        spark.createDataFrame([(i, i * 10) for i in range(30)], "k long, v long"),
        t,
        keys=["k"],
        changelog_dir=cl,
    )
    before = sorted(map(tuple, read_merge_target(spark, t).collect()))

    os.makedirs(t + "._staging/junk")  # crashed whole-table merge
    buckets = [d for d in os.listdir(t) if d.startswith("_kb=")]
    os.makedirs(os.path.join(t, f".{buckets[0]}._staging"))  # crashed bucket
    stale = os.path.join(t, f".{buckets[1]}.old")
    shutil.copytree(os.path.join(t, buckets[1]), stale)  # completed-swap backup
    os.makedirs(os.path.join(cl, ".commit=9._staging"))  # crashed feed write
    # orphan backup: destination missing -> must be RESTORED, not deleted
    orphan_src = os.path.join(t, buckets[2])
    orphan = os.path.join(t, f".{buckets[2]}.old")
    os.rename(orphan_src, orphan)

    res = vacuum_table(t, changelog_dir=cl)
    assert len(res["removed"]) == 3
    assert not os.path.exists(t + "._staging")
    assert not os.path.exists(stale)
    assert not os.path.exists(orphan) and os.path.isdir(orphan_src)  # restored
    assert not os.path.exists(os.path.join(cl, ".commit=9._staging"))
    assert sorted(map(tuple, read_merge_target(spark, t).collect())) == before
    assert vacuum_table(t, changelog_dir=cl)["removed"] == []
