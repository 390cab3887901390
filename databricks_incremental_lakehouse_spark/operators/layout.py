"""Z-order data layout — the OPTIMIZE ZORDER analogue for parquet tables.

The reference declares ``delta.autoOptimize`` table properties
(create_extract_schemas.py:40) and Databricks pairs them with
``OPTIMIZE ... ZORDER BY`` for multi-column data skipping. Plain parquet
has no OPTIMIZE, but the mechanism is reproducible Spark-first: map each
z-order column to a rank on a fixed integer grid, interleave the grid
bits into one z-value, and range-partition + sort the table by it. Files
then cover small hyper-rectangles of the (col1, col2, ...) space, so a
reader's min/max footer pruning (or Delta's file statistics) skips most
files for a predicate on ANY of the z-columns — unlike a plain sort,
which only prunes on its leading column.

``zorder_write`` computes per-column integer ranks with ``percent_rank``
over the column (ties share a cell; computed on O(distinct value) grids
via the same aggregate-first construction the exact quantiles use would
be overkill here — percent_rank runs once per z-column over the rows
being laid out, a one-off maintenance job exactly like OPTIMIZE), then
``repartitionByRange`` on the interleaved z-value so each output file
owns a contiguous z-range.

Verification (test_operators): for every z-column, the average per-file
min/max span fraction under the z-layout must be well under both the
hash layout's (~1.0: every file covers the whole domain) and strictly
better than a single-column sort's span on the OTHER column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Z_BITS = 16  # grid resolution per column (16 bits -> 65536 cells)


def z_value(df: DataFrame, cols: list[str], bits: int = Z_BITS) -> DataFrame:
    """Add ``_z``: the bit-interleaved (Morton) value of the given columns.

    Each column is first mapped to ``[0, 2^bits)`` by percent_rank (rank
    spacing makes the grid distribution-uniform, so skewed columns still
    split files evenly — the same trick Delta's ZORDER uses). Bit i of
    each column's cell lands at position ``i * len(cols) + j``: purely
    integer expressions, whole-stage codegen."""
    out = df
    cells = []
    for c in cols:
        w = Window.orderBy(F.col(c))
        cell = F.least(
            F.lit((1 << bits) - 1),
            F.floor(F.percent_rank().over(w) * (1 << bits)).cast("long"),
        )
        out = out.withColumn(f"_cell_{c}", cell)
        cells.append(f"_cell_{c}")
    n = len(cols)
    parts: list[Column] = []
    for j, cell_col in enumerate(cells):
        for i in range(bits):
            # bit i of this column -> bit (i*n + j) of the z-value
            parts.append(
                F.shiftleft(
                    F.shiftright(F.col(cell_col), i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    z = reduce(lambda a, b: a.bitwiseOR(b), parts)
    return out.withColumn("_z", z).drop(*cells)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` to ``path`` z-ordered on ``cols`` across ``num_files``
    files: range-partition on the interleaved z-value (each file owns a
    contiguous z-range = a small hyper-rectangle of the column space),
    sort within files so parquet row-group stats are tight too."""
    (
        z_value(df, cols, bits)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def table_file_stats(path: str) -> list[tuple[str, int, int]]:
    """(partition_dir, n_files, total_bytes) per leaf directory holding
    parquet files — the footer-level view OPTIMIZE decides from. Pure
    os.walk: at 100 TB the same listing comes from the transaction log /
    object-store inventory, never a data scan."""
    import os

    out = []
    for dirpath, _dirnames, filenames in os.walk(path):
        parts = [
            f for f in filenames
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        if parts:
            total = sum(os.path.getsize(os.path.join(dirpath, f)) for f in parts)
            out.append((os.path.relpath(dirpath, path), len(parts), total))
    return sorted(out)


def optimize_compact(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Small-file compaction — the ``OPTIMIZE`` (bin-packing) analogue for
    parquet tables, complementing :func:`zorder_write` (the ZORDER face).
    The reference declares ``delta.autoOptimize.autoCompact`` on every
    table (create_extract_schemas.py:40); this is the explicit maintenance
    form of the same contract.

    Per leaf partition directory INDEPENDENTLY: if it holds more than
    ``max(min_files, ceil(bytes / target_file_bytes))`` files, rewrite it
    to that many files (coalesce — a narrow, shuffle-free plan) into a
    staging dir and atomically swap (rename-complete-then-unlink, the
    merge machinery's discipline, crash-recoverable by the same
    ``.old``-backup convention). Rows, values, and the partition layout
    are untouched — asserted in tests. Returns
    {partition_dir: (files_before, files_after)} for the dirs rewritten.

    At 100 TB each directory is its own independent job over just that
    directory's files — embarrassingly parallel maintenance, no global
    stage, exactly how Delta's OPTIMIZE schedules bin-packing."""
    import math
    import os
    import shutil

    from ..streaming.incremental import _swap_dir

    done: dict[str, tuple[int, int]] = {}
    for rel, n_files, total in table_file_stats(path):
        target_n = max(min_files, math.ceil(total / target_file_bytes))
        if n_files <= target_n:
            continue
        leaf = os.path.join(path, rel) if rel != "." else path
        staging = leaf.rstrip("/") + "._compact"
        shutil.rmtree(staging, ignore_errors=True)
        spark.read.parquet(leaf).coalesce(target_n).write.mode(
            "overwrite"
        ).parquet(staging)
        _swap_dir(staging, leaf)
        done[rel] = (n_files, target_n)
    return done


STORE_META = "_store_meta.json"

# staging suffixes every lifecycle/merge job uses; vacuum_table removes
# leftovers with these names and the maintenance policy's vacuum-due
# signal counts exactly the same set (llmdata/maintenance.py)
STAGING_SUFFIXES = ("._staging", "._rebucket", "._recluster", "._compact")


def write_store_meta(path: str, **meta) -> None:
    """Persist a maintained store's layout parameters as a sidecar inside
    the store directory (leading ``_`` => invisible to Spark's partition
    discovery and file listing). The probe/reader side derives pruning
    from THIS file, never from a compile-time constant, so a lifecycle job
    can re-bucket the store without a code deploy."""
    import json
    import os

    existing = read_store_meta(path)
    existing.update(meta)
    tmp = os.path.join(path, f".{STORE_META}.tmp")
    with open(tmp, "w") as fh:
        json.dump(existing, fh, sort_keys=True)
    os.replace(tmp, os.path.join(path, STORE_META))


def read_store_meta(path: str) -> dict:
    """Read a store's sidecar meta — first finishing a lifecycle swap
    that crashed between its two renames (ADVICE r11: rebucket/recluster
    swap via ``_swap_dir`` has a window where the store path is missing
    and only the ``.<name>.old`` backup survives; every store probe
    funnels through here, so the maintained stores self-heal like the
    streaming merge targets). Recovery runs ONLY when the store path is
    MISSING — that is the crash signature — so the hot probe path never
    pays a store-tree walk and never deletes the stale-backup debris the
    maintenance report counts. A LIVE swap's mid-window looks identical
    to a crash on disk, so recovery serializes with publishes via the
    swap machinery's ``_SWAP_LOCK`` (r12 review): the reader blocks until
    the in-flight swap lands, then recovery is a no-op."""
    import json
    import os

    if not os.path.isdir(path):
        from ..streaming.incremental import _recover_swaps

        _recover_swaps(path)
    p = os.path.join(path, STORE_META)
    if not os.path.isfile(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def rebucket_store(
    spark,
    path: str,
    key_col: str,
    num_buckets: int,
    bucket_col: str = "bucket",
) -> dict:
    """Re-bucket a hash-partitioned maintained store to ``num_buckets``
    partitions — the lifecycle job the append stores need once buckets
    widen past their design size (VERDICT r10 #1: append-forever kept the
    probe O(batch) in the number of buckets READ, but each bucket grows
    with the index, so a 10x index taxed every probe ~+28%; re-bucketing
    to ~10x buckets restores the designed per-bucket size). One linear
    pass over the store (read -> recompute ``bucket_col`` from
    ``key_col`` -> rewrite partitioned), staged and atomically swapped
    with the merge machinery's rename discipline, then the sidecar meta
    is updated so every later probe prunes with the NEW bucket count.
    Probe results are layout-invariant by construction (the join key is
    the value column, the bucket only routes reads) — test-locked.

    At 100 TB this is OPTIMIZE-shaped maintenance: embarrassingly
    parallel over output buckets, scheduled off the serving path, with
    readers seeing either the old or the new complete image."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..streaming.incremental import _swap_dir

    old_meta = read_store_meta(path)
    staging = path.rstrip("/") + "._rebucket"
    shutil.rmtree(staging, ignore_errors=True)
    df = spark.read.parquet(path)
    cols = [c for c in df.columns if c != bucket_col]
    (
        df.select(*cols)
        .withColumn(
            bucket_col, F.pmod(F.xxhash64(key_col), F.lit(num_buckets))
        )
        # cluster rows by target bucket BEFORE the partitioned write: each
        # bucket dir then gets exactly one file (a task writes one file per
        # bucket it holds), so the rebucketed store is born compacted —
        # without this, every shuffle partition sprays a small file into
        # every bucket dir (num_buckets x parallelism files, measured as a
        # probe SLOWDOWN from open/footer overhead)
        .repartition(F.col(bucket_col))
        .write.partitionBy(bucket_col)
        .parquet(staging)
    )
    new_meta = dict(old_meta)
    new_meta["num_buckets"] = num_buckets
    write_store_meta(staging, **new_meta)
    _swap_dir(staging, path)
    return {"path": path, "num_buckets": num_buckets, "was": old_meta}


def compact_store(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> dict[str, tuple[int, int]]:
    """Bin-pack a maintained append store's partition directories — each
    ``mode("append")`` ingest adds a file wave per touched bucket/cell, so
    a long-lived store accumulates small files that tax every probe's
    open/footer cost. Thin wrapper over :func:`optimize_compact` (same
    per-leaf independent rewrite + atomic swap) with ``min_files=1``: an
    append store's buckets are small by design, so singleton files are the
    right steady state. The sidecar meta file is untouched (compaction
    never changes the bucket routing). No writer may be active."""
    return optimize_compact(
        spark, path, target_file_bytes=target_file_bytes, min_files=min_files
    )


def write_bucketed(
    df,
    table_name: str,
    keys: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a hash-bucketed (optionally per-bucket-sorted)
    managed parquet table — Spark's declarative co-location contract and
    the third table-layout face next to :func:`zorder_write` (range
    clustering) and :func:`optimize_compact` (bin-packing).

    Two tables bucketed by the same keys into the same bucket count join
    and aggregate WITHOUT an Exchange: the scan itself reports the hash
    partitioning, so the sort-merge join's shuffle disappears from the
    plan (plan-locked in tests/test_plans.py). That is the standing
    pre-shuffle every big-fact-to-big-fact join wants at 100 TB — pay the
    partitioning once at write time, reuse it on every read — and the
    parquet-native analogue of Delta clustered tables / Hive bucketed
    joins. ``sort_cols`` additionally orders rows inside each bucket so
    the merge phase needs no sort either."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *keys)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def vacuum_table(path: str, changelog_dir: str | None = None) -> dict[str, list[str]]:
    """VACUUM — the garbage-collection face completing the maintenance
    triple (:func:`optimize_compact` = OPTIMIZE, :func:`zorder_write` =
    ZORDER). The merge machinery's crash-safety leaves two classes of
    invisible debris a long-lived table accumulates:

    - ``<table>._staging`` siblings / ``.commit=N._staging`` changelog
      dirs: a writer that crashed mid-materialization (readers never see
      them; the owning slot's next writer would clear its own, but a
      RETIRED pipeline's staging lives forever);
    - ``.<name>.old`` swap backups: first routed through the standard
      recovery (:func:`.._recover_swaps`), which RESTORES a backup whose
      destination is missing (it is the only surviving copy) and drops
      the stale ones — vacuum never deletes what recovery would keep.

    Contract (Delta VACUUM's): no writer may be active on the table or
    feed while vacuuming. Returns {"removed": [...], "recovered_root": p}
    paths for the audit log. Idempotent; never touches live data files.

    Removal set == exactly what the maintenance policy's vacuum-due
    signal counts (llmdata/maintenance.py ``_debris_dirs`` — r12 review:
    the due flag must be clearable by running THIS job): all lifecycle
    staging suffixes (merge ``._staging``, ``rebucket_store``'s
    ``._rebucket``, ``recluster_ivf_store``'s ``._recluster``,
    ``optimize_compact``'s ``._compact``), sibling or nested, plus the
    parent-level stale ``.<name>.old`` a crash between ``_swap_dir``'s
    final rename and its backup cleanup leaves behind (recovery only
    drops the nested ones)."""
    import os
    import shutil

    from ..streaming.incremental import _recover_changelog, _recover_swaps

    staging_suffixes = STAGING_SUFFIXES
    removed: list[str] = []
    if os.path.isdir(path):
        _recover_swaps(path)
    parent, base = os.path.split(path.rstrip("/"))
    for suffix in staging_suffixes:
        sib = path.rstrip("/") + suffix
        if os.path.isdir(sib):
            shutil.rmtree(sib)
            removed.append(sib)
    whole_old = os.path.join(parent, f".{base}.old")
    if os.path.isdir(whole_old) and os.path.isdir(path):
        # swap completed (destination exists) => the backup is stale;
        # recovery would have RESTORED it had the destination been missing
        shutil.rmtree(whole_old)
        removed.append(whole_old)
    if os.path.isdir(path):
        for dirpath, dirs, _files in os.walk(path):
            for name in list(dirs):
                # no dot-prefix requirement: optimize_compact's nested
                # staging is `<leaf>._compact`, undotted
                if name.endswith(staging_suffixes):
                    full = os.path.join(dirpath, name)
                    shutil.rmtree(full)
                    removed.append(full)
                    dirs.remove(name)
    if changelog_dir is not None and os.path.isdir(changelog_dir):
        _recover_changelog(changelog_dir)
        for name in os.listdir(changelog_dir):
            if name.startswith(".") and name.endswith("._staging"):
                full = os.path.join(changelog_dir, name)
                shutil.rmtree(full)
                removed.append(full)
    return {"removed": sorted(removed), "recovered_root": path}
