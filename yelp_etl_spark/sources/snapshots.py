"""Snapshot/manifest table layer: the Iceberg read/write semantics the
reference depends on (write.py:24-53 createOrReplace; spark-defaults.conf
catalog) re-derived natively over parquet — atomic commit, snapshot
isolation, time travel, snapshot expiry + safe vacuum, and file-level
min/max skipping — with zero jar dependencies (the sandbox has no
Iceberg runtime; this is the same guarantee surface, minimally).

Layout:

    table_dir/
      data/<uuid>-partNNNNN.parquet     immutable data files
      manifests/manifest-0000000001.json  one per snapshot
      _current                          pointer file (atomic os.replace)

Commit protocol (single-writer; see note below):
1. Data files are FULLY written (to a scratch dir, then renamed into
   ``data/`` under fresh unique names) before any manifest references
   them — a crash mid-write leaves only unreferenced files, invisible
   to every reader.
2. The manifest (file list + per-file row counts and column min/max
   pulled from parquet footers) is written as a new numbered file.
3. ``_current`` is swapped with ``os.replace`` — POSIX-atomic, so a
   reader resolves either the old snapshot or the new one, never a mix.

Readers resolve a snapshot (``_current`` or a pinned id) to its exact
file list, so concurrent replaces never tear a read; replaced files
stay on disk until ``expire_snapshots`` + ``vacuum``, which is what
makes time travel work and is exactly Iceberg's expire/remove-orphans
model. At 100 TB the same design holds with the manifest in object
storage; the single piece that needs a real catalog is compare-and-swap
on the pointer for MULTI-writer safety (Iceberg delegates that to the
catalog too — Hadoop catalogs use an atomic rename exactly like this).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_POINTER = "_current"
_BOOTSTRAP = "_bootstrap"  # present only until the first pointer swap
_SKIP_STATS_TYPES = ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY")  # strings: keep simple


import re as _re
import time as _time

_MANIFEST_RE = _re.compile(r"^manifest-\d{10}\.json$")

# A named manifest with no pointer swap that is older than this is
# treated as a crashed commit and reclaimed by the next writer; a
# younger one is assumed to be a live racer's (Iceberg's
# remove_orphan_files uses the same age-cutoff idea).
_ORPHAN_GRACE_SECONDS = 60.0


def _manifest_sid(name: str) -> int:
    """Snapshot id encoded in a manifest filename."""
    return int(name.replace("manifest-", "").replace(".json", ""))


def _manifest_path(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(table_dir, "manifests", f"manifest-{snapshot_id:010d}.json")


def _manifest_names(mdir: str) -> list[str]:
    """Only fully-committed manifests: a crash between writing the .tmp
    and the os.replace may leave a stray partial file, which must never
    wedge snapshots()/expire/vacuum (the commit protocol's promise is
    that incomplete commits are invisible)."""
    return [f for f in os.listdir(mdir) if _MANIFEST_RE.match(f)]


def _committed_manifest_names(table_dir: str) -> list[str]:
    """Manifests at or below the pointer, sorted ascending. A crash
    between the manifest os.replace and the pointer swap leaves a fully
    NAMED manifest that was never committed — the pointer is the commit
    instant, so every metadata operation must treat manifests newer
    than it as invisible (not a snapshot, not retained, its files not
    live). The stray manifest blocks the next commit's exclusive
    create (ConcurrentCommitError) until remove_orphaned_manifests()
    reclaims it."""
    mdir = os.path.join(table_dir, "manifests")
    ptr = _read_pointer(table_dir)
    names = []
    for f in _manifest_names(mdir):
        sid = _manifest_sid(f)
        if ptr is not None and sid <= ptr:
            names.append(f)
    return sorted(names)


def _read_pointer(table_dir: str) -> int | None:
    try:
        with open(os.path.join(table_dir, _POINTER)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def _load_manifest(table_dir: str, snapshot_id: int) -> dict:
    with open(_manifest_path(table_dir, snapshot_id)) as fh:
        return json.load(fh)


def _file_bloom(path: str, bloom_columns: list[str]) -> dict:
    """Per-file Bloom sidecar for point-lookup file skipping: for each
    declared column, the DISTINCT values in this file fold into a
    sparse {word: bits} map using the repo's portable md5 bit
    positions (functions/integrity.py py_bit_positions — the same
    convention the Spark expressions replay). ~`_BLOOM_SIDE_BITS/8`
    bytes per (file, column) at worst; self-describing (b/k recorded
    per entry) so mixed-spec manifests stay consistent. Restricted to
    integer/string columns — their to-string rendering is identical
    between pyarrow values here and Spark's cast on the probe side;
    floats are refused upstream."""
    import pyarrow.parquet as pq

    from yelp_etl_spark.functions.integrity import py_bit_positions

    out: dict = {}
    cols = [c for c in bloom_columns]
    table = pq.ParquetFile(path).read(columns=cols)
    for c in cols:
        words: dict[int, int] = {}
        vals = set(table[c].to_pylist())
        vals.discard(None)
        for v in vals:
            for bit in py_bit_positions(v, _BLOOM_SIDE_BITS, _BLOOM_SIDE_K):
                w, m = bit // 32, 1 << (bit % 32)
                words[w] = words.get(w, 0) | m
        out[c] = {
            "b": _BLOOM_SIDE_BITS,
            "k": _BLOOM_SIDE_K,
            "w": {str(w): m for w, m in sorted(words.items())},
        }
    return out


# 32 Kib / 3 hashes ≈ 0.5% false positives at ~2000 distinct values
# per (file, column); a sidecar costs ≤ 4 KB per (file, column) in the
# manifest — metadata-sized at any table scale.
_BLOOM_SIDE_BITS = 32768
_BLOOM_SIDE_K = 3


def _file_stats(path: str, bloom_columns: list[str] | None = None) -> dict:
    """Per-file row count and numeric column min/max from the parquet
    footer (pyarrow metadata — no data read). These power manifest-level
    file skipping, the scan feature that makes a 100 TB table affordable
    to point-query: a predicate prunes FILES before Spark ever lists
    them. With ``bloom_columns``, one single-column-projection data
    read per declared column adds the Bloom sidecar (_file_bloom)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            if col.physical_type in _SKIP_STATS_TYPES:
                continue
            name = col.path_in_schema
            lo, hi = st.min, st.max
            if not isinstance(lo, (int, float)) or isinstance(lo, bool):
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    st = {
        "rows": md.num_rows,
        "min": mins,
        "max": maxs,
    }
    if bloom_columns:
        st["bloom"] = _file_bloom(path, bloom_columns)
    return st


_DRIVER_STATS_MAX = 8


def _gather_file_stats(
    spark: SparkSession,
    paths: list[str],
    bloom_columns: list[str] | None = None,
) -> list[dict]:
    """Per-file footer stats for ``paths``, read EXECUTOR-side past a
    constant bound. At 100 TB / ~1e5 files, serial driver-side footer
    reads are the commit's dominant cost (minutes of driver I/O per
    commit); Iceberg collects data-file stats task-side during the
    write and assembles only the manifest on the driver — same model
    here: one mapInPandas pass over the file list, one collected row
    per file (bounded by the manifest the driver must hold anyway).
    Below the bound a local loop avoids paying a Spark job's
    scheduling overhead on every small commit."""
    if len(paths) <= _DRIVER_STATS_MAX:
        return [_file_stats(p, bloom_columns) for p in paths]

    def footer_stats(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "path": b["path"],
                    "stats": [
                        json.dumps(_file_stats(p, bloom_columns))
                        for p in b["path"]
                    ],
                }
            )

    rows = (
        spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(min(len(paths), 64))
        .mapInPandas(footer_stats, "path string, stats string")
        .collect()
    )
    by_path = {r["path"]: json.loads(r["stats"]) for r in rows}
    return [by_path[p] for p in paths]


class ConcurrentCommitError(RuntimeError):
    """Another manifest with this snapshot id already exists: either a
    concurrent writer violated the single-writer assumption (the lost
    update this error prevents) or a previous writer crashed between
    its manifest write and pointer swap. Run
    ``remove_orphaned_manifests`` after confirming no writer is live,
    then retry."""


def remove_orphaned_manifests(table_dir: str) -> list[int]:
    """Delete fully-named manifests NEWER than the committed pointer —
    the leftovers of a writer that crashed between manifest creation
    and the pointer swap (their data files are reclaimed separately by
    ``vacuum``). Single-maintenance-writer only, like vacuum: a live
    concurrent committer's not-yet-swapped manifest looks identical to
    a crash orphan from here."""
    mdir = os.path.join(table_dir, "manifests")
    ptr = _read_pointer(table_dir)
    removed = []
    for f in _manifest_names(mdir):
        sid = _manifest_sid(f)
        if ptr is None or sid > ptr:
            # staged (write-audit-publish) snapshots are intentional,
            # not crash litter: snapshot_abandon is their remover
            if json.load(open(os.path.join(mdir, f))).get("staged"):
                continue
            os.remove(os.path.join(mdir, f))
            removed.append(sid)
    # also reclaim .tmp litter from crashes between the tmp write and
    # its unlink (the uuid suffix means no later commit reuses the name)
    for f in os.listdir(mdir):
        if f.endswith(".tmp"):
            os.remove(os.path.join(mdir, f))
    return sorted(removed)


def _commit_manifest(
    table_dir: str, manifest: dict, swap_pointer: bool = True
) -> int:
    """Publish ``manifest`` exclusively and swap the pointer — the
    shared commit tail of snapshot_write and snapshot_rollback.

    Exclusive manifest creation approximates the catalog
    compare-and-swap: two writers that both read parent N race to
    create manifest N+1, and the loser fails LOUDLY instead of
    silently clobbering the winner's committed file list (lost
    update). Written to a unique tmp first so a fully-NAMED manifest
    is always complete, then published with os.link — atomic and
    EEXCL on POSIX (the object-store analogue is a conditional PUT /
    If-None-Match; Iceberg delegates the same race to its catalog).

    On EEXIST, disambiguate before failing. (a) The pointer already
    reached snapshot_id: another writer COMMITTED first and our parent
    read is stale — the lost-update case this guard exists for; always
    loud. (b) Pointer still behind and the manifest is older than the
    grace window: a previous writer crashed between manifest publish
    and pointer swap — auto-reclaim so checkpointed streaming replays
    converge without an operator. (c) Pointer behind but the manifest
    is fresh: a live racer milliseconds before its pointer swap — loud.
    """
    snapshot_id = manifest["snapshot_id"]
    mpath = _manifest_path(table_dir, snapshot_id)
    # Durable bootstrap marker: dropped the instant the FIRST pointer
    # swap succeeds, so "no pointer + marker present" (true bootstrap
    # crash, safe to self-heal) is distinguishable from "no pointer +
    # no marker" (a committed table whose pointer file was lost
    # externally — self-healing there would overwrite real history;
    # r6 ADVICE). Touched before the first manifest ever publishes.
    sentinel = os.path.join(table_dir, _BOOTSTRAP)
    if _read_pointer(table_dir) is None and not _manifest_names(
        os.path.join(table_dir, "manifests")
    ):
        open(sentinel, "a").close()
    tmp = f"{mpath}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, mpath)
    except FileExistsError:
        committed = _read_pointer(table_dir)
        if committed is not None:
            # a pointer exists, so any sentinel is stale litter from a
            # losing bootstrap racer that re-touched it after the
            # winner's swap — retire it so it can't legitimize a
            # future self-heal on this committed table
            try:
                os.unlink(sentinel)
            except FileNotFoundError:
                pass
        try:
            existing_staged = bool(
                json.load(open(mpath)).get("staged", False)
            )
        except Exception:
            existing_staged = False
        if existing_staged:
            # a STAGED snapshot (write-audit-publish) is intentional,
            # not a crash orphan: never reclaim it by age — the next
            # writer must wait for snapshot_publish / snapshot_abandon
            os.unlink(tmp)
            raise ConcurrentCommitError(
                f"snapshot {snapshot_id} is STAGED (write-audit-"
                f"publish) in {table_dir!r}: publish or abandon it "
                "before committing again"
            ) from None
        try:
            age = _time.time() - os.path.getmtime(mpath)
        except FileNotFoundError:
            # the blocking manifest vanished between the failed link
            # and this stat (concurrent abandon / orphan sweep won the
            # race): retry the exclusive create cleanly
            os.unlink(tmp)
            return _commit_manifest(table_dir, manifest, swap_pointer)
        # committed=None counts as "pointer behind": a writer that
        # crashed between publishing manifest 1 and the FIRST-EVER
        # pointer swap leaves no pointer at all, and without this the
        # orphan would block every retry forever (case (b)'s bootstrap
        # variant — checkpointed streaming replays must converge).
        # BUT a missing pointer is only a bootstrap crash when (i) no
        # HIGHER-numbered manifest exists (pointer loss on an
        # established table would clobber real history) AND (ii) the
        # durable bootstrap marker is still present — the marker is
        # removed by the first successful pointer swap, so its absence
        # proves a pointer EXISTED and was lost externally, even on a
        # one-snapshot table where (i) alone cannot tell the cases
        # apart. Pointer loss is an operator problem (restore the
        # pointer or remove_orphaned_manifests), never a silent heal.
        bootstrap_ok = (
            committed is None
            and os.path.exists(sentinel)
            and snapshot_id == max(
                (_manifest_sid(n) for n in _manifest_names(
                    os.path.join(table_dir, "manifests"))),
                default=snapshot_id,
            )
        )
        if (
            bootstrap_ok or (committed is not None and committed < snapshot_id)
        ) and age > _ORPHAN_GRACE_SECONDS:
            os.replace(tmp, mpath)  # reclaim the crash orphan
        else:
            os.unlink(tmp)
            raise ConcurrentCommitError(
                f"manifest for snapshot {snapshot_id} already exists in "
                f"{table_dir!r}: "
                + (
                    "a concurrent writer committed first (stale parent)"
                    if committed is not None and committed >= snapshot_id
                    else "a writer is mid-commit, or a crash happened "
                    f"within the last {_ORPHAN_GRACE_SECONDS}s"
                )
                + " — confirm no writer is live, then "
                "remove_orphaned_manifests() and retry"
            ) from None
    else:
        os.unlink(tmp)

    if not swap_pointer:
        # staged (write-audit-publish): the manifest exists and its
        # data files are durable, but no reader resolves it until
        # snapshot_publish swaps the pointer
        return snapshot_id
    # atomic pointer swap — the commit instant
    ptmp = os.path.join(table_dir, _POINTER + ".tmp")
    with open(ptmp, "w") as fh:
        fh.write(str(snapshot_id))
    os.replace(ptmp, os.path.join(table_dir, _POINTER))
    # a pointer now durably exists: retire the bootstrap marker so a
    # future missing pointer reads as external loss, not a crash
    try:
        os.unlink(sentinel)
    except FileNotFoundError:
        pass
    return snapshot_id


_HIVE_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"

_BUCKET_SPEC_RE = _re.compile(r"^bucket\((\d+),\s*([A-Za-z_][A-Za-z0-9_]*)\)$")


def _spec_fields(partition_by: list[str]) -> list[tuple[str, str, int | None]]:
    """Resolve a partition spec into (field_name, source_column,
    n_buckets-or-None) triples. Two transform kinds, Iceberg-style:
    a bare column name is an identity partition; ``bucket(N, col)`` is
    a hash bucket (hidden partitioning — readers filter on the SOURCE
    value and never see bucket numbers)."""
    out = []
    for entry in partition_by:
        m = _BUCKET_SPEC_RE.match(entry)
        if m:
            n, col = int(m.group(1)), m.group(2)
            out.append((f"{col}_bucket{n}", col, n))
        else:
            out.append((entry, entry, None))
    return out


def _bucket_expr(col: str, n: int):
    """The bucket transform: pmod(xxhash64(col), n), NULL-preserving
    (Iceberg buckets NULL into the null partition, and Spark's
    xxhash64 would otherwise hash a NULL to the seed value)."""
    return F.when(
        F.col(col).isNull(), F.lit(None).cast("long")
    ).otherwise(F.pmod(F.xxhash64(F.col(col)), F.lit(n)))


def _parse_partition_dirs(rel_dir: str, fields: list[str]) -> dict:
    """Decode a Hive-style ``__p_field=value/...`` scratch path into the
    file's partition tuple (values as unescaped strings, NULL as
    None)."""
    from urllib.parse import unquote

    vals: dict = {}
    for part in rel_dir.split(os.sep):
        if "=" not in part:
            continue
        k, _, v = part.partition("=")
        name = k.removeprefix("__p_")
        if name in fields:
            vals[name] = None if v == _HIVE_NULL_DIR else unquote(v)
    return vals


def _write_data_files(
    df: DataFrame,
    table_dir: str,
    partition_by: list[str] | None,
    bloom_columns: list[str] | None = None,
) -> list[dict]:
    """Step 1 of every commit: fully write ``df``'s data files (scratch
    write, rename under fresh unique names) and return their manifest
    entries (path + footer stats + identity-partition tuple). No
    manifest references them yet, so a crash here leaves only
    unreferenced files, invisible to every reader and reclaimed by
    vacuum."""
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    os.makedirs(os.path.join(table_dir, "manifests"), exist_ok=True)
    scratch = os.path.join(table_dir, f".commit-{uuid.uuid4().hex}")
    prefix = uuid.uuid4().hex[:12]
    renamed = []  # (manifest-relative path, absolute path)
    partitions: list[dict | None] = []
    if partition_by:
        fields = _spec_fields(partition_by)
        # Empty-string identity partition values are refused at commit
        # time: Spark's Hive-style scratch layout writes '' and NULL to
        # the SAME __HIVE_DEFAULT_PARTITION__ directory, so the two
        # would collapse into one manifest tuple — and a later dynamic
        # overwrite of the '' partition would silently delete the NULL
        # partition's rows (and partition_filter='' would under-read).
        # One narrow pruned-column scan per commit, string identity
        # sources only.
        from pyspark.sql.types import StringType as _StrT

        str_srcs = [
            src
            for _f, src, n in fields
            if n is None
            and src in df.columns
            and isinstance(df.schema[src].dataType, _StrT)
        ]
        if str_srcs:
            probe = df.select(
                *[
                    F.max(F.when(F.col(c) == "", F.lit(1))).alias(c)
                    for c in str_srcs
                ]
            ).collect()[0]
            offenders = [c for c in str_srcs if probe[c] is not None]
            if offenders:
                raise ValueError(
                    f"empty-string value(s) in identity partition "
                    f"column(s) {offenders}: the Hive scratch layout "
                    "cannot distinguish '' from NULL "
                    f"({_HIVE_NULL_DIR}) — map empty strings to NULL "
                    "or a sentinel before partitioning on them"
                )
        out = df
        for field, src, n in fields:
            out = out.withColumn(
                f"__p_{field}",
                F.col(src) if n is None else _bucket_expr(src, n),
            )
        out.write.partitionBy(*[f"__p_{f}" for f, _, _ in fields]).parquet(
            scratch
        )
        field_names = [f for f, _, _ in fields]
        i = 0
        for root, _dirs, fnames in sorted(os.walk(scratch)):
            for f in sorted(fnames):
                if not f.endswith(".parquet"):
                    continue
                dst_name = f"{prefix}-{i:05d}.parquet"
                i += 1
                dst = os.path.join(table_dir, "data", dst_name)
                os.rename(os.path.join(root, f), dst)
                renamed.append((os.path.join("data", dst_name), dst))
                partitions.append(
                    _parse_partition_dirs(
                        os.path.relpath(root, scratch), field_names
                    )
                )
    else:
        df.write.parquet(scratch)
        for f in sorted(os.listdir(scratch)):
            if not f.endswith(".parquet"):
                continue
            dst_name = f"{prefix}-{f.split('-')[1]}.parquet"
            dst = os.path.join(table_dir, "data", dst_name)
            os.rename(os.path.join(scratch, f), dst)
            renamed.append((os.path.join("data", dst_name), dst))
            partitions.append(None)
    shutil.rmtree(scratch)
    stats = _gather_file_stats(
        df.sparkSession, [a for _, a in renamed], bloom_columns
    )
    return [
        {"path": rel, **st, **({"partition": p} if p is not None else {})}
        for (rel, _), st, p in zip(renamed, stats, partitions)
    ]


def snapshot_write(
    df: DataFrame,
    table_dir: str,
    mode: str = "replace",
    partition_by: list[str] | None = None,
    bloom_columns: list[str] | None = None,
    publish: bool = True,
) -> int:
    """Commit ``df`` as a new snapshot of ``table_dir``; returns the new
    snapshot id. ``mode='replace'`` is the reference's createOrReplace
    (write.py:24-29); ``'append'`` keeps the parent snapshot's files and
    adds the new ones (Iceberg's append commit); ``'rewrite'`` is a
    replace labeled as compaction (snapshot_compact) so the snapshot
    log distinguishes maintenance commits from data changes.

    ``partition_by`` is an identity partition spec (reference
    write.py:45-49, Iceberg-style rather than Hive-style): every data
    file holds exactly ONE partition tuple, the tuple is recorded in
    the MANIFEST per file, and — unlike a Hive layout — the partition
    columns stay present inside the data files, so reads need no
    directory inference and the file layout stays flat. Readers prune
    on the manifest tuples (snapshot_read ``partition_filter``) before
    Spark lists a single file — at 100 TB this is the coarse pruning
    layer in front of the min/max zone maps. The per-file-single-tuple
    guarantee comes from writing through a scratch partitionBy on
    duplicated dunder columns (Spark's fanout writer splits tasks by
    value), which are stripped from the files themselves."""
    if mode not in ("replace", "append", "rewrite"):
        raise ValueError(f"mode must be replace|append|rewrite, got {mode!r}")
    parent = _read_pointer(table_dir)
    pm = None
    # parse the parent manifest at most once per commit: manifests
    # embed per-file bloom sidecars, so a double json parse is a
    # multi-MB driver cost on a many-file table
    parent_manifest = (
        _load_manifest(table_dir, parent) if parent is not None else None
    )
    if mode in ("replace", "rewrite") and parent is not None and partition_by is None:
        # replace/rewrite inherit the parent's partition spec too
        # (Iceberg createOrReplace keeps the TABLE's spec): a plain
        # replace on a partitioned table must not silently commit a
        # spec-less manifest — that de-partitions the table, the next
        # overwrite_partitions refuses, and pruned reads degrade to
        # full listings. An explicit partition_by still re-specs, and
        # an explicit partition_by=[] de-partitions deliberately.
        partition_by = parent_manifest.get("partition_by")
        if partition_by:
            missing = [
                f for f, _, _ in _spec_fields(partition_by)
                if f not in df.columns
            ]
            if missing:
                raise ValueError(
                    f"replace inherits the table partition spec "
                    f"{partition_by!r} but the new schema lacks source "
                    f"column(s) {missing!r}: pass partition_by=[...] for "
                    "a new spec, or partition_by=[] to de-partition the "
                    "table explicitly"
                )
    if mode in ("replace", "rewrite") and parent is not None and bloom_columns is None:
        # Bloom sidecars are a table property like the partition spec:
        # a plain replace/rewrite (compaction included) must not
        # silently stop building them — point_filter reads would
        # degrade to full scans with no error. Same contract as the
        # partition inherit above: missing source columns refuse
        # loudly, bloom_columns=[] disables deliberately.
        inherited_bloom = parent_manifest.get("bloom_columns")
        if inherited_bloom:
            missing = [c for c in inherited_bloom if c not in df.columns]
            if missing:
                raise ValueError(
                    f"replace inherits the table bloom_columns "
                    f"{inherited_bloom!r} but the new schema lacks "
                    f"column(s) {missing!r}: pass bloom_columns=[...] for "
                    "a new spec, or bloom_columns=[] to drop the sidecars "
                    "explicitly"
                )
            bloom_columns = inherited_bloom
    if mode == "append" and parent is not None:
        pm = parent_manifest
        # An append INHERITS the parent's partition spec (Iceberg: the
        # spec belongs to the table, not the write) — without this, a
        # plain append would silently de-partition the table and the
        # next merge/compact would rewrite it spec-less. A caller-passed
        # spec must MATCH the parent's; this layer has no spec
        # evolution, so a mismatch (including spec'd append onto a
        # spec-less table, which would mix tuple-less and tupled files
        # in one manifest) refuses loudly.
        parent_spec = pm.get("partition_by")
        if partition_by is None:
            partition_by = parent_spec
        elif parent_spec is None or list(partition_by) != list(parent_spec):
            raise ValueError(
                f"append spec {list(partition_by)!r} != parent snapshot "
                f"spec {parent_spec!r}: append with the parent's spec "
                "(or omit partition_by to inherit it) — to change the "
                "table's layout going forward, commit "
                "snapshot_evolve_spec first"
            )
        if bloom_columns is None:
            # sidecars are a table property like the partition spec:
            # an append keeps building them for its new files
            bloom_columns = pm.get("bloom_columns")
    if bloom_columns:
        from pyspark.sql.types import IntegralType, StringType

        bad = [
            c for c in bloom_columns
            if c not in df.columns
            or not isinstance(
                df.schema[c].dataType, (IntegralType, StringType)
            )
        ]
        if bad:
            raise ValueError(
                f"bloom_columns {bad!r} must be existing integer or "
                "string columns: the sidecar's to-string rendering is "
                "only engine-stable for those types (floats render "
                "differently between pyarrow and Spark casts)"
            )
    # CHECK constraints are a table property (Delta's ADD CONSTRAINT):
    # every write against a constrained table validates the INCOMING
    # DataFrame before any data file lands — append checks the new
    # rows only (existing data was checked when its constraint was
    # added), replace/rewrite check the full replacement. One counting
    # job per constrained write, the price Delta pays too; violations
    # refuse the commit with per-constraint counts, so a bad upstream
    # batch can never poison the table silently.
    constraints = (
        parent_manifest.get("constraints") if parent_manifest else None
    )
    if constraints:
        _validate_constraints(df, constraints)
    new_files = _write_data_files(df, table_dir, partition_by, bloom_columns)

    # 2. new manifest = parent files (append) or just new files (replace)
    files = list(new_files)
    schema = df.schema
    if pm is not None:
        files = pm["files"] + files
        # Additive schema evolution (Iceberg's add-column): the
        # snapshot's schema is the UNION of parent and append schemas,
        # so files missing a column read it as NULL and an append that
        # lacks an old column can never silently drop it. Incompatible
        # type changes fail here, at commit time, not at read time.
        from pyspark.sql.types import StructField, StructType

        old = StructType.fromJson(json.loads(pm["schema"]))
        merged = list(old.fields)
        by_name = {f.name: f for f in merged}
        for f in schema.fields:
            prev = by_name.get(f.name)
            if prev is None:
                merged.append(f)
            elif prev.dataType != f.dataType:
                raise ValueError(
                    f"append changes type of column {f.name!r}: "
                    f"{prev.dataType} -> {f.dataType}"
                )
        schema = StructType(
            [StructField(f.name, f.dataType, True) for f in merged]
        )
    snapshot_id = (parent or 0) + 1
    # Every new data file records the sequence number of the commit
    # that added it (Iceberg's data_sequence_number): merge-on-read
    # equality deletes apply only to files with a STRICTLY smaller
    # seq, which is what lets a key be deleted and later re-inserted
    # without the old delete swallowing the new row. Entries carried
    # over from the parent keep their original seq.
    for e in new_files:
        e["seq"] = snapshot_id
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_id": parent,
        "operation": mode,
        "schema": schema.json(),
        "files": files,
    }
    if not publish:
        # write-audit-publish staging (Iceberg's WAP): the snapshot is
        # fully materialized and auditable by explicit id
        # (snapshot_read(snapshot_id=...)), invisible to every default
        # reader, and EXCLUSIVE — a staged snapshot holds the next sid,
        # so concurrent commits fail loudly until snapshot_publish /
        # snapshot_abandon resolves the audit. Crash-safety: an
        # abandoned stage is just a manifest + unreferenced files,
        # reclaimed by snapshot_abandon or expire-less vacuum flows.
        manifest["staged"] = True
    if pm is not None and pm.get("delete_files"):
        # an append carries the parent's data files, so it must carry
        # the delete files that mask them; replace/rewrite start from
        # a DataFrame that already has deletes applied (snapshot_read
        # applies them), so they deliberately reset the delete list —
        # that is exactly Iceberg's rewrite_position_deletes cleanup
        manifest["delete_files"] = pm["delete_files"]
    if partition_by:
        manifest["partition_by"] = list(partition_by)
    if bloom_columns:
        manifest["bloom_columns"] = list(bloom_columns)
    if constraints:
        # constraints are a table property: every write-path commit
        # carries them forward (drop is explicit, snapshot_drop_constraint)
        manifest["constraints"] = dict(constraints)
    return _commit_manifest(
        table_dir, manifest, swap_pointer=publish
    )


def _validate_constraints(df: DataFrame, constraints: dict) -> None:
    """Refuse (ValueError) if any row of ``df`` violates any CHECK
    constraint. NULL predicate results count as violations — the
    conservative reading (Delta treats CHECK as 'must evaluate true'),
    so a constraint on a nullable column must say so explicitly
    (``x IS NULL OR x > 0``). One aggregate job computes every
    constraint's violation count at once (not one scan per
    constraint)."""
    counts = df.agg(
        *[
            F.sum(
                F.when(F.expr(pred), F.lit(0)).otherwise(F.lit(1))
            ).alias(name)
            for name, pred in sorted(constraints.items())
        ]
    ).collect()[0]
    bad = {
        name: int(counts[name] or 0)
        for name in constraints
        if counts[name]
    }
    if bad:
        raise ValueError(
            f"CHECK constraint violation(s), commit refused: "
            + ", ".join(
                f"{n!r} ({constraints[n]!r}): {c} row(s)"
                for n, c in sorted(bad.items())
            )
        )


def snapshot_set_constraint(
    spark: SparkSession, table_dir: str, name: str, predicate: str
) -> int:
    """Add a named CHECK constraint to the table (Delta's ALTER TABLE
    ADD CONSTRAINT): ``predicate`` is a SQL boolean over the table's
    columns. Like Delta, the EXISTING data is validated first (one
    scan — a constraint that current rows violate refuses), then a
    metadata-only snapshot commits the constraint into the manifest;
    every later snapshot_write against the table validates incoming
    rows and refuses violating commits. Constraint names are tag-rule
    identifiers; re-setting an existing name refuses (drop first) so
    a constraint can't be silently weakened in place."""
    if not _TAG_RE.match(name):
        raise ValueError(
            f"constraint name {name!r} must match {_TAG_RE.pattern}"
        )
    parent = _read_pointer(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    pm = _load_manifest(table_dir, parent)
    constraints = dict(pm.get("constraints") or {})
    if name in constraints:
        raise ValueError(
            f"constraint {name!r} already set to "
            f"{constraints[name]!r}: snapshot_drop_constraint first"
        )
    current = snapshot_read(spark, table_dir)
    _validate_constraints(current, {name: predicate})
    constraints[name] = predicate
    manifest = {
        **{k: v for k, v in pm.items() if k != "snapshot_id"},
        "snapshot_id": parent + 1,
        "parent_id": parent,
        "operation": "set_constraint",
        "constraints": constraints,
    }
    return _commit_manifest(table_dir, manifest)


def snapshot_drop_constraint(table_dir: str, name: str) -> int:
    """Remove a named CHECK constraint (metadata-only commit; the
    explicit inverse of snapshot_set_constraint). Unknown names refuse
    so a typo can't no-op where a real drop was intended."""
    parent = _read_pointer(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    pm = _load_manifest(table_dir, parent)
    constraints = dict(pm.get("constraints") or {})
    if name not in constraints:
        raise ValueError(f"no constraint named {name!r} on this table")
    del constraints[name]
    manifest = {
        **{
            k: v
            for k, v in pm.items()
            if k not in ("snapshot_id", "constraints")
        },
        "snapshot_id": parent + 1,
        "parent_id": parent,
        "operation": "drop_constraint",
    }
    if constraints:
        manifest["constraints"] = constraints
    return _commit_manifest(table_dir, manifest)


def snapshot_publish(table_dir: str, snapshot_id: int) -> int:
    """Publish a STAGED snapshot (the P of write-audit-publish): after
    the audit passes, one atomic pointer swap makes the staged
    snapshot current. The manifest is rewritten without the staged
    flag first, so metadata readers (snapshots(), expire) see a plain
    committed snapshot afterwards. Refuses if the id is not a staged
    manifest directly above the pointer."""
    mpath = _manifest_path(table_dir, snapshot_id)
    try:
        manifest = json.load(open(mpath))
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no staged manifest {snapshot_id} in {table_dir!r}"
        ) from None
    ptr = _read_pointer(table_dir)
    if not manifest.get("staged"):
        raise ValueError(
            f"snapshot {snapshot_id} is not staged (already published?)"
        )
    if ptr is not None and snapshot_id <= ptr:
        # crash-recovery retry: a previous publish swapped the pointer
        # but died before clearing the flag — finish idempotently
        pass
    elif (ptr or 0) + 1 != snapshot_id:
        raise ValueError(
            f"staged snapshot {snapshot_id} does not sit directly above "
            f"the pointer ({ptr}): publish refused"
        )
    else:
        # POINTER FIRST: after this instant the snapshot is committed
        # (readers resolve it; vacuum counts its files live via the
        # committed path) even if we crash before clearing the flag.
        # The reverse order opens a window where an unstaged
        # above-pointer manifest looks like crash litter — an orphan
        # sweep or vacuum inside it would delete the audited snapshot.
        ptmp = os.path.join(table_dir, _POINTER + ".tmp")
        with open(ptmp, "w") as fh:
            fh.write(str(snapshot_id))
        os.replace(ptmp, os.path.join(table_dir, _POINTER))
        try:  # first-ever pointer may arrive via publish: retire marker
            os.unlink(os.path.join(table_dir, _BOOTSTRAP))
        except FileNotFoundError:
            pass
    manifest.pop("staged", None)
    tmp = f"{mpath}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, mpath)
    return snapshot_id


def snapshot_abandon(table_dir: str, snapshot_id: int) -> None:
    """Drop a STAGED snapshot after a failed audit: removes the staged
    manifest (its data files become unreferenced and vacuum reclaims
    them). Refuses to touch committed snapshots."""
    ptr = _read_pointer(table_dir)
    if ptr is not None and snapshot_id <= ptr:
        raise ValueError(
            f"snapshot {snapshot_id} is committed (pointer {ptr}): "
            "abandon only removes staged snapshots — use rollback + "
            "expire for committed history"
        )
    mpath = _manifest_path(table_dir, snapshot_id)
    manifest = json.load(open(mpath))
    if not manifest.get("staged"):
        raise ValueError(f"snapshot {snapshot_id} is not staged")
    os.remove(mpath)


_TAG_RE = _re.compile(r"^[A-Za-z0-9_.-]{1,64}$")


def snapshot_tag(
    table_dir: str, name: str, snapshot_id: int | None = None
) -> int:
    """Create/move a named TAG (Iceberg refs): a durable name for a
    snapshot id — 'v1', 'audited-2024-06', the dataset versions
    training jobs pin. Tagged snapshots survive expire_snapshots
    (refs retain history, exactly Iceberg's retention rule); reads
    resolve with ``snapshot_read(..., snapshot_id=resolve_tag(...))``.
    Atomic os.replace, so a tag move is all-or-nothing."""
    if not _TAG_RE.match(name):
        raise ValueError(f"tag name {name!r} must match {_TAG_RE.pattern}")
    sid = snapshot_id if snapshot_id is not None else _read_pointer(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if not os.path.exists(_manifest_path(table_dir, sid)):
        raise FileNotFoundError(f"no manifest for snapshot {sid}")
    ptr = _read_pointer(table_dir)
    if ptr is None or sid > ptr:
        # staged / crash-orphaned manifests are not committed history:
        # a tag on one dangles the moment it is abandoned or swept,
        # breaking the docstring's durability promise silently
        raise ValueError(
            f"snapshot {sid} is not committed (pointer {ptr}): tags pin "
            "committed snapshots — publish first"
        )
    rdir = os.path.join(table_dir, "refs")
    os.makedirs(rdir, exist_ok=True)
    tmp = os.path.join(rdir, f".{name}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(sid))
    os.replace(tmp, os.path.join(rdir, name))
    return sid


def snapshot_tags(table_dir: str) -> dict[str, int]:
    """All tags as {name: snapshot_id}."""
    rdir = os.path.join(table_dir, "refs")
    if not os.path.isdir(rdir):
        return {}
    out = {}
    for f in os.listdir(rdir):
        if f.startswith("."):
            continue
        with open(os.path.join(rdir, f)) as fh:
            out[f] = int(fh.read().strip())
    return out


def resolve_tag(table_dir: str, name: str) -> int:
    tags = snapshot_tags(table_dir)
    if name not in tags:
        raise FileNotFoundError(f"no tag {name!r} in {table_dir!r}")
    return tags[name]


def snapshot_drop_tag(table_dir: str, name: str) -> None:
    if not _TAG_RE.match(name):
        # same validation as snapshot_tag: an unvalidated os.remove
        # would follow '../_current' out of refs/ and delete the
        # commit pointer
        raise ValueError(f"tag name {name!r} must match {_TAG_RE.pattern}")
    os.remove(os.path.join(table_dir, "refs", name))


def snapshot_read(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    prune: tuple[str, str, float] | None = None,
    schema_snapshot_id: int | None = None,
    partition_filter: dict | None = None,
    point_filter: dict | None = None,
) -> DataFrame:
    """Read a snapshot (current by default; pass ``snapshot_id`` for
    time travel). The file list is resolved NOW, so later commits or
    replaces cannot tear this read (snapshot isolation; files survive
    until expire+vacuum).

    ``prune=(column, op, value)`` with op in <=,>=,== applies
    manifest-level file skipping from footer min/max stats BEFORE Spark
    lists anything — combine with a matching .filter() for row-level
    semantics (skipping alone keeps whole files that merely overlap).

    ``partition_filter={col: value, ...}`` keeps only files whose
    manifest-recorded identity-partition tuple matches every given
    value (stringified; None matches the NULL partition). Exact
    pruning — a partitioned file holds exactly one tuple — so unlike
    min/max skipping it needs no residual row filter on the partition
    columns. Files without recorded partition info (committed before
    the spec, or under a different spec) are conservatively KEPT;
    combine with a row-level .filter() when the table mixes specs.

    ``point_filter={col: value, ...}`` applies Bloom-sidecar file
    skipping (for tables written with ``bloom_columns``): files whose
    sidecar proves a value absent are dropped before listing — the
    point-lookup complement to min/max ``prune`` (zone maps cannot
    skip on high-cardinality unclustered keys; a Bloom can). Never a
    false negative; sidecar-less files are kept. Whole-file skipping —
    combine with a matching .filter() for row semantics.

    ``schema_snapshot_id`` reads the files under ANOTHER snapshot's
    (usually newer, evolved) schema — columns added since the read
    snapshot appear as NULL. This is how changelog reads span an
    add-column boundary (Iceberg reads both ends of a changelog under
    the current schema for the same reason)."""
    sid = snapshot_id if snapshot_id is not None else _read_pointer(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _load_manifest(table_dir, sid)
    schema_manifest = (
        _load_manifest(table_dir, schema_snapshot_id)
        if schema_snapshot_id is not None
        else manifest
    )
    files = manifest["files"]
    if point_filter:
        # Bloom-sidecar file skipping (snapshot_write bloom_columns):
        # a file is dropped only when its sidecar PROVES the value
        # absent (some probe bit unset) — no false negatives, ~0.5%
        # false-keep at the sidecar's design point. Files without a
        # sidecar for the column are conservatively KEPT, so mixed
        # manifests stay correct. Like ``prune``, this skips whole
        # files; combine with a matching .filter() for row semantics.
        from yelp_etl_spark.functions.integrity import py_bit_positions

        def _bloom_keeps(f: dict) -> bool:
            for col, value in point_filter.items():
                if value is None:
                    # NULL membership is never recorded in a sidecar
                    # (builders discard None), and hashing the string
                    # 'None' would fabricate false negatives — a NULL
                    # point lookup keeps every file (use partition or
                    # min/max pruning for NULL-partitioned layouts)
                    continue
                side = (f.get("bloom") or {}).get(col)
                if side is None:
                    continue
                words = side["w"]
                for bit in py_bit_positions(value, side["b"], side["k"]):
                    if not words.get(str(bit // 32), 0) & (1 << (bit % 32)):
                        return False
            return True

        files = [f for f in files if _bloom_keeps(f)]
    if partition_filter:
        # Hidden partitioning: filters name SOURCE columns and raw
        # values; the spec maps each to its manifest field(s) — an
        # identity field matches the value rendered by SPARK'S OWN
        # string cast under the column's declared type (the manifest
        # tuples come from Spark's partition-directory names, which
        # use Spark's rendering: 'true'/'false' for booleans, '5.0'
        # for doubles — Python str() would render 'True'/'5' and
        # silently prune every file), a bucket(N, col) field matches
        # the COMPUTED bucket of the value (same Spark hash the writer
        # used). Both are one 1-row local expression per filter
        # column, so reader and writer can never drift.
        from pyspark.sql.types import StructType as _St

        spec = _spec_fields(manifest.get("partition_by") or [])
        schema_fields = {
            f.name: f
            for f in _St.fromJson(json.loads(manifest["schema"])).fields
        }

        def _spark_render(col: str, value) -> str:
            fld = schema_fields.get(col)
            if fld is None:
                return str(value)
            probe = spark.createDataFrame([(value,)], _St([fld]))
            return probe.select(
                F.col(col).cast("string").alias("s")
            ).collect()[0]["s"]

        wanted: dict[str, str | None] = {}
        for src, value in partition_filter.items():
            for field, col, n in spec:
                if col != src:
                    continue
                if n is None:
                    wanted[field] = (
                        None if value is None else _spark_render(col, value)
                    )
                elif value is None:
                    wanted[field] = None
                else:
                    probe = spark.createDataFrame(
                        [(value,)], _St([schema_fields[col]])
                    )
                    bucket = probe.select(
                        _bucket_expr(col, n).alias("b")
                    ).collect()[0]["b"]
                    wanted[field] = str(bucket)
            if not any(col == src for _, col, _n in spec):
                # not a partition source under this spec: identity
                # fallback for tables written before spec strings
                wanted[src] = (
                    None if value is None else _spark_render(src, value)
                )

        def tuple_matches(f: dict) -> bool:
            part = f.get("partition")
            if part is None:
                return True  # unknown spec → cannot skip
            for field, want in wanted.items():
                if field not in part:
                    continue  # field not in this file's spec
                if part[field] != want:
                    return False
            return True

        files = [f for f in files if tuple_matches(f)]
    if prune is not None:
        col, op, value = prune
        if op not in ("<=", ">=", "=="):
            raise ValueError(f"prune op must be <=, >= or ==, got {op!r}")

        def overlaps(f: dict) -> bool:
            lo, hi = f["min"].get(col), f["max"].get(col)
            if lo is None or hi is None:
                return True  # no stats → cannot skip
            if op == "<=":
                return lo <= value
            if op == ">=":
                return hi >= value
            return lo <= value <= hi

        files = [f for f in files if overlaps(f)]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(schema_manifest["schema"]))
    if not files:
        return spark.createDataFrame([], schema)
    dels = manifest.get("delete_files") or []
    if not dels:
        paths = [os.path.join(table_dir, f["path"]) for f in files]
        return spark.read.schema(schema).parquet(*paths)
    # Merge-on-read equality deletes (snapshot_mor_delete): a delete
    # file masks rows of every data file with a STRICTLY smaller
    # sequence number (Iceberg v2's equality-delete rule — files
    # appended after the delete, including re-inserts of deleted keys,
    # are untouched). Data files group by their seq; each group
    # anti-joins the union of the delete files that apply to it. No
    # broadcast hint: the delete scans carry size stats, so Catalyst/
    # AQE broadcasts small delete sets on its own but won't be forced
    # to materialize a billion-key delete set on every executor —
    # when deletes grow past that, snapshot_compact materializes them
    # away (delete_files reset on rewrite).
    by_seq: dict[int, list[str]] = {}
    for f in files:
        by_seq.setdefault(int(f.get("seq", 0)), []).append(
            os.path.join(table_dir, f["path"])
        )
    # each delete file is scanned ONCE and the frame reused across seq
    # groups (the frames are seq-invariant; re-creating them per group
    # would multiply scan nodes by |groups|·|deletes|)
    del_frames = [
        (
            d["seq"],
            list(d["keys"]),
            spark.read.parquet(
                *[os.path.join(table_dir, p) for p in d["paths"]]
            ),
        )
        for d in dels
    ]
    parts = []
    for fseq, paths in sorted(by_seq.items()):
        part = spark.read.schema(schema).parquet(*paths)
        for dseq, dkeys, dk in del_frames:
            if dseq > fseq:
                part = part.join(dk, dkeys, "left_anti")
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshots(table_dir: str) -> list[dict]:
    """All committed snapshots, oldest first: (snapshot_id, parent_id,
    operation, n_files, n_rows) — Iceberg's snapshots metadata table.
    Manifests newer than the pointer (a crashed, never-committed write)
    are not snapshots and are excluded."""
    mdir = os.path.join(table_dir, "manifests")
    out = []
    for f in _committed_manifest_names(table_dir):
        m = json.load(open(os.path.join(mdir, f)))
        out.append(
            {
                "snapshot_id": m["snapshot_id"],
                "parent_id": m["parent_id"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
                "n_rows": sum(fl["rows"] for fl in m["files"]),
            }
        )
    return out


def snapshot_files_table(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Iceberg's ``table.files`` metadata table as a DataFrame: one row
    per data file of a snapshot with (path, rows, partition tuple as a
    map, min/max zone maps as JSON). Layout audits, skew checks, and
    compaction planning query THIS instead of listing storage — at
    100 TB the manifest is the only thing small enough to inspect
    interactively."""
    sid = snapshot_id if snapshot_id is not None else _read_pointer(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    m = _load_manifest(table_dir, sid)
    rows = [
        (
            f["path"],
            f["rows"],
            {k: v for k, v in (f.get("partition") or {}).items()},
            json.dumps(f["min"], sort_keys=True),
            json.dumps(f["max"], sort_keys=True),
        )
        for f in m["files"]
    ]
    return spark.createDataFrame(
        rows,
        "path string, n_rows long, partition map<string,string>, "
        "min_json string, max_json string",
    )


def snapshot_history_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Iceberg's ``table.history``/``table.snapshots`` metadata table:
    one row per committed snapshot (id, parent, operation, file/row
    counts) — the audit trail behind time travel and rollback."""
    rows = [
        (
            s["snapshot_id"],
            s["parent_id"],
            s["operation"],
            s["n_files"],
            s["n_rows"],
        )
        for s in snapshots(table_dir)
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, operation string, "
        "n_files long, n_rows long",
    )


def expire_snapshots(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` manifests (returns expired
    ids). Data files stay until vacuum() — expiry only limits how far
    back time travel reaches, exactly Iceberg's expire_snapshots.

    ``keep_last`` must be >= 1: expiring everything would leave the
    ``_current`` pointer dangling and a subsequent vacuum() would treat
    every live data file as orphaned."""
    if keep_last < 1:
        raise ValueError(
            "keep_last must be >= 1 — expiring every snapshot would "
            "orphan the current pointer and let vacuum() delete the "
            "live table"
        )
    mdir = os.path.join(table_dir, "manifests")
    # retention is computed over COMMITTED manifests only: counting a
    # crash-orphaned newer manifest could expire the manifest the
    # pointer references (and vacuum would then delete the live table)
    names = _committed_manifest_names(table_dir)
    # tagged snapshots are retained regardless of position (Iceberg's
    # refs rule): a tag is a durable promise that time travel to that
    # id keeps working
    tagged = set(snapshot_tags(table_dir).values())
    expired = []
    for f in names[:-keep_last]:
        sid = _manifest_sid(f)
        if sid in tagged:
            continue
        os.remove(os.path.join(mdir, f))
        expired.append(sid)
    return expired


def vacuum(table_dir: str) -> int:
    """Delete data files referenced by NO committed manifest (returns
    count removed) — Iceberg's remove_orphan_files. Every readable
    snapshot's files are referenced, so vacuum never breaks a committed
    snapshot; files of a crash-orphaned uncommitted manifest ARE
    removed (that is the cleanup of the failed commit). MUST NOT run
    concurrently with an in-flight snapshot_write: a commit renames
    data files into place before its manifest exists, and a concurrent
    vacuum would collect them (same single-maintenance-writer rule as
    Iceberg's remove_orphan_files, which uses an age cutoff for the
    same reason)."""
    mdir = os.path.join(table_dir, "manifests")
    live = set()
    for f in _committed_manifest_names(table_dir):
        m = json.load(open(os.path.join(mdir, f)))
        live |= {fl["path"] for fl in m["files"]}
        # merge-on-read delete files are as live as the data files
        # they mask: collecting one would resurrect deleted rows in
        # every snapshot that references it
        live |= {
            p for d in m.get("delete_files", []) for p in d["paths"]
        }
    # a STAGED (write-audit-publish) snapshot above the pointer is not
    # committed but IS intentional: its files must survive vacuum or
    # the audit would read a half-deleted snapshot. Crash orphans
    # (named manifests above the pointer WITHOUT the flag) stay
    # collectible as before.
    ptr = _read_pointer(table_dir)
    for f in _manifest_names(mdir):
        sid = _manifest_sid(f)
        if ptr is not None and sid <= ptr:
            continue
        m = json.load(open(os.path.join(mdir, f)))
        if m.get("staged"):
            live |= {fl["path"] for fl in m["files"]}
            live |= {
                p for d in m.get("delete_files", []) for p in d["paths"]
            }
    removed = 0
    ddir = os.path.join(table_dir, "data")
    for f in os.listdir(ddir):
        rel = os.path.join("data", f)
        if rel not in live:
            os.remove(os.path.join(ddir, f))
            removed += 1
    return removed


def snapshot_overwrite_partitions(
    df: DataFrame, table_dir: str, partition_by: list[str]
) -> int:
    """Atomic dynamic partition overwrite (Iceberg's overwrite commit;
    the snapshot-layer form of writers.overwrite_partitions_dynamic):
    replace ONLY the partitions present in ``df``, keep every other
    partition's files from the parent snapshot, all in ONE commit —
    readers see the old table or the new one, never a half-replaced
    partition, and the replaced partitions stay time-travelable. This
    is the idempotent backfill/late-data publish primitive: re-running
    a day's job rewrites exactly that day.

    Requires the parent snapshot to carry the SAME identity spec
    (files without partition info cannot be safely kept-or-replaced;
    the commit refuses rather than guessing). The touched-tuple
    collect is bounded by the number of distinct partitions in the
    delta, not by rows."""
    parent = _read_pointer(table_dir)
    if parent is None:
        return snapshot_write(
            df, table_dir, mode="replace", partition_by=partition_by
        )
    pm = _load_manifest(table_dir, parent)
    if pm.get("partition_by") != list(partition_by):
        raise ValueError(
            f"parent snapshot spec {pm.get('partition_by')!r} != "
            f"{list(partition_by)!r}: dynamic overwrite needs a matching "
            "identity spec on the parent"
        )
    fields = [f for f, _, _ in _spec_fields(partition_by)]
    if any(
        "partition" not in f or any(c not in f["partition"] for c in fields)
        for f in pm["files"]
    ):
        # files without the CURRENT spec's full partition tuple — an
        # older layer version's tuple-less files, or files written
        # before a snapshot_evolve_spec under the previous layout —
        # cannot be safely kept-or-replaced; refuse BEFORE the data
        # write (a KeyError after it would strand orphan files)
        raise ValueError(
            "parent snapshot contains files without the current spec's "
            "partition tuples (pre-evolution or tuple-less): dynamic "
            "overwrite cannot keep-or-replace them safely — rewrite the "
            "table under the spec first (snapshot_write replace with "
            "partition_by)"
        )
    # the overwrite inherits the table's bloom sidecar spec like every
    # other write path — replaced partitions keep point-lookup skipping
    bloom_columns = pm.get("bloom_columns")
    if pm.get("constraints"):
        # CHECK constraints bind every ingest path, not just
        # snapshot_write (r9 review finding): validate the incoming
        # partition replacement before any file lands
        _validate_constraints(df, pm["constraints"])
    new_files = _write_data_files(df, table_dir, partition_by, bloom_columns)
    touched = {
        tuple(f["partition"][c] for c in fields) for f in new_files
    }
    kept = [
        f
        for f in pm["files"]
        if tuple(f["partition"][c] for c in fields) not in touched
    ]
    snapshot_id = parent + 1
    # new files get this commit's sequence number (snapshot_write's
    # convention) so inherited MOR delete files — which apply only to
    # strictly-smaller seqs — never mask the freshly written rows
    for e in new_files:
        e["seq"] = snapshot_id
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_id": parent,
        "operation": "overwrite",
        "schema": pm["schema"],
        "files": new_files + kept,
        "partition_by": list(partition_by),
    }
    if pm.get("delete_files"):
        # kept partitions carry their data files, so they must carry
        # the delete files masking them — dropping the list would
        # resurrect MOR-deleted rows in every UNTOUCHED partition
        manifest["delete_files"] = pm["delete_files"]
    if pm.get("constraints"):
        manifest["constraints"] = pm["constraints"]
    if bloom_columns:
        manifest["bloom_columns"] = list(bloom_columns)
    return _commit_manifest(table_dir, manifest)


def snapshot_rollback(table_dir: str, to_snapshot: int) -> int:
    """Iceberg's rollback: make ``to_snapshot``'s file list current
    again by committing it as a NEW snapshot (operation 'rollback') —
    history is never rewritten, so the bad snapshot stays inspectable
    and the rollback itself is time-travelable and revertible. Pure
    metadata: no data files move; the commit is one manifest write and
    a pointer swap regardless of table size — the operational 'undo'
    for a bad replace/merge at 100 TB."""
    current = _read_pointer(table_dir)
    if current is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if to_snapshot > current:
        # ids beyond the pointer are either nonexistent or a crash-
        # orphaned UNCOMMITTED manifest from a failed writer — rolling
        # "back" to one would publish a file list that never committed
        raise ValueError(
            f"snapshot {to_snapshot} is not committed (current is "
            f"{current}): refusing to roll back to an uncommitted or "
            "orphaned manifest"
        )
    target = _load_manifest(table_dir, to_snapshot)  # raises if expired
    snapshot_id = current + 1
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_id": current,
        "operation": "rollback",
        "rolled_back_to": to_snapshot,
        "schema": target["schema"],
        "files": target["files"],
    }
    if target.get("partition_by"):
        # restoring a spec'd snapshot restores its spec too — otherwise
        # a later dynamic overwrite would refuse the "spec-less" parent
        manifest["partition_by"] = target["partition_by"]
    if target.get("constraints"):
        # ... and its CHECK constraints (table properties travel with
        # the restored version, Delta RESTORE semantics)
        manifest["constraints"] = target["constraints"]
    # ... and its MOR delete files (dropping them would RESURRECT
    # every row the target snapshot had masked — silent un-deletion
    # of erased keys) and its bloom sidecar spec (losing it degrades
    # point lookups to full scans and stops later writes building
    # sidecars). Rollback restores the table STATE, all of it.
    if target.get("delete_files"):
        manifest["delete_files"] = target["delete_files"]
    if target.get("bloom_columns"):
        manifest["bloom_columns"] = target["bloom_columns"]
    return _commit_manifest(table_dir, manifest)


def snapshot_evolve_spec(table_dir: str, partition_by: list[str]) -> int:
    """Iceberg's partition-spec evolution (``ALTER TABLE … ADD/REPLACE
    PARTITION FIELD``): commit a NEW snapshot with the SAME file list
    but a new declared spec — pure metadata, one manifest write and a
    pointer swap at any table size, because Iceberg NEVER rewrites
    data on a spec change. Files written before the evolution keep the
    partition tuples of the spec they were written under (their
    directory layout is immutable history); appends after it lay new
    files out under the NEW spec. Reads stay correct across the mix:
    ``partition_filter`` prunes exactly on files that RECORD the
    filter column and conservatively KEEPS files that don't
    (snapshot_read's documented mixed-spec contract), so pre-evolution
    files are scanned rather than wrongly skipped — combine with a
    row-level ``.filter()`` for row semantics, exactly as Iceberg
    requires residual filters over mixed specs. ``partition_by=[]``
    de-partitions the table going forward.

    Reference anchor: the reference hard-codes one identity
    partition + bucket layout per entity for the table's whole life
    (write.py:24-53); this is the capability that lets a 100 TB table
    change its layout as query patterns drift, without a rewrite."""
    current = _read_pointer(table_dir)
    if current is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    pm = _load_manifest(table_dir, current)
    if partition_by:
        schema = T.StructType.fromJson(json.loads(pm["schema"]))
        # validate SOURCE columns (a bucket(N, col) field is named
        # col_bucketN — checking field names would falsely reject
        # every bucket-transform spec)
        missing = [
            src for _f, src, _n in _spec_fields(partition_by)
            if src not in schema.fieldNames()
        ]
        if missing:
            raise ValueError(
                f"new partition spec {partition_by!r} references source "
                f"column(s) {missing!r} absent from the table schema"
            )
    if list(partition_by or []) == list(pm.get("partition_by") or []):
        raise ValueError(
            f"partition spec is already {partition_by!r}: nothing to evolve"
        )
    manifest = {
        "snapshot_id": current + 1,
        "parent_id": current,
        "operation": "evolve-spec",
        "schema": pm["schema"],
        "files": pm["files"],
    }
    if partition_by:
        manifest["partition_by"] = list(partition_by)
    # spec evolution must not drop the rest of the table state
    if pm.get("constraints"):
        manifest["constraints"] = pm["constraints"]
    if pm.get("delete_files"):
        manifest["delete_files"] = pm["delete_files"]
    if pm.get("bloom_columns"):
        manifest["bloom_columns"] = pm["bloom_columns"]
    return _commit_manifest(table_dir, manifest)


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 2**20,
    cluster_by: str | None = None,
) -> int:
    """Iceberg's ``rewrite_data_files``: rewrite the current
    snapshot's files into ~``target_file_bytes``-sized ones and commit
    the result as a new snapshot with IDENTICAL content (operation
    'rewrite'). Readers pinned to older snapshots keep their exact
    file lists; the small files are reclaimed later by
    expire_snapshots + vacuum — compaction never deletes anything
    in-band, which is what makes it safe to run while readers are
    live. The streaming-sink small-files problem at 100 TB is exactly
    this maintenance loop (writers.compact_parquet_dir is the
    bare-parquet form; this is the snapshot-layer form with time
    travel preserved).

    ``cluster_by=<column>`` additionally SORT-ORDERS the rewrite
    (Iceberg's rewrite with a sort order / binpack→sort strategy):
    rows are value-range bucketed on the column from its exact global
    min/max and each output file covers a narrow range, so later
    ``prune=(column, op, value)`` reads skip most files. Deterministic
    by construction (exact-bounds bucketing, never sampled range
    partitioning)."""
    sid = _read_pointer(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _load_manifest(table_dir, sid)
    total = sum(
        os.path.getsize(os.path.join(table_dir, f["path"]))
        for f in manifest["files"]
    )
    n_out = max(1, -(-total // target_file_bytes))
    df = snapshot_read(spark, table_dir)
    spec = manifest.get("partition_by")
    if cluster_by is not None:
        if spec:
            raise ValueError(
                "cluster_by compaction on a partitioned table is not "
                "supported: cluster within partitions by compacting each "
                "partition's sub-table, or de-partition first"
            )
        # Clustered rewrite (Iceberg's rewrite_data_files with a sort
        # order): assign each row a value-range bucket from the EXACT
        # global min/max (one cheap agg — deterministic, unlike
        # repartitionByRange's reservoir sampling, so the resulting
        # file layout and every file-skip count replay identically),
        # shuffle on the bucket, and sort within partitions. Each
        # output file then covers a narrow value range, so min/max
        # ``prune`` reads skip most files — the layout maintenance
        # that keeps zone-map pruning effective as a table ages.
        lo, hi = (
            df.agg(
                F.min(cluster_by).cast("double"),
                F.max(cluster_by).cast("double"),
            ).collect()[0]
        )
        if lo is None or hi is None:
            # empty table or all-NULL cluster column: no value range to
            # order by — a plain rewrite is the meaningful maintenance op
            raise ValueError(
                f"cluster_by={cluster_by!r}: no non-NULL values to cluster "
                "on (empty table or all-NULL column); run a plain compact"
            )
        span = (hi - lo) or 1.0
        # NULL cluster values get a dedicated bucket 0 (NULLS FIRST, the
        # engines' default sort placement) — without the explicit branch,
        # F.least(lit(n-1), NULL) = n-1 would silently mix NULL rows into
        # the top value-range file and break its zone-map tightness.
        bucket = F.when(F.col(cluster_by).isNull(), F.lit(0)).otherwise(
            F.least(
                F.lit(n_out - 1),
                F.floor(
                    (F.col(cluster_by).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * n_out
                ).cast("int"),
            )
        )
        # A plain repartition(n, bucket) hash-scatters buckets across
        # partitions (collisions merge ranges and wreck the zone-map
        # story). Probe Spark's own hash partitioner for one integer
        # token per target partition and route each bucket through its
        # token — every output file then holds EXACTLY one value
        # range. The probe is one n_out-row local job.
        probe = (
            spark.range(0, 65536)
            .selectExpr(
                "CAST(id AS INT) AS t",
                f"pmod(hash(CAST(id AS INT)), {n_out}) AS p",
            )
            .groupBy("p")
            .agg(F.min("t").alias("t"))  # min: collect-order-independent
        )
        tok = {r.p: r.t for r in probe.collect()}
        if len(tok) < n_out:
            raise RuntimeError(
                f"hash-token probe could not cover {n_out} partitions"
            )
        token = F.element_at(
            F.array(*[F.lit(tok[p]) for p in range(n_out)]), bucket + 1
        )
        clustered = (
            df.withColumn("__cluster_tok", token)
            .repartition(n_out, "__cluster_tok")
            .sortWithinPartitions(cluster_by)
            .drop("__cluster_tok")
        )
        return snapshot_write(clustered, table_dir, mode="rewrite")
    if not spec:
        return snapshot_write(df.repartition(n_out), table_dir, mode="rewrite")
    # preserve the partition spec (Iceberg compaction rewrites WITHIN
    # the spec): repartition on the spec fields so each output task
    # holds whole partitions — the fanout write then emits ~one file
    # per (task, partition) instead of files-per-partition × tasks
    exprs = [
        F.col(src) if n is None else _bucket_expr(src, n)
        for _f, src, n in _spec_fields(spec)
    ]
    return snapshot_write(
        df.repartition(n_out, *exprs),
        table_dir,
        mode="rewrite",
        partition_by=spec,
    )


def snapshot_merge(
    spark: SparkSession,
    source: DataFrame,
    table_dir: str,
    keys: list[str],
    delete_condition=None,
) -> int:
    """MERGE INTO for the snapshot layer (operators/scd.merge_upsert)
    committed as one atomic snapshot: readers see the pre-merge table
    or the post-merge table, never an intermediate state, and the
    pre-merge snapshot stays time-travelable. First merge into an
    empty table is the initial insert.

    ``delete_condition`` (a Column over ``source``) adds the
    WHEN MATCHED THEN DELETE branch of the full MERGE statement
    (Iceberg v2 row-level deletes, the natural extension of reference
    write.py's replace semantics): source rows where it is true REMOVE
    the matching target keys and are not inserted; the remaining rows
    upsert. Extra columns that exist only for the condition (an op
    flag from a CDC feed) are allowed on ``source`` — the upsert
    branch is projected onto the target's columns. Execution is one
    extra anti-join on the delete keys over the plain upsert — still a
    single keyed shuffle family, broadcastable when the delta is
    small.

    Merge, compaction, and rollback all PRESERVE the parent snapshot's
    partition spec — a maintenance or merge commit must never silently
    turn a partitioned table into an unpartitioned one (that would
    make the next dynamic overwrite refuse and every partition-pruned
    read degrade to a full listing)."""
    from yelp_etl_spark.operators.scd import merge_upsert

    parent = _read_pointer(table_dir)
    parent_spec = (
        _load_manifest(table_dir, parent).get("partition_by")
        if parent is not None
        else None
    )
    if delete_condition is None:
        if parent is None:
            return snapshot_write(source, table_dir, mode="replace")
        target = snapshot_read(spark, table_dir)
        return snapshot_write(
            merge_upsert(target, source, keys),
            table_dir,
            mode="replace",
            partition_by=parent_spec,
        )
    deletes = source.filter(delete_condition).select(*keys)
    upserts = source.filter(
        ~F.coalesce(delete_condition, F.lit(False))
    )
    if parent is None:
        # no target schema to project onto yet: strip engine-internal
        # dunder columns (the CDC op-flag convention) so a bootstrap
        # merge does not bake the flag into the table schema forever
        merged = upserts.drop(
            *[c for c in upserts.columns if c.startswith("__")]
        )
    else:
        target = snapshot_read(spark, table_dir)
        merged = merge_upsert(
            target, upserts.select(*target.columns), keys
        ).join(deletes, keys, "left_anti")
    return snapshot_write(
        merged, table_dir, mode="replace", partition_by=parent_spec
    )


def snapshot_mor_delete(
    spark: SparkSession,
    table_dir: str,
    delete_keys: DataFrame,
    keys: list[str],
) -> int:
    """Merge-on-read row deletion (Iceberg v2 equality deletes): commit
    the distinct ``keys``-tuples of ``delete_keys`` as a DELETE FILE —
    the parent's data files are carried into the new snapshot
    UNTOUCHED, and readers mask matching rows with an anti-join at
    scan time (snapshot_read). Returns the new snapshot id.

    This is the write path copy-on-write cannot afford at 100 TB:
    deleting a scattered 0.1% of rows (GDPR erasure, late
    retractions) under snapshot_merge's replace semantics rewrites
    the entire table; here the commit cost is O(|deleted keys|) — one
    small parquet write plus a manifest — regardless of table size.
    The read-side anti-join is the deferred price; when accumulated
    delete files grow, ``snapshot_compact`` materializes them into a
    clean rewrite and resets the delete list (Iceberg's
    rewrite_position_deletes + rewrite_data_files maintenance pair).

    Sequence-number semantics: the delete applies only to data files
    with a strictly smaller sequence number, so keys re-inserted by a
    LATER append are visible — delete-then-reinsert works exactly as
    in Iceberg. Time travel to the parent snapshot still sees the
    deleted rows (the delete is a new snapshot, not an edit).

    ``delete_keys`` may carry extra columns; only ``keys`` are
    written. Deleting by a non-key predicate = filter the table first
    and pass the matching key tuples."""
    parent = _read_pointer(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    pm = _load_manifest(table_dir, parent)
    missing = [k for k in keys if k not in delete_keys.columns]
    if missing:
        raise ValueError(f"delete_keys lacks key column(s) {missing!r}")
    entries = _write_data_files(
        delete_keys.select(*keys).distinct(), table_dir, None, None
    )
    snapshot_id = parent + 1
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_id": parent,
        "operation": "delete",
        "schema": pm["schema"],
        "files": pm["files"],
        # a delete introduces no rows, but the table property survives
        **({"constraints": pm["constraints"]} if pm.get("constraints") else {}),
        "delete_files": (pm.get("delete_files") or [])
        + [
            {
                "paths": [e["path"] for e in entries],
                "keys": list(keys),
                "seq": snapshot_id,
                "count": sum(e.get("rows", 0) for e in entries),
            }
        ],
    }
    if pm.get("partition_by"):
        manifest["partition_by"] = pm["partition_by"]
    if pm.get("bloom_columns"):
        manifest["bloom_columns"] = pm["bloom_columns"]
    return _commit_manifest(table_dir, manifest)


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: int,
    to_snapshot: int,
    keys: list[str],
    compare_columns: list[str],
) -> DataFrame:
    """Changelog between two committed snapshots (Iceberg's
    changelog/CDC read): rows classified added / removed / changed /
    unchanged via operators/scd.snapshot_diff — one full-outer join on
    the keys between the two pinned file lists. This is what lets
    downstream incremental consumers (incremental_agg_maintenance,
    index refreshers) process exactly the delta between two table
    versions without a write-side log."""
    from yelp_etl_spark.operators.scd import snapshot_diff

    # both ends read under the TO side's schema, so a column added
    # between the snapshots compares as NULL->value (= 'changed')
    # instead of crashing the old side's select
    old = snapshot_read(
        spark, table_dir, snapshot_id=from_snapshot,
        schema_snapshot_id=to_snapshot,
    )
    new = snapshot_read(spark, table_dir, snapshot_id=to_snapshot)
    return snapshot_diff(old, new, keys, compare_columns)


def snapshot_merge_3way(
    spark: SparkSession,
    table_dir: str,
    base_id: int,
    ours_id: int,
    theirs_id: int,
    keys: list[str],
    on_conflict: str = "theirs",
) -> int:
    """Three-way keyed merge of two diverged table versions against
    their common base — the RECONCILING publish for the WAP surface
    (Iceberg/Nessie branch merge semantics): stage work on a branch
    (snapshot_write(publish=False)), let main advance meanwhile, then
    merge the branch back instead of blind-publishing over main's
    concurrent commits.

    Per key, each side's change vs base classifies as insert / update
    / delete / nochange — value equality is a NULL-SAFE struct
    comparison over the merged schema (never a bare xxhash64 of the
    columns: Spark's xxhash64 skips NULL children, so swapping a value
    between same-typed columns around a NULL would hash identically
    and the edit would silently vanish — the same quirk _bucket_expr
    guards). Non-conflicting changes from BOTH sides apply; keys
    changed on both sides to DIFFERENT values resolve by
    ``on_conflict``: 'theirs' (the branch wins — merge-publish),
    'ours' (main wins — rebase-drop), or 'fail' (raise with the
    conflicting key count, Nessie's default — checked BEFORE the
    staged branch is consumed, so it survives for a resolve+retry).
    Identical both-side changes are not conflicts.

    Additive schema evolution is honored: the merge operates over the
    UNION of the three versions' schemas (a column added on either
    side reads as NULL from the others — snapshot_write's append
    rule), so a column added on main or on the branch survives the
    merge instead of being silently projected away.

    Durability ordering when the branch is staged: the merged data
    files are fully written FIRST; then ONE atomic os.replace swaps
    the staged branch manifest's file for a STAGED merge manifest
    reusing the same snapshot id (a stage holds parent+1 exclusively,
    so the id is free to reuse); then the normal snapshot_publish tail
    (pointer swap, idempotent flag clear) commits it. There is no
    instant where neither manifest exists: before the replace the
    branch is intact, after it a staged merge is on disk (resumable
    via snapshot_publish), after the pointer swap the merge is
    committed. The branch's own data files become unreferenced at the
    replace and are reclaimed by vacuum, exactly as an abandon would
    leave them.

    Execution: two keyed full-outer joins (base⟗ours⟗theirs) on the
    merge keys + one CASE projection — the standard three-scan keyed
    shuffle family, broadcastable when the diverged deltas are small,
    linear at 100 TB. Preserves the parent snapshot's partition spec
    (the snapshot_merge rule)."""
    if on_conflict not in ("theirs", "ours", "fail"):
        raise ValueError(f"on_conflict must be theirs|ours|fail: {on_conflict}")
    base = snapshot_read(spark, table_dir, base_id)
    ours = snapshot_read(spark, table_dir, ours_id)
    theirs = snapshot_read(spark, table_dir, theirs_id)
    # merged schema = union of the three versions (additive evolution)
    merged_fields: list = []
    by_name: dict = {}
    for df in (base, ours, theirs):
        for f in df.schema.fields:
            prev = by_name.get(f.name)
            if prev is None:
                by_name[f.name] = f
                merged_fields.append(f)
            elif prev.dataType != f.dataType:
                raise ValueError(
                    f"3-way merge: column {f.name!r} has diverged types "
                    f"{prev.dataType} vs {f.dataType}"
                )
    cols = [f.name for f in merged_fields]
    val_cols = [c for c in cols if c not in keys]

    def aligned(df: DataFrame) -> DataFrame:
        have = set(df.columns)
        return df.select(
            *[
                F.col(c) if c in have
                else F.lit(None).cast(by_name[c].dataType).alias(c)
                for c in cols
            ]
        )

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        return aligned(df).select(
            *[F.col(k).alias(f"{tag}_{k}") for k in keys],
            F.struct(*[F.col(c) for c in val_cols]).alias(f"{tag}_row"),
            F.lit(True).alias(f"{tag}_present"),
        )

    b, o, t = tagged(base, "b"), tagged(ours, "o"), tagged(theirs, "t")
    cond_bo = [b[f"b_{k}"].eqNullSafe(o[f"o_{k}"]) for k in keys]
    j = b.join(o, cond_bo, "full_outer")
    key_bo = [
        F.coalesce(F.col(f"b_{k}"), F.col(f"o_{k}")).alias(f"k_{k}")
        for k in keys
    ]
    j = j.select(*key_bo, "b_row", "b_present", "o_row", "o_present")
    cond_t = [j[f"k_{k}"].eqNullSafe(t[f"t_{k}"]) for k in keys]
    j = j.join(t, cond_t, "full_outer").select(
        *[F.coalesce(F.col(f"k_{k}"), F.col(f"t_{k}")).alias(k) for k in keys],
        "b_row", "b_present", "o_row", "o_present", "t_row", "t_present",
    )
    bp = F.coalesce("b_present", F.lit(False))
    op_ = F.coalesce("o_present", F.lit(False))
    tp = F.coalesce("t_present", F.lit(False))
    # NULL-safe struct equality: exact, no hash, no NULL-shift blindness
    bo_eq = F.col("b_row").eqNullSafe(F.col("o_row"))
    bt_eq = F.col("b_row").eqNullSafe(F.col("t_row"))
    ot_eq = F.col("o_row").eqNullSafe(F.col("t_row"))
    o_changed = (bp != op_) | (bp & op_ & ~bo_eq)
    t_changed = (bp != tp) | (bp & tp & ~bt_eq)
    same_result = (op_ == tp) & (~op_ | ot_eq)
    conflict = o_changed & t_changed & ~same_result
    if on_conflict == "fail":
        n = j.filter(conflict).count()
        if n:
            raise ValueError(f"3-way merge: {n} conflicting keys")
    winner_theirs = conflict if on_conflict == "theirs" else F.lit(False)
    take_theirs = (t_changed & ~o_changed) | winner_theirs
    present = F.when(take_theirs, tp).otherwise(op_)
    row = F.when(take_theirs, F.col("t_row")).otherwise(F.col("o_row"))
    merged = (
        j.select(*keys, present.alias("__present"), row.alias("__row"))
        .filter(F.col("__present"))
        .select(*keys, *[F.col("__row")[c].alias(c) for c in val_cols])
        .select(*cols)
    )
    parent = _read_pointer(table_dir)
    parent_manifest = (
        _load_manifest(table_dir, parent) if parent is not None else {}
    )
    spec = parent_manifest.get("partition_by")
    theirs_manifest = _load_manifest(table_dir, theirs_id)
    if not theirs_manifest.get("staged"):
        return snapshot_write(
            merged, table_dir, mode="replace", partition_by=spec
        )
    # staged branch: atomic consume (see docstring) — merged data
    # files first, then os.replace the staged branch manifest with a
    # STAGED merge manifest reusing its id, then the publish tail.
    # Never abandon-then-commit: a crash between those two steps would
    # leave BOTH the branch and the merge as unreferenced orphans.
    bloom = parent_manifest.get("bloom_columns")
    if parent_manifest.get("constraints"):
        # the merge is an incoming replacement row set like any other
        # write: validate before the data files land (r9 review)
        _validate_constraints(merged, parent_manifest["constraints"])
    new_files = _write_data_files(merged, table_dir, spec, bloom)
    snapshot_id = (parent or 0) + 1
    if theirs_id != snapshot_id:
        # a stage holds parent+1 exclusively (snapshot_write refuses
        # concurrent commits while it exists), so anything else means
        # external manifest surgery — refuse rather than clobber
        raise ValueError(
            f"staged branch {theirs_id} does not sit directly above "
            f"the pointer ({parent}): refusing in-place consume"
        )
    for e in new_files:
        e["seq"] = snapshot_id
    manifest = {
        "snapshot_id": snapshot_id,
        "parent_id": parent,
        "operation": "replace",
        "schema": merged.schema.json(),
        "files": new_files,
        "staged": True,
    }
    if spec:
        manifest["partition_by"] = spec
    if bloom:
        manifest["bloom_columns"] = bloom
    if parent_manifest.get("constraints"):
        manifest["constraints"] = parent_manifest["constraints"]
    mpath = _manifest_path(table_dir, snapshot_id)
    tmp = f"{mpath}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, mpath)
    return snapshot_publish(table_dir, snapshot_id)


def snapshot_clone(src_dir: str, dst_dir: str) -> int:
    """Zero-copy shallow clone (Delta SHALLOW CLONE / Iceberg snapshot
    ref across tables): create a NEW table at ``dst_dir`` whose first
    snapshot references the SOURCE table's current data files by
    absolute path — no data is read or copied, the clone commit is one
    manifest write however many petabytes the source holds. The clone
    then evolves independently: its own writes land as normal relative
    files inside ``dst_dir``, and commits there never touch the
    source.

    Same caveat as every shallow clone: the clone BORROWS the source's
    files, so expire+vacuum on the SOURCE can reclaim files the clone
    still references (Delta documents the identical hazard). The
    clone's own vacuum is safe — it only sweeps files under its own
    directory, and the borrowed entries live outside it.

    Dev/test table forks, reproducible-experiment pinning, and
    blue/green migration staging are the 100 TB use cases: all want
    "a table that starts as an exact copy, diverges cheaply"."""
    sid = _read_pointer(src_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {src_dir}")
    if _read_pointer(dst_dir) is not None:
        raise ValueError(f"clone target {dst_dir!r} already has a table")
    m = _load_manifest(src_dir, sid)
    src_abs = os.path.abspath(src_dir)

    def absolutize(entries: list[dict]) -> list[dict]:
        out = []
        for e in entries:
            e2 = dict(e)
            e2["path"] = os.path.join(src_abs, e["path"])
            out.append(e2)
        return out

    # The clone's history starts AT the source's snapshot counter, not
    # at 1: borrowed file entries keep their source sequence numbers
    # (all <= sid), so the clone's own future commits (sid+1, ...) can
    # mask them with merge-on-read deletes — restarting at 1 would make
    # every borrowed seq look newer than any clone delete and the
    # delete would silently not apply. Carried delete-file seq
    # relationships stay verbatim for the same reason.
    manifest = {
        "snapshot_id": sid,
        "parent_id": None,
        "operation": "clone",
        "clone_of": {"table": src_abs, "snapshot_id": sid},
        "schema": m["schema"],
        "files": absolutize(m["files"]),
    }
    if m.get("delete_files"):
        # delete-file entries carry a "paths" LIST, not a single path
        manifest["delete_files"] = [
            {**d, "paths": [os.path.join(src_abs, p) for p in d["paths"]]}
            for d in m["delete_files"]
        ]
    if m.get("partition_by"):
        manifest["partition_by"] = m["partition_by"]
    if m.get("bloom_columns"):
        manifest["bloom_columns"] = m["bloom_columns"]
    if m.get("constraints"):
        manifest["constraints"] = m["constraints"]
    os.makedirs(os.path.join(dst_dir, "manifests"), exist_ok=True)
    # data/ too: vacuum on a fresh clone lists it (borrowed files live
    # outside it, so the sweep is a safe no-op, not a FileNotFoundError)
    os.makedirs(os.path.join(dst_dir, "data"), exist_ok=True)
    return _commit_manifest(dst_dir, manifest)


def snapshot_binpack(
    spark: SparkSession,
    table_dir: str,
    small_file_bytes: int = 32 * 2**20,
) -> int:
    """SELECTIVE small-file compaction (Iceberg rewrite_data_files'
    binpack with a min-input-files/size filter — the shape real
    maintenance uses): only files under ``small_file_bytes`` are read
    and rewritten; every file already at target size is carried into
    the new snapshot UNTOUCHED, byte-identical path entries and all.
    A full-table compact rewrites 100 TB to fix a few thousand
    streaming-sink micro-files; this rewrites only the micro-files —
    maintenance cost proportional to the problem, not the table.

    Commits one atomic 'rewrite' snapshot (content identical by
    construction); parent spec and bloom sidecars carry over like
    snapshot_compact. Refuses when merge-on-read delete files are
    pending (a partial rewrite would bump rewritten rows' sequence
    numbers past the delete files' — apply them first via a full
    compact/rewrite, the same ordering rule as Iceberg's
    rewrite_position_deletes)."""
    sid = _read_pointer(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _load_manifest(table_dir, sid)
    if manifest.get("delete_files"):
        raise ValueError(
            "snapshot_binpack with pending merge-on-read delete files "
            "would un-mask rewritten rows (their new sequence numbers "
            "pass the delete files'): run a full snapshot_compact "
            "first to apply the deletes"
        )
    from pyspark.sql.types import StructType

    small, big = [], []
    for e in manifest["files"]:
        size = os.path.getsize(os.path.join(table_dir, e["path"]))
        (small if size < small_file_bytes else big).append(e)
    if len(small) <= 1:
        return sid  # nothing worth rewriting: keep the snapshot as-is
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    df_small = spark.read.schema(schema).parquet(
        *[os.path.join(table_dir, e["path"]) for e in small]
    )
    spec = manifest.get("partition_by")
    # maintenance INHERITS the table's bloom property (the
    # snapshot_compact rule) — a caller-supplied list here would bypass
    # snapshot_write's type validation and could desync the recorded
    # property from the sidecars actually built
    bloom_columns = manifest.get("bloom_columns")
    n_out = max(
        1,
        -(
            -sum(
                os.path.getsize(os.path.join(table_dir, e["path"]))
                for e in small
            )
            // small_file_bytes
        ),
    )
    if spec:
        exprs = [
            F.col(src) if n is None else _bucket_expr(src, n)
            for _f, src, n in _spec_fields(spec)
        ]
        df_small = df_small.repartition(n_out, *exprs)
    else:
        df_small = df_small.repartition(n_out)
    new_files = _write_data_files(df_small, table_dir, spec, bloom_columns)
    new_sid = sid + 1
    for e in new_files:
        e["seq"] = new_sid
    out = {
        "snapshot_id": new_sid,
        "parent_id": sid,
        "operation": "rewrite",
        "schema": manifest["schema"],
        "files": big + new_files,
    }
    if spec:
        out["partition_by"] = spec
    if manifest.get("bloom_columns"):
        out["bloom_columns"] = manifest["bloom_columns"]
    if manifest.get("constraints"):
        # rewrite of already-validated rows: carry, no re-validation
        out["constraints"] = manifest["constraints"]
    return _commit_manifest(table_dir, out)
