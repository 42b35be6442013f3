"""TableFormat seam: snapshot-committed tables (SURVEY §7 storage note).

Production path is Iceberg (`spark.read.format("iceberg")`, `MERGE
INTO`, snapshot time travel) — that is configuration, not code. This
sandbox has no Iceberg runtime jar, so ``SnapshotStore`` implements the
same *observable* semantics on plain Parquet + an atomically-swapped
JSON manifest:

- **Atomic multi-table commit**: a wave commits frontier + seen +
  jobs + lineage in ONE manifest swap (os.replace is atomic on POSIX).
  A crash mid-write leaves orphan data dirs that no manifest
  references — invisible, exactly like an uncommitted Iceberg
  snapshot.
- **Snapshot isolation / time travel**: every commit is a new
  snapshot id; readers name a snapshot or take the latest.
- **Resume-from-checkpoint** (north_rule, reference analogue: Redis
  AOF persistence, docker-compose.yml:30): restart reads the last
  committed snapshot and continues; the kill-resume test pins this.

Tables not rewritten by a commit carry forward by reference (the
manifest points at the previous snapshot's directory) — no data copy,
like Iceberg manifests reusing unchanged data files.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._manifest_path = self.root / "_manifest.json"

    # -- manifest ---------------------------------------------------------
    def _read_manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"snapshots": []}
        return json.loads(self._manifest_path.read_text())

    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    def latest(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def latest_wave(self) -> int | None:
        s = self.latest()
        return None if s is None else s["wave"]

    # -- read -------------------------------------------------------------
    def _entry(self, table: str, snapshot_id: int | None = None):
        """(paths, base_partition_cols) for a table at a snapshot, or
        None. paths[0] is the base (last overwrite); the rest are the
        append deltas committed since, oldest first."""
        snaps = self.snapshots()
        if snapshot_id is not None:
            snaps = [s for s in snaps if s["sid"] == snapshot_id]
        for s in reversed(snaps):
            if table in s["tables"]:
                entry = s["tables"][table]
                paths = entry if isinstance(entry, list) else [entry]
                part = s.get("layout", {}).get(table, [])
                return [str(self.root / p) for p in paths], part
        return None

    def _read_paths(self, spark: SparkSession, paths: list[str],
                    select: dict) -> DataFrame:
        """Union a table's batch dirs. A dir written by a FOLDED commit
        (several control tables in one partitioned write) carries the
        fold's column superset; its manifest `select` entry prunes it
        back to the table's own columns."""
        plain = [p for p in paths if p not in select]
        frames = ([spark.read.parquet(*plain)] if plain else []) + [
            spark.read.parquet(p).select(*select[p]) for p in paths
            if p in select]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def read(self, spark: SparkSession, table: str,
             snapshot_id: int | None = None) -> DataFrame | None:
        """Read a table at a snapshot (default: latest). None if absent.

        Append-mode tables resolve to the union of all their batch
        directories (manifest entry is a list) — the parquet-sandbox
        equivalent of an Iceberg table's data-file list. A partitioned
        base (e.g. seen bucketed by salt) is read separately from the
        flat deltas and unioned by name.
        """
        got = self._entry(table, snapshot_id)
        if got is None:
            return None
        paths, part = got
        select = self._select_map(snapshot_id)
        if len(paths) == 1:
            return self._read_paths(spark, paths, select)
        if not part:
            return self._read_paths(spark, paths, select)
        deltas = self._read_paths(spark, paths[1:], select)
        return deltas.unionByName(
            spark.read.parquet(paths[0]).select(*deltas.columns))

    def _select_map(self, snapshot_id: int | None = None) -> dict:
        """abs-path -> column list for folded batch dirs (carried
        forward across snapshots like the table entries themselves)."""
        snaps = self.snapshots()
        if snapshot_id is not None:
            snaps = [s for s in snaps if s["sid"] == snapshot_id]
        if not snaps:
            return {}
        sel = snaps[-1].get("select", {})
        return {str(self.root / rel): cols for rel, cols in sel.items()}

    def read_split(self, spark: SparkSession, table: str,
                   snapshot_id: int | None = None
                   ) -> tuple[DataFrame | None, DataFrame | None]:
        """(base, deltas) — the merge-on-read halves. base = the last
        overwrite (bootstrap or compaction, already one row per key);
        deltas = the appends since (each internally one row per key,
        `_wseq`-ordered across waves). The driver's views window-resolve
        ONLY the deltas and anti-join the base — the read-side exchange
        is O(delta chain), never O(total state) (Iceberg MoR analogue;
        the delta chain is bounded by compact_every)."""
        got = self._entry(table, snapshot_id)
        if got is None:
            return None, None
        paths, _ = got
        select = self._select_map(snapshot_id)
        base = self._read_paths(spark, paths[:1], select)
        if len(paths) == 1:
            return base, None
        deltas = self._read_paths(spark, paths[1:], select)
        return base.select(*deltas.columns), deltas

    # -- commit -----------------------------------------------------------
    def commit(self, wave: int, tables: dict[str, DataFrame],
               partition_by: dict[str, list[str]] | None = None,
               output_partitions: int | None = None,
               appends: dict[str, DataFrame] | None = None,
               repartition_tables: set[str] | None = None,
               fold_appends: set[str] | None = None) -> int:
        """Write `tables` (overwrite semantics) and `appends` (the wave's
        batch joins the table's directory list — O(batch) IO instead of
        an O(total) rewrite, like Iceberg appending data files), then
        atomically publish ONE snapshot covering both plus every
        carried-forward table. Returns the new snapshot id.

        repartition_tables limits the file-sizing repartition to the
        named (fat) tables — small control/delta tables write with their
        natural partitioning, saving one shuffle per table per wave
        (Iceberg's writer handles file sizing in production).

        fold_appends names append tables to write as ONE Spark job: a
        column-superset union partitioned by a `_table` discriminator.
        Every parquet job pays corpus-size-independent constants
        (Catalyst planning, task scheduling, committer setup) that are
        pure serial fraction at N->4N scaling; folding the small
        control deltas cuts the wave's job count without changing any
        table's read schema — each folded dir's manifest `select`
        entry prunes reads back to the table's own columns, and a
        zero-row table simply contributes no partition dir (nothing is
        appended). Column names shared across folded tables must have
        identical types (the driver's fold set does)."""
        manifest = self._read_manifest()
        prev = manifest["snapshots"][-1] if manifest["snapshots"] else None
        sid = (prev["sid"] + 1) if prev else 1

        entry_tables: dict = dict(prev["tables"]) if prev else {}
        # base layout registry: which tables' BASE directory is written
        # with directory partitioning (e.g. seen bucketed by salt) —
        # readers must read such a base separately from the flat deltas
        layout: dict = dict(prev.get("layout", {})) if prev else {}
        select_map: dict = dict(prev.get("select", {})) if prev else {}

        def _write(item):
            name, df = item
            rel = f"data/{sid}/{name}"
            if output_partitions and (repartition_tables is None
                                      or name in repartition_tables):
                # Fewer output files avoid committer contention (Iceberg
                # handles file sizing in production). MUST be repartition,
                # not coalesce: coalesce would pull the upstream compute
                # (normalize/clean pUDFs) down to output_partitions tasks;
                # repartition keeps compute wide and only shuffles the
                # small finished rows into the output files.
                df = df.repartition(output_partitions)
            part_cols = (partition_by or {}).get(name, [])
            writer = df.write.mode("overwrite")
            for col in part_cols:
                writer = writer.partitionBy(col)
            writer.parquet(str(self.root / rel))
            if part_cols and not any((self.root / rel).rglob("*.parquet")):
                # an EMPTY partitioned write leaves no schema-bearing
                # file (partition dirs only exist per value) — rewrite
                # flat so the dir stays readable (Iceberg keeps schema
                # in metadata; plain parquet needs a footer)
                df.limit(0).write.mode("overwrite").parquet(str(self.root / rel))
                part_cols = []
            return name, rel, part_cols

        appends = appends or {}
        folded = {n: df for n, df in appends.items()
                  if fold_appends and n in fold_appends}
        plain_appends = {n: df for n, df in appends.items() if n not in folded}

        def _write_folded():
            from pyspark.sql import functions as F

            cols_by = {n: df.columns for n, df in folded.items()}
            frames = [df.withColumn("_table", F.lit(n))
                      for n, df in folded.items()]
            uni = frames[0]
            for f in frames[1:]:
                uni = uni.unionByName(f, allowMissingColumns=True)
            if output_partitions:
                # round-robin, NOT by _table: hashing by the
                # discriminator would funnel each table's whole batch
                # into one task; round-robin keeps the write wide and
                # the partitionBy writer still splits files per table
                uni = uni.repartition(output_partitions)
            rel = f"data/{sid}/ctl"
            uni.write.mode("overwrite").partitionBy("_table") \
               .parquet(str(self.root / rel))
            # a zero-row table leaves no partition dir: append nothing
            return [(n, f"{rel}/_table={n}", cols)
                    for n, cols in cols_by.items()
                    if (self.root / rel / f"_table={n}").exists()]

        def _append_entry(name, rel):
            prev_entry = entry_tables.get(name, [])
            prev_list = (prev_entry if isinstance(prev_entry, list)
                         else [prev_entry])
            entry_tables[name] = prev_list + [rel]

        # Spark accepts concurrent job submission from driver threads:
        # writing the wave's tables in parallel keeps all cores busy
        # instead of serializing N small parquet jobs (the serial
        # fraction is what kills N->4N scaling efficiency).
        from concurrent.futures import ThreadPoolExecutor

        all_items = list(tables.items()) + list(plain_appends.items())
        n_jobs = len(all_items) + (1 if folded else 0)
        with ThreadPoolExecutor(max_workers=max(1, n_jobs)) as pool:
            fold_fut = pool.submit(_write_folded) if folded else None
            for name, rel, part_cols in pool.map(_write, all_items):
                if name in plain_appends:
                    _append_entry(name, rel)
                else:
                    entry_tables[name] = rel
                    if part_cols:
                        layout[name] = part_cols
                    else:
                        layout.pop(name, None)
            if fold_fut is not None:
                for name, rel, cols in fold_fut.result():
                    _append_entry(name, rel)
                    select_map[rel] = cols

        # prune select entries whose dirs are no longer referenced
        # (compaction overwrote the table; its delta chain was dropped)
        live: set = set()
        for e in entry_tables.values():
            live.update(e if isinstance(e, list) else [e])
        select_map = {k: v for k, v in select_map.items() if k in live}

        manifest["snapshots"].append({
            "sid": sid,
            "wave": wave,
            "tables": entry_tables,
            "layout": layout,
            "select": select_map,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        tmp = self._manifest_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self._manifest_path)  # the atomic commit point
        return sid
