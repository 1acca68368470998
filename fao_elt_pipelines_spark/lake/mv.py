"""Incrementally-maintained aggregate view over a :class:`LakeTable`.

The capstone consumer of the table's CDC surface: a gold-layer aggregate
(per-repo live-path counts / byte totals) kept current by reading ONLY the
change interval since the last refresh, instead of re-scanning the table.
This replaces the reference's full-recompute dbt aggregate models
(``/root/reference/dbt/models/marts``) with classic delta-based
incremental view maintenance:

    new_agg(repo) = old_agg(repo) − contrib(before-image of changed keys)
                                  + contrib(after-image of changed keys)

Cost per refresh at 10^10-row scale:

- changed keys come from ``changes_between`` — O(files the interval
  added), no shuffle;
- before/after images are read at the cursor / head snapshots via
  time travel, pruned three ways: to the TOUCHED BUCKETS (manifest
  entries of the interval carry bucket ids), to the files whose
  manifest repo-bounds intersect the changed-repo set, and — for a
  bounded changed-repo set — by a literal ``repo IN (...)`` predicate
  that reaches parquet row-group stats AND passes through the MOR
  read-merge aggregate, so the LWW merge runs over ~interval-sized
  input rather than the touched buckets' full contents;
- when the interval rewrote ≥30% of the table, refresh auto-falls-back
  to a full recompute (cheaper than restricted images of two
  snapshots) — decided from manifest row counts alone;
- the view state itself is O(distinct repos), rewritten atomically per
  refresh (tiny compared to the base table).

Only decomposable aggregates (SUM/COUNT) are maintained incrementally —
MIN/MAX are not retractable under deletes without keeping per-key state,
which is exactly the base table itself; consumers needing them do a full
recompute (``refresh(full=True)``).

Crash safety mirrors the table's commit protocol: state parquet is
written to a fresh versioned directory first, then the cursor JSON
(snapshot id + state version) is swapped in with ``os.replace`` — a
crash mid-refresh leaves the old cursor pointing at the old state, and
the next refresh redoes the interval idempotently.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import LakeTable

KEYS = ("repo", "path")


def _any_repo_in_bounds(entry: dict[str, Any], repos_sorted: list[str]) -> bool:
    """Manifest-level file prune: does the file's [min, max] repo range
    contain ANY changed repo? Conservative (no stats → keep). Binary
    search keeps the driver-side walk O(files · log repos)."""
    import bisect

    rng = (entry.get("stats") or {}).get("repo")
    if not rng:
        return True
    i = bisect.bisect_left(repos_sorted, rng[0])
    return i < len(repos_sorted) and repos_sorted[i] <= rng[1]


def _contrib(df: DataFrame) -> DataFrame:
    """Decomposable per-repo contributions of a set of live rows."""
    return df.groupBy("repo").agg(
        F.count("*").alias("n_paths"),
        F.sum(F.length(F.coalesce(F.col("content"), F.lit("")))).alias("total_bytes"),
    )


class IncrementalGoldView:
    #: interval rows ≥ this fraction of table rows → full recompute is
    #: cheaper than reading restricted images of two snapshots
    FULL_FALLBACK_RATIO = 0.3
    #: changed-repo cap for the driver-collected InSet pushdown; above it
    #: the collect itself would dominate and the plain semi-join wins
    MAX_PUSHDOWN_REPOS = 20_000

    def __init__(self, spark: SparkSession, table: LakeTable, state_dir: str):
        self.spark = spark
        self.table = table
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # ---------------------------------------------------------------- state
    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.state_dir, "cursor.json")

    def cursor(self) -> dict[str, Any] | None:
        try:
            with open(self._cursor_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame:
        """Current view contents: (repo, n_paths, total_bytes)."""
        cur = self.cursor()
        if cur is None:
            return self.spark.createDataFrame(
                [], "repo string, n_paths bigint, total_bytes bigint"
            )
        return self.spark.read.parquet(os.path.join(self.state_dir, f"v{cur['version']}"))

    def _commit_state(self, df: DataFrame, to_sid: int) -> None:
        cur = self.cursor()
        version = (cur["version"] + 1) if cur else 0
        out = os.path.join(self.state_dir, f"v{version}")
        # single small file: the state is O(repos); coalesce(1) keeps the
        # view readable as one footer without a shuffle of consequence
        df.coalesce(1).write.mode("overwrite").parquet(out)
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": to_sid, "version": version}, f)
        os.replace(tmp, self._cursor_path)
        # GC superseded state versions (cursor no longer references them)
        for d in os.listdir(self.state_dir):
            if d.startswith("v") and d != f"v{version}":
                shutil.rmtree(os.path.join(self.state_dir, d), ignore_errors=True)

    # -------------------------------------------------------------- refresh
    def refresh(self, full: bool = False) -> dict[str, Any]:
        """Bring the view up to the table's current snapshot.

        First call (or ``full=True``) computes from a full table scan;
        subsequent calls apply the delta algebra over the change interval
        only. Returns a small metrics dict (mode, interval, buckets read).
        """
        snap = self.table.current_snapshot()
        to_sid = snap["snapshot_id"] if snap else None
        cur = self.cursor()
        if to_sid is None:
            return {"mode": "noop", "reason": "empty table"}
        if cur is None or full:
            self._commit_state(_contrib(self.table.read()), to_sid)
            return {"mode": "full", "to": to_sid}
        if cur["snapshot_id"] == to_sid:
            return {"mode": "noop", "from": to_sid, "to": to_sid}

        from_sid = cur["snapshot_id"]
        try:
            entries = self.table._changes_entries(from_sid, to_sid)
        except ValueError:
            # cursor predates every retained snapshot (expire_snapshots ran
            # past it): the interval is unreconstructable, so fall back to
            # a full recompute instead of wedging the view forever
            self._commit_state(_contrib(self.table.read()), to_sid)
            return {"mode": "full", "to": to_sid, "reason": "cursor expired"}
        if not entries:
            self._commit_state(self.read(), to_sid)  # advance cursor only
            return {"mode": "noop", "from": from_sid, "to": to_sid}

        # When the interval rewrote a large fraction of the table, the
        # delta algebra costs MORE than recomputing (it reads restricted
        # images of TWO snapshots): recompute instead. Decision is made
        # from manifest row counts alone — no data IO.
        interval_rows = sum(e["rows"] for e in entries)
        table_rows = max(1, sum(e["rows"] for e in snap["manifest"]))
        if interval_rows >= self.FULL_FALLBACK_RATIO * table_rows:
            self._commit_state(_contrib(self.table.read()), to_sid)
            return {"mode": "full", "to": to_sid, "reason": "large interval"}
        touched = {e["bucket"] for e in entries}

        # changed keys: superset is fine (unchanged keys cancel in the
        # before/after algebra), so raw change rows need only the key cols
        keys = (
            self.table._read_entries(entries, include_tombstones=True, merged=False)
            .select(*KEYS)
            .distinct()
        )
        # For a bounded changed-repo set, turn the key set into a literal
        # InSet predicate: it reaches the parquet scan (row-group stats
        # pruning over key-sorted files) AND passes through the MOR
        # read-merge aggregate (filter on a grouping key), so the LWW
        # merge runs over ~interval-sized input instead of the touched
        # buckets' full contents. Above the cap the driver-side collect
        # would be the bottleneck — rely on the plain semi-join (AQE picks
        # broadcast vs shuffle from the actual key count).
        repos = [
            r["repo"]
            for r in keys.select("repo")
            .distinct()
            .limit(self.MAX_PUSHDOWN_REPOS + 1)
            .collect()
        ]
        pred = None
        repos_sorted = None
        if len(repos) <= self.MAX_PUSHDOWN_REPOS:
            pred = F.col("repo").isin(repos)
            repos_sorted = sorted(repos)
        old_snap = next(
            s for s in self.table.snapshots() if s["snapshot_id"] == from_sid
        )

        def image(s: dict[str, Any]) -> DataFrame:
            es = [e for e in s["manifest"] if e["bucket"] in touched]
            if repos_sorted is not None:
                es = [e for e in es if _any_repo_in_bounds(e, repos_sorted)]
            df = self.table._read_entries(es)
            if pred is not None:
                df = df.filter(pred)
            # Join strategy stays with Catalyst/AQE: a small interval's
            # key set broadcasts on its own; a huge one must NOT be
            # force-broadcast.
            return df.join(keys, list(KEYS), "left_semi")

        before = image(old_snap)
        after = image(snap)
        delta = (
            _contrib(after)
            .withColumnRenamed("n_paths", "a_n")
            .withColumnRenamed("total_bytes", "a_b")
            .join(
                _contrib(before)
                .withColumnRenamed("n_paths", "b_n")
                .withColumnRenamed("total_bytes", "b_b"),
                ["repo"],
                "full_outer",
            )
        )
        z = F.lit(0).cast("long")
        merged = (
            self.read()
            .join(delta, ["repo"], "full_outer")
            .select(
                "repo",
                (
                    F.coalesce("n_paths", z) + F.coalesce("a_n", z) - F.coalesce("b_n", z)
                ).alias("n_paths"),
                (
                    F.coalesce("total_bytes", z)
                    + F.coalesce("a_b", z)
                    - F.coalesce("b_b", z)
                ).alias("total_bytes"),
            )
            .filter(F.col("n_paths") > 0)
        )
        self._commit_state(merged, to_sid)
        return {
            "mode": "incremental",
            "from": from_sid,
            "to": to_sid,
            "touched_buckets": len(touched),
            "n_buckets": self.table._load_metadata()["n_buckets"],
        }
