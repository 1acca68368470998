"""Scale validation + scaling evidence for the partial-update merge engine
(operators/partial_update.py) at 10^8 change events.

Two independent checks in one harness:

1. **Correctness at scale, through the cross-batch path**: the 10^8-event
   patch stream is folded as TWO epoch halves merged with the monoid
   ``merge_partial_states`` (NOT the one-shot fold), and the resulting
   visible state is cross-checked against a DuckDB oracle that computes
   the one-shot partial-update algebra independently from the identical
   ``range()``-derived stream — per-repo (rows, sum last_seq) over all
   2048 repos plus a sha256 tuple-hash sample (``last_seq % 997 = 0``),
   the same three-way evidence style as BENCH/validate_1e8.json.
2. **North-rule scaling**: the identical one-shot fold job at local[N] and
   local[4N] (fresh subprocess per run, ``ActiveProcessorCount`` pinned,
   interleaved rounds, median round is the headline — the exact
   methodology of bench/scaling.py, bandwidth profile).

The stream is synthesized from ``spark.range`` / DuckDB ``range`` with
identical modular arithmetic (no parquet intermediary needed): ~2.1M keys
(2048 repos x 1024 paths), ~48 events/key at 10^8 — inserts every 5th
event (every 10th-ending-in-5 insert clears lang), deletes every 20th,
patches carrying an id%4-chosen column subset otherwise.

Usage: python bench/partial_scale.py [--events 100000000] [--n 1]
       [--rounds 3] [--validate-cores 8] [--skip-scaling | --skip-validate]
Writes BENCH/partial_update_scale.json.
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench._common import n_core_jvm_env  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "partial_update_scale.json")

# portable stream synthesis — keep the Spark and DuckDB forms in lockstep
N_REPOS, N_PATHS = 2048, 1024

STREAM_SQL = """
  SELECT id AS seq,
         'repo_' || CAST(((id * 48271) % 100003) % {nr} AS VARCHAR) AS repo,
         'src/f_' || CAST(id % {np} AS VARCHAR) || '.py' AS path,
         CASE WHEN id % 20 = 19 THEN 'delete'
              WHEN id % 5 = 0 THEN 'insert'
              ELSE 'patch' END AS op,
         CASE WHEN id % 20 = 19 THEN NULL
              WHEN id % 5 = 0 OR id % 4 IN (0, 3) THEN 'c' || CAST(id AS VARCHAR) END AS commit,
         CASE WHEN id % 20 = 19 THEN NULL
              WHEN id % 5 = 0 AND id % 10 = 5 THEN NULL
              WHEN id % 5 = 0 OR id % 4 = 1 THEN 'l' || CAST(id % 11 AS VARCHAR) END AS lang,
         CASE WHEN id % 20 = 19 THEN NULL
              WHEN id % 5 = 0 OR id % 4 IN (2, 3)
                THEN 'v' || CAST(id AS VARCHAR) || ':' || CAST(id % 97 AS VARCHAR) END AS content
  FROM range({n}) t(id)
"""


def synth_stream(spark, n: int, parallelism: int):
    from pyspark.sql import functions as F

    d = spark.range(0, n, 1, parallelism)
    i = F.col("id")
    repo = F.concat(F.lit("repo_"), (((i * 48271) % 100003) % N_REPOS).cast("string"))
    path = F.concat(F.lit("src/f_"), (i % N_PATHS).cast("string"), F.lit(".py"))
    is_del, is_ins = i % 20 == 19, i % 5 == 0
    null_s = F.lit(None).cast("string")
    return d.select(
        i.alias("seq"),
        repo.alias("repo"),
        path.alias("path"),
        F.when(is_del, F.lit("delete")).when(is_ins, F.lit("insert")).otherwise(F.lit("patch")).alias("op"),
        F.when(is_del, null_s)
        .when(is_ins | (i % 4).isin(0, 3), F.concat(F.lit("c"), i.cast("string")))
        .alias("commit"),
        F.when(is_del | (is_ins & (i % 10 == 5)), null_s)
        .when(is_ins | (i % 4 == 1), F.concat(F.lit("l"), (i % 11).cast("string")))
        .alias("lang"),
        F.when(is_del, null_s)
        .when(
            is_ins | (i % 4).isin(2, 3),
            F.concat(F.lit("v"), i.cast("string"), F.lit(":"), (i % 97).cast("string")),
        )
        .alias("content"),
    )


def child_fold(events: int, cores: int, out_dir: str | None, store_batches: int = 0) -> None:
    """One fold job in THIS process (invoked as a fresh subprocess per
    measurement). out_dir=None -> timed noop sink (one-shot fold);
    out_dir set -> split + monoid-merge, visible state written to parquet;
    with store_batches > 0 -> drive PartialStateStore epoch-by-epoch (the
    operational exactly-once path) and write its visible state."""
    from pyspark.sql import functions as F

    from fao_elt_pipelines_spark.operators.partial_update import (
        fold_partial,
        merge_partial_states,
        partial_update_state,
        visible_partial,
    )
    from fao_elt_pipelines_spark.session import get_spark

    spark = get_spark("partial_scale", cores=cores, profile="bandwidth")
    ev = synth_stream(spark, events, parallelism=max(cores * 4, 16))
    if store_batches:
        from fao_elt_pipelines_spark.streaming.partial_state import PartialStateStore

        store = PartialStateStore(
            spark, os.path.join(os.path.dirname(out_dir), "store"), n_buckets=64
        )
        per = events // store_batches
        t0 = time.time()
        for b in range(store_batches):
            lo, hi = b * per, events if b == store_batches - 1 else (b + 1) * per
            store.apply_batch(ev.filter((F.col("seq") >= lo) & (F.col("seq") < hi)), b)
        store.visible().write.mode("overwrite").parquet(out_dir)
        wall = time.time() - t0
    elif out_dir is None:
        t0 = time.time()
        partial_update_state(ev).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
    else:
        mid = events // 2
        s1 = fold_partial(ev.filter(F.col("seq") < mid))
        s2 = fold_partial(ev.filter(F.col("seq") >= mid))
        state = visible_partial(merge_partial_states(s1, s2))
        t0 = time.time()
        state.write.mode("overwrite").parquet(out_dir)
        wall = time.time() - t0
    print(json.dumps({"wall_sec": round(wall, 2), "events_per_sec": round(events / wall, 1)}))
    spark.stop()


def run_child(events: int, cores: int, out_dir: str | None, store_batches: int = 0) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--_child",
           "--events", str(events), "--validate-cores", str(cores),
           "--store-batches", str(store_batches)]
    if out_dir:
        cmd += ["--_out", out_dir]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       env=n_core_jvm_env(cores))
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"child failed rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def validate(events: int, cores: int, state_dir: str) -> dict:
    import duckdb

    from fao_elt_pipelines_spark.plans.queries import partial_update_oracle_sql

    con = duckdb.connect()
    con.execute(f"SET threads={cores * 4}")
    stream = STREAM_SQL.format(n=events, nr=N_REPOS, np=N_PATHS)
    # the SAME oracle text the registry's cdc_partial_update runs — only
    # the stream CTE and the projection differ, so the harnesses can't drift
    oracle = partial_update_oracle_sql(
        stream, "repo, path, commit, lang, content, last_seq"
    )
    con.execute(f"CREATE TEMP TABLE s AS {oracle}")
    tup = (
        "repo || '|' || path || '|' || coalesce(commit, '~') || '|' "
        "|| coalesce(lang, '~') || '|' || coalesce(content, '~') || '|' "
        "|| CAST(last_seq AS VARCHAR)"
    )
    ora_repo = con.execute(
        "SELECT repo, count(*) AS rows, sum(last_seq) AS sum_seq FROM s GROUP BY repo ORDER BY repo"
    ).df()
    ora_sample = sorted(
        r[0] for r in con.execute(f"SELECT sha256({tup}) FROM s WHERE last_seq % 997 = 0").fetchall()
    )
    eng_repo = con.execute(
        f"""SELECT repo, count(*) AS rows, sum(last_seq) AS sum_seq
            FROM read_parquet('{state_dir}/*.parquet') GROUP BY repo ORDER BY repo"""
    ).df()
    eng_sample = sorted(
        r[0]
        for r in con.execute(
            f"""SELECT sha256({tup}) FROM read_parquet('{state_dir}/*.parquet')
                WHERE last_seq % 997 = 0"""
        ).fetchall()
    )
    state_rows = con.execute(
        f"SELECT count(*) FROM read_parquet('{state_dir}/*.parquet')"
    ).fetchone()[0]
    repo_match = (
        len(eng_repo) == len(ora_repo)
        and (eng_repo["repo"].values == ora_repo["repo"].values).all()
        and (eng_repo["rows"].astype(int).values == ora_repo["rows"].astype(int).values).all()
        and (eng_repo["sum_seq"].astype(int).values == ora_repo["sum_seq"].astype(int).values).all()
    )
    con.close()
    return {
        "state_rows": int(state_rows),
        "repos_compared": int(len(ora_repo)),
        "per_repo_match": bool(repo_match),
        "sample_rows": len(ora_sample),
        "sample_hash_match": eng_sample == ora_sample,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--n", type=int, default=1, help="small core level (large is 4N)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--validate-cores", type=int, default=8)
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--skip-validate", action="store_true")
    ap.add_argument(
        "--out",
        default=None,
        help="artifact path; defaults to BENCH/partial_update_scale.json only "
        "for full runs (both arms) — partial/smoke runs print without "
        "overwriting the recorded full-scale artifact unless --out is given",
    )
    ap.add_argument(
        "--store-batches",
        type=int,
        default=0,
        help="with N>0, the validation arm drives PartialStateStore over N "
        "epoch batches (the operational exactly-once path: bucket COW + "
        "hard-link carry-over + commit pointer per batch) instead of the "
        "bare split+merge fold; verified against the same oracle",
    )
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--_out", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child:
        child_fold(args.events, args.validate_cores, args._out, args.store_batches)
        return

    out: dict = {"metric": "partial_update_scale", "events": args.events}

    if not args.skip_validate:
        workdir = tempfile.mkdtemp(prefix="partial_scale_")
        atexit.register(shutil.rmtree, workdir, ignore_errors=True)
        state_dir = os.path.join(workdir, "state")
        t0 = time.time()
        fold = run_child(args.events, args.validate_cores, state_dir, args.store_batches)
        out["validate"] = {
            "mode": (
                f"PartialStateStore x{args.store_batches} exactly-once batches"
                if args.store_batches
                else "split-halves + monoid merge (cross-batch path)"
            ),
            "cores": args.validate_cores,
            "fold_wall_sec": fold["wall_sec"],
            "fold_events_per_sec": fold["events_per_sec"],
            **validate(args.events, args.validate_cores, state_dir),
            "end_to_end_wall_sec": round(time.time() - t0, 1),
        }
        out["validate"]["pass"] = (
            out["validate"]["per_repo_match"] and out["validate"]["sample_hash_match"]
        )

    if not args.skip_scaling:
        rounds = []
        for _ in range(args.rounds):
            lo = run_child(args.events, args.n, None)
            hi = run_child(args.events, args.n * 4, None)
            rounds.append(
                {
                    "N": {"cores": args.n, **lo},
                    "4N": {"cores": args.n * 4, **hi},
                    "efficiency": round(
                        hi["events_per_sec"] / lo["events_per_sec"] / 4, 3
                    ),
                }
            )
            print(json.dumps(rounds[-1]), file=sys.stderr)
        effs = sorted(r["efficiency"] for r in rounds)
        out["scaling"] = {
            "methodology": "identical one-shot fold at local[N] vs local[4N], "
            "fresh JVM + ActiveProcessorCount per run, interleaved rounds, "
            "median round; bandwidth profile (bench/scaling.py methodology)",
            "N_cores": args.n,
            "4N_cores": args.n * 4,
            "efficiency_rounds": [r["efficiency"] for r in rounds],
            "efficiency": statistics.median(effs),
            "pass": statistics.median(effs) >= 0.8,
            "rounds": rounds,
        }

    # top-level pass = every arm that ran passed (bench/scaling.py's >=0.8
    # criterion for the scaling arm, exact state match for validation)
    arms = [a["pass"] for a in (out.get("validate"), out.get("scaling")) if a is not None]
    out["pass"] = bool(arms) and all(arms)

    dest = args.out or (OUT if not (args.skip_scaling or args.skip_validate) else None)
    if dest:
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
