"""Wall-clock A/B for per-file Bloom pruning (lake/bloom.py): a POINT
lookup on a specific commit hash through scan_where, with vs without the
bloom sidecar, at a scale where each bucket holds many files.

The probed column is ``commit`` — the "which row carries this commit
hash" provenance lookup a CDC lake serves constantly. Hash values are
uniformly distributed, so every file's [min, max] straddles every key
(and commit bounds aren't recorded anyway): the min/max-only scan reads
every file in every bucket, while the bloom keeps the one file that
truly contains it plus FPR noise. m_bits is sized at ~16-19 bits per
distinct key per file (files ~1.7k rows here → 32768 bits = 4 KiB/file,
FPR ~4e-4). Exactness is asserted against a full-scan filter per arm.

Prints one JSON line; recorded as BENCH/bloom_scan_ab.json.

Usage: python bench/bloom_ab.py [--events 5000000]
"""

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fao_elt_pipelines_spark import binlog  # noqa: E402
from fao_elt_pipelines_spark.lake.table import LakeTable  # noqa: E402
from fao_elt_pipelines_spark.session import get_spark  # noqa: E402
from scripts.replay_job import STATE_SCHEMA  # noqa: E402


def timed(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    args = ap.parse_args()

    spark = get_spark("bloom_ab", cores=32, shuffle_partitions=32)
    d = tempfile.mkdtemp(dir="/tmp")
    ev = binlog.change_events(
        spark,
        args.events,
        n_repos=2000,
        paths_per_repo=400,
        events_per_epoch=args.events,
        num_partitions=64,
    )
    t = LakeTable.create(spark, f"{d}/t", STATE_SCHEMA, n_buckets=16)
    t.merge_changes(ev, epoch_id=0)
    state_rows = sum(e["rows"] for e in t.current_snapshot()["manifest"])
    # linear repo order: path interleaves arbitrarily within every file
    t.cluster(["repo"], strategy="linear", max_records_per_file=state_rows // 256)
    probe_key = (
        t.read().filter(F.col("path").startswith("src/dir_7/file_247."))
        .select("commit").first()["commit"]
    )
    bounds = {"commit": (probe_key, probe_key)}

    out = {}
    for arm in ("minmax_only", "bloom"):
        if arm == "bloom":
            t0 = time.time()
            n_rows = t.build_blooms(["commit"], m_bits=32768)
            out["bloom_build_sec"] = round(time.time() - t0, 2)
            out["bloom_rows"] = n_rows
        _, pruned, total = t.scan_where(bounds, with_stats=True)
        scan = timed(
            lambda: t.scan_where(bounds).write.mode("overwrite").format("noop").save()
        )
        rows_match = (
            sorted(map(tuple, t.scan_where(bounds).collect()))
            == sorted(
                map(tuple, t.read().filter(F.col("commit") == probe_key).collect())
            )
        )
        out[arm] = {
            "files_total": total,
            "files_kept": total - pruned,
            "scan_sec": round(scan, 3),
            "rows_match": rows_match,
        }
    out["speedup"] = round(
        out["minmax_only"]["scan_sec"] / out["bloom"]["scan_sec"], 2
    )

    # distributed grep: a seq-specific identifier token lives in exactly
    # one row's content; full-scan tokenized filter vs token-bloom prune
    from fao_elt_pipelines_spark.lake.bloom import TOKEN_SEP

    t0 = time.time()
    t.build_blooms(["content"], m_bits=1 << 17, mode="tokens")
    grep_build = round(time.time() - t0, 2)
    token = str(
        t.read().select("last_seq").orderBy(F.desc("last_seq")).first()["last_seq"]
    )
    _, g_pruned, g_total = t.scan_contains("content", token, with_stats=True)
    g_scan = timed(
        lambda: t.scan_contains("content", token)
        .write.mode("overwrite").format("noop").save()
    )
    full = timed(
        lambda: t.read()
        .filter(F.array_contains(F.split(F.col("content"), TOKEN_SEP), token))
        .write.mode("overwrite").format("noop").save()
    )
    g_match = sorted(map(tuple, t.scan_contains("content", token).collect())) == sorted(
        map(
            tuple,
            t.read()
            .filter(F.array_contains(F.split(F.col("content"), TOKEN_SEP), token))
            .collect(),
        )
    )
    out["token_grep"] = {
        "build_sec": grep_build,
        "files_total": g_total,
        "files_kept": g_total - g_pruned,
        "grep_sec": round(g_scan, 3),
        "full_scan_sec": round(full, 3),
        "speedup": round(full / g_scan, 2),
        "rows_match": g_match,
    }
    res = {
        "metric": "bloom_scan_ab",
        "events": args.events,
        "state_rows": state_rows,
        "n_buckets": 16,
        "predicate": "commit = <sha1> (point provenance lookup)",
        **out,
    }
    print(json.dumps(res))
    shutil.rmtree(d)


if __name__ == "__main__":
    main()
