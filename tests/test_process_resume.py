"""Process-level crash-resume: SIGKILL the spark-submit replay job
mid-replay, rerun it, and require the final table state to be byte-identical
to an uninterrupted control run (the north rule's 'restarting mid-replay
without duplicate or lost applies', proven at the process boundary rather
than with an injected in-process exception)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "scripts", "replay_job.py")

EVENTS = 60_000
EPOCHS = 12


def _cmd(binlog, table, ckpt, *extra):
    return [
        sys.executable, JOB,
        "--binlog", binlog, "--table", table, "--checkpoint", ckpt,
        "--generate", str(EVENTS),
        "--events-per-epoch", str(EVENTS // EPOCHS),
        "--n-repos", "100", "--n-buckets", "8", "--cores", "4",
        *extra,
    ]


def _state_sha_set(spark, table_path):
    from fao_elt_pipelines_spark.lake.table import LakeTable

    rows = LakeTable(spark, table_path).read().select(
        "repo", "path", "content_sha256", "last_seq"
    ).collect()
    return {tuple(r) for r in rows}


@pytest.mark.slow
@pytest.mark.parametrize(
    "extra",
    [[], ["--wap", "--wap-min-rows", "1", "--wap-max-quarantine-ratio", "0.5"]],
    ids=["plain", "wap"],
)
def test_kill9_resume_matches_uninterrupted(spark, tmp_path, extra):
    """kill -9 at an arbitrary commit point; with WAP, the kill can land
    between a staging commit and its publish — resume must re-stage the
    unpublished epoch and still converge bit-identically."""
    binlog = str(tmp_path / "binlog")
    ckpt_a, table_a = str(tmp_path / "a.json"), str(tmp_path / "a_state")
    ckpt_b, table_b = str(tmp_path / "b.json"), str(tmp_path / "b_state")

    # control: uninterrupted run
    out = subprocess.run(
        _cmd(binlog, table_a, ckpt_a, *extra), capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    control = json.loads(out.stdout.strip().splitlines()[-1])
    assert control["epochs_applied"] == list(range(EPOCHS))

    # victim: same binlog, kill -9 once >= 2 merge versions are committed
    proc = subprocess.Popen(
        _cmd(binlog, table_b, ckpt_b, *extra),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    version_file = os.path.join(table_b, "metadata", "VERSION")
    deadline = time.time() + 300
    killed = False
    # WAP spends 3 metadata versions per epoch (branch reset, staged
    # merge, publish): v4 is the first point where >= 1 epoch is
    # guaranteed PUBLISHED, so the survived-epoch assertion below holds
    kill_at = 4 if extra else 2
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — resume run must no-op
        try:
            with open(version_file) as f:
                if int(f.read().strip()) >= kill_at:
                    os.kill(proc.pid, signal.SIGKILL)
                    proc.wait(timeout=30)
                    killed = True
                    break
        except (FileNotFoundError, ValueError):
            pass
        time.sleep(0.05)

    # resume: identical command converges without duplicate/lost applies
    out2 = subprocess.run(
        _cmd(binlog, table_b, ckpt_b, *extra), capture_output=True, text=True, timeout=600
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    resumed = json.loads(out2.stdout.strip().splitlines()[-1])
    applied_twice = set(resumed["epochs_applied"]) & set(resumed["epochs_skipped"])
    assert not applied_twice
    if killed:
        # at least one epoch survived the crash and was NOT re-applied
        assert resumed["epochs_applied"] != list(range(EPOCHS))

    assert resumed["state_rows"] == control["state_rows"]
    assert resumed["max_seq"] == control["max_seq"]
    assert _state_sha_set(spark, table_b) == _state_sha_set(spark, table_a)


def test_table_tool_cli(spark, tmp_path):
    """The ops CLI must describe, compact, and read a real table."""
    binlog = str(tmp_path / "b")
    table = str(tmp_path / "t")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "replay_job.py"),
         "--binlog", binlog, "--table", table, "--checkpoint", str(tmp_path / "c.json"),
         "--generate", "20000", "--events-per-epoch", "10000",
         "--n-repos", "20", "--n-buckets", "4", "--cores", "4", "--mode", "mor",
         # pin per-epoch commits: the assertions below address specific
         # snapshot ids, which the job-default auto batching policy
         # would legitimately collapse into one grouped commit
         "--epoch-batch", "1"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-1500:]

    def tool(*args):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "table_tool.py"),
             "--table", table, *args],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        return r.stdout.strip().splitlines()

    desc = json.loads(tool("describe")[-1])
    assert desc["committed_epochs"] == [0, 1] and desc["rows"] > 0
    assert json.loads(tool("compact")[-1])["compacted_snapshot_id"] == 3
    hist = json.loads(tool("history")[-1])
    assert [s["operation"] for s in hist] == ["merge", "merge", "compact"]
    rows = [json.loads(l) for l in tool("read", "--limit", "3") if l.startswith("{")]
    assert len(rows) == 3 and all("content_sha256" in r for r in rows)
    hit = [
        json.loads(l)
        for l in tool("lookup", "--repo", rows[0]["repo"], "--path", rows[0]["path"])
        if l.startswith("{")
    ]
    assert len(hit) == 1 and hit[0]["content_sha256"] == rows[0]["content_sha256"]

    # refs surface: tag a cut, branch + publish a no-op fast-forward, GC
    assert json.loads(tool("tag", "cut-v1", "--at-snapshot", "2")[-1])["snapshot_id"] == 2
    tagged = [json.loads(l) for l in tool("read", "--ref", "cut-v1", "--limit", "2") if l.startswith("{")]
    assert len(tagged) == 2
    assert json.loads(tool("branch", "staging")[-1])["type"] == "branch"
    assert json.loads(tool("publish", "staging")[-1])["published_snapshot_id"] == 3
    assert json.loads(tool("drop-ref", "cut-v1")[-1])["dropped"] == "cut-v1"
    gc = json.loads(tool("orphans", "--older-than-hours", "24")[-1])
    assert gc == {"data_files": 0, "manifest_files": 0,
                  "bloom_sidecars": 0}  # nothing uncommitted
    assert set(json.loads(tool("describe")[-1])["refs"]) == {"main"}
    chk = json.loads(tool("check")[-1])
    assert chk["ok"] and chk["files_checked"] > 0 and chk["issues"] == []


@pytest.mark.slow
@pytest.mark.parametrize("extra", [[], ["--wap"]], ids=["plain", "wap"])
def test_dual_writer_convergence(spark, tmp_path, extra):
    """Two concurrent replay PROCESSES on the SAME table (a zombie/dual
    applier — the failure mode optimistic CAS commits exist for): each
    loser of a version race dies with a ConflictError and is simply
    rerun (the documented recovery), and the table must converge to the
    exact single-writer state — every epoch applied once, none lost,
    none doubled (committed-epoch skip + version pinning at commit).
    The WAP arm adds branch resets and publish fast-forwards to the
    contended CAS stream; wap_merge's retry loop absorbs what it can and
    the rerun covers the rest."""
    binlog = str(tmp_path / "binlog")
    ckpt_s, table_s = str(tmp_path / "s.json"), str(tmp_path / "s_state")

    # single-writer control (also generates the shared binlog)
    out = subprocess.run(
        _cmd(binlog, table_s, ckpt_s, *extra), capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr[-2000:]
    control = json.loads(out.stdout.strip().splitlines()[-1])

    # dual writers: same table dir, independent checkpoints
    table_d = str(tmp_path / "d_state")
    cmds = [
        _cmd(binlog, table_d, str(tmp_path / f"w{i}.json"), *extra) for i in (1, 2)
    ]
    procs = [
        subprocess.Popen(c, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for c in cmds
    ]
    results = [p.communicate(timeout=600) for p in procs]
    rcs = [p.returncode for p in procs]

    # rerun any conflict loser until clean (bounded; each pass can only
    # shrink the pending set because committed epochs are skipped)
    for i in (0, 1):
        tries = 0
        while rcs[i] != 0 and tries < 6:
            # plain: CommitConflictError; WAP adds PublishConflictError
            # (subclass, name matches) from the contended fast-forward
            assert "ConflictError" in results[i][1], results[i][1][-2000:]
            out_i = subprocess.run(cmds[i], capture_output=True, text=True, timeout=600)
            rcs[i], results[i] = out_i.returncode, (out_i.stdout, out_i.stderr)
            tries += 1
        assert rcs[i] == 0, results[i][1][-2000:]

    final = json.loads(results[0][0].strip().splitlines()[-1])
    assert final["state_rows"] == control["state_rows"]
    assert final["max_seq"] == control["max_seq"]
    assert _state_sha_set(spark, table_d) == _state_sha_set(spark, table_s)
