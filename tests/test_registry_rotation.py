"""Self-enforcing invariants for the registry's driver-cap rotation.

The round driver's CORRECTNESS check verifies only the FIRST 50 registry
entries (iteration order). plans/registry.py manages that cap with an
explicit policy (see its docstring): never-driver-verified or changed
entries lead; only entries with a past triple-green driver row may sit in
the overflow tail. These tests make the policy mechanical — a future
entry added carelessly (pushing a never-verified name past position 50,
or parking a name with no historical green row in the tail) fails CI
instead of silently shipping without driver evidence.
"""

import glob
import json
import os

from fao_elt_pipelines_spark.plans.registry import (
    REGISTRY,
    _MIDDLE,
    _ROTATION_TAIL,
    _VERIFY_FIRST,
)

DRIVER_CAP = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_verify_first_and_middle_fill_the_cap_exactly():
    """Everything not in the tail must be driver-checked this round:
    verify-first + middle == the 50-entry cap, so position 51+ is
    exactly the managed tail and nothing else."""
    in_cap = len(_VERIFY_FIRST) + len(_MIDDLE)
    assert in_cap == DRIVER_CAP, (
        f"{in_cap} entries ahead of the tail but the driver verifies "
        f"{DRIVER_CAP}; rotate {in_cap - DRIVER_CAP} stable entr(ies) "
        "into _ROTATION_TAIL (with a documented rationale) or pull some "
        "back in"
    )
    names = list(REGISTRY)
    assert names[:DRIVER_CAP] == [*_VERIFY_FIRST, *_MIDDLE]
    assert names[DRIVER_CAP:] == _ROTATION_TAIL


def test_every_tail_entry_has_a_past_driver_green_row():
    """A tail seat requires a triple-green (rows+schema+hash) row in some
    committed CORRECTNESS_r*.json — an entry the driver has NEVER
    verified may not rotate out."""
    greens: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and row.get("err") is None
                ):
                    greens.add(name)
    never_verified = [n for n in _ROTATION_TAIL if n not in greens]
    assert not never_verified, (
        f"tail entries with no historical driver-green row: {never_verified}"
    )


def test_tail_entries_all_exist_and_have_oracles():
    """Tail names must be real registry entries, and each keeps its oracle
    SQL so the in-repo differential (test_entry_oracle) still pins it
    every run while it sits out a driver round."""
    for n in _ROTATION_TAIL:
        assert n in REGISTRY
        assert REGISTRY[n][1] is not None, f"{n} lost its oracle SQL"
