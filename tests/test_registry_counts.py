"""Drift guard: the registry counts quoted in README.md must match the
actual registry (r5 VERDICT: the hand-edited counts drifted off by one).
Any change to queries()/oracle_sql() that forgets to update the README
fails here with the real numbers in the message."""

import re

import __spark_entry__ as entry_mod


def test_readme_counts_match_registry():
    nq = len(entry_mod.queries())
    no = len(entry_mod.oracle_sql())
    readme = open("README.md").read()
    assert f"(flagship), {nq}" in readme, (
        f"README queries() count != {nq} (update README.md)"
    )
    assert f"{no} paired with a DuckDB" in readme, (
        f"README oracle count != {no} (update README.md)"
    )
    assert f"{nq - no} rows-only" in readme, (
        f"README rows-only count != {nq - no} (update README.md)"
    )
    assert f"entry smoke + {no} oracle comparisons" in readme


def test_plans_head_counts_match_registry():
    """r10 VERDICT item 6: PLANS.md's certification counts went stale
    within a round while README's guarded counts did not — so the
    'Registry at HEAD' line in PLANS.md is now pinned the same way."""
    nq = len(entry_mod.queries())
    no = len(entry_mod.oracle_sql())
    plans = open("PLANS.md").read()
    want = (
        f"Registry at HEAD: {nq} entries ({no} oracle-backed + "
        f"{nq - no} rows-only)."
    )
    assert want in plans, (
        f"PLANS.md 'Registry at HEAD' line != registry ({nq} entries, "
        f"{no} oracle-backed, {nq - no} rows-only) — update the line"
    )


def test_driver_window_matches_pin():
    """r12 VERDICT item 2: the r13 window pin was stated inconsistently
    between the registry comments (23+15) and PLANS.md (22+16). The pin
    is now a module constant; this guard fails loudly if the implemented
    dict order, the pin, or the oracle-backing invariant ever diverge."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    window = list(q)[:50]
    plan = entry_mod.DRIVER_WINDOW_PLAN
    assert len(plan) == 50, f"pin must list exactly 50 slots, got {len(plan)}"
    assert window == plan, (
        "queries() dict order diverged from DRIVER_WINDOW_PLAN:\n"
        f"  dict[:50] = {window}\n  pin       = {plan}"
    )
    assert plan[:12] == entry_mod.DRIVER_WINDOW_ANCHORS
    not_backed = [k for k in window if k not in o]
    assert not not_backed, (
        f"window slots without an oracle (all-slots-oracle-backed "
        f"invariant): {not_backed}"
    )


def test_parked_oracle_entries_all_attested():
    """Rotation safety net (r13): the never-attested-first invariant
    means an oracle-backed entry may only sit PAST the 50-slot driver
    window if some prior round's driver run already attested it green
    (rows+schema+hash, no err). A rotation that parks a never-attested
    entry silently drops it from the attestation frontier — fail loudly
    with the names instead."""
    import glob
    import json
    import os

    # Anchor the glob at the repo root (ADVICE r13: a CWD-relative glob
    # run from outside the repo finds nothing and fails misleadingly).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green = set()
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                green.add(name)
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    parked = [k for k in list(q)[50:] if k in o]
    missing = [k for k in parked if k not in green]
    assert not missing, (
        f"oracle-backed entries parked past slot 50 with NO green driver "
        f"row in any CORRECTNESS_r*.json: {missing}"
    )


def test_every_oracle_has_a_query():
    q = entry_mod.queries()
    extra = [k for k in entry_mod.oracle_sql() if k not in q]
    assert not extra, f"oracle_sql() keys without queries(): {extra}"


def test_every_registry_entry_in_operators_md():
    """r6 VERDICT item 6: extend the drift guard to OPERATORS.md — a
    registry entry with no OPERATORS.md row means the per-round
    inventory silently drifted. Every queries() key must appear as a
    word in OPERATORS.md (either a 🧪 marker on its operator's row or
    the warehouse-breadth inventory table)."""
    ops = open("OPERATORS.md").read()
    missing = [
        k for k in entry_mod.queries()
        if not re.search(r"\b" + re.escape(k) + r"\b", ops)
    ]
    assert not missing, (
        f"registry entries with no OPERATORS.md row: {missing}"
    )


def test_every_public_operator_in_operators_md():
    """r8 VERDICT item 3: the module->docs direction the old guards
    missed (unigram_jsd shipped as dead code because nothing checked
    it). Every public top-level function in operators/*.py that is
    annotated to return a DataFrame must appear by name in OPERATORS.md
    — landing an operator without documenting/registering it fails
    here."""
    import ast
    import glob

    ops = open("OPERATORS.md").read()
    missing = []
    for path in sorted(glob.glob("indexlab_spark/operators/*.py")):
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if not isinstance(node, ast.FunctionDef):
                continue
            if node.name.startswith("_"):
                continue
            ret = node.returns
            returns_df = (
                isinstance(ret, ast.Name) and ret.id == "DataFrame"
            ) or (
                isinstance(ret, ast.Constant) and ret.value == "DataFrame"
            )
            if not returns_df:
                continue
            if not re.search(r"\b" + re.escape(node.name) + r"\b", ops):
                missing.append(f"{path}:{node.name}")
    assert not missing, (
        f"public DataFrame operators with no OPERATORS.md row: {missing}"
    )


def test_no_shadowed_definitions_in_modules():
    """r9 incident guard: a SECOND top-level def with an existing name
    (appended at the end of a module) silently shadows the original —
    the docs/registry guards can't see it because the name is still
    documented. Fail on any duplicate top-level function name in the
    operator, streaming, functions, and sources modules."""
    import ast
    import glob
    from collections import Counter

    paths = sorted(
        glob.glob("indexlab_spark/operators/*.py")
        + glob.glob("indexlab_spark/streaming/*.py")
        + glob.glob("indexlab_spark/functions/*.py")
        + glob.glob("indexlab_spark/sources/*.py")
    )
    offenders = []
    for path in paths:
        tree = ast.parse(open(path).read())
        names = Counter(
            node.name
            for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
        )
        offenders.extend(
            f"{path}:{name} (x{c})" for name, c in names.items() if c > 1
        )
    assert not offenders, (
        f"shadowed top-level definitions: {offenders}"
    )
