"""Float-parity regression net at the bench SF (r14 VERDICT item 6).

The r14 sf0.1 oracle sweep surfaced six latent SCALE-DEPENDENT parity
flaps the sf0.01 gate could never hit (catastrophic cancellation at
~5e7 magnitudes, HUGEINT round overflow, ulp-flipped top-n cuts, theta
saturation, 6dp-half-boundary decimal rationals, double rounding).
Their fixes embed scale-dependent contracts — 2dp SSE quanta, 9dp rank
keys, k=32768 theta, scaled-floor mmr, both-stage pagerank replay —
that only BITE at sf0.1-sized inputs. This net replays exactly those
six entries at sf0.1 through the sim harness (same canon: columns
sorted by name, rows sorted, floats 6dp) so a future operator touch
cannot silently re-open them without running the full sweep.

Marked slow (deselect with -m 'not slow'); run by the default suite and
by tools/round_close.py."""

import importlib.util
import os

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01_DIR = "/root/testdata/sf0.1"

# The six r14 parity-fixed entries (PLANS.md 'sf0.1 oracle certification'
# table) — each name pins the contract its fix introduced.
PARITY_FIXED = [
    "gini_customers",     # oracle: exact integer cents sum, no HUGEINT round
    "amoc_revenue",       # r16: exact scaled-integer prefixes (bit-exact)
    "unigram_jsd",        # 9dp quantized rank key before the top-10 cut
    "theta_users",        # k=32768 keeps sf0.1 below sketch saturation
    "mmr_embeddings",     # floor(x*1e6+0.5)/1e6 output on both sides
    "pagerank_parts",     # oracle replays BOTH quantization stages
]


def _load_sim():
    spec = importlib.util.spec_from_file_location(
        "driver_sim_for_tests", os.path.join(REPO_ROOT, "tools", "driver_sim.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sf01_oracle_con():
    if not os.path.isdir(SF01_DIR):
        pytest.skip(f"{SF01_DIR} not present")
    sim = _load_sim()
    con = duckdb.connect()
    for t in sim.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.slow
@pytest.mark.parametrize("name", PARITY_FIXED)
def test_parity_fixed_entry_hash_green_at_sf01(spark, sf01_oracle_con, name):
    import __spark_entry__ as entry_mod

    sim = _load_sim()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert name in qs and name in oracles, f"{name} left the registry"

    s_vals, s_cols = sim.canon(qs[name](spark, SF01_DIR).toPandas())
    o_vals, o_cols = sim.canon(sf01_oracle_con.execute(oracles[name]).fetchdf())

    assert s_cols == o_cols, f"{name}: schema {s_cols} vs {o_cols}"
    assert len(s_vals) == len(o_vals), (
        f"{name}: rowcount {len(s_vals)} vs {len(o_vals)}"
    )
    diffs = [(a, b) for a, b in zip(s_vals, o_vals) if a != b]
    assert not diffs, (
        f"{name}: {len(diffs)}/{len(s_vals)} rows differ at sf0.1; first: "
        f"spark={diffs[0][0]} duck={diffs[0][1]}"
    )
