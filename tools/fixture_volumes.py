"""Pinned driver-fixture cardinalities — the single source for the
§26b input-volume gates (SCALE.md §27).

The driver fixtures (TESTDATA.md, seed=42) are deterministic and
read-only, so these are CONSTANTS, not snapshots. Consumers:

- ``bench.py`` — pins every table count during the per-session
  warm-up (the count is already computed there; the pin is free), so
  a truncated fixture fails the invocation loudly instead of
  producing a silently-fast record;
- ``tools/scale_stress.py`` — pins the exponent tier's x-axis row
  counts at sf0.01/sf0.1 (scratch_sf1 is pinned transitively via
  ``assert_replica_volume``);
- ``tests/test_input_volume.py`` — asserts the same pins through
  both read paths (duckdb on the raw files, ``load_table``).

Note documents/embeddings are SF-STEPPED, not linear in sf — the
reason the exponent x-axis counts rows instead of trusting the sf
label.
"""

from __future__ import annotations

import os

EXPECTED_ROWS: dict[str, dict[str, int]] = {
    "sf0.001": {
        "region": 5, "nation": 25, "customer": 150, "supplier": 10,
        "part": 200, "orders": 1_500, "lineitem": 6_000,
        "events": 1_000, "documents": 500, "embeddings": 500,
    },
    "sf0.01": {
        "region": 5, "nation": 25, "customer": 1_500, "supplier": 100,
        "part": 2_000, "orders": 15_000, "lineitem": 60_000,
        "events": 10_000, "documents": 500, "embeddings": 500,
    },
    "sf0.1": {
        "region": 5, "nation": 25, "customer": 15_000,
        "supplier": 1_000, "part": 20_000, "orders": 150_000,
        "lineitem": 600_000, "events": 100_000, "documents": 5_000,
        "embeddings": 2_000,
    },
}


def expected_for(sf_dir: str) -> dict[str, int] | None:
    """The pinned table->rows map for a fixture directory, or None
    for directories we hold no pin for (scratch replicas, ad-hoc
    test fixtures) — callers skip the gate there rather than guess."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return EXPECTED_ROWS.get(base)
