"""Invariant tests for the round-4b query additions: sketches
(KMV / Count-Min), fleet-telemetry rollups (trips / debounce / dwell),
CDC materialization, and SemDeDup. The oracle gate already checks
value equality vs DuckDB at sf0.01; these assert the STRUCTURAL
guarantees the oracles cannot express (estimator bounds, partition
invariants, tombstone semantics) on the sf0.001 smoke fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_geotab_spark.queries import _REGISTRY


def _q(name, spark, sf_dir):
    return _REGISTRY[name][0](spark, sf_dir)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-Min's defining bound: estimate >= exact for EVERY key."""
    rows = _q("count_min_freq", spark, sf_dir).collect()
    assert rows
    assert all(r.cms_estimate >= r.exact_count for r in rows)
    assert all(r.overestimate == r.cms_estimate - r.exact_count for r in rows)


def test_kmv_exact_below_fill(spark, sf_dir):
    """Below k=32 distinct values the KMV sketch IS the exact count;
    at/above fill the estimate must be positive and within a loose
    multiplicative band (k=32 gives ~18% relative error at 1 sigma;
    5x covers the tail without flaking)."""
    rows = _q("kmv_distinct", spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_exact < 32:
            assert r.kmv_estimate == float(r.n_exact)
        else:
            assert 0.2 * r.n_exact <= r.kmv_estimate <= 5.0 * r.n_exact


def test_trip_segmentation_partitions_pings(spark, sf_dir):
    """Trips PARTITION each vehicle's pings: per-trip ping counts sum
    to the vehicle's event count, trip numbering is 1..n_trips dense,
    and every trip's span fits inside its ping gap contract."""
    trips = _q("trip_segmentation", spark, sf_dir).collect()
    assert trips
    from etl_geotab_spark.io import load_table

    events_per_user = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_vehicle: dict[int, list] = {}
    for t in trips:
        per_vehicle.setdefault(t.vehicle_id, []).append(t)
    assert set(per_vehicle) == set(events_per_user)
    for vid, ts in per_vehicle.items():
        assert sum(t.n_pings for t in ts) == events_per_user[vid]
        assert sorted(t.trip_no for t in ts) == list(range(1, len(ts) + 1))
        for t in ts:
            assert t.duration_us >= 0
            assert t.dist_km >= 0.0
            if t.n_pings == 1:
                assert t.duration_us == 0 and t.dist_km == 0.0


def test_event_debounce_bounds(spark, sf_dir):
    """kept + dropped == total per type; at least one event per type
    survives (the first of each key is always kept)."""
    rows = _q("event_debounce", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_total
        assert r.n_kept >= 1


def test_geofence_dwell_positive_spans(spark, sf_dir):
    """Dwell is a sum of strictly-forward time spans: positive, and
    dwell_s is exactly dwell_us scaled."""
    rows = _q("geofence_dwell", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.dwell_us > 0
        assert abs(r.dwell_s - r.dwell_us / 1_000_000.0) < 1e-9
        assert r.n_pings >= 1


def test_cdc_apply_tombstones_and_versions(spark, sf_dir):
    """Deletes vanish, updates carry version 2, untouched keys stay at
    version 1 — checked against the generating rule itself."""
    rows = _q("cdc_apply", spark, sf_dir).collect()
    assert rows
    keys = {r.key: r for r in rows}
    for k, r in keys.items():
        assert k % 13 != 0, "deleted key survived"
        assert r.version == (2 if k % 7 == 0 else 1)
    from etl_geotab_spark.io import load_table

    all_keys = {
        r.o_orderkey
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey").collect()
    }
    assert set(keys) == {k for k in all_keys if k % 13 != 0}


def test_semdedup_drops_only_with_lower_neighbor(spark, sf_dir):
    """Every vector appears exactly once; at least the lowest id per
    bucket is always kept (it can have no lower-id neighbor)."""
    rows = _q("semdedup_buckets", spark, sf_dir).collect()
    assert rows
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids))
    lowest_per_bucket: dict[int, int] = {}
    keep = {}
    for r in rows:
        keep[r.vec_id] = r.keep
        b = lowest_per_bucket.get(r.bucket)
        if b is None or r.vec_id < b:
            lowest_per_bucket[r.bucket] = r.vec_id
    for b, vid in lowest_per_bucket.items():
        assert keep[vid], f"bucket {b} lowest id {vid} was dropped"
