"""Explicit bloom-filter runtime join pruning.

Spark's own InjectRuntimeFilter builds a bloom on the selective side
of a join and probes it on the fact scan before the shuffle; the
`bloom_filter_agg` expression it uses is internal (not SQL-registered),
so this module builds the same shape explicitly:

    build: hash every key with k seeded xxhash64 probes mod m bits,
           collect the DISTINCT bit positions — bounded by the BITMAP
           size (m/8 bytes), never by the key count — and pack them
           into an array<bigint> literal.
    probe: k shift/mask tests against that literal, pure JVM codegen,
           evaluated map-side before any exchange.

No false negatives by construction (every build key set its bits), so
following the probe with an exact semi-join yields exactly the plain
semi-join while the probe prunes ~(1-fpr) of non-matching rows from
the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position_exprs(key_expr: str, num_hashes: int, bits: int) -> list[str]:
    """k seeded hash → bit-position SQL expressions (shared dialect)."""
    return [
        f"pmod(xxhash64({key_expr}, {seed}), {bits})"
        for seed in range(num_hashes)
    ]


def build_bloom(
    keys: DataFrame, key_col: str, bits: int = 1 << 16, num_hashes: int = 3
) -> list[int]:
    """Build the bitmap as a list of signed 64-bit words. The only
    driver transfer is the DISTINCT position set (≤ bits rows).

    ``bits`` must be a multiple of 64: the probe side reconstructs the
    modulus as len(bitmap)*64, so a ragged final word would make build
    and probe hash into DIFFERENT moduli — silent false negatives."""
    if bits <= 0 or bits % 64 != 0:
        raise ValueError(f"bits must be a positive multiple of 64: {bits}")
    positions = (
        keys.select(
            F.explode(
                F.array(
                    *[
                        F.expr(e)
                        for e in _position_exprs(key_col, num_hashes, bits)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    bitmap = [0] * (bits // 64)
    for row in positions:
        p = int(row["pos"])
        bitmap[p // 64] |= 1 << (p % 64)
    # two's-complement wrap so the words are valid Spark bigint literals
    return [b - (1 << 64) if b >= (1 << 63) else b for b in bitmap]


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bitmap: list[int],
    num_hashes: int = 3,
) -> DataFrame:
    """Filter df to rows whose key MIGHT be in the bloom (no false
    negatives). The bitmap rides as an array literal; each probe is a
    shift/mask expression inside whole-stage codegen."""
    bits = len(bitmap) * 64
    bloom = F.array(*[F.lit(b) for b in bitmap])
    out = df.withColumn("__bloom", bloom)
    probe: Column | None = None
    for e in _position_exprs(key_col, num_hashes, bits):
        test = F.expr(
            f"((element_at(__bloom, cast(({e}) div 64 as int) + 1)"
            f"  >> pmod({e}, 64)) & 1) = 1"
        )
        probe = test if probe is None else (probe & test)
    return out.where(probe).drop("__bloom")
