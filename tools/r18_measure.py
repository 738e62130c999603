"""Round-18 optimization measurement harness.

Two subcommands:

    python tools/r18_measure.py explain <tag> q1 [q2 ...]
        Capture ``.explain("formatted")`` for each named query into
        plans/r18/<query>_<tag>.txt  (tag ∈ before|after).

    python tools/r18_measure.py time q1 [q2 ...] [--reps N] [--sf DIR]
        Isolated timing: one warm session, then per query REPS
        noop-sink executions (best + all samples printed) with the
        bench's own session-hygiene between queries. This is the
        guide §1.4 isolation loop — time the computation, not the
        sink, on a session whose one-time costs are already paid.

Uses the same session factory and warmup shape as bench.py so that
isolated numbers are comparable with bench per-query numbers.
"""

from __future__ import annotations

import gc
import io
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_geotab_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def warm(spark, sf_dir: str) -> None:
    """The bench preamble's cheap parts: flagship + full-width table
    touch + pandas-UDF pool + HOF/rownum JIT probes."""
    from pyspark.sql import functions as F

    from etl_geotab_spark.io import TABLES, load_table

    qs = entrymod.queries()
    force(qs["geotab_flagship"](spark, sf_dir))
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.agg(F.count(F.lit(1)), *[F.max(c) for c in df.columns]).collect()
    from pyspark.sql.pandas.functions import pandas_udf

    _ident = pandas_udf(lambda s: s, "long")
    spark.range(64).select(_ident(F.col("id"))).count()
    from etl_geotab_spark.functions.text import tokenize

    spark.createDataFrame([("a b c",)], "t string").select(
        F.size(tokenize(F.col("t"))).alias("n")
    ).groupBy("n").count().count()
    from etl_geotab_spark.operators.rownum import ordered_prefix_sum

    ordered_prefix_sum(
        spark.range(128).select(F.col("id").alias("k"), F.lit(1).alias("v")),
        ["k"],
        "v",
    ).count()
    spark.catalog.clearCache()


def hygiene(spark) -> None:
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    gc.collect()


def cmd_explain(tag: str, names: list[str], sf_dir: str) -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r18",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r18-explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for n in names:
        if n not in qs:
            print(f"unknown query: {n}", file=sys.stderr)
            continue
        df = qs[n](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
        hygiene(spark)
    spark.stop()


def cmd_time(names: list[str], sf_dir: str, reps: int) -> None:
    spark = get_spark("r18-time")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark, sf_dir)
    qs = entrymod.queries()
    results = {}
    for n in names:
        if n not in qs:
            print(f"unknown query: {n}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"r18-time:{n}")
        samples = []
        for _ in range(reps):
            t0 = time.time()
            force(qs[n](spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
            hygiene(spark)
        results[n] = {"best": min(samples), "samples": samples}
        print(json.dumps({n: results[n]}))
    spark.stop()
    print(json.dumps(results))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    cmd, rest = args[0], args[1:]
    if cmd == "explain":
        cmd_explain(rest[0], rest[1:], sf_dir)
    elif cmd == "time":
        cmd_time(rest, sf_dir, reps)
    else:
        raise SystemExit(f"unknown subcommand {cmd}")


if __name__ == "__main__":
    main()
