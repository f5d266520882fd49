#!/usr/bin/env python3
"""Dump .explain("formatted") for every declared query into a plans dir.

Usage: python scripts/dump_plans.py <out_dir> [suffix] [--only a,b,c]
e.g.   python scripts/dump_plans.py plans/r07 _before
"""

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else ""
    only = None
    for a in sys.argv[2:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("qfspark-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qmap = entry.queries()
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = plan_of(df)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
