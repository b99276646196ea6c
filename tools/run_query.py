"""Run one registered query by name and print its result (or plan).

The switch-over story for a reference user: every operator is a named
query; this is the one-liner to execute any of them against a dataset
directory.

Usage:
  python tools/run_query.py NAME [sf_dir] [--explain] [--limit N] [--csv]
  python tools/run_query.py --list [pattern]
"""

from __future__ import annotations

import fnmatch
import sys

sys.path.insert(0, ".")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]

    from prac_data_pipelines_spark.queries import all_queries

    queries = all_queries()

    if "--list" in flags:
        pattern = args[0] if args else "*"
        for name in queries:
            if fnmatch.fnmatch(name, f"*{pattern.strip('*')}*"):
                print(name)
        return 0

    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in queries:
        close = [n for n in queries if name.lower() in n.lower()]
        print(f"unknown query {name!r}" + (f"; close: {close}" if close else ""))
        return 2

    limit = 50
    for f in flags:
        if f.startswith("--limit"):
            limit = int(f.split("=", 1)[1]) if "=" in f else limit

    from prac_data_pipelines_spark.session import get_spark

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
        return 0
    if "--csv" in flags:
        pdf = df.toPandas()
        print(pdf.to_csv(index=False), end="")
        return 0
    df.show(limit, truncate=False)
    print(f"({name} over {sf_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
