"""Project / engine structure introspection CLI.

Counterpart of the reference's ``show_structure.py`` (reference repo
root), which prints the project directory tree. An analytics engine's
"structure" is more than its files, so beyond the tree this also
introspects the run-time surface without starting Spark:

    python tools/show_structure.py                  # package tree
    python tools/show_structure.py --max-depth 2
    python tools/show_structure.py --queries        # query registry
    python tools/show_structure.py --tables SF_DIR  # parquet schemas

``--queries`` lists every registered query with its module and whether
it carries a DuckDB value oracle (the correctness gate's unit).
``--tables`` reads parquet footers via pyarrow (schema + row count) for
each table in a test-data directory.
"""

from __future__ import annotations

import argparse
import os
import sys

IGNORE = {"__pycache__", ".git", ".pytest_cache", "spark-warehouse",
          "derby.log", ".hypothesis"}


def tree_lines(root: str, max_depth: int | None, depth: int = 0,
               prefix: str = "") -> list[str]:
    if max_depth is not None and depth >= max_depth:
        return []
    try:
        items = sorted(os.scandir(root),
                       key=lambda e: (not e.is_dir(), e.name.lower()))
    except OSError:
        return []
    items = [e for e in items
             if e.name not in IGNORE and not e.name.startswith(".")
             and not e.name.endswith(".pyc")]
    lines = []
    for i, e in enumerate(items):
        last = i == len(items) - 1
        conn = "└── " if last else "├── "
        if e.is_dir():
            lines.append(f"{prefix}{conn}{e.name}/")
            lines += tree_lines(e.path, max_depth, depth + 1,
                                prefix + ("    " if last else "│   "))
        else:
            try:
                with open(e.path, "rb") as fh:
                    n = sum(1 for _ in fh)
                lines.append(f"{prefix}{conn}{e.name}  ({n} lines)")
            except OSError:
                lines.append(f"{prefix}{conn}{e.name}")
    return lines


def show_queries() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from prac_data_pipelines_spark.queries import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    print(f"{len(queries)} registered queries "
          f"({len(oracles)} with DuckDB value oracles):\n")
    for name, fn in queries.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        mark = "oracle" if name in oracles else "ROWS-ONLY"
        print(f"  {name:32s} {mod:10s} {mark}")


def show_tables(sf_dir: str) -> None:
    import pyarrow.parquet as pq

    for entry in sorted(os.listdir(sf_dir)):
        if not entry.endswith(".parquet"):
            continue
        path = os.path.join(sf_dir, entry)
        try:
            f = pq.ParquetFile(path) if os.path.isfile(path) else None
            if f is None:  # directory-style parquet
                import pyarrow.dataset as ds

                d = ds.dataset(path, format="parquet")
                schema, rows = d.schema, sum(
                    fr.count_rows() for fr in d.get_fragments())
            else:
                schema, rows = f.schema_arrow, f.metadata.num_rows
        except Exception as exc:  # noqa: BLE001
            print(f"{entry}: unreadable ({exc})")
            continue
        cols = ", ".join(f"{n}:{t}" for n, t in
                         zip(schema.names, schema.types))
        print(f"{entry.removesuffix('.parquet'):12s} {rows:>10,} rows  "
              f"[{cols}]")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--queries", action="store_true")
    ap.add_argument("--tables", metavar="SF_DIR")
    args = ap.parse_args()
    if args.queries:
        show_queries()
        return 0
    if args.tables:
        show_tables(args.tables)
        return 0
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(os.path.basename(root) + "/")
    print("\n".join(tree_lines(root, args.max_depth)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
