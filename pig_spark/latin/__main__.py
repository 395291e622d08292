"""bin/pig-style script runner (reference Main.java / Grunt entry):

    python -m pig_spark.latin script.pig [-p name=value ...] [-e 'stmts;']

Runs a Pig Latin script on a local SparkSession: parameters substitute
like `pig -param`, DUMP prints tuples, STORE writes files. With -e,
runs inline statements instead of a file.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pig_spark.latin", description="Run a Pig Latin script on Spark")
    ap.add_argument("script", nargs="?", help="path to .pig script")
    ap.add_argument("-p", "--param", action="append", default=[], metavar="NAME=VALUE")
    ap.add_argument("-e", "--execute", help="inline statements instead of a script file")
    ap.add_argument("--explain", action="store_true", help="print the plan of every alias instead of executing stores")
    args = ap.parse_args(argv)

    if not args.script and not args.execute:
        ap.error("need a script file or -e 'statements;'")
    src = args.execute if args.execute else open(args.script).read()
    params = dict(p.split("=", 1) for p in args.param)

    from ..session import get_spark
    from . import translator

    spark = get_spark("pig_spark_latin")
    spark.sparkContext.setLogLevel("ERROR")
    tr = translator(spark, params=params)
    rels = tr.run(src)
    if args.explain:
        for alias, rel in rels.items():
            print(f"-- {alias}")
            rel.explain()
    return 0


if __name__ == "__main__":
    sys.exit(main())
