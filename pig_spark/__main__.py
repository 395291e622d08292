"""Batch CLI — the `pig` launcher surface (reference: bin/pig +
Main.java option handling), Spark-first:

    python -m pig_spark script.pig
    python -m pig_spark -p date=2024-01-01 -p sf=sf0.1 script.pig
    python -m pig_spark -e "a = LOAD 's.parquet' USING ParquetLoader(); DUMP a;"
    python -m pig_spark -c script.pig          # syntax check only
    python -m pig_spark -r script.pig          # preprocessor dryrun

Supported flags mirror the reference launcher where they make sense on
Spark: `-p/-param`, `-m/-param_file`, `-e/-execute`, `-c/-check`,
`-r/-dryrun`. `-x/-exectype` is accepted and ignored — the execution
engine is always Spark (local master unless SPARK_GRAFT_CPUS or an
existing session says otherwise).
"""

from __future__ import annotations

import argparse
import os
import sys


def _parse_params(pairs: list[str], files: list[str]) -> dict[str, str]:
    params: dict[str, str] = {}
    for path in files:
        # param files: NAME=value lines, '#' comments (reference
        # tools/parameters/ParamLoader.jj)
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                name, _, value = line.partition("=")
                params[name.strip()] = value.strip().strip("'\"")
    for pair in pairs:
        name, _, value = pair.partition("=")
        params[name.strip()] = value.strip("'\"")
    return params


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m pig_spark",
        description="Run a Pig Latin script on Spark (pig_spark engine).",
    )
    ap.add_argument("script", nargs="?", help="path to the .pig script")
    ap.add_argument("-e", "-execute", dest="execute", help="execute a script string")
    ap.add_argument("-p", "-param", dest="params", action="append", default=[], metavar="NAME=value")
    ap.add_argument("-m", "-param_file", dest="param_files", action="append", default=[], metavar="FILE")
    ap.add_argument("-c", "-check", dest="check", action="store_true", help="syntax check only")
    ap.add_argument("-r", "-dryrun", dest="dryrun", action="store_true", help="print preprocessed script, don't run")
    ap.add_argument("-x", "-exectype", dest="exectype", help="accepted for compatibility; engine is always Spark")
    ap.add_argument("-P", "-propertyFile", dest="prop_files", action="append", default=[], metavar="FILE",
                    help="java-properties file; each key=value SETs a conf (bin/pig -P)")
    ap.add_argument("-M", "-no_multiquery", dest="no_multiquery", action="store_true",
                    help="disable the multiquery shared-subplan cache (bin/pig -M)")
    ap.add_argument("-F", "-stop_on_failure", dest="stop_on_failure", action="store_true",
                    help="abort remaining STOREs on the first failure (bin/pig -F; "
                    "default continues independent sinks and reports at the end)")
    ap.add_argument("-t", "-optimizer_off", dest="rules_off", action="append", default=[], metavar="RULE",
                    help="accepted for compatibility; Catalyst rule sets differ from Pig's")
    ap.add_argument("-l", "-logfile", dest="logfile", help="accepted for compatibility")
    ap.add_argument("-4", "-log4jconf", dest="log4jconf", help="accepted for compatibility")
    ap.add_argument("-b", "-brief", dest="brief", action="store_true", help="accepted for compatibility")
    ap.add_argument("-d", "-debug", dest="debug", help="log level (DEBUG/INFO/WARN/ERROR)")
    ap.add_argument("-w", "-warning", dest="warning", action="store_true",
                    help="accepted for compatibility (warning aggregation)")
    ap.add_argument("-version", action="store_true", dest="version", help="print version and exit")
    args = ap.parse_args(argv)

    if args.version:
        import pyspark

        from . import __version__

        print(f"pig_spark {__version__} (Spark {pyspark.__version__})")
        return 0

    if args.script and args.execute:
        ap.error("give either <script> or -e, not both")
    params = _parse_params(args.params, args.param_files)
    if not args.script and not args.execute:
        if args.check or args.dryrun:
            ap.error("-c/-r need a <script> or -e")
        # no script → interactive Grunt shell (bin/pig with no args)
        from .grunt import main as grunt_main

        return grunt_main(params=params)
    src = args.execute if args.execute else open(args.script, encoding="utf-8").read()

    if args.check or args.dryrun:
        # no SparkSession needed for a front-end-only pass
        from .latin import grammar as G
        from .latin.macros import expand as expand_macros

        import re as _re

        expanded = expand_macros(src)
        for name, value in params.items():
            expanded = _re.sub(r"\$" + _re.escape(name) + r"\b", lambda _m, v=str(value): v, expanded)
        if args.dryrun:
            print(expanded)
            return 0
        G.parse(_re.sub(r"^\s*%(declare|default)[^\n]*$", "", expanded, flags=_re.M))
        print(f"{args.script or '<inline>'}: syntax OK")
        return 0

    from .latin import run
    from .session import get_spark

    spark = get_spark("pig_spark_cli")
    if args.debug:
        spark.sparkContext.setLogLevel(args.debug.upper())
    # ./pig.properties auto-loads when present (bin/pig reads
    # conf/pig.properties; the cwd is this engine's conf anchor),
    # then -P files override it, key by key
    prop_files = list(args.prop_files)
    if os.path.isfile("pig.properties"):
        prop_files.insert(0, "pig.properties")
    # -P: java-properties files, each key=value SETs a conf (the same
    # surface a script-level SET statement reaches); -M / -F map to
    # the execution confs the translator honors
    for pf in prop_files:
        with open(pf, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith(("#", "!")) or "=" not in line:
                    continue
                k, _, v = line.partition("=")
                try:
                    spark.conf.set(k.strip(), v.strip())
                except Exception:
                    pass  # unknown/static confs are advisory, like SET
    if args.no_multiquery:
        spark.conf.set("pig.opt.multiquery", "false")
    if args.stop_on_failure:
        spark.conf.set("pig.stop.on.failure", "true")
    if args.rules_off:
        print(
            f"warning: -t {' '.join(args.rules_off)} accepted for compatibility; "
            "this engine optimizes with Catalyst, whose rule set differs from Pig's",
            file=sys.stderr,
        )
    run(spark, src, params=params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
