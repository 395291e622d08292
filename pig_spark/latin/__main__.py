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

    params = dict(p.split("=", 1) for p in args.param)

    from ..session import get_spark
    from . import translator

    spark = get_spark("pig_spark_latin")
    spark.sparkContext.setLogLevel("ERROR")
    tr = translator(spark, params=params)

    if not args.script and not args.execute:
        return _grunt(tr)

    src = args.execute if args.execute else open(args.script).read()
    rels = tr.run(src)
    if args.explain:
        for alias, rel in rels.items():
            print(f"-- {alias}")
            rel.explain()
    return 0


def _grunt(tr) -> int:
    """Grunt shell (reference tools/grunt/Grunt.java): read statements
    until a terminating ';' (or '}'), execute incrementally, keep the
    alias environment across inputs. quit/exit leaves."""
    print("grunt — pig_spark interactive shell (quit; to exit)")
    buf: list[str] = []
    while True:
        try:
            line = input("grunt> " if not buf else "    >> ")
        except EOFError:
            print()
            return 0
        if not buf and line.strip().rstrip(";").lower() in ("quit", "exit"):
            return 0
        if not buf and _utility_cmd(line):
            continue
        buf.append(line)
        joined = "\n".join(buf)
        # a statement ends at ';' (or '}' for nested-foreach blocks)
        if not (line.rstrip().endswith(";") or line.rstrip().endswith("}")):
            continue
        buf = []
        try:
            tr.run(joined)
        except Exception as e:  # keep the shell alive like Grunt does
            print(f"ERROR: {e}")


def _utility_cmd(line: str) -> bool:
    """Grunt's fs/sh/cat/pwd/cd utility commands (GruntParser.java
    hosts these alongside DUMP/DESCRIBE). Returns True if handled."""
    import os
    import shlex
    import subprocess

    words = line.strip().rstrip(";").split(None, 1)
    if not words:
        return False
    cmd, rest = words[0].lower(), words[1] if len(words) > 1 else ""
    if cmd == "fs":
        # `fs -<cmd> args` — shared FsShell local equivalents
        # (errors print and the shell keeps going, like Grunt);
        # shlex rules so quoted paths with spaces stay one arg
        from ..fsshell import fs_shell

        fs_shell(shlex.split(rest))
        return True
    if cmd == "sh":
        subprocess.run(rest, shell=True)
        return True
    if cmd == "cat":
        for p in shlex.split(rest):
            with open(p) as fh:
                sys.stdout.write(fh.read())
        return True
    if cmd == "pwd":
        print(os.getcwd())
        return True
    if cmd == "cd":
        os.chdir(rest.strip() or os.path.expanduser("~"))
        return True
    return False


if __name__ == "__main__":
    sys.exit(main())
