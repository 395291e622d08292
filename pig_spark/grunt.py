"""Grunt — the interactive Pig shell, Spark-first.

Reference surface: ``bin/pig`` with no script drops into Grunt
(``Grunt.java`` / ``GruntParser.java``): a ``grunt>`` prompt that
accepts Pig Latin statements incrementally (registered, lazily
executed) plus immediate utility commands.  Parity notes:

* Pig Latin statements accumulate in one :class:`PigTranslator`
  (≅ ``PigServer.registerQuery``); DUMP/DESCRIBE/EXPLAIN/ILLUSTRATE
  execute on demand, STORE executes when entered (interactive mode
  runs each batch as it completes — ``GruntParser.processPig``).
* Utility commands: ``help``, ``history``, ``quit``/``exit``,
  ``ls``/``cat``/``pwd``/``cd``/``mkdir``/``rm``/``rmf``/``cp``/
  ``mv``/``copyToLocal``/``copyFromLocal`` (and the ``fs -cmd``
  spellings), ``sh <cmd>`` (``GruntParser.processShCommand``),
  ``exec <script>`` (fresh scope) vs ``run <script>`` (current scope —
  ``processScript`` semantics), ``set``/``aliases``/``clear``/``kill``.
* A statement may span lines; the shell waits for a terminating ``;``
  outside quotes/comments with balanced ``{ }`` (nested FOREACH
  blocks), echoing a continuation prompt — ``GruntParser`` newline
  handling.
* Errors print and the shell continues (Grunt never dies on a bad
  statement).

Driven by any line iterator, so it is testable without a TTY:
``Grunt(spark, inp=io.StringIO(script), out=buf).loop()``.
"""

from __future__ import annotations

import io
import os
import subprocess
import sys
from contextlib import redirect_stdout

__all__ = ["Grunt", "main"]

_HELP = """Commands:
<pig latin statement>;      register/execute (DUMP, DESCRIBE, EXPLAIN,
                            ILLUSTRATE and STORE run immediately)
exec <script> [-p k=v ...]  run a script in a FRESH scope
run  <script> [-p k=v ...]  run a script in the CURRENT scope
ls / cat / pwd / cd / mkdir / rm  — file commands (also: fs -<cmd>)
sh <command>                shell escape
aliases                     list defined aliases
history [n]                 show statement history
set <key> <value>           set a conf (same as the SET statement)
clear                       clear the screen
help                        this message
quit / exit                 leave the shell"""

_UTILITY = {
    "quit", "exit", "help", "history", "aliases", "clear", "kill",
    "ls", "cat", "pwd", "cd", "mkdir", "rm", "fs", "sh", "exec", "run",
    "rmf", "cp", "mv", "copytolocal", "copyfromlocal", "set",
}


def statement_complete(buf: str) -> bool:
    """True when ``buf`` holds ≥1 complete statement: a ``;`` at
    brace-depth 0 outside quotes and comments, with nothing but
    whitespace/comments after the final one."""
    depth = 0
    i, n = 0, len(buf)
    in_sq = in_bq = False
    saw_stmt = pending = False
    while i < n:
        c = buf[i]
        if in_sq:
            if c == "\\" and i + 1 < n:
                i += 1
            elif c == "'":
                in_sq = False
        elif in_bq:
            if c == "`":
                in_bq = False
        elif c == "'":
            in_sq = True
            pending = True
        elif c == "`":
            in_bq = True
            pending = True
        elif c == "-" and buf[i : i + 2] == "--":
            j = buf.find("\n", i)
            i = n if j < 0 else j
        elif c == "/" and buf[i : i + 2] == "/*":
            j = buf.find("*/", i + 2)
            i = n if j < 0 else j + 1
        elif c in "{(":
            depth += 1
            pending = True
        elif c in "})":
            depth -= 1
        elif c == ";" and depth == 0:
            saw_stmt, pending = True, False
        elif not c.isspace():
            pending = True
        i += 1
    return saw_stmt and not pending and depth <= 0


class Grunt:
    def __init__(self, spark, inp=None, out=None, params: dict[str, str] | None = None):
        from .latin import translator

        self.spark = spark
        self.inp = inp if inp is not None else sys.stdin
        self.out = out if out is not None else sys.stdout
        self.t = translator(spark, params=dict(params or {}))
        self.history: list[str] = []
        self.cwd = os.getcwd()

    # ------------------------------------------------------------------
    def _print(self, *args) -> None:
        print(*args, file=self.out)

    def _prompt(self, cont: bool) -> None:
        if hasattr(self.inp, "isatty") and self.inp.isatty():
            sys.stderr.write(">> " if cont else "grunt> ")
            sys.stderr.flush()

    def loop(self) -> None:
        """Read-eval loop until quit/EOF."""
        buf = ""
        self._prompt(False)
        for raw in self.inp:
            line = raw.rstrip("\n")
            if not buf:
                stripped = line.strip()
                first = stripped.split(None, 1)[0].rstrip(";").lower() if stripped else ""
                if first in _UTILITY:
                    self.history.append(stripped)
                    if self._utility(stripped.rstrip(";")) == "quit":
                        return
                    self._prompt(False)
                    continue
                if not stripped:
                    self._prompt(False)
                    continue
            buf = buf + "\n" + line if buf else line
            if statement_complete(buf):
                self.history.append(buf)
                self._pig(buf)
                buf = ""
            self._prompt(bool(buf))
        if buf.strip():  # trailing unterminated statement at EOF
            self.history.append(buf)
            self._pig(buf + ";")

    # ------------------------------------------------------------------
    def _pig(self, src: str) -> None:
        try:
            with redirect_stdout(self.out):
                self.t.run(src)
        except Exception as exc:  # Grunt survives bad statements
            self._print(f"ERROR: {type(exc).__name__}: {exc}")

    def _utility(self, line: str) -> str | None:
        # shlex, not str.split: the reference GruntParser honors shell
        # quoting, so `fs -rm "a b.txt"` is ONE path argument (Pig.fs
        # keeps the plain whitespace split — it mirrors cmd.split("\\s+"))
        import shlex

        try:
            parts = shlex.split(line)
        except ValueError:  # unbalanced quote — fall back to raw split
            parts = line.split()
        if not parts:
            return None
        cmd, args = parts[0].lower(), parts[1:]
        if cmd == "sh":
            # GruntParser.processShCommand hands the RAW remainder of
            # the line to the shell — quoting and spacing must survive
            # (shlex-stripping then rejoining would turn
            # `sh grep "foo bar" f` into `grep foo bar f`)
            raw = line.split(None, 1)[1] if len(line.split(None, 1)) > 1 else ""
            res = subprocess.run(
                raw, shell=True, capture_output=True, text=True, cwd=self.cwd
            )
            if res.stdout:
                self.out.write(res.stdout)
            if res.stderr:
                self.out.write(res.stderr)
            return None
        if cmd == "fs" and args:
            # fs -<cmd> args → shared FsShell equivalents, anchored at
            # the shell's cwd; errors print and the shell keeps going
            # (GruntParser.processFsCommand → FsShell.run). stderr is
            # captured too — the Grunt consumer reads ONE out stream
            from contextlib import redirect_stderr

            from .fsshell import fs_shell

            with redirect_stdout(self.out), redirect_stderr(self.out):
                fs_shell(args, cwd=self.cwd)
            return None
        try:
            return self._dispatch(cmd, args)
        except Exception as exc:
            self._print(f"ERROR: {type(exc).__name__}: {exc}")
            return None

    def _dispatch(self, cmd: str, args: list[str]) -> str | None:
        if cmd in ("quit", "exit"):
            return "quit"
        if cmd == "help":
            self._print(_HELP)
        elif cmd == "history":
            n = int(args[0]) if args else len(self.history)
            for i, h in enumerate(self.history[-n:], 1):
                self._print(f"{i}  {h}")
        elif cmd == "aliases":
            self._print(", ".join(sorted(self.t.aliases)) or "(none)")
        elif cmd == "clear":
            self._print("\033[2J\033[H", sep="")
        elif cmd == "kill":
            self._print("kill: no backend job tracker on Spark local — use Ctrl-C or the Spark UI")
        elif cmd == "pwd":
            self._print(self.cwd)
        elif cmd == "cd":
            target = os.path.abspath(os.path.join(self.cwd, args[0])) if args else os.path.expanduser("~")
            if not os.path.isdir(target):
                raise FileNotFoundError(target)
            self.cwd = target
        elif cmd == "ls":
            target = os.path.join(self.cwd, args[0]) if args else self.cwd
            for name in sorted(os.listdir(target)):
                self._print(name)
        elif cmd == "cat":
            for a in args:
                with open(os.path.join(self.cwd, a), encoding="utf-8") as fh:
                    self.out.write(fh.read())
        elif cmd == "mkdir":
            os.makedirs(os.path.join(self.cwd, args[0]), exist_ok=True)
        elif cmd == "rm":
            import shutil

            target = os.path.join(self.cwd, args[0])
            shutil.rmtree(target) if os.path.isdir(target) else os.remove(target)
        elif cmd == "rmf":
            # GruntParser.processRemove(force=true): recursive delete,
            # silent when the target doesn't exist
            import shutil

            for a in args:
                target = os.path.join(self.cwd, a)
                if os.path.isdir(target):
                    shutil.rmtree(target, ignore_errors=True)
                elif os.path.exists(target):
                    os.remove(target)
        elif cmd in ("cp", "mv", "copytolocal", "copyfromlocal"):
            # GruntParser.processCopy/processMove/processCopyToLocal/
            # processCopyFromLocal — same FsShell-backed semantics as
            # the `fs -<cmd>` spellings, relative to the shell's cwd
            from contextlib import redirect_stderr

            from .fsshell import fs_shell

            with redirect_stdout(self.out), redirect_stderr(self.out):
                fs_shell([cmd, *args], cwd=self.cwd)
        elif cmd in ("exec", "run"):
            path, params = None, {}
            it = iter(args)
            for a in it:
                if a in ("-p", "-param"):
                    k, _, v = next(it).partition("=")
                    params[k] = v
                else:
                    path = a
            if path is None:
                raise ValueError(f"{cmd}: script path required")
            src = open(os.path.join(self.cwd, path), encoding="utf-8").read()
            if cmd == "exec":  # fresh scope (GruntParser.processScript batch=true)
                from .latin import translator

                fresh = translator(self.spark, params=params)
                with redirect_stdout(self.out):
                    fresh.run(src)
            else:  # run: current scope — aliases persist
                self.t.params.update(params)
                self._pig(src)
        elif cmd == "set":
            if not args:
                # bare `set` lists the session's properties
                # (GruntParser.processSet with no arguments). Runtime
                # SET statements land in SQLConf (spark.conf.set), not
                # the static SparkConf snapshot — merge both so
                # `set x y` followed by `set` shows x
                props = dict(self.t.spark.sparkContext.getConf().getAll())
                props.update(self.t.spark.conf.getAll)
                for k, v in sorted(props.items()):
                    self._print(f"{k}={v}")
                return None
            if len(args) < 2:
                raise ValueError("set: usage `set <key> <value>`")
            self._pig(f"SET {args[0]} '{args[1]}';")
        return None


def main(params: dict[str, str] | None = None) -> int:
    """Entry for ``python -m pig_spark`` with no script: a Grunt shell."""
    from .session import get_spark

    spark = get_spark("pig_spark_grunt")
    sys.stderr.write("pig_spark Grunt shell — type 'help' for commands, 'quit' to leave\n")
    Grunt(spark, params=params).loop()
    return 0
