"""Local-filesystem equivalents of hadoop ``FsShell`` commands.

One shared implementation behind every surface that accepts an
``fs -<cmd>`` string — ``Pig.fs`` (scripting/Pig.java:57), the script
preprocessor's ``fs`` statements and the Grunt shell
(GruntParser.java:1169 processFsCommand), and the latin CLI.

Contract mirrors ``FsShell.run`` as the reference uses it:

- returns 0 on success, -1 on error (Pig.java:61 initialises the code
  to -1 and returns whatever ``shell.run`` produced);
- errors print a shell-style ``<cmd>: <path>: <reason>`` line to
  stderr instead of raising — Grunt prints the status and keeps going;
- the leading ``-`` on the command is optional (Pig.java:64 prepends
  it when missing).
"""

from __future__ import annotations

import os
import shutil
import sys

__all__ = ["fs_shell"]


def _resolve(path: str, cwd: str | None) -> str:
    return os.path.join(cwd, path) if cwd else path


def fs_shell(cmd: str | list[str], cwd: str | None = None) -> int:
    """Run one FsShell-style command (``"-mkdir p"``,
    ``"rmr out dir2"``, ``"-copyFromLocal a b"``, ``"-ls p"``).

    A string splits on whitespace — exactly ``Pig.fs``'s
    ``cmd.split("\\s+")`` (Pig.java:64), which does NOT honor shell
    quoting; callers that already tokenized (the Grunt shell, the
    latin CLI with shlex rules) pass a list instead.
    ``cwd`` anchors relative paths (the Grunt shell tracks its own
    ``cd`` state); defaults to the process working directory.
    Returns 0 on success, -1 on error (``FsShell.run`` contract).
    """
    parts = list(cmd) if isinstance(cmd, list) else (cmd or "").split()
    if not parts:
        return -1  # Pig.fs(null) → -1 (Pig.java:61)
    op = parts[0].lstrip("-").lower()
    args = [_resolve(a, cwd) for a in parts[1:]]

    def fail(msg: str) -> int:
        print(f"{op}: {msg}", file=sys.stderr)
        return -1

    try:
        if op in ("rm", "rmr"):
            if not args:
                return fail("missing operand")
            code = 0
            for a in args:
                if os.path.isdir(a):
                    if op == "rm" and os.listdir(a):
                        # plain -rm refuses a non-empty directory the
                        # way `hadoop fs -rm` does; -rmr recurses
                        code = fail(f"{a}: is a non-empty directory (use -rmr)")
                        continue
                    shutil.rmtree(a, ignore_errors=True)
                elif os.path.exists(a):
                    os.remove(a)
                else:
                    code = fail(f"{a}: No such file or directory")
            return code
        if op == "mkdir":
            if not args:
                return fail("missing operand")
            for a in args:
                os.makedirs(a, exist_ok=True)
            return 0
        if op == "mv":
            if len(args) != 2:
                return fail("expects <src> <dst>")
            os.replace(args[0], args[1])
            return 0
        if op in ("cp", "copyfromlocal", "copytolocal", "put", "get"):
            if len(args) != 2:
                return fail("expects <src> <dst>")
            # HDFS FileSystem.create() makes missing parent dirs by
            # default, so `fs -cp src /a/b/c` succeeds with /a/b absent
            # — grunt.conf's cp/copyFromLocal tests rely on this
            parent = os.path.dirname(args[1])
            if parent:
                os.makedirs(parent, exist_ok=True)
            if os.path.isdir(args[0]):
                shutil.copytree(args[0], args[1], dirs_exist_ok=True)
            else:
                shutil.copy(args[0], args[1])
            return 0
        if op == "ls":
            code = 0
            for a in args or [cwd or "."]:
                if not os.path.exists(a):
                    code = fail(f"{a}: No such file or directory")
                    continue
                for name in sorted(os.listdir(a)) if os.path.isdir(a) else [a]:
                    print(name)
            return code
        if op == "cat":
            code = 0
            for a in args:
                if not os.path.isfile(a):
                    code = fail(f"{a}: No such file or directory")
                    continue
                with open(a, errors="replace") as fh:
                    print(fh.read(), end="")
            return code
        if op == "touchz":
            for a in args:
                open(a, "a").close()
            return 0
        if op == "test":
            # -test -e|-d|-z <path>: result IS the return code
            flag = parts[1] if len(parts) > 2 else "-e"
            target = args[-1] if args else ""
            if flag == "-d":
                return 0 if os.path.isdir(target) else -1
            if flag == "-z":
                return 0 if os.path.isfile(target) and os.path.getsize(target) == 0 else -1
            return 0 if os.path.exists(target) else -1
        if op == "du":
            for a in args or [cwd or "."]:
                if os.path.isdir(a):
                    for name in sorted(os.listdir(a)):
                        p = os.path.join(a, name)
                        print(f"{os.path.getsize(p) if os.path.isfile(p) else 0}\t{p}")
                elif os.path.isfile(a):
                    print(f"{os.path.getsize(a)}\t{a}")
            return 0
        return fail("unknown fs command")
    except OSError as exc:
        return fail(str(exc))
