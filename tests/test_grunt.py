"""Grunt interactive shell (pig_spark/grunt.py ≅ Grunt.java /
GruntParser.java): statement accumulation, utility commands, scope
rules for exec vs run, and error recovery."""

from __future__ import annotations

import io

from pig_spark.grunt import Grunt, statement_complete


def _shell(spark, script: str, sf_dir: str | None = None, params=None) -> tuple[Grunt, str]:
    out = io.StringIO()
    g = Grunt(spark, inp=io.StringIO(script), out=out, params=params)
    g.loop()
    return g, out.getvalue()


def test_statement_complete():
    assert statement_complete("DUMP a;")
    assert not statement_complete("DUMP a")
    assert not statement_complete("b = FOREACH g {")
    assert not statement_complete("b = FOREACH g { x = FILTER a BY n > 1;")
    assert statement_complete("b = FOREACH g { x = DISTINCT a.c; GENERATE COUNT(x); };")
    assert not statement_complete("a = LOAD 'x;y' USING")  # ; inside quotes
    assert statement_complete("a = FILTER b BY c == 'x;y';")
    assert statement_complete("DUMP a; -- trailing comment")
    assert not statement_complete("-- just a comment")


def test_load_dump_describe_aliases(spark, sf_dir):
    script = f"""
r = LOAD '{sf_dir}/region.parquet' USING ParquetLoader();
small = FILTER r BY r_regionkey < 2;
DUMP small;
DESCRIBE small;
aliases
quit
"""
    g, out = _shell(spark, script)
    assert "(0," in out  # Pig tuple rendering of region rows
    assert "small:" in out
    assert "r, small" in out


def test_multiline_statement_and_history(spark, sf_dir):
    script = f"""
n = LOAD '{sf_dir}/nation.parquet'
    USING ParquetLoader();
g = GROUP n BY n_regionkey;
c = FOREACH g {{
    d = DISTINCT n.n_nationkey;
    GENERATE group AS rk, COUNT(d) AS n_nations;
}};
DUMP c;
history 2
quit
"""
    g, out = _shell(spark, script)
    assert len([h for h in g.history if h.startswith("n = LOAD")]) == 1
    assert "(0," in out
    # history printed the last two entries (DUMP + history itself)
    assert "history 2" in out


def test_error_recovery(spark, sf_dir):
    script = f"""
bogus = FILTER nowhere BY x > 1;
r = LOAD '{sf_dir}/region.parquet' USING ParquetLoader();
DUMP r;
quit
"""
    _, out = _shell(spark, script)
    assert "ERROR" in out
    assert "(0," in out  # shell survived and ran the next statement


def test_exec_fresh_scope_run_shared_scope(spark, sf_dir, tmp_path):
    sub = tmp_path / "sub.pig"
    sub.write_text(f"x = LOAD '{sf_dir}/region.parquet' USING ParquetLoader();\n")
    script = f"""
exec {sub}
aliases
run {sub}
aliases
quit
"""
    _, out = _shell(spark, script)
    lines = [line for line in out.splitlines() if line.strip()]
    assert lines[0] == "(none)"  # exec ran in a fresh scope
    assert lines[1] == "x"  # run ran in the current scope


def test_utility_fs_and_sh(spark, tmp_path):
    f = tmp_path / "hello.txt"
    f.write_text("hi grunt\n")
    script = f"""
cd {tmp_path}
pwd
ls
cat hello.txt
sh echo shell-ok
quit
"""
    _, out = _shell(spark, script)
    assert str(tmp_path) in out
    assert "hello.txt" in out
    assert "hi grunt" in out
    assert "shell-ok" in out


def test_param_substitution_in_shell(spark, sf_dir):
    script = """
r = LOAD '$dir/region.parquet' USING ParquetLoader();
DUMP r;
quit
"""
    _, out = _shell(spark, script, params={"dir": sf_dir})
    assert "(0," in out


def test_store_executes_immediately(spark, sf_dir, tmp_path):
    dest = tmp_path / "out_parquet"
    script = f"""
r = LOAD '{sf_dir}/region.parquet' USING ParquetLoader();
STORE r INTO '{dest}' USING ParquetStorer();
quit
"""
    _shell(spark, script)
    assert spark.read.parquet(str(dest)).count() == 5


def test_fs_quoted_path_with_spaces(spark, tmp_path):
    """Grunt fs tokenizes with shlex (GruntParser honors quoting), so
    `fs -rm "a b.txt"` is ONE path argument (ADVICE r6)."""
    target = tmp_path / "a b.txt"
    target.write_text("x\n")
    script = f"""
fs -rm "{target}"
quit
"""
    _shell(spark, script)
    assert not target.exists()


def test_bare_set_lists_properties(spark):
    """`set` with no arguments lists the session properties
    (GruntParser.processSet no-arg form)."""
    _, out = _shell(spark, "set\nquit\n")
    assert "spark.app.name=" in out or "spark.master=" in out


def test_sql_command_in_repl(spark, sf_dir):
    """GruntParser.processSQLCommand through the REPL: a multi-line
    `sql create table ...;` statement accumulates to its ';', the DDL
    lands in the catalog, and a following HCatLoader LOAD reads it."""
    from pig_spark.sources.hcatalog import run_sql

    run_sql(spark, "drop table if exists grunt_sql_t")
    script = """
sql drop table if exists grunt_sql_t;
sql create table grunt_sql_t(name string,
age int)
stored as textfile;
quit
"""
    _shell(spark, script)
    assert spark.catalog.tableExists("grunt_sql_t")
    assert [f.name for f in spark.table("grunt_sql_t").schema.fields] == ["name", "age"]
    run_sql(spark, "drop table if exists grunt_sql_t")
