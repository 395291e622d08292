"""The shared FsShell helper (pig_spark/fsshell.py) — one
implementation behind Pig.fs, script `fs` statements, the Grunt shell
and the latin CLI, with FsShell.run's return-code contract
(scripting/Pig.java:57-72: 0 success, -1 error, errors printed not
raised — GruntParser prints the status and continues)."""

from __future__ import annotations

import os

from pig_spark.fsshell import fs_shell


def test_mkdir_mv_cp_roundtrip(tmp_path):
    d = tmp_path / "a" / "b"
    assert fs_shell(f"-mkdir {d}") == 0
    f = tmp_path / "x.txt"
    f.write_text("data")
    assert fs_shell(f"-cp {f} {d}/y.txt") == 0
    assert fs_shell(f"-mv {d}/y.txt {d}/z.txt") == 0
    assert (d / "z.txt").read_text() == "data"
    # dash is optional, like Pig.fs (Pig.java:64 prepends it)
    assert fs_shell(f"rmr {tmp_path}/a") == 0
    assert not d.exists()


def test_error_paths_return_minus_one(tmp_path, capsys):
    assert fs_shell("") == -1  # Pig.fs(null) → -1
    assert fs_shell(f"-rm {tmp_path}/nope") == -1
    assert fs_shell(f"-ls {tmp_path}/nope") == -1
    assert fs_shell(f"-cat {tmp_path}/nope") == -1
    assert fs_shell("-frobnicate x") == -1
    err = capsys.readouterr().err
    assert "No such file or directory" in err
    # plain -rm refuses a non-empty directory; -rmr recurses
    d = tmp_path / "full"
    d.mkdir()
    (d / "f").write_text("x")
    assert fs_shell(f"-rm {d}") == -1
    assert d.exists()
    assert fs_shell(f"-rmr {d}") == 0
    assert not d.exists()


def test_cwd_anchors_relative_paths(tmp_path):
    assert fs_shell("-touchz rel.txt", cwd=str(tmp_path)) == 0
    assert (tmp_path / "rel.txt").exists()
    assert fs_shell("-test -e rel.txt", cwd=str(tmp_path)) == 0
    assert fs_shell("-test -z rel.txt", cwd=str(tmp_path)) == 0
    assert fs_shell("-test -d rel.txt", cwd=str(tmp_path)) == -1


def test_ls_cat_put(tmp_path, capsys):
    f = tmp_path / "src.txt"
    f.write_text("payload\n")
    assert fs_shell(f"-put {f} {tmp_path}/dst.txt") == 0
    assert fs_shell(f"-ls {tmp_path}") == 0
    assert fs_shell(f"-cat {tmp_path}/dst.txt") == 0
    out = capsys.readouterr().out
    assert "src.txt" in out and "dst.txt" in out and "payload" in out


def test_pig_fs_delegates(tmp_path):
    from pig_spark.embed import Pig

    d = tmp_path / "viafs"
    assert Pig.fs(f"-mkdir {d}") == 0
    assert os.path.isdir(d)
    assert Pig.fs(f"-rmr {d}") == 0
    assert Pig.fs(f"-rmr {d}") == -1  # already gone → error code


def test_plan_inspection_skips_sh_and_fs(spark, sf_dir, tmp_path):
    """describe/explain never execute sh or fs side effects — the
    reference runs both only `if (mExplain == null)`
    (GruntParser.java:1174,1203)."""
    from pig_spark.embed import Pig

    victim = tmp_path / "victim.txt"
    victim.write_text("keep me")
    marker = tmp_path / "marker.txt"
    script = (
        f"sh touch {marker};\n"
        f"fs -rm {victim};\n"
        f"a = LOAD '{sf_dir}/nation.parquet' USING ParquetLoader();\n"
        f"STORE a INTO '{tmp_path}/sink' USING PigStorage();\n"
    )
    b = Pig.compile(script).bind()
    b.describe("a")
    b.explain()
    assert victim.exists() and not marker.exists()
    # run DOES execute them
    stats = b.runSingle(spark)
    assert stats.is_successful()
    assert not victim.exists() and marker.exists()
