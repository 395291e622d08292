"""Embedded-control-script coverage: the reference turing_jython.conf
suite (jython programs driving Pig via org.apache.pig.scripting.Pig —
compile / bind / runSingle / run / describe / explain / illustrate /
result(alias).iterator() / Pig.fs) executes against this engine's
`pig_spark.embed` facade, which carries the same camelCase surface.

The scripts are Python-2 jython; a minimal mechanical transpile
(print statement → function, string raise → Exception) plus module
shims for `org.apache.pig.scripting` make them run verbatim on
Python 3. expected_err blocks are asserted NEGATIVE tests (undefined
names, missing script files, describe of unknown aliases).

Skipped (environmental): scripts importing org.apache.hadoop /
java.util (JVM-only classes with no engine equivalent).
"""

import os
import random
import re
import sys
import types
import warnings

import pytest

_CONF = "/root/reference/test/e2e/pig/tests/turing_jython.conf"
_PIG_RE = re.compile(r"'pig' => q([\\#?@])(.*?)\1(?=\s*[,}\]])", re.DOTALL)
_POS_FLOOR = 16
_NEG_FLOOR = 6

_SKIP = (
    "org.apache.hadoop", "from java.util", ":scripthomepath:",
    "$loadfile", "$fname", "sys.argv",  # perl-harness-supplied parameters
)


def extract(src: str):
    out = []
    ms = list(_PIG_RE.finditer(src))
    for i, m in enumerate(ms):
        end = ms[i + 1].start() if i + 1 < len(ms) else min(len(src), m.end() + 2000)
        neg = any(
            "expected_err" in ln and not ln.lstrip().startswith("#")
            for ln in src[m.end():end].splitlines()
        )
        out.append((m.group(2), neg))
    return out


def py2to3(src: str) -> str:
    """Mechanical jython(py2) → py3: print statements, string raises,
    binary-mode text writes. Deliberately minimal — the scripts only
    use these three py2-isms."""
    out = []
    for ln in src.splitlines():
        m = re.match(r"^(\s*)print (.+)$", ln)
        if m and not ln.strip().startswith("print("):
            ln = f"{m.group(1)}print({m.group(2)})"
        m = re.match(r"^(\s*)raise (\".*\"|'.*')\s*$", ln)
        if m:
            ln = f"{m.group(1)}raise Exception({m.group(2)})"
        ln = ln.replace("'wb+'", "'w+'")
        out.append(ln)
    return "\n".join(out)


@pytest.fixture(scope="module")
def jy_fixtures(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jython_inputs"))
    rng = random.Random(7)
    names = ["alice", "bob", "carol", "dave", "erin", "fred"]
    os.makedirs(f"{d}/singlefile", exist_ok=True)
    with open(f"{d}/singlefile/studenttab10k", "w") as f:
        for _ in range(1000):
            f.write(f"{rng.choice(names)}\t{rng.randint(18, 77)}\t{rng.uniform(0, 4):.2f}\n")
    with open(f"{d}/singlefile/votertab10k", "w") as f:
        for _ in range(1000):
            f.write(
                f"{rng.choice(names)}\t{rng.randint(18, 77)}\t"
                f"{rng.choice(['democrat', 'republican'])}\t{rng.uniform(0, 1000):.2f}\n"
            )
    os.makedirs(f"{d}/tmp", exist_ok=True)
    os.makedirs(f"{d}/out", exist_ok=True)
    return d


def _install_shims(monkey: dict):
    """sys.modules entries so `from org.apache.pig.scripting import
    Pig` resolves to the engine facade."""
    from pig_spark.embed import Pig

    for name in ("org", "org.apache", "org.apache.pig", "org.apache.pig.scripting"):
        mod = types.ModuleType(name)
        monkey[name] = sys.modules.get(name)
        sys.modules[name] = mod
    sys.modules["org"].apache = sys.modules["org.apache"]
    sys.modules["org.apache"].pig = sys.modules["org.apache.pig"]
    sys.modules["org.apache.pig"].scripting = sys.modules["org.apache.pig.scripting"]
    sys.modules["org.apache.pig.scripting"].Pig = Pig


def _restore_shims(monkey: dict):
    for name, prev in monkey.items():
        if prev is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = prev


def test_reference_jython_corpus(spark, jy_fixtures):
    if not os.path.exists(_CONF):
        pytest.skip("reference e2e corpus not available")
    with open(_CONF, errors="replace") as fh:
        src = fh.read()
    monkey: dict = {}
    _install_shims(monkey)
    pos_total = pos_ok = neg_total = neg_raised = 0
    failures: list[str] = []
    silent: list[str] = []
    outn = 0
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for s, neg in extract(src):
                if any(m in s.lower() for m in (m.lower() for m in _SKIP)):
                    continue
                outn += 1
                script = py2to3(
                    s.replace(":INPATH:", jy_fixtures)
                    .replace(":OUTPATH:", f"{jy_fixtures}/out/{outn}")
                    .replace(":TMP:", f"{jy_fixtures}/tmp")
                )
                glb = {"__name__": f"jython_case_{outn}"}
                if neg:
                    neg_total += 1
                    try:
                        exec(compile(script, f"<jython {outn}>", "exec"), glb)
                        silent.append(" ".join(script.split())[:90])
                    except Exception:
                        neg_raised += 1
                else:
                    pos_total += 1
                    try:
                        exec(compile(script, f"<jython {outn}>", "exec"), glb)
                        pos_ok += 1
                    except Exception as e:
                        failures.append(f"case {outn}: {type(e).__name__}: {str(e)[:100]}")
    finally:
        _restore_shims(monkey)
    print(
        f"jython corpus: {pos_ok}/{pos_total} control scripts run, "
        f"{neg_raised}/{neg_total} negatives raise"
    )
    for f in failures:
        print("   FAIL", f)
    for f in silent:
        print("   SILENT", f)
    assert pos_total >= 15, f"extraction broke: only {pos_total} positive scripts"
    assert pos_ok >= _POS_FLOOR, f"jython coverage regressed: {pos_ok}/{pos_total}; " + "; ".join(failures[:5])
    assert neg_raised >= _NEG_FLOOR, f"negatives regressed: {neg_raised}/{neg_total}"
    assert not silent, f"negative scripts ran silently: {silent[:3]}"


def test_utf8_embedded_driver_script(spark, jy_fixtures):
    """utf8.conf ships ONE snippet that is not Pig Latin but an
    embedded jython DRIVER (shebang + `from org.apache.pig.scripting
    import Pig`): it writes a CJK-pathed .pig file and runs it via
    compileFromFile().bind().runSingle(). The parse gate documents it
    as non-Pig; HERE it executes for real through the embed facade —
    CJK directory names, CJK script content, and the camelCase
    surface end-to-end."""
    conf = "/root/reference/test/e2e/pig/tests/utf8.conf"
    if not os.path.exists(conf):
        pytest.skip("reference e2e corpus not available")
    with open(conf, errors="replace") as fh:
        src = fh.read()
    drivers = [s for s, _neg in extract(src) if s.strip().startswith("#!")]
    assert drivers, "utf8.conf embedded driver disappeared from the corpus"
    # the driver filters the reference's utf8Student fixture
    os.makedirs(f"{jy_fixtures}/utf8Data/学生", exist_ok=True)
    with open(f"{jy_fixtures}/utf8Data/学生/utf8Student", "w") as f:
        for i, nm in enumerate(["佛", "张伟", "李娜", "佛", "王芳"]):
            f.write(f"{nm}\t{20 + i}\t{2.5 + i / 10:.2f}\n")
    monkey: dict = {}
    _install_shims(monkey)
    try:
        for i, s in enumerate(drivers):
            script = py2to3(
                s.replace(":INPATH:", jy_fixtures)
                .replace(":OUTPATH:", f"{jy_fixtures}/out/utf8driver{i}")
                .replace(":TMP:", f"{jy_fixtures}/tmp")
            )
            glb = {"__name__": f"utf8_driver_{i}"}
            exec(compile(script, f"<utf8 driver {i}>", "exec"), glb)
        # the driver's own success check ran (it raises on failure);
        # confirm the filtered store really landed the two 佛 rows
        out0 = f"{jy_fixtures}/out/utf8driver0"
        rows = open(
            [os.path.join(out0, p) for p in os.listdir(out0) if not p.startswith(("_", "."))][0],
            encoding="utf-8",
        ).read().strip().splitlines()
        assert len(rows) == 2 and all(r.startswith("佛\t") for r in rows)
    finally:
        _restore_shims(monkey)
