r"""Grammar coverage over the reference's ENTIRE e2e corpus.

Every Pig snippet in the reference e2e suites (test/e2e/pig/tests/
*.conf — the queries real Pig users' regression suite runs) must
PARSE through macros.expand + %default preprocessing + grammar.parse.
This is a parse gate, not an execution gate (snippets reference
:INPATH:-style harness placeholders and Java test UDF jars), but it
catches grammar regressions against ~465 real-world scripts at once.

Current floor: 604 of 608 (99%; all THREE perl q-delimiters —
q\...\, q#...# and r6's q?...? TOTUPLE/TOBAG suites — are extracted
across eleven confs including r6's cmdline.conf,
and blocks declaring a non-commented ``expected_err`` are negative
tests whose failure is correct behavior, so they are excluded).
:SCRIPTHOMEPATH: snippets are no longer skipped (r6): the harness
placeholder substitutes to the reference's own macros/streaming/udfs
directories, so IMPORTed macro files resolve for real.
NATIVE/MAPREDUCE snippets raise NotImplementedError by design
(SURVEY §2.2#26) and count as documented-unsupported, not failures.
Harness 'pig_params' are honored as -p/-m substitutions (late r6 —
this closed the bare `$setting` statement residual). r7: EVERY
snippet is classified — 604 parse + 3 documented NATIVE/MAPREDUCE
notimpl + 1 jython-suite driver script (the utf8.conf
`#!/usr/bin/python` control script, which EXECUTES end-to-end in
test_jython_corpus.py::test_utf8_embedded_driver_script) = 608/608,
zero unclassified failures (asserted).
"""

import re
import warnings

import pytest

from pig_spark.latin import grammar
from pig_spark.latin.macros import expand as expand_macros

_CONF_DIR = "/root/reference/test/e2e/pig/tests"
_SCRIPT_HOME = {
    "macro.conf": f"{_CONF_DIR}/../macros",
    "streaming.conf": f"{_CONF_DIR}/../streaming",
    "streaming_local.conf": f"{_CONF_DIR}/../streaming",
    "multiquery.conf": f"{_CONF_DIR}/../streaming",
    "bigdata.conf": f"{_CONF_DIR}/../streaming",
    "nightly.conf": f"{_CONF_DIR}/../udfs",
}
_CONFS = (
    "nightly.conf", "join.conf", "bigdata.conf", "multiquery.conf",
    "macro.conf", "streaming.conf", "streaming_local.conf",
    "utf8.conf", "orc.conf", "grunt.conf", "cmdline.conf",
)
_FLOOR = 604


def all_commented(s: str) -> bool:
    """cmdline.conf ships a few snippets whose every line is
    #-commented out (disabled harness tests, not Pig — Pig comments
    are -- and /* */)."""
    lines = [ln.strip() for ln in s.splitlines() if ln.strip()]
    return bool(lines) and all(ln.startswith("#") for ln in lines)


def _preprocess(src: str) -> str:
    params = {}
    out = []
    for line in src.splitlines():
        if re.match(r"\s*sh\s+\S", line) and not re.match(r"\s*sh\s*=", line):
            continue  # Grunt `sh <cmd>` is a preprocessor-level line
        if re.match(r"\s*fs\s+-\w", line):
            continue  # Grunt `fs -<cmd>` — engine handles it pre-parse too
        m = re.match(r"\s*%(declare|default)\s+(\w+)\s+(.+?)\s*;?\s*$", line)
        if m:
            v = m.group(3)
            # backtick command substitution: the engine executes it
            # (translate._preprocess); the parse gate just needs a
            # placeholder token standing in for the stdout
            params[m.group(2)] = "cmdout" if v.startswith("`") else v.strip("'\"")
            continue
        out.append(line)
    src = "\n".join(out)
    for name, value in params.items():
        src = re.sub(r"\$" + re.escape(name) + r"\b", lambda _m: str(value), src)
    return src


# all three perl quote delimiters the harness uses: q\...\, q#...#,
# q?...? (the TOTUPLE/TOBAG suites); the closing delimiter may be
# followed by whitespace before the next perl hash token (`,` `}` `]`)
_PIG_RE = re.compile(r"'pig' => q([\\#?])(.*?)\1(?=\s*[,}\]])", re.DOTALL)


_PARAMFILE_DIR = f"{_CONF_DIR}/../paramfiles"


def _harness_params(pre_window: str) -> dict[str, str]:
    """Parse a test block's ``'pig_params' => ['-p', qq(k='v'), ...]``
    declaration (TestDriverPig.pm passes these as ``pig -p k=v`` /
    ``-m paramfile``) into the substitution dict the engine's run()
    accepts. Only the LAST pig_params line before the snippet counts
    (it belongs to this test's hash)."""
    line = None
    for ln in pre_window.splitlines():
        if "'pig_params'" in ln and not ln.lstrip().startswith("#"):
            line = ln
    if line is None:
        return {}
    params: dict[str, str] = {}
    # -m <paramfile>: defaults loaded from a file of `k = v` lines
    fm = re.search(r"'-m'\s*,\s*\"?([^\"\]]+)", line)
    if fm:
        import os

        pf = fm.group(1).strip().replace(":PARAMPATH:", _PARAMFILE_DIR)
        if os.path.isfile(pf):
            with open(pf) as fh:
                for pl in fh:
                    pl = pl.strip()
                    if pl and not pl.startswith("#") and "=" in pl:
                        k, _, v = pl.partition("=")
                        params[k.strip()] = v.strip().strip("'\"")
    for pm in re.finditer(r"qq\((\w+)=(.*?)\)\s*[,\]]", line):
        params[pm.group(1)] = pm.group(2).strip().strip("'\"")
    return params


def extract_snippets(src: str) -> list[tuple[str, bool, dict]]:
    """(script, negative, params) triples from a .conf — ``negative``
    marks a block that declares ``expected_err``: the reference EXPECTS
    those scripts to fail (bad macro arity, unknown operators), so an
    engine error there is correct behavior, not a coverage miss.
    Commented-out directives (# 'expected_err_regex' …) do NOT count
    (r6 fix: they marked two positive nightly tests negative).
    ``params`` is the block's 'pig_params' declaration (the -p/-m
    values the harness passes to pig)."""
    out = []
    ms = list(_PIG_RE.finditer(src))
    for i, m in enumerate(ms):
        start = ms[i - 1].end() if i > 0 else max(0, m.start() - 2000)
        end = ms[i + 1].start() if i + 1 < len(ms) else min(len(src), m.end() + 2000)
        window = src[m.end():end]
        negative = any(
            "expected_err" in ln and not ln.lstrip().startswith("#")
            for ln in window.splitlines()
        )
        out.append((m.group(2), negative, _harness_params(src[start:m.start()])))
    return out


def test_reference_e2e_corpus_parses():
    import os

    if not os.path.isdir(_CONF_DIR):
        pytest.skip("reference e2e corpus not available")
    total = ok = notimpl = jython_driver = 0
    failures: list[str] = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for conf in _CONFS:
            path = os.path.join(_CONF_DIR, conf)
            if not os.path.exists(path):
                continue
            with open(path, errors="replace") as fh:
                src = fh.read()
            for s, negative, params in extract_snippets(src):
                if negative or all_commented(s):
                    continue  # error-expectation tests / disabled
                total += 1
                if re.match(r"\s*#!.*python", s.lstrip()):
                    # utf8.conf's one embedded JYTHON DRIVER script —
                    # a `#!/usr/bin/python` control script using the
                    # org.apache.pig.scripting API, not Pig Latin. It
                    # belongs to the jython suite, where it EXECUTES
                    # end-to-end (test_jython_corpus.py::
                    # test_utf8_embedded_driver_script) — classified,
                    # not a parse failure (VERDICT r6 #6)
                    jython_driver += 1
                    continue
                try:
                    # :SCRIPTHOMEPATH: is the harness's per-suite script
                    # dir (TestDriverPig.pm:84) — the reference ships
                    # those files, so IMPORTed macros resolve for real;
                    # 'pig_params' substitute like the harness's -p/-m
                    s_sub = s.replace(":SCRIPTHOMEPATH:", _SCRIPT_HOME.get(conf, f"{_CONF_DIR}/../streaming"))
                    for k, v in params.items():
                        s_sub = re.sub(r"\$" + re.escape(k) + r"\b", lambda _m, v=v: v, s_sub)
                    grammar.parse(_preprocess(expand_macros(s_sub)))
                    ok += 1
                except NotImplementedError:
                    notimpl += 1  # NATIVE/MAPREDUCE — documented
                except Exception as e:
                    failures.append(f"{conf}: {str(e)[:80]}")
    assert total > 550, f"corpus extraction broke: only {total} snippets found"
    assert ok >= _FLOOR, (
        f"parse coverage regressed: {ok}/{total} (floor {_FLOOR}); "
        + "; ".join(failures[:10])
    )
    # every snippet is CLASSIFIED: parses, documented NATIVE/MAPREDUCE
    # notimpl, or the jython-suite driver script — zero unclassified
    # parse failures (604 + 3 + 1 = 608 today)
    assert not failures, f"unclassified parse failures: {failures[:10]}"
    assert jython_driver == 1, f"expected exactly 1 embedded jython driver, got {jython_driver}"
    assert ok + notimpl + jython_driver == total
