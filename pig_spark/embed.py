"""Embedded orchestration: compile / bind / run Pig Latin from Python.

Parity with the reference's embedded-Pig API (`scripting/Pig.java`,
`scripting/BoundScript.java`, SURVEY §3.3): a control program
compiles a script once, binds parameter sets (one dict, or a list of
dicts for parallel sweeps), runs, inspects results, and iterates —
the canonical use being convergence loops (PageRank-style) where each
iteration's output feeds the next bind.

    from pig_spark.embed import Pig
    P = Pig.compile('''
        a = LOAD '$in' USING ParquetLoader();
        b = FILTER a BY l_quantity > $q;
        g = GROUP b ALL;
        c = FOREACH g GENERATE COUNT(b) AS n;
    ''')
    stats = P.bind({'in': path, 'q': 40}).run_single(spark)
    stats.result('c').dump()

Stats surface ≅ PigStats/JobStats (`tools/pigstats/PigStats.java`):
`is_successful`, `result(alias)`, `get_number_records(alias)`,
`get_output_locations`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from .dsl import Relation
from .latin.translate import PigTranslator


class ScriptStats:
    """Result of one bound run (≅ org.apache.pig.tools.pigstats.PigStats)."""

    def __init__(self, aliases: dict[str, Relation], stores: list[str], error: Exception | None = None):
        self._aliases = aliases
        self._stores = stores
        self._error = error

    def is_successful(self) -> bool:
        return self._error is None

    @property
    def error(self) -> Exception | None:
        return self._error

    def result(self, alias: str) -> Relation:
        """≅ PigStats.result(alias).iterator() — but lazy: the Relation."""
        if self._error is not None:
            raise self._error
        return self._aliases[alias]

    def get_number_records(self, alias: str) -> int:
        return self.result(alias).df.count()

    def get_output_locations(self) -> list[str]:
        """Paths written by STORE statements in this run."""
        return list(self._stores)

    def aliases(self) -> list[str]:
        return sorted(self._aliases)


class BoundScript:
    """≅ org.apache.pig.scripting.BoundScript."""

    def __init__(self, script: str, param_sets: list[dict[str, Any]]):
        self._script = script
        self._param_sets = param_sets

    def run_single(self, spark: SparkSession) -> ScriptStats:
        """Run with the single bound parameter set (BoundScript.runSingle)."""
        if len(self._param_sets) != 1:
            raise ValueError(f"run_single with {len(self._param_sets)} bound param sets; use run()")
        return self._run_one(spark, self._param_sets[0])

    def run(self, spark: SparkSession) -> list[ScriptStats]:
        """Run every bound parameter set (BoundScript.run — the reference
        launches these as parallel jobs; here each is an independent
        lazy plan on the shared SparkSession, so the driver loop is
        sequential but all cluster work stays distributed)."""
        return [self._run_one(spark, p) for p in self._param_sets]

    def _run_one(self, spark: SparkSession, params: dict[str, Any]) -> ScriptStats:
        tr = PigTranslator(spark, params={k: str(v) for k, v in params.items()})
        try:
            rels = tr.run(self._script)
        except Exception as e:  # PigStats.isSuccessful() == False path
            return ScriptStats({}, [], error=e)
        return ScriptStats(rels, tr.stores)


class Pig:
    """≅ org.apache.pig.scripting.Pig (compile/bind entry points)."""

    def __init__(self, script: str, name: str | None = None):
        self._script = script
        self.name = name

    @staticmethod
    def compile(script: str, name: str | None = None) -> "Pig":
        """Pig.compile(String pig_latin) — parse is deferred to run so
        unbound $params don't trip the grammar, same as the reference
        (bind-time substitution, Pig.java compile→bind→run)."""
        return Pig(script, name)

    @staticmethod
    def compile_from_file(path: str, name: str | None = None) -> "Pig":
        with open(path) as fh:
            return Pig(fh.read(), name)

    def bind(self, params: dict[str, Any] | list[dict[str, Any]] | None = None) -> BoundScript:
        """Bind one parameter dict (→ run_single) or a list of dicts
        (→ run, one stats per set). bind() with no args binds {}."""
        if params is None:
            params = {}
        sets = params if isinstance(params, list) else [params]
        return BoundScript(self._script, [dict(p) for p in sets])
