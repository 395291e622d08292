"""Pig Latin AST → pig_spark DSL translation.

Mirrors the reference pipeline (QueryParserDriver.parse →
LogicalPlanBuilder → LogicalPlan, PigServer.java:707): each statement
binds an alias to a lazy Relation; STORE/DUMP force execution.
Catalyst replaces all of Pig's logical optimization
(LogicalPlanOptimizer.java) — we only translate.

The load-bearing piece is FOREACH-over-GROUP: Pig's
  g = GROUP li BY k;  out = FOREACH g GENERATE group, SUM(li.x);
materializes reducer bags in the reference; here, when every GENERATE
item is a group-key or an algebraic aggregate, it lowers to
groupBy().agg() — bags never exist and Catalyst plans partial
aggregation (the CombinerOptimizer path). Non-algebraic FOREACH falls
back to the literal bag-form relation.
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import replace as G_replace

from pyspark.sql import Column, SparkSession
from pyspark.sql import Window as SparkWindow
from pyspark.sql import functions as F

from .. import functions as PF
from ..compat import cast_as
from ..dsl import Relation
from . import grammar as G

PIG_TO_SPARK_TYPE = {
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "chararray": "string",
    "boolean": "boolean",
    "datetime": "timestamp",
    # bytearray from text loaders IS utf8 text; backing it with string
    # (same convention as sources' schema sidecar) gives Pig's
    # coerce-on-use gradual typing for free: `age < 50` or AVG(age)
    # over an untyped field leans on Spark's legacy string→numeric
    # coercion, and explicit casts go through try_cast (null on
    # garbage) — a binary backing made every such use an analysis
    # error instead (POCast.java / Utf8StorageConverter.java)
    "bytearray": "string",
    "biginteger": "decimal(38,0)",
    "bigdecimal": "decimal(38,18)",
}

def _tuple_fields(ptype: str) -> list[tuple[str, str]]:
    """'tuple(a:int,b)' / '(a:int,b)' → [(name, pig_type), ...]."""
    body = ptype[ptype.index("(") + 1 : ptype.rindex(")")]
    fields = []
    for i, part in enumerate(_split_top(body)):
        name, sep, ftype = part.partition(":")
        fields.append((name.strip() if sep else (name.strip() or f"t{i}"), ftype.strip() if sep else "bytearray"))
    return fields


def pig_field_ddl(ptype: str | None) -> str:
    """Pig type (scalar or canonical complex string from the grammar)
    → Spark DDL type. map[] values default chararray→string (Pig's
    bytearray-in-maps reads as text here), bag{} → array<struct>."""
    t = (ptype or "bytearray").strip()
    lt = t.lower()
    if lt in PIG_TO_SPARK_TYPE:
        return PIG_TO_SPARK_TYPE[lt]
    if lt.startswith("map[") or lt.startswith("["):
        # 'map[int]' and the bare 'm:[]' spelling (QueryParser.g
        # map_type — both are legal schema syntax)
        inner = t[t.index("[") + 1 : t.rindex("]")].strip()
        return f"map<string,{pig_field_ddl(inner) if inner else 'string'}>"
    if lt.startswith("tuple(") or lt.startswith("("):
        fields = _tuple_fields(t)
        return "struct<" + ",".join(f"{n}:{pig_field_ddl(ft)}" for n, ft in fields) + ">"
    if lt.startswith("bag{") or lt.startswith("{"):
        inner = t[t.index("{") + 1 : t.rindex("}")].strip()
        if inner and ":" in inner.split("(")[0] and not inner.startswith("("):
            inner = inner.split(":", 1)[1].strip()  # drop the tuple alias
        return f"array<{pig_field_ddl(inner) if inner else 'struct<t:string>'}>"
    return "string"


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (nested (), {}, [] kept intact)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def pig_cast_ddl(t: str) -> str:
    """Pig CAST type syntax → Spark DDL. Unlike schema declarations
    (pig_field_ddl — name:type pairs), cast types carry BARE types:
    ``(bag{tuple(chararray, int, float)})`` (QueryParser.g type_cast;
    the empty-bag-default COGROUP idiom). Unnamed tuple fields get
    positional names."""
    lt = (t or "bytearray").strip().lower()
    t = t.strip()
    if lt in PIG_TO_SPARK_TYPE:
        return PIG_TO_SPARK_TYPE[lt]
    if lt.startswith("bag{") or lt.startswith("{"):
        inner = t[t.index("{") + 1 : t.rindex("}")].strip()
        return f"array<{pig_cast_ddl(inner) if inner else 'struct<t:string>'}>"
    if lt.startswith("tuple(") or lt.startswith("("):
        inner = t[t.index("(") + 1 : t.rindex(")")]
        parts = [p.strip() for p in _split_top(inner) if p.strip()]
        body = ",".join(
            f"{p.partition(':')[0].strip() if ':' in p.split('(')[0].split('{')[0] else f'f{i}'}:"
            f"{pig_cast_ddl(p.partition(':')[2].strip() if ':' in p.split('(')[0].split('{')[0] else p)}"
            for i, p in enumerate(parts)
        )
        return f"struct<{body}>"
    if lt.startswith("map["):
        inner = t[4:-1].strip()
        return f"map<string,{pig_cast_ddl(inner) if inner else 'string'}>"
    return "string"


def utf8_cast(col: Column, ptype: str | None) -> Column:
    """Utf8StorageConverter.java: one TEXT field → its declared type,
    including Pig's textual complex forms — ``[k#v,...]`` maps,
    ``(a,b)`` tuples, ``{(a,b),(c,d)}`` bags (scalar elements, the
    shapes PigStorage writes). Garbage → null, never an error. All
    Column ops (str_to_map / split / regexp_extract_all) — codegen,
    no Python."""
    t = (ptype or "bytearray").strip()
    lt = t.lower()
    if lt in PIG_TO_SPARK_TYPE:
        return col.try_cast(PIG_TO_SPARK_TYPE[lt])
    if lt.startswith("decimal(") or lt == "date":
        # raw Spark scalar DDL riding through a complex Pig type
        # string (stream._pig_type_ddl keeps nested precisions)
        return col.try_cast(lt)
    if lt.startswith("map["):
        inner = t[4:-1].strip()
        body = F.regexp_replace(F.regexp_replace(col, r"^\[", ""), r"\]$", "")
        # map_filter drops the {""→null} artifact str_to_map produces
        # for an empty body ("[]" → empty map)
        m = F.map_filter(
            F.str_to_map(body, F.lit(","), F.lit("#")), lambda k, _v: F.length(k) > 0
        )
        if inner and inner.lower() in PIG_TO_SPARK_TYPE and inner.lower() != "chararray":
            m = F.map_from_arrays(
                F.map_keys(m),
                F.transform(F.map_values(m), lambda v: v.try_cast(PIG_TO_SPARK_TYPE[inner.lower()])),
            )
        return F.when(col.rlike(r"^\[.*\]$"), m)
    if lt.startswith("tuple(") or lt.startswith("("):
        fields = _tuple_fields(t)
        body = F.regexp_replace(F.regexp_replace(col, r"^\(", ""), r"\)$", "")
        parts = F.split(body, ",")
        return F.when(
            col.rlike(r"^\(.*\)$"),
            F.struct(
                *[
                    utf8_cast(F.get(parts, i), ft).alias(n)
                    for i, (n, ft) in enumerate(fields)
                ]
            ),
        )
    if lt.startswith("bag{") or lt.startswith("{"):
        inner = t[t.index("{") + 1 : t.rindex("}")].strip()
        if inner and ":" in inner.split("(")[0] and not inner.startswith("("):
            inner = inner.split(":", 1)[1].strip()
        fields = _tuple_fields(inner) if inner else [("t", "bytearray")]
        tuples = F.regexp_extract_all(col, F.lit(r"\(([^()]*)\)"), 1)
        return F.when(
            col.rlike(r"^\{.*\}$"),
            F.transform(
                tuples,
                lambda s: F.struct(
                    *[
                        utf8_cast(F.get(F.split(s, ","), i), ft).alias(n)
                        for i, (n, ft) in enumerate(fields)
                    ]
                ),
            ),
        )
    return col.try_cast("string")


LOADER_FORMAT = {
    None: "pigstorage",
    "pigstorage": "pigstorage",
    "textloader": "text",
    "jsonloader": "json",
    "jsonstorage": "json",
    "avrostorage": "avro",
    "orcstorage": "orc",
    "parquetloader": "parquet",
    "parquetstorer": "parquet",
    # piggybank IndexedStorage(delim, index-cols): the data file is
    # plain delimited text; the .index sidecar is random-access
    # metadata with no Spark analogue (columnar min/max pruning and
    # bucketing cover that role — sources.store(bucket_by=, sort_by=))
    "indexedstorage": "pigstorage",
    # BinStorage is Pig's INTERNAL typed intermediate — its contract
    # is "readable by the same Pig version that wrote it" (docs warn
    # against external use). The same-engine contract here is parquet:
    # full type fidelity for store-then-load within/between scripts.
    # Byte-level interop with Java Pig's BinStorage files is out of
    # scope (COVERAGE.md §2.5), exactly as version-interop is in Pig.
    "binstorage": "parquet",
    # test-UDF jar (test/e2e/pig/udfs): SimpleCollectableLoader IS
    # PigStorage plus the CollectableLoadFunc marker (map-side
    # `group ... using 'collected'` eligibility — the engine's
    # collected-group path keys on the clause, not the loader)
    "simplecollectableloader": "pigstorage",
}

AGG_FUNCS = {"count", "count_star", "sum", "avg", "min", "max"}

# jar bundles whose classes are implemented ENGINE-SIDE — REGISTERing
# them succeeds without the file (functions/piggybank.py,
# functions/testudf.py; the datafu leaves the corpus uses resolve from
# the builtin registry); any OTHER missing jar raises ERROR 101
_ENGINE_JARS = {"piggybank.jar", "testudf.jar", "datafu.jar"}


class _JavaStub:
    """Stand-in for a java class referenced at module level by a
    jython scripting-UDF file (``Path('foo')``, PIG-1824): accepts any
    construction/call/attribute and returns itself."""

    def __init__(self, *_a, **_k):
        pass

    def __call__(self, *_a, **_k):
        return self

    def __getattr__(self, _name):
        return self


class _JavaImportStub:
    """Import-machinery shim for jython scripts' java imports
    (``from org.apache.hadoop.fs import Path``): fabricates permissive
    package modules under the org/java/javax roots so module-level
    java references don't kill the script — the UDF bodies themselves
    are plain Python. Installed only around scripting-UDF exec."""

    _ROOTS = ("org", "java", "javax")

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".", 1)[0] not in self._ROOTS:
            return None
        import importlib.machinery

        return importlib.machinery.ModuleSpec(fullname, self, is_package=True)

    def create_module(self, spec):
        import types

        mod = types.ModuleType(spec.name)
        mod.__path__ = []  # package, so submodule imports recurse here
        mod.__all__ = []  # star imports add nothing; see _JythonGlobals
        mod.__getattr__ = lambda name: _JavaStub()
        return mod

    def exec_module(self, module):
        pass


class _JythonGlobals(dict):
    """exec-globals for a script that does a java STAR import
    (``from org.apache... import *``): star imports can't enumerate a
    fabricated package, so unknown CamelCase names resolve to a
    _JavaStub at use — jython itself resolves java classes lazily the
    same way. Lowercase names still raise NameError normally."""

    def __missing__(self, name):
        if name[:1].isupper():
            return _JavaStub()
        raise KeyError(name)


# jython is Python 2: the dict-iterator idioms reference scripts use
# rewrite textually to their Python-3 spellings before compile
_PY2_REWRITES = ((".iteritems()", ".items()"), (".iterkeys()", ".keys()"), (".itervalues()", ".values()"))


def _deco_outputSchema(schema_str: str):  # noqa: N802 — Pig decorator name
    def deco(fn):
        fn._pig_output_schema = schema_str
        return fn

    return deco


def _deco_outputSchemaFunction(name: str):  # noqa: N802
    def deco(fn):
        fn._pig_schema_fn_ref = name
        return fn

    return deco


def _deco_schemaFunction(name: str):  # noqa: N802
    def deco(fn):
        fn._pig_schema_fn_name = name
        return fn

    return deco


# singletons, so a pig_util stub created by one REGISTER is still
# recognized (by identity) when a later REGISTER imports from it
_PIG_DECORATORS = {
    "outputSchema": _deco_outputSchema,
    "outputSchemaFunction": _deco_outputSchemaFunction,
    "schemaFunction": _deco_schemaFunction,
}

_SPARK_TO_PIG_TYPE = {v: k for k, v in reversed(PIG_TO_SPARK_TYPE.items())}


def _pig_text_value(v):
    """Render a Python value in Pig's textual forms — bag {(..),(..)},
    tuple (..), map [k#v] — the shape a bytearray cast of a complex
    jython result produces (JythonUtils.pythonToPig → TextDataParser
    round-trip). A null INSIDE a container writes as an empty field
    ('(7,)' not '(7,None)'), Pig's text form for null."""

    def fld(x):
        return "" if x is None else str(_pig_text_value(x))

    if v is None or isinstance(v, str):
        return v
    if isinstance(v, list):
        return "{" + ",".join(
            fld(x) if isinstance(x, tuple) else f"({fld(x)})" for x in v
        ) + "}"
    if isinstance(v, tuple):
        return "(" + ",".join(fld(x) for x in v) + ")"
    if isinstance(v, dict):
        return "[" + ",".join(f"{k}#{fld(x)}" for k, x in v.items()) + "]"
    return str(v)


def _stringify_result(fn):
    def wrapped(*a, **k):
        return _pig_text_value(fn(*a, **k))

    return wrapped


class _ScriptUDF:
    """One scripting-UDF function with its declared Pig return type.
    ``@outputSchemaFunction`` UDFs (JythonFunction.java outputSchema
    delegation) defer typing to call time: the named schema function
    maps the INPUT's Pig type to the output type, so the translator
    passes the relation for input-type resolution."""

    def __init__(self, fn, ddl: str | None, schema_fn=None):
        self.fn, self.ddl, self.schema_fn = fn, ddl, schema_fn

    def __call__(self, *cols, _rel=None):
        ddl = self.ddl
        if ddl is None and self.schema_fn is not None and _rel is not None and cols:
            spark_t = _rel.df.select(cols[0]).schema[0].dataType.simpleString()
            pig_in = _SPARK_TO_PIG_TYPE.get(spark_t, spark_t)
            try:
                out = self.schema_fn(pig_in)
            except Exception:
                out = pig_in
            ddl = pig_field_ddl(str(out))
        fn = self.fn
        if (ddl or "string") == "string":
            # bytearray/chararray-typed result: coerce complex Python
            # values through Pig's text forms ({(..)}, (..), [k#v]) —
            # JythonUtils.pythonToPig + bytearray cast semantics for
            # un-annotated functions returning lists/tuples/dicts
            fn = _stringify_result(self.fn)
        # Arrow-optimized Python UDF (SPARK-40307) for scalar-in/
        # scalar-out signatures: identical row-at-a-time call semantics
        # (each value arrives as a plain Python object, None stays
        # None) but Arrow batch transport instead of pickled rows —
        # the plan node becomes ArrowEvalPython. This is the hot path
        # a reference user actually drives with data volume (per-row
        # cleanup UDFs over every document). Bag/tuple/map signatures
        # keep classic row mode: complex values cross the Arrow
        # boundary as dicts/lists rather than Rows, which would change
        # what the script function sees.
        use_arrow = _scalar_ddl(ddl or "string")
        if use_arrow and _rel is not None and cols:
            try:
                in_types = _rel.df.select(*cols).schema.fields
                use_arrow = all(_scalar_ddl(f.dataType.simpleString()) for f in in_types)
            except Exception:
                use_arrow = False
        if use_arrow:
            try:
                return F.udf(fn, ddl or "string", useArrow=True)(*cols)
            except TypeError:  # pyspark without the useArrow kwarg
                pass
        return F.udf(fn, ddl or "string")(*cols)


# builtin/Invoker.java user-facing wrappers → Spark return types
# (InvokeForInt.java .. InvokeForString.java)
_INVOKER_RETURNS = {
    "InvokeForInt": "int",
    "InvokeForLong": "bigint",
    "InvokeForFloat": "float",
    "InvokeForDouble": "double",
    "InvokeForString": "string",
}


def _scalar_ddl(ddl: str) -> bool:
    """True when a Spark DDL type string is a plain scalar (no
    array/map/struct nesting) — the signatures eligible for the
    Arrow-optimized UDF path."""
    d = ddl.lower()
    return "<" not in d and not any(t in d for t in ("array", "map", "struct"))


def _load_script_udfs(path: str, engine: str = "jython") -> dict:
    """Execute a Pig scripting-UDF file (REGISTER ... USING jython AS
    ns — scripting/jython/JythonScriptEngine.java; USING
    streaming_python — python/PythonScriptEngine.java: that engine IS
    CPython, exactly what runs here) and wrap its public functions as
    Spark UDFs. Pig's decorator surface works verbatim:
    ``@outputSchema('name:type')`` declares the return type
    (un-annotated functions default to chararray, like Pig's
    bytearray-as-default); ``@outputSchemaFunction`` +
    ``@schemaFunction`` delegate typing to a function of the input
    schema; ``from pig_util import outputSchema`` (the
    streaming_python idiom) resolves against an injected stub; java
    imports in jython files resolve to permissive stubs (PIG-1824
    module-level references). The script's own directory joins
    sys.path during exec so sibling helper modules import
    (JythonScriptEngine adds the script dir to jython's path).
    Scripting UDFs are arbitrary row-at-a-time Python — the sanctioned
    slow path, same class as STREAM THROUGH; prefer the builtin Column
    library for anything hot."""
    import os as _os
    import re as _re
    import sys as _sys
    import types as _types

    decorators = _PIG_DECORATORS
    with open(path, encoding="utf-8") as fh:
        code = fh.read()
    for old, new in _PY2_REWRITES:
        code = code.replace(old, new)
    # java-class references are a JYTHON capability (the interpreter
    # runs on the JVM); streaming_python is plain CPython in the
    # reference too, so its files get no java stubs — an org.* import
    # there fails exactly as it would under Pig
    jython = engine.lower() not in ("streaming_python", "cpython")
    glb: dict = (
        _JythonGlobals()
        if jython and _re.search(r"from\s+(?:org|java|javax)[\w.]*\s+import\s+\*", code)
        else {}
    )
    glb.update(decorators)
    finder = _JavaImportStub() if jython else None
    script_dir = _os.path.dirname(_os.path.abspath(path))
    # the pig_util stub lives in sys.modules only for the duration of
    # the exec (save/restore, like the meta_path finder) so it never
    # shadows a real user-installed pig_util package for the rest of
    # the process; decorator identity across REGISTERs still holds
    # because the decorators themselves are module singletons
    saved_pig_util = _sys.modules.get("pig_util")
    if saved_pig_util is None:
        pig_util = _types.ModuleType("pig_util")
        for dname, deco in decorators.items():
            setattr(pig_util, dname, deco)
        _sys.modules["pig_util"] = pig_util
    if finder is not None:
        _sys.meta_path.insert(0, finder)
    _sys.path.insert(0, script_dir)
    try:
        exec(compile(code, path, "exec"), glb)  # noqa: S102 — user-registered script, like Pig
    finally:
        if finder is not None:
            _sys.meta_path.remove(finder)
        if script_dir in _sys.path:
            _sys.path.remove(script_dir)
        if saved_pig_util is None:
            _sys.modules.pop("pig_util", None)
        else:
            _sys.modules["pig_util"] = saved_pig_util
    # sibling helper modules the script imported (JythonScriptEngine
    # puts the script dir on the interpreter path) exist only on the
    # driver — ship them INSIDE the pickled UDF, or the executor's
    # unpickle dies with ModuleNotFoundError
    try:
        from pyspark import cloudpickle as _cp

        for mod in list(_sys.modules.values()):
            mf = getattr(mod, "__file__", None)
            if mf and _os.path.dirname(_os.path.abspath(mf)) == script_dir:
                _cp.register_pickle_by_value(mod)
    except Exception:
        pass
    schema_fns = {
        getattr(obj, "_pig_schema_fn_name"): obj
        for obj in glb.values()
        if callable(obj) and getattr(obj, "_pig_schema_fn_name", None)
    }
    deco_ids = {id(d) for d in decorators.values()}
    out: dict = {}
    for name, obj in glb.items():
        if name.startswith("_") or not callable(obj) or isinstance(obj, (type, _JavaStub)):
            continue
        if id(obj) in deco_ids:
            continue
        if getattr(obj, "_pig_schema_fn_name", None):
            continue  # schema functions aren't UDFs themselves
        schema = getattr(obj, "_pig_output_schema", None)
        ref = getattr(obj, "_pig_schema_fn_ref", None)
        out[name] = _ScriptUDF(
            obj,
            _script_udf_ddl(schema) if schema else (None if ref else "string"),
            schema_fns.get(ref) if ref else None,
        )
    return out


def _script_udf_ddl(schema: str) -> str:
    """@outputSchema string → Spark DDL type: strip the outer field
    name, then the shared Pig-type mapper handles scalars, tuples
    (both ``(...)`` and ``tuple(...)`` spellings), bags and maps."""
    body = schema.strip()
    head, sep, rest = body.partition(":")
    if sep and not any(ch in head for ch in "({["):
        body = rest.strip()
    return pig_field_ddl(body)


def _sub_positional(e, sub: dict[str, str]):
    """Rewrite ``$0`` / ``$1`` column heads per ``sub`` throughout an
    expression tree (GROUP-output positional refs → group / bag)."""
    if isinstance(e, G.Col):
        head, dot, rest = e.name.partition(".")
        if head in sub:
            return G.Col(sub[head] + dot + rest)
        return e
    if isinstance(e, G.Bin):
        return G.Bin(e.op, _sub_positional(e.left, sub), _sub_positional(e.right, sub))
    if isinstance(e, G.Cast):
        return G.Cast(e.type, _sub_positional(e.operand, sub))
    if isinstance(e, G.Call):
        return G.Call(e.func, [_sub_positional(a, sub) for a in e.args])
    if isinstance(e, G.BinCond):
        return G.BinCond(
            _sub_positional(e.cond, sub),
            _sub_positional(e.then, sub),
            _sub_positional(e.otherwise, sub),
        )
    return e


def _orderable(dtype) -> bool:
    """True when a column of this type can appear in an ORDER BY
    (maps — and anything containing one — cannot)."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.MapType):
        return False
    if isinstance(dtype, T.ArrayType):
        return _orderable(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return all(_orderable(f.dataType) for f in dtype.fields)
    return True


def _group_key(kname: str, key_exprs) -> str:
    """Resolve a ``group.<ref>`` deref to a key column name —
    positional ``group.$N`` (QueryParser.g col_ref: tuple deref
    applies to the implicit 'group' tuple) or by field name."""
    if kname.startswith("$"):
        idx = int(kname[1:])
        if idx >= len(key_exprs):
            raise NameError(
                f"pig latin: group.${idx} — the group key has only {len(key_exprs)} fields"
            )
        return key_exprs[idx][0]
    return kname


def _suggest(name: str, candidates: list[str]) -> str:
    """' — did you mean X?' fragment for unknown-name errors."""
    import difflib

    close = difflib.get_close_matches(name, candidates, n=2, cutoff=0.6)
    if not close and name.upper() != name:
        close = difflib.get_close_matches(name.upper(), candidates, n=2, cutoff=0.6)
    return f" — did you mean {' or '.join(repr(c) for c in close)}?" if close else ""


@dataclass
class GroupedInfo:
    key_exprs: list[tuple[str, Column]]  # output key name → child expr
    child: Relation
    child_alias: str
    # columns ADDED to the child by nested expression aliases / inner
    # FOREACH projections — excluded from whole-tuple pipe outputs
    # (FLATTEN(l) must emit the original tuple)
    derived: tuple[str, ...] = ()
    # CUBE/ROLLUP statements carry explicit grouping sets (lists of key
    # names); None = plain GROUP BY. Lowered to df.groupingSets so
    # partial aggregation stays below the Expand node (LOCube.java
    # desugars to row expansion BEFORE the shuffle — strictly worse).
    sets: list[list[str]] | None = None


@dataclass
class RelInfo:
    rel: Relation
    grouped: GroupedInfo | None = None


@dataclass
class _Pipe:
    """Flattened state of an inner-bag pipeline inside FOREACH { }."""

    col: str | None = None
    distinct: bool = False
    cond: object = None
    ordered: bool = False
    limited: bool = False
    order_keys: object = None  # list[(col, asc)] from nested ORDER
    limit_n: int | None = None
    # inner-FOREACH projection: output field name → materialized
    # (mangled) child column; the pipe's tuple is exactly these fields
    proj: dict[str, str] | None = None
    # inner-FOREACH with FLATTEN: the pipe's tuples are the ELEMENTS of
    # this per-row array column (multiplicity lives inside the array —
    # the child row count is untouched, so sibling pipes stay correct)
    arr: str | None = None
    # ops chained AFTER a LIMIT, in statement order: the flags above
    # apply in canonical filter→distinct→order→limit order, so a
    # later op that must see the SLICED bag (f = FILTER l BY ...)
    # records here and consumers (_pipe_bag) replay it sequentially
    # after the slice — Pig's dataflow order, not the flag order
    post_ops: list | None = None

    def copy(self) -> "_Pipe":
        return _Pipe(
            self.col, self.distinct, self.cond, self.ordered, self.limited,
            self.order_keys, self.limit_n, self.proj, self.arr,
            list(self.post_ops) if self.post_ops else None,
        )


@dataclass
class _SortedCollect:
    """Internal topk-frame aggregate: collect one LIMIT pipe's column
    as an array in the pipe's bag iteration order (declared ORDER keys
    or the pinned stand-in) — the bounded (≤ limit_n) bag arguments of
    the multi-bag aggregates COR/COV (builtin/COR.java computeAll walks
    both bags with paired iterators, so positional order matters)."""

    col: str
    order: list | None = None  # [(frame col, asc)] — set once the frame is built


def _pairwise_stats(fn: str, argrefs: list[str]) -> Column:
    """COR/COV over collected bag-value arrays (builtin/COR.java:66-101
    exec + computeAll; COV.java:60-95): for each argument pair i<j emit
    (var_i, var_j, stat) — Pig's output bag — with the running sums of
    computeAll's dual-iterator walk computed via array aggregates over
    the zipped arrays, pure codegen. Pig returns null for the whole
    bag when a pair's iterators misalign (computeAll throws, exec
    catches); here that is a size mismatch → null result."""
    eq = F.lit(True)
    for r in argrefs[1:]:
        eq = eq & (F.size(F.col(argrefs[0])) == F.size(F.col(r)))
    pairs = []
    for i in range(len(argrefs)):
        for j in range(i + 1, len(argrefs)):
            a = F.transform(F.col(argrefs[i]), lambda x: x.cast("double"))
            b = F.transform(F.col(argrefs[j]), lambda x: x.cast("double"))
            n = F.size(F.col(argrefs[i])).cast("double")
            sx = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)
            sy = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x)
            sxx = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
            syy = F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
            sxy = F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
            )
            if fn == "cor":
                # (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
                stat = (n * sxy - sx * sy) / F.sqrt(
                    (n * sxx - sx * sx) * (n * syy - sy * sy)
                )
            else:
                # COV.java: (n·Σxy − Σx·Σy) / n²  (population covariance)
                stat = (n * sxy - sx * sy) / (n * n)
            pairs.append(
                F.struct(
                    F.lit(f"var{i}").alias("var_x"),
                    F.lit(f"var{j}").alias("var_y"),
                    stat.alias(fn),
                )
            )
    return F.when(eq, F.array(*pairs))


class PigTranslator:
    def __init__(
        self,
        spark: SparkSession,
        params: dict[str, str] | None = None,
        execute_stores: bool = True,
    ):
        self.spark = spark
        self.aliases: dict[str, RelInfo] = {}
        self.outputs: dict[str, object] = {}
        # DESCRIBE of a nested inner alias (describe C::D — Pig
        # prints the inner relation's schema): recorded as each
        # nested block translates
        self.nested_schemas: dict[str, str] = {}
        self.stores: list[str] = []  # paths written by STORE
        self.sink_aliases: list[str] = []  # STORE/DUMP target aliases, script order
        self.params = params or {}
        self.registered: list[str] = []
        self.script_udfs: dict[str, dict] = {}  # REGISTER ... AS ns → {fn: udf}
        self._job_ship: list[str] = []  # union of DEFINE SHIP files (job-scoped)
        self.defines: dict[str, str] = {}
        # STOREs are deferred to end-of-script (Pig batch semantics:
        # PigServer executes the whole plan at the last STORE) so the
        # MultiQuery planner can cache subplans shared between sinks
        self._pending_stores: list[tuple[Relation, str, str, str, dict]] = []
        # False for describe/explain/illustrate: the reference's
        # BoundScript plan-inspection methods never run the sinks
        self.execute_stores = execute_stores

    # ------------------------------------------------------------------
    def run(self, src: str) -> dict[str, Relation]:
        from .macros import expand as _expand_macros

        src = _expand_macros(src)
        src = self._preprocess(src)
        # token-aware substitution: '$a' must not rewrite the prefix of
        # '$ab' (Pig's PreprocessorContext substitutes whole names)
        import re as _re

        for name, value in self.params.items():
            sval = str(value)
            src = _re.sub(r"\$" + _re.escape(name) + r"\b", lambda _m: sval, src)
        # any named $param still present is undefined — fail like the
        # reference preprocessor (PreprocessorContext.substitute:
        # "Undefined parameter : <name>") instead of parsing '$out'
        # as a literal path and silently writing a '$out' directory.
        # \$digit positional refs and \\$-escapes are not parameters,
        # and neither is bare `$_` (perl idiom inside backtick stream
        # commands): Pig's parameter IDENTIFIER must contain a letter
        # (PigFileParser.jj:265 `(<SPECIALCHAR>)*<LETTER>...`).
        # Comments don't participate (the reference preprocessor passes
        # them through; the lexer drops them at parse time), so search
        # comment-stripped text — but keep string/backtick literals,
        # where $params DO substitute and an undefined one must raise.
        searchable = _re.sub(
            r"('(?:\\.|[^'\\])*')|(`[^`]*`)|--[^\n]*|/\*.*?\*/",
            lambda m: m.group(1) or m.group(2) or " ",
            src,
            flags=_re.S,
        )
        leftover = _re.search(r"(?<!\\)\$(_*[A-Za-z]\w*)", searchable)
        if leftover:
            raise ValueError(f"Undefined parameter : {leftover.group(1)}")
        script = G.parse(src)
        for stmt in script.statements:
            self._stmt(stmt)
        self._flush_stores()
        return {a: info.rel for a, info in self.aliases.items()}

    def _flush_stores(self) -> None:
        """Execute pending STOREs through the MultiQuery planner —
        subplans shared by several sinks are detected automatically and
        cached once (MultiQueryOptimizer.java equivalent)."""
        if not self._pending_stores or not self.execute_stores:
            self._pending_stores = []
            return
        from ..operators.multisink import multi_store

        sinks = [(rel.df, store_fn) for rel, _path, store_fn in self._pending_stores]
        self._pending_stores = []
        # bin/pig semantics: -M disables the multiquery cache
        # (pig.opt.multiquery=false), and the batch default runs every
        # independent sink even after one fails — -F / stop.on.failure
        # aborts on the first failure instead (Main.java -F handling)
        conf = self.spark.conf
        shared = [] if conf.get("pig.opt.multiquery", "true") == "false" else None
        stop = conf.get("pig.stop.on.failure", "false") == "true"
        multi_store(sinks, shared=shared, stop_on_failure=stop)

    def relation(self, alias: str) -> Relation:
        return self.aliases[alias].rel

    def _preprocess(self, src: str) -> str:
        """Parameter preprocessor (tools/parameters in the reference):
        %declare NAME value (always set) and %default NAME value (set
        unless passed via params). Lines are consumed, values join the
        $NAME substitution map. Lines this pass EXECUTES (sh / fs) get
        the accumulated parameters substituted FIRST — the reference
        preprocessor rewrites the whole file before Grunt runs any of
        it, so `fs -rmr $out` must see the bound value, not '$out'."""
        import re as _re

        def _sub_params(text: str) -> str:
            for name, value in self.params.items():
                text = _re.sub(r"\$" + _re.escape(name) + r"\b", lambda _m, v=str(value): v, text)
            return text

        out_lines = []
        sql_buf: list[str] = []  # multi-line `sql <ddl> ... ;` statement
        for line in src.splitlines():
            if "$" in line:
                # top-to-bottom: a $ref sees every param bound so far
                # (callers' params + earlier %declare/%default lines)
                line = _sub_params(line)
            if sql_buf:
                sql_buf.append(line)
                if line.rstrip().endswith(";"):
                    self._run_sql_command(" ".join(sql_buf))
                    sql_buf = []
                continue
            sqlm = _re.match(r"\s*sql\s+(.*)$", line, _re.IGNORECASE)
            if sqlm and not _re.match(r"\s*sql\s*=", line, _re.IGNORECASE):
                # Grunt `sql <stmt>;` (GruntParser.processSQLCommand:
                # 1267, pig.sql.type=hcat): DDL to the SQL engine —
                # here Spark's own catalog (sources/hcatalog.py). The
                # statement runs up to its terminating ';', possibly
                # spanning lines, at preprocess time like sh/fs; same
                # explain-mode skip (GruntParser.java:1327 ignores
                # 'sql' under explain/check)
                rest = sqlm.group(1)
                if rest.rstrip().endswith(";"):
                    self._run_sql_command(rest)
                else:
                    sql_buf = [rest]
                continue
            sh = _re.match(r"\s*sh\s+(.+?)\s*;?\s*$", line)
            if sh and not _re.match(r"\s*sh\s*=", line):
                # Grunt `sh <command>` (GruntParser.processShCommand):
                # run via the shell, keep going on non-zero exit (Grunt
                # prints the status and continues). Skipped entirely
                # during plan inspection — the reference executes sh
                # only `if (mExplain == null)` (GruntParser.java:1203)
                if self.execute_stores:
                    import subprocess

                    subprocess.run(sh.group(1), shell=True, check=False)
                continue
            fsm = _re.match(r"\s*fs\s+(-?\w+\s*.*?)\s*;?\s*$", line)
            if fsm and not _re.match(r"\s*fs\s*=", line):
                # Grunt `fs -<cmd> args` inside a script (GruntParser.
                # processFsCommand → hadoop FsShell): shared local-FS
                # equivalents, continue on non-zero like Grunt. Same
                # explain-mode skip (GruntParser.java:1174)
                if self.execute_stores:
                    from ..fsshell import fs_shell

                    fs_shell(fsm.group(1))
                continue
            m = _re.match(r"\s*%(declare|default)\s+(\w+)\s+(.+?)\s*;?\s*$", line)
            if m:
                kind, name, value = m.groups()
                if value.startswith("`") and value.rstrip().endswith("`"):
                    # backtick command substitution (PreprocessorContext
                    # .java processShellCmd: run the command, the value
                    # is its stdout, trailing newline stripped)
                    import subprocess

                    value = subprocess.run(
                        value.strip().strip("`"), shell=True, capture_output=True, text=True, check=True
                    ).stdout.rstrip("\n")
                else:
                    value = value.strip("'\"")
                if kind == "declare" or name not in self.params:
                    self.params[name] = value
                continue
            out_lines.append(line)
        if sql_buf:  # unterminated trailing sql statement — run as-is
            self._run_sql_command(" ".join(sql_buf))
        return "\n".join(out_lines)

    def _run_sql_command(self, stmt: str) -> None:
        """Execute one Grunt ``sql`` statement (sources/hcatalog.py);
        skipped during plan inspection like sh/fs (GruntParser.java:
        1327 warns-and-ignores 'sql' under explain -script/-check)."""
        if self.execute_stores:
            from ..sources.hcatalog import run_sql

            run_sql(self.spark, stmt)

    # ------------------------------------------------------------------
    def _stmt(self, stmt):
        if isinstance(stmt, G.Assign):
            self.aliases[stmt.alias] = self._op(stmt.op, stmt.alias)
        elif isinstance(stmt, G.Realias):
            self.aliases[stmt.alias] = self.aliases[stmt.src]
        elif isinstance(stmt, G.Store):
            # fully-qualified class storers resolve by leaf name
            # (org.apache.pig.piggybank.storage.CSVExcelStorage →
            # CSVExcelStorage), as Pig resolves registered classes
            storer = (stmt.storer or "pigstorage").rsplit(".", 1)[-1].lower()
            args = list(stmt.storer_args or [])
            if storer == "hbasestorage":
                # HBaseStorage(columnList[, options]) — cell-model
                # facade store (putNext: field 0 = row key, scalars one
                # cell each, maps one cell per entry); appends (puts
                # are upserts), so no clobber check applies
                from ..sources.hbase import store_hbase

                if not args:
                    raise ValueError("HBaseStorage needs a column list argument")
                store_fn = lambda d, p=stmt.path, cl=args[0], o=(args[1] if len(args) > 1 else ""): store_hbase(d, p, cl, o)  # noqa: E731
            elif storer == "accumulostorage":
                from ..sources.accumulo import store_accumulo

                if not args:
                    raise ValueError("AccumuloStorage needs a columns argument")
                store_fn = lambda d, p=stmt.path, cl=args[0], o=(args[1] if len(args) > 1 else ""): store_accumulo(d, p, cl, o)  # noqa: E731
            elif storer == "hcatstorer":
                # HCatStorer([partitionSpec]) — catalog-native append
                # into an existing table (sources/hcatalog.py; the INTO
                # target is the table name, not a path)
                from ..sources.hcatalog import store_hcat

                store_fn = lambda d, t=stmt.path, ps=(args[0] if args else ""): store_hcat(d, t, ps)  # noqa: E731
            elif storer == "dbstorage":
                # DBStorage(driver, url[, table]) — builtin/DBStorage.java
                # ctor order; the INTO target doubles as the table name
                # when no explicit table arg is given, and as the url for
                # `STORE x INTO 'sqlite:///db' USING DBStorage()`.
                from ..sources.db import store_db

                url = next((a for a in args if "://" in a or a.lower().startswith("jdbc:")), None)
                if url is None:
                    url, table = stmt.path, (args[-1] if args else "pig_out")
                else:
                    table = stmt.path
                store_fn = lambda d, u=url, t=table: store_db(d, u, t)  # noqa: E731
            elif storer == "stringstore":
                # test-UDF jar StringStore (storefunc/StringStore.java):
                # putNext writes tuple.toString() — one Pig-rendered
                # tuple per line, complex values in their Pig text forms
                def _store_stringstore(d, p=stmt.path):
                    from ..sources import _complex_to_pig_text

                    dfs = _complex_to_pig_text(d)
                    line = F.concat(
                        F.lit("("),
                        F.concat_ws(",", *[
                            F.coalesce(dfs[c].cast("string"), F.lit(""))
                            for c in dfs.columns
                        ]),
                        F.lit(")"),
                    )
                    dfs.select(line.alias("value")).write.text(p)

                store_fn = _store_stringstore
            elif storer in LOADER_FORMAT:
                fmt = LOADER_FORMAT[storer]
                opts = {}
                if any(a.strip().lower() == "-schema" for a in args):
                    opts["schema_sidecar"] = True
                args = [a for a in args if not a.strip().lower().startswith("-")]
                sep = _unescape_delim(args[0]) if args else "\t"
                from ..sources import store as _sstore

                # SET pig.error-handling.enabled true → tolerant store
                # (ErrorHandling.java; thresholds per PigConfiguration:
                # pig.error-handling.min.error.records /
                # pig.error-handling.error.threshold)
                conf = self.spark.conf
                # only delimited-text storers participate — mirrors
                # Pig, where a StoreFunc opts in by implementing the
                # ErrorHandling interface; others store normally
                if fmt in ("csv", "pigstorage") and conf.get("pig.error-handling.enabled", "false") == "true":
                    opts["on_error"] = "skip"
                    opts["min_error_records"] = int(
                        conf.get("pig.error-handling.min.error.records", "0")
                    )
                    opts["max_error_frac"] = float(
                        conf.get("pig.error-handling.error.threshold", "0.0")
                    )
                store_fn = lambda d, p=stmt.path, f=fmt, s=sep, o=opts: _sstore(d, p, format=f, sep=s, **o)  # noqa: E731
            else:
                raise NameError(
                    f"unknown storer {stmt.storer!r} — one of "
                    f"{sorted(k for k in LOADER_FORMAT if k)}, DBStorage, HBaseStorage, AccumuloStorage or HCatStorer"
                )
            import os as _os

            if storer not in ("dbstorage", "hbasestorage", "accumulostorage", "hcatstorer") and self.execute_stores and _os.path.exists(stmt.path):
                # Pig refuses to clobber an existing output location
                # (InputOutputFileValidator ERROR 6000, negative.conf
                # 'store into existing file'); remove it first (fs -rmr)
                # or store elsewhere — the DSL .store(mode=...) keeps
                # Spark's explicit-mode semantics for programmatic use
                raise ValueError(
                    f"pig latin: output location {stmt.path!r} already exists "
                    "(ERROR 6000 Output Location Validation Failed)"
                )
            self._pending_stores.append((self._rel(stmt.rel), stmt.path, store_fn))
            self.stores.append(stmt.path)
            self.sink_aliases.append(stmt.rel)
        elif isinstance(stmt, G.Simple) and stmt.op == "dump":
            self.sink_aliases.append(stmt.rel)
            if not self.execute_stores:
                # plan-inspection translation (BoundScript.describe/
                # explain/illustrate): never run jobs for DUMPs
                return
            from ..render import render_row

            rows = self._rel(stmt.rel).df.collect()
            self.outputs[stmt.rel] = rows
            for r in rows[:100]:
                print(render_row(r))
        elif isinstance(stmt, G.Simple) and stmt.op == "describe":
            if not self.execute_stores:
                # plan-inspection translation (explain -script /
                # BoundScript.describe): GruntParser.processExplain
                # only COMPILES the script — in-script describe/
                # explain/illustrate/DUMP print and run nothing
                return
            if stmt.rel in (None, "@"):
                # bare describe / describe @ — last-defined alias
                # (processDescribe's getLastAlias path + its error)
                if not self.aliases:
                    raise NameError(
                        "No previously defined alias found. Please define an "
                        "alias and use 'describe' operator."
                    )
                stmt = G.Simple("describe", list(self.aliases)[-1])
            if stmt.rel in self.nested_schemas:
                # describe <alias>::<inner> — the nested block's inner
                # relation schema (Pig DESCRIBE nested alias support)
                print(f"{stmt.rel}: {self.nested_schemas[stmt.rel]}")
            else:
                print(f"{stmt.rel}: {self._rel(stmt.rel).describe()}")
        elif isinstance(stmt, G.Simple) and stmt.op == "explain":
            if not self.execute_stores:
                return  # plan-inspection translation — see describe
            self._rel(stmt.rel).explain()
        elif isinstance(stmt, G.ExplainStmt):
            if not self.execute_stores:
                return  # plan-inspection translation — see describe
            self._explain_stmt(stmt)
        elif isinstance(stmt, G.Simple) and stmt.op == "illustrate":
            if not self.execute_stores:
                return  # plan-inspection translation — see describe
            self._rel(stmt.rel).illustrate()
        elif isinstance(stmt, G.SplitStmt):
            parent = self._rel(stmt.rel)
            conds = [self._expr(c, parent) for _, c in stmt.branches if c is not None]
            has_otherwise = any(c is None for _, c in stmt.branches)
            outs = parent.split(*conds, otherwise=has_otherwise)
            for (alias, _), rel in zip(stmt.branches, outs):
                self.aliases[alias] = RelInfo(rel)
        elif isinstance(stmt, G.Simple) and stmt.op == "register":
            self.registered.append(stmt.rel)  # recorded no-op: code is Python-native
        elif isinstance(stmt, G.Register):
            self.registered.append(stmt.path)
            import os as _os

            if (
                stmt.path.endswith(".jar")
                and "://" not in stmt.path
                and not any(ch in stmt.path for ch in "*?{[")
                and _os.path.basename(stmt.path) not in _ENGINE_JARS
                and not _os.path.exists(stmt.path)
            ):
                # QueryParserDriver.registerJar: a registered jar must
                # exist (ERROR 101) — except the bundles whose classes
                # ship ENGINE-SIDE (piggybank/test-UDF/datafu leaves
                # resolve from functions/, so their registration is
                # meaningful without the file)
                raise ValueError(
                    f"pig latin: file '{stmt.path}' does not exist "
                    "(ERROR 101; REGISTER checks the path — "
                    "QueryParserDriver.registerJar)"
                )
            engine = (stmt.engine or "").lower()
            if engine in ("jruby", "javascript", "groovy"):
                # scripting engines whose runtime isn't Python: can't
                # execute the UDF file. Parse-and-refuse with guidance
                # (same scope class as MAPREDUCE/HBase)
                raise NotImplementedError(
                    f"REGISTER ... USING {engine}: only Python scripting "
                    "engines run here (jython/streaming_python execute as "
                    "native CPython); port the UDF file to Python"
                )
            if stmt.namespace or engine:
                # REGISTER 'udfs.py' USING jython [AS ns] — scripting
                # UDFs (JythonScriptEngine/PythonScriptEngine): exec the
                # file with Pig's decorator surface in scope, expose
                # every public callable as ns.func(...) — or, with no
                # AS clause, as bare top-level names (Pig registers
                # them unqualified)
                funcs = _load_script_udfs(stmt.path, engine or "jython")
                if stmt.namespace:
                    self.script_udfs[stmt.namespace] = funcs
                else:
                    self.script_udfs.setdefault("", {}).update(funcs)
        elif isinstance(stmt, G.SetStmt):
            if stmt.key == "__exec_boundary__":
                # Grunt `exec`: run everything queued so far — later
                # LOADs may read paths the pending STOREs write
                self._flush_stores()
                return
            # SET default_parallel n ≅ PARALLEL clause → shuffle partitions
            key = {"default_parallel": "spark.sql.shuffle.partitions"}.get(stmt.key, stmt.key)
            try:
                self.spark.conf.set(key, stmt.value)
            except Exception:
                pass  # unknown/static confs are advisory in Pig too
        elif isinstance(stmt, G.Define):
            if stmt.args and stmt.args[0] == "__exec__":
                self.defines[stmt.alias] = self._parse_exec_define(stmt)
            elif stmt.func.rsplit(".", 1)[-1] in ("HiveUDF", "HiveUDTF", "HiveUDAF") and stmt.args:
                # org.apache.pig.builtin.HiveUDF family (HiveUDF.java:
                # wraps a Hive function by name). Spark's own function
                # registry IS Hive-compatible — resolve by name at call
                # time (F.call_function), staying JVM-side. The
                # optional SECOND ctor arg is Hive-side constructor
                # parameters — no Spark equivalent, refuse rather than
                # silently resolve a differently-configured function.
                if len(stmt.args) > 1:
                    raise NotImplementedError(
                        f"DEFINE {stmt.alias} {stmt.func}(...): constructor "
                        "parameters beyond the function name need the Hive "
                        "bridge; inline the parameters into the call instead"
                    )
                self.defines[stmt.alias] = ("__hive__", stmt.func.rsplit(".", 1)[-1], str(stmt.args[0]))
            elif stmt.func.rsplit(".", 1)[-1] in _INVOKER_RETURNS and stmt.args:
                # builtin/Invoker.java family (InvokeForInt/Long/Float/
                # Double/String): reflection-invoke a STATIC Java method
                # — Spark's java_method expression is the exact JVM-side
                # equivalent (reflection per row, no Python). Ctor:
                # (fullName, paramSpecs?, isStatic?="true"); paramSpecs
                # are space-separated Pig types the args cast to (that
                # cast is also what selects the Java overload).
                leaf = stmt.func.rsplit(".", 1)[-1]
                full = str(stmt.args[0])
                params = str(stmt.args[1]).strip() if len(stmt.args) > 1 else ""
                is_static = (
                    str(stmt.args[2]).lower() in ("true", "static")
                    if len(stmt.args) > 2
                    else True
                )
                if not is_static:
                    raise NotImplementedError(
                        f"DEFINE {stmt.alias} {leaf}('{full}', ..., 'false'): "
                        "instance-method invocation needs per-row JVM object "
                        "construction (Invoker.java non-static path); only "
                        "STATIC methods are supported — use the static "
                        "equivalent or a scripting UDF"
                    )
                self.defines[stmt.alias] = (
                    "__invoke__", _INVOKER_RETURNS[leaf], full, params,
                )
            else:
                leaf = stmt.func.rsplit(".", 1)[-1]
                factory = getattr(PF, leaf, None)
                if stmt.args and factory is not None and getattr(factory, "__pig_ctor__", False):
                    # ctor-arg eval classes (the test-UDF jar surface:
                    # Udfcachetest('path#link'), TestingAccumulatorHelper
                    # ('true'), ... — functions/testudf.py): bind the
                    # constructor strings NOW, exactly when the Java
                    # ctor runs; the alias maps to the bound column fn
                    self.defines[stmt.alias] = factory(*[str(a) for a in stmt.args])
                else:
                    self.defines[stmt.alias] = stmt.func
        elif isinstance(stmt, G.AssertStmt):
            rel = self._rel(stmt.rel)
            self.aliases[stmt.rel] = RelInfo(rel.assert_by(self._expr(stmt.cond, rel), stmt.msg or ""))
        else:
            raise NotImplementedError(f"statement {type(stmt).__name__}")

    def _explain_stmt(self, stmt) -> None:
        """EXPLAIN with GruntParser.processExplain's surface
        (GruntParser.java:330): [-script f] [-param k=v] [-out target]
        [-dot|-xml] [-brief] [alias|@]. Bare explain = the last-defined
        alias (getLastAlias); '@' = the last relation. -dot/-xml render
        the CATALYST optimized plan (the artifact that matters on this
        engine) via plans.plan_dot/plan_xml; -out writes files
        (logical_plan-<n>.<fmt> inside a directory target, reference
        naming); -brief = Spark's 'simple' mode instead of 'formatted'."""
        import io
        import os as _os
        from contextlib import redirect_stdout

        targets: list[tuple[str, Relation]] = []
        if stmt.script is not None:
            from . import translator as _translator

            fresh = _translator(self.spark, params=dict(stmt.params or {}))
            fresh.execute_stores = False
            with open(stmt.script, encoding="utf-8") as fh:
                rels = fresh.run(fh.read())
            sinks = [a for i, a in enumerate(fresh.sink_aliases)
                     if a in rels and a not in fresh.sink_aliases[:i]]
            if not sinks and rels:
                sinks = [list(rels)[-1]]
            targets = [(a, rels[a]) for a in sinks]
        else:
            alias = stmt.rel
            if alias in (None, "@"):
                if not self.aliases:
                    raise SyntaxError(
                        "'explain' statement must be on an alias or on a script."
                    )
                alias = list(self.aliases)[-1]
            targets = [(alias, self._rel(alias))]

        def _render(rel: Relation) -> str:
            if stmt.fmt == "dot":
                from ..plans import plan_dot

                return plan_dot(rel.df)
            if stmt.fmt == "xml":
                from ..plans import plan_xml

                return plan_xml(rel.df)
            buf = io.StringIO()
            with redirect_stdout(buf):
                rel.explain("simple" if stmt.brief else "formatted")
            return buf.getvalue()

        for i, (alias, rel) in enumerate(targets):
            text = _render(rel)
            if stmt.out is None:
                print(f"# {alias}")
                print(text)
            elif _os.path.isdir(stmt.out):
                ext = {"text": "txt"}.get(stmt.fmt, stmt.fmt)
                suffix = "" if len(targets) == 1 else f"_{i + 1}"
                with open(_os.path.join(stmt.out, f"logical_plan{suffix}.{ext}"), "w") as fh:
                    fh.write(text)
            else:
                mode = "w" if i == 0 else "a"
                with open(stmt.out, mode) as fh:
                    fh.write(f"# {alias}\n{text}\n")

    def _rel(self, alias: str) -> Relation:
        if alias not in self.aliases:
            raise NameError(f"pig latin: unknown alias {alias!r}")
        return self.aliases[alias].rel

    def _parse_exec_define(self, stmt: "G.Define") -> dict:
        """DEFINE alias `cmd` [SHIP/CACHE(...)] [INPUT(stdin USING
        serde) OUTPUT(stdout USING serde)] (QueryParser.g command
        clause, PigStreamingBase.java, impl/streaming/PigStreaming.java).

        INPUT's serde SERIALIZES tuples onto the command's stdin;
        OUTPUT's serde DESERIALIZES its stdout lines. PigStreaming
        ['<delim>'] — the only serde shipped with Pig — maps to the
        delimiter-parameterized built-in contract (Column ops for ANY
        delimiter, so value formatting is Spark's cast-to-string
        regardless of delimiter). Any other class name raises with
        guidance: arbitrary Java PigStreamingBase classes cannot load
        here; Python callables go through
        ``Relation.stream_through(serialize=..., deserialize=...)``."""
        extras = stmt.args[1] if len(stmt.args) > 1 else []
        spec: dict = {
            "cmd": stmt.func, "ship": [], "in_sep": "\t", "out_sep": "\t",
            "in_file": None, "out_file": None,
            "serialize": None, "deserialize": None,
        }

        def parse_serde(items: list):
            toks = [(k, v) for k, v in items]
            idx = next(
                (i for i, (k, v) in enumerate(toks) if k == "tok" and v.lower() == "using"),
                None,
            )
            # INPUT('foo' ...) / OUTPUT('foo' ...): a quoted token
            # before USING names a FILE the command reads/writes in
            # its task cwd instead of stdin/stdout (QueryParser.g
            # stream_cmd input/output clauses, POStream file channels)
            target = next(
                (v for k, v in (toks if idx is None else toks[:idx]) if k == "str"),
                None,
            )
            if idx is None:
                return target, None, None  # INPUT(stdin) — default serde
            cls_parts: list[str] = []
            args: list[str] = []
            in_args = False
            for k, v in toks[idx + 1:]:
                if k == "tok" and v == "(":
                    in_args = True
                elif k == "tok" and v == ")":
                    in_args = False
                elif k == "str" and in_args:
                    args.append(v)
                elif k == "tok" and not in_args:
                    cls_parts.append(v)
            cls = "".join(cls_parts)
            base = cls.rsplit(".", 1)[-1]
            from ..functions.testudf import STREAM_SERDES

            if base.lower() in STREAM_SERDES:
                # the reference test-UDF serdes (StreamingDump =
                # PigToStream tuple-format writer, DumpStreamer =
                # StreamToPig paren-strip parser) run as the engine's
                # Python serialize/deserialize hooks
                return target, None, STREAM_SERDES[base.lower()]
            if base != "PigStreaming":
                raise NameError(
                    f"DEFINE {stmt.alias}: stream serde {cls!r} is a Java "
                    "PigStreamingBase class this engine cannot load; use "
                    "PigStreaming('<delim>') or pass Python callables via "
                    "Relation.stream_through(serialize=..., deserialize=...)"
                )
            return target, (args[0] if args else "\t"), None

        for kind, items in extras:
            if kind in ("ship", "cache"):
                spec["ship"].extend(v for k, v in items if k == "str")
            elif kind in ("input", "output"):
                target, d, serde = parse_serde(items)
                side = "in" if kind == "input" else "out"
                if target is not None:
                    spec[f"{side}_file"] = target
                if d is not None:
                    spec[f"{side}_sep"] = d
                if serde is not None:
                    role, fn = serde
                    want = "serialize" if kind == "input" else "deserialize"
                    if role != want:
                        raise NameError(
                            f"DEFINE {stmt.alias}: serde is a "
                            f"{'PigToStream' if role == 'serialize' else 'StreamToPig'} "
                            f"— wrong side for {kind.upper()}()"
                        )
                    spec[role] = fn
            # stderr('dir' [limit n]) is a task-log routing directive —
            # no dataflow effect (GruntParser handles it as logging)
        # SHIP is job-scoped in Pig (JobControlCompiler distributes
        # every shipped file to every task's cwd), so an inline
        # `stream X through \`perl script.pl\`` can rely on files
        # shipped by a DEFINE elsewhere in the same script.
        # Auto-ship candidates register FIRST, explicit SHIP paths
        # after (LogicalPlanBuilder.buildCommand: checkAutoShipSpecs
        # runs before addPathToShip) — on a basename collision the
        # EXPLICIT file is staged last and wins
        self._autoship(spec["cmd"])
        for p in spec["ship"]:
            self._add_job_ship(p)
        return spec

    def _add_job_ship(self, path: str) -> None:
        """Register a file for the job's task-cwd staging. Two
        DIFFERENT files sharing a basename cannot both land in one
        task cwd — Pig's DistributedCache rejects conflicting
        resources; identical copies (the autoship-found cwd copy of an
        explicitly shipped script) dedupe to the later registration."""
        import filecmp
        import os as _os

        path = _os.path.abspath(path)
        if path in self._job_ship:
            return
        base = _os.path.basename(path)
        for prev in list(self._job_ship):
            if _os.path.basename(prev) == base:
                if _os.path.isfile(prev) and _os.path.isfile(path) and filecmp.cmp(prev, path, shallow=False):
                    self._job_ship.remove(prev)  # identical: later wins
                    break
                raise ValueError(
                    f"pig latin: SHIP conflict — two different files named "
                    f"{base!r} ({prev} vs {path}) cannot both land in the "
                    "task working directory (DistributedCache contract)"
                )
        self._job_ship.append(path)

    def _autoship(self, cmd: str) -> None:
        """Auto-ship (StreamingCommandUtils.checkAutoShipSpecs): for
        `perl x.pl` / `python x.py` the candidate is the first
        non-option non-quoted argument, otherwise the command word
        itself; absolute paths are never auto-shipped, and a candidate
        the client environment can't find is silently skipped (the
        reference's which(1) miss). Found candidates resolve against
        the submitting process's cwd and join the job's ship list."""
        import os as _os
        import shlex as _shlex

        try:
            toks = _shlex.split(cmd)
        except ValueError:
            return
        if not toks:
            return
        cand = None
        if toks[0].lower() in ("perl", "python"):
            cand = next((a for a in toks[1:] if not a.startswith("-")), None)
        else:
            cand = toks[0]
        if cand and not _os.path.isabs(cand) and _os.path.isfile(cand):
            self._add_job_ship(cand)
        if toks[0].lower() == "perl" and cand and _os.path.isfile(cand):
            # a perl script's `use`d modules resolve from @INC '.' =
            # the task cwd, so sibling .pm files must travel WITH the
            # script (the reference harness ships
            # PigStreamingModule.pm explicitly for exactly this;
            # StreamingCommandUtils has no module scanner, so Pig
            # users ship by hand — the engine does it for them).
            # Applies to absolute script paths too: the script file
            # stays cluster-visible but the task cwd moves.
            import glob as _glob

            for pm in _glob.glob(_os.path.join(_os.path.dirname(_os.path.abspath(cand)), "*.pm")):
                self._add_job_ship(pm)

    # ------------------------------------------------------------------
    def _op(self, op, out_alias: str) -> RelInfo:
        self._current_alias = out_alias  # nested describe keys (C::D)
        if isinstance(op, G.Load):
            return RelInfo(self._load(op))
        if isinstance(op, G.Filter):
            rel = self._rel(op.rel)
            return RelInfo(rel.filter(self._bool_expr(op.cond, rel)))
        if isinstance(op, G.Foreach):
            return self._foreach(op)
        if isinstance(op, G.Group):
            return self._group(op)
        if isinstance(op, G.Join):
            return RelInfo(self._join(op))
        if isinstance(op, G.Order):
            rel = self._rel(op.rel)
            cols = [self._expr(e, rel).asc() if asc else self._expr(e, rel).desc() for e, asc in op.keys]
            return RelInfo(rel.order_by(*cols))
        if isinstance(op, G.Simple) and op.op == "distinct":
            return RelInfo(self._rel(op.rel).distinct())
        if isinstance(op, G.Limit):
            return RelInfo(self._rel(op.rel).limit(int(self._scalar_value(op.n))))
        if isinstance(op, G.Sample):
            return RelInfo(self._rel(op.rel).sample(float(self._scalar_value(op.p))))
        if isinstance(op, G.Union):
            rels = [self._rel(r) for r in op.rels]
            return RelInfo(rels[0].union(*rels[1:], onschema=op.onschema))
        if isinstance(op, G.Cross):
            rels = [self._rel(r) for r in op.rels]
            # Pig qualifies CROSS output fields with their input alias
            # (LogicalSchema: c::age, d::age) — prefix colliding names
            # so c::age / d::age resolve and bare refs stay unambiguous
            from collections import Counter

            counts = Counter(c for r in rels for c in r.df.columns)
            pref = []
            for alias, r in zip(op.rels, rels):
                df = r.df
                sel = [
                    df[c].alias(f"{alias}::{c}") if counts[c] > 1 else df[c]
                    for c in df.columns
                ]
                pref.append(Relation(df.select(*sel)))
            out = pref[0]
            for r in pref[1:]:
                out = out.cross(r)
            return RelInfo(out)
        if isinstance(op, G.CubeStmt):
            return self._cube_stmt(op)
        if isinstance(op, G.Rank):
            rel = self._rel(op.rel)
            # Pig names the prepended column rank_<input alias>
            # (LORank.java getSchema)
            rname = f"rank_{op.rel}"
            if not op.keys:
                return RelInfo(rel.rank(name=rname))
            cols = [self._expr(e, rel) for e, _ in op.keys]
            asc = [a for _, a in op.keys]
            return RelInfo(rel.rank(*cols, ascending=asc, dense=op.dense, name=rname))
        if isinstance(op, G.Stream):
            rel = self._rel(op.rel)
            cmd = op.cmd
            # the command's stdout is Pig TEXT: land every declared
            # field as a string, then utf8_cast applies the declared
            # type — scalars try_cast (null on garbage), complex types
            # parse their textual forms ([k#v], (a,b), {(a,b)})
            str_ddl = (
                ", ".join(f"{f.name} string" for f in op.schema)
                if op.schema is not None
                else None  # no AS: runtime-discovered arity, untyped
            )

            def typed(rel2: Relation) -> RelInfo:
                if op.schema is None:
                    return RelInfo(rel2)
                df = rel2.df
                return RelInfo(Relation(df.select(
                    *[utf8_cast(df[f.name], f.type).alias(f.name) for f in op.schema]
                )))

            if cmd.startswith("\x00alias:"):
                name = cmd[len("\x00alias:"):]
                if name not in self.defines:
                    raise NameError(f"STREAM THROUGH {name}: no such DEFINE")
                spec = self.defines[name]
                if isinstance(spec, dict):
                    return typed(rel.stream_through(
                        spec["cmd"], str_ddl, ship=self._job_ship or None,
                        in_sep=spec["in_sep"], out_sep=spec["out_sep"],
                        in_file=spec["in_file"], out_file=spec["out_file"],
                        serialize=spec.get("serialize"),
                        deserialize=spec.get("deserialize"),
                    ))
                cmd = spec
            self._autoship(cmd)  # inline `stream X through \`perl x.pl\``
            return typed(rel.stream_through(cmd, str_ddl, ship=self._job_ship or None))
        raise NotImplementedError(f"operator {type(op).__name__}")

    # ------------------------------------------------------------------
    def _load(self, op: G.Load) -> Relation:
        # a LOAD of a path some pending STORE will write is a job
        # dependency (Pig orders these jobs): flush the writes first
        if any(
            op.path.startswith(p) or p.startswith(op.path)
            for _, p, _ in self._pending_stores
        ):
            self._flush_stores()
        loader = (op.loader or "pigstorage").rsplit(".", 1)[-1].lower()
        if loader == "hcatloader":
            # HCatLoader() — the LOAD target is a catalog table name;
            # schema (incl. trailing partition columns) arrives TYPED
            # from the catalog, so an AS clause only renames/casts
            # (sources/hcatalog.py; hcat.conf)
            from ..sources.hcatalog import load_hcat

            df = load_hcat(self.spark, op.path)
            if op.schema:
                outs = []
                for i, f in enumerate(op.schema):
                    if i >= len(df.columns):
                        outs.append(
                            F.lit(None)
                            .cast(pig_field_ddl(f.type) if f.type else "string")
                            .alias(f.name)
                        )
                        continue
                    c = df[df.columns[i]]
                    outs.append(
                        (c.try_cast(pig_field_ddl(f.type)) if f.type else c).alias(f.name)
                    )
                df = df.select(*outs)
            return Relation(df)
        if loader == "hbasestorage":
            # HBaseStorage(columnList[, options]) — the client-less
            # cell-model facade (sources/hbase.py; HBaseStorage.java:146).
            # Values decode to strings (the bytearray→POCast flow), so
            # the AS clause applies Pig gradual typing per field; map
            # fields (cf:* / cf:prefix*) arrive as map<string,string>
            # and rename positionally.
            from ..sources.hbase import load_hbase

            hargs = list(op.loader_args or [])
            if not hargs:
                raise ValueError("HBaseStorage needs a column list argument")
            df = load_hbase(
                self.spark,
                op.path,
                hargs[0],
                hargs[1] if len(hargs) > 1 else "",
                # AS-clause types drive the binary caster's per-field
                # decode (the Java HBaseBinaryConverter contract)
                field_types=[f.type for f in op.schema] if op.schema else None,
            )
            if op.schema:
                outs = []
                for i, f in enumerate(op.schema):
                    if i >= len(df.columns):
                        outs.append(
                            F.lit(None)
                            .cast(pig_field_ddl(f.type) if f.type else "string")
                            .alias(f.name)
                        )
                        continue
                    c = df[df.columns[i]]
                    if df.schema[df.columns[i]].dataType.simpleString().startswith("map"):
                        outs.append(c.alias(f.name))
                    else:
                        outs.append(utf8_cast(c, f.type).alias(f.name))
                df = df.select(*outs)
            return Relation(df)
        if loader == "accumulostorage":
            # AccumuloStorage(columns[, options]) — the sibling facade
            # (sources/accumulo.py; AccumuloStorage.java). Row key is
            # always field 0; AS applies gradual typing to scalars.
            from ..sources.accumulo import load_accumulo

            aargs = list(op.loader_args or [])
            df = load_accumulo(
                self.spark,
                op.path,
                aargs[0] if aargs else "",
                aargs[1] if len(aargs) > 1 else "",
                field_types=[f.type for f in op.schema] if op.schema else None,
            )
            if op.schema:
                outs = []
                for i, f in enumerate(op.schema):
                    if i >= len(df.columns):
                        outs.append(
                            F.lit(None)
                            .cast(pig_field_ddl(f.type) if f.type else "string")
                            .alias(f.name)
                        )
                        continue
                    c = df[df.columns[i]]
                    if df.schema[df.columns[i]].dataType.simpleString().startswith("map"):
                        outs.append(c.alias(f.name))
                    else:
                        outs.append(utf8_cast(c, f.type).alias(f.name))
                df = df.select(*outs)
            return Relation(df)
        if loader == "dumploader":
            # test-UDF jar DumpLoader (storefunc/DumpLoader.java): one
            # tuple per line '(f1, f2, ... )' — the Java strips char 0
            # and the LAST TWO chars (its data always ends ' )'), then
            # splits on ',' and trims. The reference appends fields
            # per ROW at runtime (ragged tuples); a DataFrame needs one
            # arity, so take max(size) over the FILE (one aggregate —
            # r10 ADVICE: first() silently truncated any later row
            # with more fields). Rows shorter than the max pad with
            # nulls where the reference would emit a shorter tuple —
            # the relational-schema divergence, not data loss.
            raw = self.spark.read.text(op.path)
            body = F.expr("substring(value, 2, greatest(length(value) - 3, 0))")
            arr = F.transform(F.split(body, ","), lambda x: F.trim(x))
            n_row = raw.agg(F.max(F.size(arr)).alias("n")).first()
            n = int(n_row["n"]) if n_row is not None and n_row["n"] is not None else 0
            df = raw.select(
                *[F.element_at(arr, i + 1).alias(f"_c{i}") for i in range(max(n, 1))]
            )
            if op.schema:
                df = df.select(*[
                    utf8_cast(df[df.columns[i]], f.type).alias(f.name)
                    if i < len(df.columns)
                    else F.lit(None).cast(pig_field_ddl(f.type) if f.type else "string").alias(f.name)
                    for i, f in enumerate(op.schema)
                ])
            return Relation(df)
        fmt = LOADER_FORMAT.get(loader, loader)
        opts = {}
        # PigStorage args: first non-flag = delimiter; '-tagFile' flag
        # prepends the source filename column; '-schema' applies the
        # .pig_schema sidecar (PigStorage.java options)
        args = list(op.loader_args or [])
        flags = {a.strip().lower() for a in args}
        if "-tagfile" in flags:
            opts["tag_file"] = True
        if "-schema" in flags:
            opts["schema_sidecar"] = True
        args = [a for a in args if not a.strip().lower().startswith("-")]
        if fmt in ("csv", "pigstorage") and args:
            opts["sep"] = _unescape_delim(args[0])
        if fmt in ("myregexloader", "regexloader") and args:
            # MyRegExLoader('regex') — the pattern is the loader arg
            opts["pattern"] = args[0]
        rel = Relation.load(self.spark, op.path, fmt, **opts)
        if op.schema:
            # with -tagFile the filename is $0 and the user's AS clause
            # includes it (Pig semantics) — positional cast covers both
            if fmt in ("csv", "pigstorage", "text", "myregexloader", "regexloader",
                       "commonlogloader", "combinedlogloader"):
                # gradual typing: strings → declared types, null on
                # garbage; complex types parse Pig's textual forms
                # ([k#v], (a,b), {(a,b),...} — Utf8StorageConverter)
                df = rel.df
                # Pig pads a schema declared WIDER than the data with
                # nulls (LoadTypeCastInserter: missing trailing fields
                # read as null, never an error)
                rel = Relation(
                    df.select(
                        *[
                            (
                                utf8_cast(df[df.columns[i]], f.type)
                                if i < len(df.columns)
                                else F.lit(None).cast(pig_field_ddl(f.type))
                            ).alias(f.name)
                            for i, f in enumerate(op.schema)
                        ]
                    )
                )
            else:
                # typed containers (parquet/orc/avro/BinStorage): the
                # AS clause renames positionally. A declared COMPLEX
                # type additionally renames/casts the NESTED fields —
                # BinStorage.java stores tuples positionally, so
                # `AS (t2:tuple(a,b,c))` over stored (col1,col2,col3)
                # rebinds the inner names (try_cast over struct/array
                # is positional in Spark, exactly Pig's rebinding)
                df = rel.df
                outs = []
                for i, f in enumerate(op.schema):
                    if i >= len(df.columns):
                        outs.append(
                            F.lit(None).cast(pig_field_ddl(f.type) if f.type else "string").alias(f.name)
                        )
                        continue
                    c = df[df.columns[i]]
                    t = (f.type or "").strip().lower()
                    if t.startswith(("tuple", "(", "bag", "{", "map")):
                        c = c.try_cast(pig_field_ddl(f.type))
                    outs.append(c.alias(f.name))
                rel = Relation(df.select(*outs))
        return rel

    # ------------------------------------------------------------------
    def _group(self, op: G.Group) -> RelInfo:
        if len(op.rels) == 1:
            alias = op.rels[0]
            child = self._rel(alias)
            keys = op.keys[0]
            if not keys:  # GROUP rel ALL
                info = GroupedInfo([], child, alias)
                bag = child.group_all().bag(alias)
                return RelInfo(bag, grouped=info)
            named = self._key_names(keys, child)
            bag_rel = Relation(
                child.df.groupBy(*[c.alias(n) for n, c in named]).agg(
                    F.collect_list(F.struct(*[child.df[x] for x in child.df.columns])).alias(alias)
                )
            )
            # single key → Pig names it 'group'
            if len(named) == 1:
                bag_rel = Relation(bag_rel.df.withColumnRenamed(named[0][0], "group"))
            return RelInfo(bag_rel, grouped=GroupedInfo(named, child, alias))
        # COGROUP: n-ary bags via operators.cogroup
        first = self._rel(op.rels[0])
        others = [self._rel(r) for r in op.rels[1:]]
        key_names = []
        dfs = []
        for rel_alias, keys in zip(op.rels, op.keys):
            rel = self._rel(rel_alias)
            named = self._key_names(keys, rel)
            key_names.append([n for n, _ in named])
            dfs.append(rel)
        out = first.cogroup(others, on=key_names, bag_names=list(op.rels), inner=op.inner)
        if len(key_names[0]) == 1:
            out = Relation(out.df.withColumnRenamed(key_names[0][0], "group"))
        return RelInfo(out)

    def _cube_stmt(self, op: G.CubeStmt) -> RelInfo:
        """CUBE rel BY CUBE(..)/ROLLUP(..) (QueryParser.g:595, LOCube.java:31-70).

        Grouping sets = the cross product of each clause's sets (CUBE →
        powerset, ROLLUP → prefixes), exactly Pig's CubeDimensions ×
        RollupDimensions expansion — but expressed as df.groupingSets
        so Catalyst plans Expand + partial agg instead of pre-shuffle
        row multiplication. Rolled-up dims are NULL (SQL-standard);
        Pig's 'ALL' string marker is available via Relation.cube(
        all_marker=...) for golden-output compat.
        """
        from itertools import combinations, product

        alias = op.rel
        child = self._rel(alias)
        named: list[tuple[str, Column]] = []
        clause_sets: list[list[list[str]]] = []
        for kind, dims in op.clauses:
            dn = self._key_names(dims, child)
            # offset default names so CUBE(a,b), ROLLUP(c,d) don't collide
            dn = [(n if not n.startswith("k") or not n[1:].isdigit() else f"k{len(named) + i}", c)
                  for i, (n, c) in enumerate(dn)]
            names = [n for n, _ in dn]
            named.extend(dn)
            if kind == "cube":
                sets = [list(c) for r in range(len(names), -1, -1) for c in combinations(names, r)]
            else:  # rollup: full prefix chain down to ()
                sets = [names[:i] for i in range(len(names), -1, -1)]
            clause_sets.append(sets)
        sets = [sum(combo, []) for combo in product(*clause_sets)]
        # materialize key exprs under their output names; keep every other
        # child column for downstream aggregates
        names = [n for n, _ in named]
        base = child.df.select(
            *[c.alias(n) for n, c in named],
            *[child.df[x] for x in child.df.columns if x not in names],
        )
        # Pig names the cubed relation's bag 'cube' (LOCube docs), so
        # downstream FOREACH writes COUNT(cube) / SUM(cube.x)
        info = GroupedInfo([(n, F.col(n)) for n in names], Relation(base), "cube", sets=sets)
        # literal bag form (FOREACH fallback): bag named 'cube' per Pig
        bag = base.groupingSets([[F.col(n) for n in s] for s in sets], *[F.col(n) for n in names]).agg(
            F.collect_list(F.struct(*[F.col(x) for x in base.columns])).alias("cube")
        )
        return RelInfo(Relation(bag), grouped=info)

    def _bag_pipe_expr(self, st, rel: Relation) -> Column:
        """One nested statement over a FLAT relation → a derived
        Column. ``expr`` aliases evaluate directly; pipe kinds
        (filter/order/limit/distinct) apply to a BAG COLUMN (array of
        structs — what COGROUP/GROUP rows carry) as higher-order array
        functions: map-only, no shuffle, the bag never explodes."""
        from pyspark.sql import types as T

        if st.kind == "expr":
            return self._expr(st.cond, rel)

        def bag_col(ref: str) -> tuple[str, Column, object]:
            nm = ref.split(".", 1)[0]
            if nm.startswith("$"):
                nm = rel.df.columns[int(nm[1:])]
            if nm not in rel.df.columns or not isinstance(
                rel.df.schema[nm].dataType, T.ArrayType
            ):
                raise SyntaxError(
                    f"nested FOREACH over a flat relation: {ref!r} must be a bag "
                    "column (or GROUP the relation first)"
                )
            return nm, rel.df[nm], rel.df.schema[nm].dataType.elementType

        if st.kind == "cross":
            # nested CROSS (QueryParser.g nested_op, Pig >= 0.10): the
            # per-row cross product of two+ bag columns — a COGROUP
            # row's bags crossed within the group. flatten(transform×
            # transform): element = concatenated tuple, fields
            # qualified <operand>::<field> (Pig's cross naming).
            # Map-only; the bags already live in the row.
            def fields_of(elem) -> list[str]:
                return list(elem.names) if isinstance(elem, T.StructType) else []

            acc_name, acc_col, acc_elem = bag_col(st.source)
            acc_fields = [
                (f, f if "::" in f else f"{acc_name}::{f}") for f in fields_of(acc_elem)
            ]
            for ref in st.cond:
                b_name, b_col, b_elem = bag_col(ref)
                b_fields = [
                    (f, f if "::" in f else f"{b_name}::{f}") for f in fields_of(b_elem)
                ]
                af, bf = list(acc_fields), list(b_fields)

                def make(x, y, af=af, bf=bf):
                    return F.struct(
                        *[x[sf].alias(qf) for sf, qf in af],
                        *[y[sf].alias(qf) for sf, qf in bf],
                    )

                def mk_outer(bc, mk):
                    # pyspark reads the HOF callback's own arity, so
                    # the callbacks must be strictly single-parameter —
                    # close over bc/mk via this factory, not defaults
                    def outer(x):
                        return F.transform(bc, lambda y: mk(x, y))

                    return outer

                acc_col = F.flatten(F.transform(acc_col, mk_outer(b_col, make)))
                acc_fields = [(qf, qf) for _, qf in af] + [(qf, qf) for _, qf in bf]
            return acc_col

        src, arr, elem = bag_col(st.source)
        fields = elem.names if isinstance(elem, T.StructType) else []

        def elem_expr(e, t) -> Column:
            if isinstance(e, G.Col):
                name = e.name.split(".")[-1]
                if name.startswith("$") and fields:
                    name = fields[int(name[1:])]
                elif fields and name not in fields:
                    # qualified cross-product fields (a::name): an
                    # unqualified ref resolves by unique suffix, as
                    # LogicalSchema disambiguation does
                    hit = [f for f in fields if f.split("::")[-1] == name]
                    if len(hit) == 1:
                        name = hit[0]
                    elif len(hit) > 1:
                        raise ValueError(f"pig latin: ambiguous field {name!r}: {hit}")
                return t[name] if fields else t
            if isinstance(e, G.Num):
                v = e.value.lower()
                return F.lit(float(v.rstrip("f")) if "." in v or "e" in v else int(v.rstrip("l")))
            if isinstance(e, G.Str):
                return F.lit(e.value)
            if isinstance(e, G.Bin):
                return _binop(e.op, elem_expr(e.left, t), elem_expr(e.right, t))
            if isinstance(e, G.Un) and e.op == "not":
                return ~elem_expr(e.operand, t)
            if isinstance(e, G.IsNull):
                c = elem_expr(e.operand, t)
                return c.isNotNull() if e.negated else c.isNull()
            if isinstance(e, G.Bool):
                return F.lit(e.value)
            if isinstance(e, G.BinCond):
                return F.when(elem_expr(e.cond, t), elem_expr(e.then, t)).otherwise(
                    elem_expr(e.otherwise, t)
                )
            if isinstance(e, G.Cast):
                return elem_expr(e.operand, t).try_cast(PIG_TO_SPARK_TYPE.get(e.type, e.type))
            if isinstance(e, G.Matches):
                return PF.MATCHES(elem_expr(e.operand, t), e.pattern)
            if isinstance(e, G.Call):
                # scalar builtin over element fields (CONCAT, UPPER…);
                # aggregates don't belong inside a per-element lambda
                if e.func.lower() in AGG_FUNCS:
                    raise NotImplementedError(
                        f"aggregate {e.func.upper()} inside a bag-column pipe; "
                        "aggregate in the outer GENERATE instead"
                    )
                fn = getattr(PF, e.func, None) or getattr(PF, e.func.upper(), None)
                if fn is None:
                    raise NameError(f"pig latin: unknown function {e.func!r}")
                return fn(*[elem_expr(a, t) for a in e.args])
            raise NotImplementedError(
                f"unsupported expression {type(e).__name__} inside a bag-column pipe"
            )

        if st.kind == "nforeach":
            # inner FOREACH over a bag column: per-element projection —
            # transform(bag, t -> struct(items)) stays map-only
            def project(t):
                out = []
                for i, item in enumerate(st.cond):
                    nm = item.alias or _default_name(item.expr, i)
                    out.append(elem_expr(item.expr, t).alias(nm))
                return F.struct(*out)

            return F.transform(arr, project)
        if st.kind == "filter":
            return F.filter(arr, lambda t: elem_expr(st.cond, t))
        if st.kind == "distinct":
            return F.array_distinct(arr)
        if st.kind == "limit":
            return F.slice(arr, 1, int(st.cond))
        if st.kind == "order":
            keys = [k if isinstance(k, tuple) else (k, True) for k in st.cond]
            # '*' expands to every element field; for scalar-element
            # bags it means the element itself
            keys = [
                kk
                for cname, asc in keys
                for kk in (
                    [(f, asc) for f in fields] if cname == "*" and fields else [(cname, asc)]
                )
            ]

            def comparator(left, right):
                result = F.lit(0)
                for cname, asc in reversed(keys):
                    if cname == "*" and not fields:
                        lv, rv = left, right
                    else:
                        nm = cname.split(".")[-1]
                        if nm.startswith("$") and fields:
                            nm = fields[int(nm[1:])]
                        lv = left[nm] if fields else left
                        rv = right[nm] if fields else right
                    c = (
                        F.when(lv.isNull() & rv.isNull(), 0)
                        .when(lv.isNull(), -1)
                        .when(rv.isNull(), 1)
                        .when(lv < rv, -1)
                        .when(lv > rv, 1)
                        .otherwise(0)
                    )
                    if not asc:
                        c = -c
                    result = F.when(c != 0, c).otherwise(result)
                return result

            return F.array_sort(arr, comparator)
        if st.kind == "project":
            rest = st.source.partition(".")[2]
            if rest and fields:
                return F.transform(arr, lambda t: t[rest.split(".")[-1]])
            return arr
        raise NotImplementedError(
            f"nested {st.kind!r} over a flat relation's bag column is not supported"
        )

    def _key_names(self, keys, rel: Relation) -> list[tuple[str, Column]]:
        named = []
        for k in keys:
            col = self._expr(k, rel)
            if isinstance(k, G.Col):
                name = k.name.split(".")[-1].replace("::", "_")
                if name.startswith("$"):
                    # positional key ($0) → the real column name, so
                    # name-based consumers (COGROUP) resolve it
                    name = rel.df.columns[int(name[1:])]
            else:
                name = f"k{len(named)}"
            named.append((name, col))
        return named

    # ------------------------------------------------------------------
    def _foreach(self, op: G.Foreach) -> RelInfo:
        if not isinstance(op.rel, str):
            # inline relational clause: FOREACH (GROUP a ALL) GENERATE
            # — evaluate the parenthesized op as an anonymous relation
            info = self._op(op.rel, "__inline__")
        else:
            info = self.aliases.get(op.rel)
        if info is None:
            raise NameError(f"pig latin: unknown alias {op.rel!r}")
        if info.grouped is not None:
            # positional refs over a GROUP result (LogicalSchema:
            # field 0 = the group key tuple, field 1 = the bag named
            # after the child): $0 ≡ group, $1 ≡ <child alias> — the
            # reference tutorial's FOREACH ... GENERATE FLATTEN($0),
            # COUNT($1) shape
            sub = {"$0": "group", "$1": info.grouped.child_alias}
            op = G.Foreach(
                op.rel,
                [
                    G.GenItem(_sub_positional(it.expr, sub), it.alias, it.flatten)
                    for it in op.items
                ],
                nested=op.nested,
            )
        if op.nested:
            if info.grouped is None:
                # nested block over a FLAT relation: expression aliases
                # (x = expr) and pipes over BAG COLUMNS (the arrays a
                # COGROUP / union-of-groups row carries) — each lowers
                # to a derived column via array higher-order functions
                # (order → array_sort with a comparator, filter →
                # F.filter, limit → slice, distinct → array_distinct),
                # then the plain flat path consumes them (FLATTEN =
                # explode, COUNT/SUM = the array-aggregate lowering)
                rel0 = info.rel
                for st in op.nested:
                    rel0 = Relation(
                        rel0.df.withColumn(st.alias, self._bag_pipe_expr(st, rel0))
                    )
                info = RelInfo(rel0)
                op = G.Foreach(op.rel, op.items, nested=None)
            else:
                return RelInfo(self._foreach_nested(op, info))
        if info.grouped is not None and self._all_algebraic(op.items, info.grouped):
            return RelInfo(self._foreach_agg(op, info.grouped))
        rel = info.rel
        cols: list[Column] = []
        flatten_aliases: list[str] = []
        seen_flat_names: set[str] = set()
        for i, item in enumerate(op.items):
            if isinstance(item.expr, G.Star):
                cols.extend(rel.df[c] for c in rel.df.columns)
                continue
            if isinstance(item.expr, G.RangeProj):
                cols.extend(rel.df[c] for c in _range_span(rel, item.expr))
                continue
            c = self._expr(item.expr, rel)
            if isinstance(item.alias, list):
                # FLATTEN(...) AS (a:int, b:chararray): splat then
                # rename/cast the appended field columns positionally
                name = f"__flat{i}"
                if not item.flatten:
                    raise SyntaxError("pig latin: a multi-field AS schema requires FLATTEN")
                flatten_aliases.append((name, item.alias))
            else:
                name = item.alias or _default_name(item.expr, i)
                if (
                    item.alias is None
                    and isinstance(item.expr, G.Col)
                    and item.expr.name.startswith("$")
                    and int(item.expr.name[1:]) < len(rel.df.columns)
                ):
                    # generate $N keeps the SOURCE field's name
                    # (LogicalSchema: positional projection preserves
                    # the input schema's field name); $N beyond a
                    # schemaless load's width keeps the default name
                    # and resolves to null in _resolve
                    name = rel.df.columns[int(item.expr.name[1:])]
                if name in seen_flat_names and item.alias is None and isinstance(item.expr, G.Col):
                    # un-aliased collision (c::group, d::group): keep
                    # the qualified source name, as LogicalSchema does.
                    # Dotted sources (mt.$0 vs mb.$0 — both leaf $0)
                    # qualify with :: — a literal dot in a column name
                    # would read as struct access downstream
                    name = item.expr.name.replace(".", "::")
                seen_flat_names.add(name)
                if item.flatten:
                    # an explicit single-name AS names the (single)
                    # flattened field — FLATTEN({(1),(2)}) AS v yields
                    # column v, not the tuple's inner field name
                    flatten_aliases.append((name, [(name, None)] if item.alias else None))
            cols.append(c.alias(name))
        out = Relation(rel.df.select(*cols))
        for name, schema in flatten_aliases:
            from pyspark.sql import types as _T

            dtype = out.df.schema[name].dataType
            if (
                schema is not None
                and len(schema) > 1
                and isinstance(dtype, _T.ArrayType)
                and not isinstance(dtype.elementType, _T.StructType)
            ):
                # FLATTEN(STRSPLIT(...)) AS (a, b, c): Pig's STRSPLIT
                # returns a TUPLE whose arity the AS schema fixes —
                # splat the first n elements POSITIONALLY (missing →
                # null), don't explode rows
                df = out.df
                others = [c for c in df.columns if c != name]
                fields = []
                for i, (new_name, ftype) in enumerate(schema):
                    c = F.get(df[name], i)
                    if ftype is not None:
                        c = c.try_cast(PIG_TO_SPARK_TYPE.get(ftype, ftype))
                    fields.append(c.alias(new_name))
                out = Relation(df.select(*others, *fields))
                continue
            before_cols = out.df.columns
            out = out.flatten(name)
            if schema is not None:
                df = out.df
                if df.columns == before_cols:
                    # identity flatten (scalar/passthrough): the
                    # column stays IN PLACE — the append-at-end splat
                    # arithmetic would mis-claim the following columns
                    splat = [name]
                else:
                    # flatten consumed `name`, appended its fields
                    splat = df.columns[len(before_cols) - 1:]
                if len(splat) != len(schema) and len(schema) == 1:
                    # UDFs whose declared output schema is an opaque
                    # BAG/MAP (CreateTupleBag/flatten(map) shapes):
                    # Pig's AS names the DECLARED single field, but
                    # runtime arity wins and the splat keeps its own
                    # names — schema is advisory (LogicalSchema merge),
                    # not an arity assertion. Warn and keep ours.
                    import warnings

                    warnings.warn(
                        f"FLATTEN AS names 1 field but the value splats into "
                        f"{len(splat)} columns — keeping generated names "
                        f"{splat} (Pig: runtime arity wins over the declared "
                        "schema)",
                        stacklevel=2,
                    )
                    schema = None
                elif len(splat) != len(schema):
                    raise ValueError(
                        f"pig latin: FLATTEN AS schema has {len(schema)} fields, got {len(splat)} columns"
                    )
            if schema is not None:
                for cur, (new_name, ftype) in zip(splat, schema):
                    col = df[cur]
                    if ftype is not None:
                        col = col.try_cast(PIG_TO_SPARK_TYPE.get(ftype, ftype))
                    df = df.withColumn(cur, col).withColumnRenamed(cur, new_name)
                out = Relation(df)
        return RelInfo(out)

    def _all_algebraic(self, items: list[G.GenItem], g: GroupedInfo) -> bool:
        for item in items:
            e = item.expr
            if isinstance(e, G.Col) and (e.name == "group" or e.name.startswith("group.")):
                continue
            if self._is_agg_expr(e, g):
                continue
            return False
        return True

    def _is_agg_expr(self, e, g: GroupedInfo | None = None) -> bool:
        if self._hive_udaf(e) is not None:
            # DEFINE f HiveUDAF('name'): an aggregate call in Pig
            # (HiveUDAF.java extends AlgebraicEvalFunc) — keep the
            # GENERATE algebraic so it lowers to a grouped agg
            return True
        if isinstance(e, G.Call) and e.func.lower() in AGG_FUNCS:
            return True
        if (
            g is not None
            and isinstance(e, G.Call)
            and e.func.lower() in ("cor", "cov")
            and len(e.args) >= 2
            and all(
                isinstance(a, G.Col) and a.name.startswith(g.child_alias + ".")
                for a in e.args
            )
        ):
            # COR/COV over same-bag projections (builtin/COR.java,
            # COV.java — Algebraic): aggregate, keep the GENERATE
            # algebraic so it lowers to native corr/covar_pop
            return True
        if (
            g is not None
            and isinstance(e, G.Call)
            and e.func.lower() in ("size", "arity")
            and len(e.args) == 1
            and isinstance(e.args[0], G.Col)
            and e.args[0].name == g.child_alias
        ):
            # SIZE(bag) in a grouped FOREACH is an aggregate in Pig
            # (BagSize ≡ COUNT_STAR) — keep the GENERATE algebraic
            return True
        if isinstance(e, G.Bin):
            return self._is_agg_expr(e.left, g) and self._is_agg_expr(e.right, g)
        if isinstance(e, (G.Num, G.Str)):
            return True
        return False

    def _foreach_agg(self, op: G.Foreach, g: GroupedInfo) -> Relation:
        child = g.child
        key_cols = [c.alias(n) for n, c in g.key_exprs]
        aggs: list[Column] = []
        selects: list[Column] = []
        flat_aggs: list[tuple[int, str, G.GenItem]] = []  # FLATTEN(<aggregate>)
        seen_names: set[str] = set()
        for i, item in enumerate(op.items):
            e = item.expr
            name = item.alias if isinstance(item.alias, str) else _default_name(e, i)
            if name in seen_names:
                # un-aliased aggregates of the same function collide
                # (SUM(a.age), SUM(a.gpa) both default to 'sum'); Pig
                # leaves them nameless/positional — disambiguate
                name = f"{name}_{i}"
            seen_names.add(name)
            if isinstance(e, G.Col) and e.name == "group":
                if not g.key_exprs:
                    # GROUP ALL: Pig's group value is the literal
                    # 'all' (LOCogroup GROUP ALL semantics)
                    selects.append(F.lit("all").alias(item.alias or "group"))
                elif len(g.key_exprs) == 1:
                    # FLATTEN(group) of a single key is Pig's no-op
                    # flatten of a scalar: the field stays named
                    # 'group' (LogicalSchema), so a downstream
                    # `generate group` keeps resolving
                    selects.append(F.col(g.key_exprs[0][0]).alias(item.alias or "group"))
                elif item.flatten:
                    selects.extend(F.col(n) for n, _ in g.key_exprs)
                else:
                    # tuple key: 'group' is one tuple-typed field
                    # (LogicalSchema) — deref later via g.$0 / g.field
                    selects.append(
                        F.struct(*[F.col(n) for n, _ in g.key_exprs]).alias(item.alias or "group")
                    )
                continue
            if isinstance(e, G.Col) and e.name.startswith("group."):
                kname = _group_key(e.name.split(".", 1)[1], g.key_exprs)
                selects.append(F.col(kname).alias(item.alias or kname))
                continue
            aggs.append(self._agg_expr(e, g).alias(name))
            selects.append(F.col(name))
            if item.flatten:
                flat_aggs.append((len(selects) - 1, name, item))
        if g.sets is not None:
            names = [n for n, _ in g.key_exprs]
            grouped = child.df.groupingSets(
                [[F.col(n) for n in s] for s in g.sets], *[F.col(n) for n in names]
            )
        elif key_cols:
            grouped = child.df.groupBy(*key_cols)
        else:
            grouped = child.df.groupBy()
        out = grouped.agg(*aggs) if aggs else grouped.agg(F.count(F.lit(1)).alias("__n")).drop("__n")
        if flat_aggs:
            # FLATTEN(<bag-valued aggregate>) — e.g. FLATTEN(COR(A.x,
            # A.y)) in the reference corpus: explode the result bag
            # post-agg (POForEach flatten of UDF output; an empty/null
            # bag drops the record) and splat tuple elements' fields,
            # honoring an AS (name[:type], ...) list. Splices run in
            # reverse select order so recorded positions stay valid.
            from pyspark.sql import types as T

            for idx, nm, it in reversed(flat_aggs):
                dt = out.schema[nm].dataType
                if isinstance(dt, T.ArrayType):
                    out = out.withColumn(nm, F.explode(F.col(nm)))
                    dt = out.schema[nm].dataType
                if not isinstance(dt, T.StructType):
                    continue  # FLATTEN of a scalar aggregate: Pig no-op
                if isinstance(it.alias, list):
                    if len(it.alias) != len(dt.names):
                        raise ValueError(
                            f"pig latin: FLATTEN AS schema has {len(it.alias)} "
                            f"fields, got {len(dt.names)}"
                        )
                    repl = [
                        (out[nm][f].try_cast(PIG_TO_SPARK_TYPE.get(t2, t2)) if t2 else out[nm][f]).alias(n2)
                        for f, (n2, t2) in zip(dt.names, it.alias)
                    ]
                else:
                    repl = [out[nm][f].alias(f) for f in dt.names]
                selects[idx:idx + 1] = repl
        return Relation(out.select(*selects))

    # -- nested FOREACH { ... } blocks ---------------------------------
    def _foreach_nested(self, op: G.Foreach, info: RelInfo) -> Relation:
        """Lower a nested block to FLAT aggregates — no reducer bags.

        Pig streams each group's bag through the inner pipeline
        (POForEach.java inner plans + SecondaryKeyOptimizer for nested
        order); the Spark-first lowering rewrites each supported shape:

          x = DISTINCT B.col   → COUNT/SUM/AVG(x) = distinct aggregates
          x = FILTER B BY p    → aggregates over when(p, ...)
          x = ORDER B BY c     → dropped for algebraic consumers
                                 (order-insensitive; no secondary sort)
          x = B.col            → plain column pipe

        LIMIT inside a block isn't algebraic — use the flat top-k form
        (operators.nested.topk_per_group) instead; we raise with that
        pointer rather than silently materializing bags.
        """
        g = info.grouped
        if g is None:
            raise SyntaxError("nested FOREACH { ... } requires FOREACH over a GROUP/COGROUP alias")
        pipes: dict[str, _Pipe] = {}
        for st in op.nested:
            if st.kind == "expr":
                # nested expression alias (QueryParser.g nested_command
                # 'alias = expression'): a derived per-tuple value of
                # the child — materialized as a pre-shuffle column, so
                # downstream aggregates/pipes treat it as a plain
                # column pipe (the projection runs in the scan stage,
                # never in a reducer bag); recorded in g.derived so
                # whole-tuple pipes keep emitting the ORIGINAL tuple.
                g = G_replace(
                    g,
                    child=Relation(
                        g.child.df.withColumn(st.alias, self._expr(st.cond, g.child))
                    ),
                    derived=g.derived + (st.alias,),
                )
                pipes[st.alias] = _Pipe(col=st.alias)
                continue
            if st.kind == "nforeach":
                # inner FOREACH (nested_op since Pig 0.10): a per-tuple
                # projection of the source pipe. The projection
                # commutes with grouping, so each generated item
                # materializes as a pre-shuffle derived column (mangled
                # name); the pipe's tuple becomes exactly those fields
                # via the proj mapping — still no reducer bags.
                base = self._resolve_pipe(st.source, g, pipes)
                ch = g.child
                if any(item.flatten for item in st.cond):
                    # FLATTEN inside the inner FOREACH (QueryParser.g
                    # nested_foreach — r4 residual corner): per-tuple
                    # expansion of an array field. The pipe's tuples
                    # become the ELEMENTS of a per-row array column
                    # (transform over the bag — multiplicity lives
                    # INSIDE the array, so the child row count and
                    # every sibling pipe stay untouched); a nested
                    # FILTER on the source pipe nulls the row's array
                    # (collect/size/sum all skip nulls). Consumers:
                    # aggregates (_arr_pipe_agg two-level partials),
                    # GENERATE <pipe> (bag = flatten ∘ collect_list),
                    # FLATTEN in GENERATE (multiflatten explode).
                    g, pipe = self._nforeach_flatten_pipe(st, base, g)
                    pipes[st.alias] = pipe
                    continue
                proj: dict[str, str] = {}
                for i, item in enumerate(st.cond):
                    name = item.alias or _default_name(item.expr, i)
                    mangled = f"__nf_{st.alias}_{name}"
                    ch = Relation(ch.df.withColumn(mangled, self._expr(item.expr, ch)))
                    proj[name] = mangled
                g = G_replace(g, child=ch, derived=g.derived + tuple(proj.values()))
                base.proj = proj
                base.col = None
                pipes[st.alias] = base
                continue
            if st.kind == "cross":
                raise NotImplementedError(
                    "nested CROSS over a single-input GROUP is not supported; "
                    "COGROUP the inputs and cross the sibling bags"
                )
            base = self._resolve_pipe(st.source, g, pipes)
            if base.arr and st.kind in ("distinct", "filter", "order", "limit", "project"):
                # pipe ops chained onto a FLATTENed inner-FOREACH pipe
                # (QueryParser.g:921-971 residual corner, closed r6).
                # FILTER is exact per element (rewrites the per-row
                # array in place — no shuffle); DISTINCT/ORDER/LIMIT
                # are group-level bag ops recorded as flags and applied
                # when the bag assembles at the consumer (_pipe_bag /
                # _nested_agg) — Pig's own reducer-bag footprint.
                # STATEMENT order is the dataflow order: once a LIMIT
                # is recorded, later ops must see the sliced bag, so
                # they append to post_ops instead of the flags (which
                # consumers apply in canonical order before the slice).
                if base.limited or base.post_ops:
                    if base.post_ops is None:
                        base.post_ops = []
                    if st.kind == "filter":
                        base.post_ops.append(("filter", st.cond))
                    elif st.kind == "distinct":
                        base.post_ops.append(("distinct", None))
                    elif st.kind == "order":
                        enames = list(g.child.df.schema[base.arr].dataType.elementType.names)
                        norm = []
                        for ok in st.cond:
                            cname, a = ok if isinstance(ok, tuple) else (ok, True)
                            if cname == "*":
                                norm.extend((c, a) for c in enames)
                            elif cname.startswith("$"):
                                norm.append((enames[int(cname[1:])], a))
                            else:
                                norm.append((cname, a))
                        base.post_ops.append(("order", norm))
                    elif st.kind == "limit":
                        base.post_ops.append(("limit", int(st.cond)))
                    pipes[st.alias] = base
                    continue
                if st.kind == "distinct" and base.ordered:
                    # d = DISTINCT o after an ORDER: Pig's nested
                    # DISTINCT is POSortedDistinct — it re-sorts by the
                    # FULL tuple (natural order), discarding the prior
                    # ORDER's keys
                    elem = g.child.df.schema[base.arr].dataType.elementType
                    names = [base.col.split("::")[-1]] if base.col is not None else list(elem.names)
                    base.distinct = True
                    base.order_keys = [(n, True) for n in names]
                    pipes[st.alias] = base
                    continue
                if st.kind == "filter":
                    ch = g.child
                    enames = list(ch.df.schema[base.arr].dataType.elementType.names)
                    mangled = f"__nfa_{st.alias}"
                    filtered = F.filter(
                        ch.df[base.arr],
                        lambda el: self._elem_expr(st.cond, el, enames),
                    )
                    g = G_replace(
                        g,
                        child=Relation(ch.df.withColumn(mangled, filtered)),
                        derived=g.derived + (mangled,),
                    )
                    base.arr = mangled
                elif st.kind == "distinct":
                    base.distinct = True
                elif st.kind == "order":
                    enames = list(g.child.df.schema[base.arr].dataType.elementType.names)
                    norm = []
                    for ok in st.cond:
                        cname, a = ok if isinstance(ok, tuple) else (ok, True)
                        if cname == "*":
                            norm.extend((c, a) for c in enames)
                        elif cname.startswith("$"):
                            norm.append((enames[int(cname[1:])], a))
                        elif cname in enames:
                            norm.append((cname, a))
                        else:
                            raise NameError(
                                f"nested ORDER over FLATTENed pipe: no field {cname!r} "
                                f"(fields: {enames})"
                            )
                    base.ordered = True
                    base.order_keys = norm
                elif st.kind == "limit":
                    base.limited = True
                    base.limit_n = int(st.cond)
                # "project" (x = p.col): _resolve_pipe already set base.col
                pipes[st.alias] = base
                continue
            if st.kind != "project" and (base.limited or base.post_ops):
                # op chained after a LIMIT pipe: statement order is the
                # dataflow order — record for sequential replay on the
                # sliced bag (_pipe_bag), mirroring the arr-pipe path
                if base.post_ops is None:
                    base.post_ops = []
                if st.kind == "filter":
                    base.post_ops.append(("filter", st.cond))
                elif st.kind == "distinct":
                    base.post_ops.append(("distinct", None))
                elif st.kind == "limit":
                    base.post_ops.append(("limit", int(st.cond)))
                elif st.kind == "order":
                    child_cols = (
                        list(base.proj)
                        if base.proj
                        else [c for c in g.child.df.columns if c not in g.derived]
                    )
                    norm = []
                    for ok in st.cond:
                        cname, a = ok if isinstance(ok, tuple) else (ok, True)
                        if cname == "*":
                            norm.extend((c, a) for c in child_cols)
                        elif cname.startswith("$"):
                            norm.append((child_cols[int(cname[1:])], a))
                        else:
                            norm.append((cname.split("::")[-1], a))
                    base.post_ops.append(("order", norm))
                pipes[st.alias] = base
                continue
            if st.kind == "project":
                pass  # _resolve_pipe already applied the column
            elif st.kind == "distinct":
                if base.ordered:
                    # Pig's nested DISTINCT (POSortedDistinct) re-sorts
                    # by the full tuple, discarding the prior ORDER
                    # (mangled child-column names, like ORDER's own
                    # normalization — consumers rename to output fields)
                    base.order_keys = [
                        (n, True)
                        for n in (
                            list(base.proj.values())
                            if base.proj
                            else (
                                [base.col]
                                if base.col is not None
                                else [c for c in g.child.df.columns if c not in g.derived]
                            )
                        )
                    ]
                base.distinct = True
            elif st.kind == "filter":
                base.cond = st.cond if base.cond is None else G.Bin("and", base.cond, st.cond)
            elif st.kind == "order":
                base.ordered = True
                # normalize positional ($N → N-th column), star (* →
                # every column) and inner-FOREACH projection names up
                # front so every downstream consumer sees real columns
                child_cols = (
                    list(base.proj.values())
                    if base.proj
                    else [c for c in g.child.df.columns if c not in g.derived]
                )
                norm: list[tuple[str, bool]] = []
                for ok in st.cond:
                    cname, a = ok if isinstance(ok, tuple) else (ok, True)
                    if cname == "*":
                        norm.extend((c, a) for c in child_cols)
                    elif cname.startswith("$"):
                        norm.append((child_cols[int(cname[1:])], a))
                    elif base.proj and cname in base.proj:
                        norm.append((base.proj[cname], a))
                    else:
                        norm.append((cname, a))
                base.order_keys = norm
            elif st.kind == "limit":
                base.limited = True
                base.limit_n = int(st.cond)
            pipes[st.alias] = base
        for pname, p in pipes.items():
            try:  # describe C::D support — best-effort schema record
                self.nested_schemas[f"{self._current_alias}::{pname}"] = self._pipe_schema(p, g)
            except Exception:
                pass
        if any(self._has_over_call(item.expr) for item in op.items):
            return self._foreach_nested_over(op, g, pipes)
        n_flat_pipes = sum(
            1 for it in op.items if it.flatten and (self._pipe_heads(it.expr) & set(pipes))
        )
        arr_flat = any(
            it.flatten
            and any(h in pipes and pipes[h].arr for h in self._pipe_heads(it.expr))
            for it in op.items
        )
        post_flat = any(
            it.flatten
            and any(h in pipes and pipes[h].post_ops for h in self._pipe_heads(it.expr))
            for it in op.items
        )
        if n_flat_pipes > 1 or arr_flat or post_flat:
            return self._foreach_nested_multiflatten(op, g, pipes)
        # arr pipes handle their own LIMIT at bag-assembly time
        # (_pipe_bag slice) — keep them out of the row-level topk path;
        # post_ops pipes assemble as bags too (the window path can't
        # replay ops that must see the sliced bag)
        limited_names = {n for n, p in pipes.items() if p.limited and not p.arr and not p.post_ops}
        if limited_names and any(
            self._pipe_heads(item.expr) & limited_names
            for item in op.items
            if not (isinstance(item.expr, G.Col) and (item.expr.name == "group" or item.expr.name.startswith("group.")))
        ):
            return self._foreach_nested_topk(op, g, pipes, limited_names)
        if any(
            item.flatten and (self._pipe_heads(item.expr) & set(pipes))
            for item in op.items
        ):
            return self._foreach_nested_flatten(op, g, pipes)
        key_cols = [c.alias(n) for n, c in g.key_exprs]
        aggs: list[Column] = []
        selects: list[Column] = []
        seen_names: set[str] = set()
        for i, item in enumerate(op.items):
            e = item.expr
            name = item.alias if isinstance(item.alias, str) else _default_name(e, i)
            if name in seen_names:  # un-aliased collisions → positional suffix
                name = f"{name}_{i}"
            seen_names.add(name)
            if isinstance(e, G.Col) and e.name == "group":
                if not g.key_exprs:
                    # GROUP ALL: Pig's group value is the literal
                    # 'all' (LOCogroup GROUP ALL semantics)
                    selects.append(F.lit("all").alias(item.alias or "group"))
                elif len(g.key_exprs) == 1:
                    # FLATTEN(group) of a single key is Pig's no-op
                    # flatten of a scalar: the field stays named
                    # 'group' (LogicalSchema), so a downstream
                    # `generate group` keeps resolving
                    selects.append(F.col(g.key_exprs[0][0]).alias(item.alias or "group"))
                elif item.flatten:
                    selects.extend(F.col(n) for n, _ in g.key_exprs)
                else:
                    selects.append(
                        F.struct(*[F.col(n) for n, _ in g.key_exprs]).alias(item.alias or "group")
                    )
                continue
            aggs.append(self._nested_agg(e, g, pipes).alias(name))
            selects.append(F.col(name))
        grouped = g.child.df.groupBy(*key_cols) if key_cols else g.child.df.groupBy()
        return Relation(grouped.agg(*aggs).select(*selects))

    def _strip_pipe_prefix(self, e, lname: str):
        """Rewrite ``lname.x`` column refs to bare ``x`` so a scalar
        expression over a nested pipe's survivors can resolve against
        the top-k frame; any ref outside the pipe raises."""
        if isinstance(e, G.Col):
            head, _, rest = e.name.partition(".")
            if head == lname and rest:
                return G.Col(rest)
            raise NotImplementedError(
                f"aggregate over {e.name!r} mixed into the {lname!r} LIMIT-pipe expression"
            )
        if isinstance(e, G.Bin):
            return G.Bin(e.op, self._strip_pipe_prefix(e.left, lname), self._strip_pipe_prefix(e.right, lname))
        if isinstance(e, G.Cast):
            return G.Cast(e.type, self._strip_pipe_prefix(e.operand, lname))
        if isinstance(e, G.Call):
            return G.Call(e.func, [self._strip_pipe_prefix(a, lname) for a in e.args])
        if isinstance(e, G.BinCond):
            return G.BinCond(
                self._strip_pipe_prefix(e.cond, lname),
                self._strip_pipe_prefix(e.then, lname),
                self._strip_pipe_prefix(e.otherwise, lname),
            )
        if isinstance(e, (G.Num, G.Str, G.Bool)):
            return e
        raise NotImplementedError(
            f"unsupported expression {type(e).__name__} inside a LIMIT-pipe aggregate"
        )

    def _bag_agg(self, fname: str, e: G.Call, rel: Relation) -> Column | None:
        """Aggregates applied to a MATERIALIZED bag column — FOREACH
        over a COGROUP alias (`FOREACH cg GENERATE group, COUNT(c),
        MAX(o.o_totalprice)`). Pig evaluates the aggregate UDF per
        tuple over the bag; here the bag is an array column, so the
        aggregate lowers to array functions (map-only, no shuffle —
        POForEach over DataBag ≅ higher-order functions over arrays).
        Returns None when not applicable (plain aggregate contexts)."""
        from pyspark.sql import types as T

        lfn = fname.lower()
        if lfn not in ("count", "count_star", "sum", "avg", "min", "max") or len(e.args) != 1:
            return None
        arg = e.args[0]
        if not isinstance(arg, G.Col):
            if isinstance(arg, (G.Num, G.Str, G.Bool)):
                return None
            # bag-valued EXPRESSION: COUNT(TOKENIZE(text)) in a plain
            # FOREACH is Pig's per-tuple bag count (COUNT.java applied
            # to the evaluated bag), not a grouped aggregate — probe
            # the expression's type (the SIZE dispatch pattern) and
            # lower to array functions when it is a bag
            try:
                c = self._expr(arg, rel)
                dtype = rel.df.select(c.alias("__bag")).schema[0].dataType
            except Exception:
                return None
            if not isinstance(dtype, T.ArrayType):
                return None
            return self._agg_over_bag(lfn, c, dtype.elementType, None)
        head, _, rest = arg.name.partition(".")
        if head.startswith("$") and head[1:].isdigit() and int(head[1:]) < len(rel.df.columns):
            # positional bag ref: COUNT($1) over a COGROUP row
            head = rel.df.columns[int(head[1:])]
        if head not in rel.df.columns:
            return None
        dtype = rel.df.schema[head].dataType
        if not isinstance(dtype, T.ArrayType):
            return None
        elem = dtype.elementType
        if rest and isinstance(elem, T.StructType) and rest not in elem.names:
            # qualifier-chain history: Pig's LogicalSchema keeps the
            # full d::field name even where our flatten dropped the
            # prefix for a non-colliding field — match by leaf when
            # unique (same contract as _resolve's :: handling)
            leaf = rest.split("::")[-1]
            cand = [n for n in elem.names if n.split("::")[-1] == leaf]
            if len(cand) == 1:
                rest = cand[0]
        return self._agg_over_bag(lfn, F.col(head), elem, rest or None)

    @staticmethod
    def _agg_over_bag(lfn: str, arr: Column, elem, rest: str | None) -> Column:
        """count/sum/avg/min/max over an ASSEMBLED bag (array) column —
        array functions only, no extra shuffle (POForEach over DataBag
        ≅ higher-order functions over arrays; COUNT skips null first
        fields per COUNT.java:40)."""
        from pyspark.sql import types as T

        if lfn == "count_star":
            return F.size(arr).cast("long")
        if rest:
            vals = F.transform(arr, lambda t: t[rest])
            velem = elem[rest].dataType if isinstance(elem, T.StructType) else elem
        elif isinstance(elem, T.StructType):
            first = elem.names[0]  # COUNT(bag): non-null FIRST field (COUNT.java:40)
            vals = F.transform(arr, lambda t: t[first])
            velem = elem[first].dataType
        else:
            vals, velem = arr, elem
        nn = F.filter(vals, lambda x: x.isNotNull())
        if lfn == "count":
            return F.size(nn).cast("long")
        if lfn == "min":
            return F.array_min(nn)
        if lfn == "max":
            return F.array_max(nn)
        if isinstance(velem, (T.StringType, T.BinaryType)):
            # SUM/AVG over an untyped (bytearray) bag field: Pig casts
            # to double (no implicit coercion inside HOF lambdas)
            nn = F.filter(
                F.transform(nn, lambda x: x.try_cast("double")), lambda x: x.isNotNull()
            )
            velem = T.DoubleType()
        zero = F.lit(0).cast(velem.simpleString())
        total = F.aggregate(nn, zero, lambda acc, x: acc + x)
        if lfn == "sum":
            return total
        return F.when(F.size(nn) > 0, total.cast("double") / F.size(nn)).otherwise(F.lit(None))

    def _split_agg_leaves(self, e, limited_names: set, leaves: list, combo_idx: int):
        """Decompose a combining expression into aggregate-call leaves:
        each leaf is replaced by a generated column ref and recorded as
        (gen_name, limited_pipe_or_None, call) so it can be computed in
        its pipe's top-k frame (or the flat-agg path) and stitched; the
        returned rewritten expression is pure scalar over those
        columns (plus group-key refs)."""
        if isinstance(e, G.Call) and e.func.lower() in AGG_FUNCS:
            lheads = self._pipe_heads(e) & limited_names
            if len(lheads) > 1:
                # COUNT/SUM/AVG/MIN/MAX take ONE bag; an argument mixing
                # two pipes is bag arithmetic, which Pig's type checker
                # rejects too (TypeCheckingExpVisitor). The multi-bag
                # aggregates (COR/COV) are handled upstream.
                raise SyntaxError(
                    f"{e.func.upper()} argument mixes two nested pipes "
                    f"({', '.join(sorted(lheads))}); single-bag aggregates take one "
                    "pipe — use COR/COV for two-bag statistics"
                )
            gen = f"__agg{combo_idx}_{len(leaves)}"
            leaves.append((gen, next(iter(lheads)) if lheads else None, e))
            return G.Col(gen)
        if isinstance(e, G.Bin):
            return G.Bin(
                e.op,
                self._split_agg_leaves(e.left, limited_names, leaves, combo_idx),
                self._split_agg_leaves(e.right, limited_names, leaves, combo_idx),
            )
        if isinstance(e, G.Cast):
            return G.Cast(e.type, self._split_agg_leaves(e.operand, limited_names, leaves, combo_idx))
        if isinstance(e, G.BinCond):
            return G.BinCond(
                self._split_agg_leaves(e.cond, limited_names, leaves, combo_idx),
                self._split_agg_leaves(e.then, limited_names, leaves, combo_idx),
                self._split_agg_leaves(e.otherwise, limited_names, leaves, combo_idx),
            )
        if isinstance(e, G.Call):  # scalar function over combined aggs
            return G.Call(
                e.func,
                [self._split_agg_leaves(a, limited_names, leaves, combo_idx) for a in e.args],
            )
        if isinstance(e, (G.Num, G.Str, G.Bool)):
            return e
        if isinstance(e, G.Col) and e.name == "group":
            return e  # single-key group ref — rewritten by the caller's frame
        if isinstance(e, G.Col) and e.name.startswith("group."):
            return G.Col(e.name.split(".", 1)[1])  # stitched frame carries key columns
        raise NotImplementedError(
            f"unaggregated pipe reference {getattr(e, 'name', type(e).__name__)!r} "
            "in an expression combining aggregates"
        )

    def _pipe_heads(self, e) -> set:
        """Inner-pipe aliases referenced anywhere in a GENERATE expr."""
        if isinstance(e, G.Bin):
            return self._pipe_heads(e.left) | self._pipe_heads(e.right)
        if isinstance(e, G.Cast):
            return self._pipe_heads(e.operand)
        if isinstance(e, G.Call):
            out: set = set()
            for a in e.args:
                out |= self._pipe_heads(a)
            return out
        if isinstance(e, G.Col):
            return {e.name.split(".", 1)[0]}
        if isinstance(e, G.MultiCol):
            return {e.rel.split(".", 1)[0]}
        return set()

    def _foreach_nested_flatten(self, op: G.Foreach, g: GroupedInfo, pipes: dict[str, "_Pipe"]) -> Relation:
        """{ s = ORDER x BY f; GENERATE group, FLATTEN(s[.col]) } — the
        SecondarySort idiom (SecondaryKeyOptimizer.java: Pig moves the
        nested sort into the shuffle's secondary key instead of sorting
        reducer bags). Spark-first equivalent: hash-partition on the
        group key and sortWithinPartitions(key, order) — per-group
        sorted row output, no bags, one shuffle. A nested FILTER in the
        pipe becomes a pre-shuffle predicate."""
        flat_items = [it for it in op.items if it.flatten and (self._pipe_heads(it.expr) & set(pipes))]
        if len(flat_items) != 1:
            raise NotImplementedError("exactly one FLATTEN(<inner pipe>) per nested GENERATE is supported")
        # aggregates alongside the FLATTEN (Pig bag×scalar cross
        # product — each flattened row carries the group's aggregate
        # values): computed in one grouped frame and joined back on
        # the group keys, same scheme as the LIMIT-pipe path
        agg_like = [
            (i, it) for i, it in enumerate(op.items)
            if not any(it is f for f in flat_items)
            and not (isinstance(it.expr, G.Col) and (it.expr.name == "group" or it.expr.name.startswith("group.")))
        ]
        item = flat_items[0]
        if not isinstance(item.expr, G.Col):
            raise NotImplementedError("FLATTEN of an inner pipe takes the pipe or pipe.column")
        pipe = self._resolve_pipe(item.expr.name, g, pipes)

        child = g.child
        df = child.df
        if pipe.cond is not None:
            df = df.filter(self._expr(pipe.cond, child))
        key_names = [n for n, _ in g.key_exprs]
        # inner-FOREACH pipes: the tuple is the projection's fields
        # (mangled pre-shuffle columns, renamed back on output).
        # Whole-tuple pipes carry the FULL child tuple — key source
        # columns included (LogicalSchema: the inner bag keeps every
        # field; r5 fix of the key-column omission divergence)
        rename = {v: k for k, v in pipe.proj.items()} if pipe.proj else {}
        others = (
            list(pipe.proj.values()) if pipe.proj
            else [c for c in df.columns if c not in g.derived]
        )
        kdf = df.select(
            *[c.alias(n) for n, c in g.key_exprs if n not in others],
            *[df[c] for c in others],
        )
        if pipe.distinct:
            # { d = DISTINCT B[.col]; GENERATE group, FLATTEN(d) } —
            # per-group distinct rows of the pipe's projection: one
            # dropDuplicates over (keys + projection), no bags
            cols = [pipe.col] if pipe.col is not None else others
            kdf = kdf.select(*[F.col(n) for n in key_names], *[F.col(c) for c in cols]).dropDuplicates()
            others = cols
        agg_names: dict[int, str] = {}
        if agg_like:
            aggs = []
            seen: set[str] = set()
            for i, it in agg_like:
                name = it.alias if isinstance(it.alias, str) else _default_name(it.expr, i)
                if name in seen:  # un-aliased collisions → positional suffix
                    name = f"{name}_{i}"
                seen.add(name)
                agg_names[i] = name
                aggs.append(self._nested_agg(it.expr, g, pipes).alias(name))
            aggf = (
                child.df.groupBy(*[c.alias(n) for n, c in g.key_exprs]) if key_names else child.df.groupBy()
            ).agg(*aggs)
            kdf = kdf.join(aggf, key_names, "left") if key_names else kdf.crossJoin(aggf)

        if pipe.ordered and pipe.order_keys:
            order_cols = []
            for ok in pipe.order_keys:
                cname, a = ok if isinstance(ok, tuple) else (ok, True)
                if cname.startswith(g.child_alias + "."):
                    cname = cname.split(".", 1)[1]
                order_cols.append(F.col(cname).asc() if a else F.col(cname).desc())
            if key_names:
                kdf = kdf.repartition(*[F.col(n) for n in key_names]).sortWithinPartitions(
                    *[F.col(n) for n in key_names], *order_cols
                )
            else:
                kdf = kdf.sortWithinPartitions(*order_cols)

        selects: list[Column] = []
        for i, it in enumerate(op.items):
            if isinstance(it.expr, G.Col) and it.expr.name == "group":
                if len(g.key_exprs) == 1:
                    selects.append(F.col(g.key_exprs[0][0]).alias(it.alias or "group"))
                else:
                    selects.extend(F.col(n) for n, _ in g.key_exprs)
            elif isinstance(it.expr, G.Col) and it.expr.name.startswith("group."):
                kname = _group_key(it.expr.name.split(".", 1)[1], g.key_exprs)
                selects.append(F.col(kname).alias(it.alias or kname))
            elif i in agg_names:
                selects.append(F.col(agg_names[i]))
            elif pipe.col is not None:
                out = rename.get(pipe.col, pipe.col)
                aname, atype = _single_alias(it.alias)
                c = F.col(pipe.col)
                if atype is not None:
                    c = c.try_cast(PIG_TO_SPARK_TYPE.get(atype, atype))
                selects.append(c.alias(aname or out.split("::")[-1]))
            elif isinstance(it.alias, list):
                # FLATTEN(pipe) AS (a[:t], ...) — positional splat
                # rename (+ casts), arity-checked
                if len(it.alias) != len(others):
                    raise ValueError(
                        f"pig latin: FLATTEN AS schema has {len(it.alias)} "
                        f"fields, got {len(others)}"
                    )
                for c, (new_name, ftype) in zip(others, it.alias):
                    col = F.col(c)
                    if ftype is not None:
                        col = col.try_cast(PIG_TO_SPARK_TYPE.get(ftype, ftype))
                    selects.append(col.alias(new_name))
            elif isinstance(it.alias, str) and len(others) == 1:
                selects.append(F.col(others[0]).alias(it.alias))
            else:
                selects.extend(F.col(c).alias(rename.get(c, c)) for c in others)
        return Relation(kdf.select(*selects))

    def _has_over_call(self, e) -> bool:
        """True when the expression contains a Stitch/Over call — the
        piggybank window idiom handled by _foreach_nested_over."""
        if isinstance(e, G.Call):
            if e.func.lower() in ("stitch", "over"):
                return True
            return any(self._has_over_call(a) for a in e.args)
        if isinstance(e, G.Bin):
            return self._has_over_call(e.left) or self._has_over_call(e.right)
        if isinstance(e, G.Cast):
            return self._has_over_call(e.operand)
        return False

    # Over.java:112-119 frame constants: -1 = unbounded, 0 = current
    # row, k>0 = k rows away from current (before for start, after for
    # end); defaults (-1, 0) = unbounded preceding .. current row.
    _OVER_RANKING = {
        "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
    }
    _OVER_SUM_CAST = {
        "int": "long", "long": "long", "float": "double", "double": "double",
        "bytearray": "double", "bigdecimal": "decimal(38,18)",
    }
    _OVER_MINMAX_CAST = {
        "int": "int", "long": "long", "float": "float", "double": "double",
        "chararray": "string", "bytearray": "string", "bigdecimal": "decimal(38,18)",
    }

    def _foreach_nested_over(self, op: G.Foreach, g: GroupedInfo, pipes: dict[str, "_Pipe"]) -> Relation:
        """{ s = ORDER B BY d; GENERATE FLATTEN(Stitch(s, Over(s.f,
        'sum(double)'), ...)) } — the piggybank window surface
        (Over.java:74-140: row_number/rank/dense_rank/ntile/
        percent_rank/cume_dist/lead/lag/first_value/last_value and
        windowed count/sum/avg/min/max with rows frames; Stitch.java
        zips results back onto the ordered tuples).

        Pig evaluates the function over each group's ordered bag;
        the Spark-first lowering is the exact native construct:
        ``Window.partitionBy(group keys).orderBy(pipe order)`` with
        Over's (window_start, window_end) mapped to ``rowsBetween`` —
        one shuffle, whole-stage-codegen window evaluation, no bags.
        Output rows = the pipe's tuples + one column per Over call
        (named ``result`` / ``result_i`` after Over.java's default
        returnName, renameable with FLATTEN ... AS (...))."""
        flat_items = [it for it in op.items if self._has_over_call(it.expr)]
        for it in op.items:
            if any(it is f for f in flat_items):
                continue
            if not (isinstance(it.expr, G.Col) and (it.expr.name == "group" or it.expr.name.startswith("group."))):
                raise NotImplementedError("Stitch/Over cannot mix with other GENERATE expressions")
        if len(flat_items) > 1:
            return self._foreach_multi_over(op, g, pipes, flat_items)
        item = flat_items[0]
        flat_sel, df = self._stitch_frame(item, g, pipes)
        # GENERATE order: group refs before/after the FLATTEN keep
        # their position (keys are in the pipe's tuples too — Stitch
        # emits the full ordered tuple — but Pig lets both appear)
        selects: list[Column] = []
        for it in op.items:
            if it is item:
                selects.extend(flat_sel)
            elif isinstance(it.expr, G.Col) and it.expr.name == "group":
                if len(g.key_exprs) == 1:
                    selects.append(g.key_exprs[0][1].alias(it.alias or "group"))
                else:
                    selects.extend(c.alias(n) for n, c in g.key_exprs)
            else:  # group.key
                kname = _group_key(it.expr.name.split(".", 1)[1], g.key_exprs)
                expr = dict(g.key_exprs).get(kname)
                if expr is None:
                    raise NameError(f"unknown group key {kname!r}")
                selects.append(expr.alias(it.alias or kname))
        return Relation(df.select(*selects))

    def _foreach_multi_over(
        self, op: G.Foreach, g: GroupedInfo, pipes: dict[str, "_Pipe"], flat_items: list
    ) -> Relation:
        """Several FLATTENed Stitch/Over bags in one GENERATE. Pig's
        FLATTEN contract for multiple bags is their per-group CROSS
        PRODUCT (LogicalPlanBuilder flatten semantics — flattening two
        bags in one GENERATE crosses their tuples), so each Stitch
        builds its own windowed frame over the same group-key
        partitioning and the cross product lowers to a null-safe
        equi-JOIN on the group keys — co-partitioned with the window
        exchanges, never a global cartesian, and row counts stay the
        honest n_i×n_j per group. Callers wanting parallel COLUMNS
        (one row per tuple) should put all Over calls in ONE Stitch.
        Each item must carry an AS (...) schema so the joined frames'
        column names are unique."""
        gk_names = [f"__gk{k}" for k in range(len(g.key_exprs))]
        frames: list[DataFrame] = []
        seen: set[str] = set()
        for item in flat_items:
            if not isinstance(item.alias, list):
                raise SyntaxError(
                    "multiple FLATTEN(Stitch/Over) expressions in one GENERATE need "
                    "AS (...) schemas to disambiguate their column names"
                )
            names = [n for n, _ in item.alias]
            dup = seen.intersection(names)
            if dup:
                raise SyntaxError(
                    f"duplicate column names across Stitch AS schemas: {sorted(dup)}"
                )
            seen.update(names)
            flat_sel, df = self._stitch_frame(item, g, pipes)
            gk = [c.alias(nm) for nm, (_, c) in zip(gk_names, g.key_exprs)]
            frames.append(df.select(*flat_sel, *gk))
        out = frames[0]
        for f in frames[1:]:
            renames = {nm: f"{nm}_r" for nm in gk_names}
            for a, b in renames.items():
                f = f.withColumnRenamed(a, b)
            cond = [out[a].eqNullSafe(f[b]) for a, b in renames.items()]
            out = out.join(f, on=cond).drop(*renames.values())
        selects: list[Column] = []
        for it in op.items:
            if any(it is fi for fi in flat_items):
                selects.extend(F.col(n) for n, _ in it.alias)
            elif isinstance(it.expr, G.Col) and it.expr.name == "group":
                if len(g.key_exprs) == 1:
                    selects.append(F.col(gk_names[0]).alias(it.alias or "group"))
                else:
                    selects.extend(
                        F.col(nm).alias(n) for nm, (n, _) in zip(gk_names, g.key_exprs)
                    )
            else:  # group.key
                kname = _group_key(it.expr.name.split(".", 1)[1], g.key_exprs)
                key_names = [n for n, _ in g.key_exprs]
                if kname not in key_names:
                    raise NameError(f"unknown group key {kname!r}")
                selects.append(
                    F.col(gk_names[key_names.index(kname)]).alias(it.alias or kname)
                )
        return Relation(out.select(*selects))

    def _stitch_frame(
        self, item, g: GroupedInfo, pipes: dict[str, "_Pipe"]
    ) -> tuple[list[Column], DataFrame]:
        """One FLATTEN(Stitch/Over) item → (select columns, source df):
        the windowed projection of its ordered pipe (tuple columns when
        stitched, plus one column per Over call, AS-schema applied)."""
        e = item.expr
        if not item.flatten:
            raise NotImplementedError(
                "Over/Stitch must be FLATTENed (bag-valued results are not materialized); "
                "write GENERATE FLATTEN(Stitch(s, Over(...)))"
            )
        # resolve the ordered pipe + the Over calls
        if isinstance(e, G.Call) and e.func.lower() == "stitch":
            if not (e.args and isinstance(e.args[0], G.Col)):
                raise SyntaxError("Stitch takes the ordered pipe as its first argument")
            pipe_ref = e.args[0].name
            overs = e.args[1:]
            stitched = True
        elif isinstance(e, G.Call) and e.func.lower() == "over":
            pipe_ref = e.args[0].name.split(".", 1)[0] if isinstance(e.args[0], G.Col) else None
            if pipe_ref is None:
                raise SyntaxError("Over takes pipe[.column] as its first argument")
            overs = [e]
            stitched = False
        else:
            raise NotImplementedError("Stitch/Over must be the whole FLATTEN expression")
        for oc in overs:
            if not (isinstance(oc, G.Call) and oc.func.lower() == "over"):
                raise SyntaxError("Stitch arguments after the pipe must be Over(...) calls")

        pipe = self._resolve_pipe(pipe_ref.split(".", 1)[0], g, pipes)
        if pipe.distinct or pipe.limited:
            raise NotImplementedError("Over works on an ORDERed pipe (no nested DISTINCT/LIMIT)")
        if not (pipe.ordered and pipe.order_keys):
            raise SyntaxError(
                "Over requires the bag ordered first (Over.java contract): add s = ORDER x BY ...;"
            )

        child = g.child
        df = child.df
        if pipe.cond is not None:
            df = df.filter(self._expr(pipe.cond, child))
        order_cols = []
        for ok in pipe.order_keys:
            cname, a = ok if isinstance(ok, tuple) else (ok, True)
            if cname.startswith(g.child_alias + "."):
                cname = cname.split(".", 1)[1]
            order_cols.append(F.col(cname).asc() if a else F.col(cname).desc())
        w = SparkWindow.partitionBy(*[c for _, c in g.key_exprs]).orderBy(*order_cols)

        over_cols = [self._over_column(oc, g, w) for oc in overs]
        names = (
            ["result"] if len(over_cols) == 1 else [f"result_{i}" for i in range(len(over_cols))]
        )
        base_cols = (
            [c for c in df.columns if c not in g.derived] if stitched else []
        )
        if isinstance(item.alias, list):
            if len(item.alias) != len(base_cols) + len(over_cols):
                raise SyntaxError(
                    f"FLATTEN AS schema has {len(item.alias)} fields; Stitch emits "
                    f"{len(base_cols) + len(over_cols)} ({len(base_cols)} tuple + {len(over_cols)} Over)"
                )

            def typed(c: Column, n: str, t: str | None) -> Column:
                return (c.cast(PIG_TO_SPARK_TYPE[t]) if t else c).alias(n)

            flat_sel = [
                typed(F.col(c), n, t) for c, (n, t) in zip(base_cols, item.alias)
            ] + [
                typed(c, n, t) for c, (n, t) in zip(over_cols, item.alias[len(base_cols):])
            ]
        elif isinstance(item.alias, str):
            raise SyntaxError("FLATTEN(Stitch(...)) AS needs a parenthesized schema, not one name")
        else:
            flat_sel = [F.col(c) for c in base_cols] + [
                c.alias(n) for c, n in zip(over_cols, names)
            ]
        return flat_sel, df

    def _over_column(self, oc: G.Call, g: GroupedInfo, w) -> Column:
        """One Over(...) call → a Spark window Column over ``w``."""
        if not oc.args or len(oc.args) < 2:
            raise SyntaxError("Over(pipe[.col], 'function'[, window_start, window_end[, args]])")
        ref = oc.args[0]
        if not isinstance(ref, G.Col):
            raise SyntaxError("Over's first argument must be pipe[.column]")
        _, _, colname = ref.name.partition(".")
        col = F.col(colname) if colname else None
        spec_node = oc.args[1]
        if not isinstance(spec_node, G.Str):
            raise SyntaxError("Over's second argument must be the function name string")
        spec = spec_node.value.lower()
        fn, _, typ = spec.partition("(")
        typ = typ.rstrip(")")
        def as_int(a) -> int | None:
            if isinstance(a, G.Num):
                try:
                    return int(a.value)
                except ValueError:
                    return None
            if isinstance(a, G.Un) and a.op == "neg":
                inner = as_int(a.operand)
                return -inner if inner is not None else None
            return None

        nums: list[int] = []
        extras: list[object] = []
        for a in oc.args[2:]:
            iv = as_int(a)
            if iv is not None and not extras:
                nums.append(iv)
            else:
                extras.append(a.value if isinstance(a, (G.Num, G.Str, G.Bool)) else a)
        # Over.java:310-356 is strictly positional: args[2] is ALWAYS
        # window_start (default -1 = unbounded preceding), args[3]
        # window_end (default 0 = current row), args[4+] the function-
        # specific arguments — even for lead/lag/ntile. A lone number
        # is therefore window_start for every function; ntile's bucket
        # count requires the full -1,-1,k form, and lead/lag offsets
        # the full -1,-1,offset[,default] form.
        if len(nums) >= 2:
            frame = (nums[0], nums[1])
            extras = nums[2:] + extras
        elif len(nums) == 1:
            frame = (nums[0], 0)
        else:
            frame = (-1, 0)

        def lo(v: int):
            return SparkWindow.unboundedPreceding if v == -1 else (SparkWindow.currentRow if v == 0 else -v)

        def hi(v: int):
            return SparkWindow.unboundedFollowing if v == -1 else (SparkWindow.currentRow if v == 0 else v)

        framed = w.rowsBetween(lo(frame[0]), hi(frame[1]))
        if fn in self._OVER_RANKING:
            # ranking functions take Pig's ordered-field-number arg —
            # redundant here (order comes from the ORDER pipe); frames
            # are meaningless for them in SQL and rejected by Spark
            return getattr(F, fn)().over(w)
        if fn == "ntile":
            if not extras:
                raise SyntaxError(
                    "Over(..., 'ntile') needs the bucket count as the function-"
                    "specific argument AFTER window_start/window_end, e.g. "
                    "Over(p, 'ntile', -1, -1, 4) (Over.java:310-356 — a lone "
                    "number is window_start, not the bucket count)"
                )
            return F.ntile(int(extras[0])).over(w)
        if fn in ("lead", "lag"):
            if col is None:
                raise SyntaxError(f"Over(..., '{fn}') needs pipe.column")
            offset = int(extras[0]) if extras else 1
            default = extras[1] if len(extras) > 1 else None
            return getattr(F, fn)(col, offset, default).over(w)
        if fn == "first_value":
            return F.first(col if col is not None else F.lit(1)).over(framed)
        if fn == "last_value":
            return F.last(col if col is not None else F.lit(1)).over(framed)
        if fn == "count":
            # builtin.COUNT semantics: non-null first field of each tuple
            return (F.count(col) if col is not None else F.count(F.lit(1))).over(framed).cast("long")
        if fn in ("sum", "avg", "min", "max"):
            if col is None:
                raise SyntaxError(f"Over(..., '{fn}(type)') needs pipe.column")
            if fn == "sum":
                cast_t = self._OVER_SUM_CAST.get(typ or "double", "double")
                return F.sum(col.cast(cast_t)).over(framed)
            if fn == "avg":
                cast_t = "decimal(38,18)" if typ == "bigdecimal" else "double"
                return F.avg(col.cast(cast_t)).over(framed)
            cast_t = self._OVER_MINMAX_CAST.get(typ) if typ else None
            c = col.cast(cast_t) if cast_t else col
            return (F.min(c) if fn == "min" else F.max(c)).over(framed)
        raise NameError(
            f"Over: unknown function {spec!r} (Over.java supports count/sum/avg/min/max/"
            f"row_number/rank/dense_rank/ntile/percent_rank/cume_dist/lead/lag/first_value/last_value)"
        )

    def _foreach_nested_topk(self, op: G.Foreach, g: GroupedInfo, pipes: dict[str, "_Pipe"], limited_names: set) -> Relation:
        """{ s = ORDER x BY f [DESC]; l = LIMIT s k; GENERATE ... } — the
        nested top-k idiom (reference nightly.conf Nested cases,
        QueryParser.g:921-971). Lowered to
        operators.nested.topk_per_group: one shuffle on the group keys
        and a partitioned window row_number ≤ k — no reducer bags, no
        global sort, scale-safe on hot keys. The k survivors then feed
        either flat rows (FLATTEN(l)) or aggregates (SUM(l.f), COUNT(l)).

        Multiple independent LIMIT pipes are supported (r3): each gets
        its own topk_per_group candidate frame; their per-group
        aggregates — plus aggregates over *unlimited* pipes from the
        normal flat-agg path — are stitched with full_outer equi-joins
        on the group keys (AQE broadcasts small aggregate sides;
        COUNT-shaped aggregates coalesce to 0 for groups the pipe's
        FILTER emptied, matching Pig's empty-bag semantics).
        DISTINCT-then-ORDER-then-LIMIT in one pipe dedupes the pipe's
        projection per group before the window rank."""
        from ..operators.nested import topk_per_group

        child = g.child
        key_names = [n for n, _ in g.key_exprs]

        _topk_cache: dict[str, tuple] = {}

        def build_topk(lname: str):
            """Top-k candidate frame for one LIMIT pipe: returns
            (frame, its non-key columns) — memoized so a pipe consumed
            by BOTH aggregates and a FLATTEN builds its window-over-
            shuffle subtree once."""
            if lname in _topk_cache:
                return _topk_cache[lname]
            pipe = pipes[lname]
            df = child.df
            if pipe.cond is not None:
                df = df.filter(self._expr(pipe.cond, child))
            # whole-tuple pipes carry the FULL child tuple, key source
            # columns included (LogicalSchema; r5 divergence fix)
            others = (
                list(pipe.proj.values()) if pipe.proj
                else [c for c in df.columns if c not in g.derived]
            )
            kdf = df.select(
                *[c.alias(n) for n, c in g.key_exprs if n not in others],
                *[df[c] for c in others],
            )
            if pipe.distinct:
                # DISTINCT before ORDER/LIMIT: dedupe the pipe's
                # projection per group ahead of the window rank
                cols = [pipe.col] if pipe.col is not None else others
                kdf = kdf.select(*[F.col(n) for n in key_names], *[F.col(c) for c in cols]).dropDuplicates()
                others = cols
            order_names: list[str] = []
            asc: list[bool] = []
            if pipe.ordered and pipe.order_keys:
                for ok in pipe.order_keys:
                    cname, a = ok if isinstance(ok, tuple) else (ok, True)
                    if cname.startswith(g.child_alias + "."):
                        cname = cname.split(".", 1)[1]
                    order_names.append(cname)
                    asc.append(a)
            else:
                # Pig allows LIMIT without ORDER inside FOREACH {}
                # (QueryParser.g:921-971): the contract is "ANY n rows
                # of the bag". An arbitrary pick isn't reproducible
                # across retries/stragglers, so we pin a deterministic
                # stand-in: the pipe's ORDERABLE columns ascending
                # (nulls first; map-typed columns can't sort and any
                # n rows is legal anyway). Documented divergence:
                # Pig's choice is arbitrary, ours is the first n of
                # this order.
                order_names = [c for c in others if _orderable(kdf.schema[c].dataType)]
                if not order_names:
                    # all-map tuple: fall back to a group key (constant
                    # within the window — the pick is then arbitrary,
                    # which 'any n rows' permits, just not retry-stable)
                    order_names = [
                        k for k in key_names if _orderable(kdf.schema[k].dataType)
                    ][:1]
                if not order_names:
                    raise NotImplementedError(
                        "unordered nested LIMIT over a tuple of only map-typed "
                        "fields has no orderable column; add an ORDER clause"
                    )
                asc = [True] * len(order_names)
            _topk_cache[lname] = (
                topk_per_group(kdf, key_names, order_names, pipe.limit_n, ascending=asc),
                others,
                list(zip(order_names, asc)),  # bag iteration order (declared or pinned)
            )
            return _topk_cache[lname]

        # classify GENERATE items
        flat_items = []
        topk_aggs: list[tuple[str, str, object]] = []  # (name, pipe, expr)
        other_aggs: list[tuple[str, object]] = []
        combos: list[tuple[str, object]] = []  # (name, rewritten scalar over agg leaves)
        multi_exprs: list[tuple[str, list[str], str]] = []  # (name, collected refs, cor|cov)
        layout: list[tuple[str, object]] = []  # (kind, payload) in output order
        seen_names: set[str] = set()
        for i, item in enumerate(op.items):
            e = item.expr
            name = item.alias if isinstance(item.alias, str) else _default_name(e, i)
            if name in seen_names:  # un-aliased collisions → positional suffix
                name = f"{name}_{i}"
            seen_names.add(name)
            if isinstance(e, G.Col) and (e.name == "group" or e.name.startswith("group.")):
                layout.append(("group", item))
                continue
            heads = self._pipe_heads(e) & limited_names
            if heads and item.flatten:
                if len(heads) > 1:
                    raise NotImplementedError("cannot FLATTEN two LIMIT pipes in one expression")
                flat_items.append(item)
                layout.append(("flatten", item))
            elif heads and isinstance(e, G.Call) and e.func.lower() in AGG_FUNCS and len(self._pipe_heads(e)) == 1:
                # whole expression is one aggregate over one pipe
                topk_aggs.append((name, next(iter(heads)), e))
                layout.append(("col", name))
            elif (
                heads
                and isinstance(e, G.Col)
                and e.name.partition(".")[0] in limited_names
            ):
                # GENERATE <limit-pipe> — the survivors as a BAG column
                # (bag of top-k tuples); collected from the topk frame
                topk_aggs.append((name, e.name.partition(".")[0], e))
                layout.append(("col", name))
            elif (
                heads
                and isinstance(e, G.Call)
                and e.func.lower() in ("cor", "cov")
                and len(e.args) >= 2
                and all(
                    isinstance(a, G.Col) and a.name.partition(".")[0] in limited_names
                    for a in e.args
                )
            ):
                # ONE aggregate call spanning two+ LIMIT pipes
                # (builtin/COR.java:66-101, COV.java — the multi-bag
                # aggregates; QueryParser.g:921-971 residual corner,
                # closed r6): each bag argument collects as an ORDERED
                # bounded array (≤ limit_n) inside its pipe's top-k
                # frame, and the pairwise stats zip the stitched arrays
                # positionally — exactly computeAll's dual-iterator
                # walk over the two bags.
                argrefs: list[str] = []
                for ai, a in enumerate(e.args):
                    ln, _, c = a.name.partition(".")
                    if not c:
                        raise SyntaxError(
                            f"{e.func.upper()} over a whole-tuple pipe needs a "
                            f"column (e.g. {ln}.field)"
                        )
                    gen = f"__mp{len(multi_exprs)}_{ai}"
                    topk_aggs.append((gen, ln, _SortedCollect(c)))
                    argrefs.append(gen)
                multi_exprs.append((name, argrefs, e.func.lower()))
                layout.append(("col", name))
            elif heads:
                # r3: expression COMBINING aggregates — possibly over
                # several LIMIT pipes and/or the full bag, e.g.
                # SUM(a.x) / COUNT(b) — split into aggregate leaves
                # (each computed in its pipe's frame / the flat path),
                # then re-evaluate the combining scalar over the
                # stitched aggregate columns
                leaves: list[tuple[str, str | None, object]] = []
                rewritten = self._split_agg_leaves(e, limited_names, leaves, len(combos))
                for gen, head, call in leaves:
                    if head is not None:
                        topk_aggs.append((gen, head, call))
                    else:
                        other_aggs.append((gen, call))
                combos.append((name, rewritten))
                layout.append(("combo", name))
            else:
                other_aggs.append((name, e))
                layout.append(("col", name))
        if len(flat_items) > 1:
            raise NotImplementedError(
                "cross product of two FLATTENed LIMIT pipes in one GENERATE is not supported"
            )
        if len({ln for _, ln, _ in topk_aggs} | {next(iter(self._pipe_heads(it.expr) & limited_names)) for it in flat_items}) == 0:
            raise NotImplementedError("LIMIT pipe defined but never consumed in GENERATE")

        def group_selects(item) -> list[Column]:
            if isinstance(item.expr, G.Col) and item.expr.name.startswith("group."):
                kname = _group_key(item.expr.name.split(".", 1)[1], g.key_exprs)
                return [F.col(kname).alias(item.alias or kname)]
            if len(g.key_exprs) == 1 and not item.flatten:
                return [F.col(g.key_exprs[0][0]).alias(item.alias or "group")]
            return [F.col(n) for n, _ in g.key_exprs]

        # one aggregate frame per consumed LIMIT pipe, in first-use order
        parts: list = []
        count_cols: list[str] = []
        seen_pipes: list[str] = []
        for _, ln, _ in topk_aggs:
            if ln not in seen_pipes:
                seen_pipes.append(ln)
        for ln in seen_pipes:
            aggs_for = [(n, e) for n, pl, e in topk_aggs if pl == ln]
            topk, _, bag_order = build_topk(ln)
            for _, e in aggs_for:  # sorted collects pair in bag order
                if isinstance(e, _SortedCollect):
                    e.order = bag_order
            parts.append(
                topk.groupBy(*[F.col(n) for n in key_names]).agg(
                    *[self._topk_agg(e, topk, ln, g, pipes).alias(n) for n, e in aggs_for]
                )
            )
            count_cols.extend(
                n for n, e in aggs_for
                if isinstance(e, G.Call) and e.func.lower() in ("count", "count_star")
            )
        if other_aggs:
            parts.append(
                (child.df.groupBy(*[c.alias(n) for n, c in g.key_exprs]) if key_names else child.df.groupBy()).agg(
                    *[self._nested_agg(e, g, pipes).alias(n) for n, e in other_aggs]
                )
            )
        agg_out = None
        if parts:
            out = parts[0]
            for p in parts[1:]:
                if not key_names:
                    # GROUP ALL: single-row aggregates — 1×1 crossJoin
                    out = out.crossJoin(p)
                else:
                    # full_outer, not inner: a group whose rows are all
                    # removed by a pipe's nested FILTER is absent from that
                    # pipe's topk frame, but Pig still emits it — null SUM,
                    # 0 COUNT over the empty bag (POForEach on empty DataBag)
                    out = out.join(p, key_names, "full_outer")
            if len(parts) > 1 and key_names:
                for n in count_cols:
                    out = out.withColumn(n, F.coalesce(F.col(n), F.lit(0).cast("long")))
            for name, rewritten in combos:
                out = out.withColumn(name, self._expr(rewritten, Relation(out)))
            for name, argrefs, fnname in multi_exprs:
                out = out.withColumn(name, _pairwise_stats(fnname, argrefs))
            agg_out = out

        if flat_items:
            # FLATTEN(l[...]) [+ aggregates]: Pig's bag×scalar cross
            # product — every flattened survivor row carries the
            # group's aggregate values. The aggregate frame joins back
            # on the group keys (left from the flattened side: FLATTEN
            # of an empty bag drops the record, so the topk frame
            # decides which groups appear; a COUNT whose own pipe was
            # emptied coalesces to 0, Pig's empty-bag count).
            item = flat_items[0]
            lname = next(iter(self._pipe_heads(item.expr) & limited_names))
            topk, others, _ = build_topk(lname)
            fproj = pipes[lname].proj or {}
            frename = {v: k for k, v in fproj.items()}
            frame = topk
            if agg_out is not None:
                frame = (
                    topk.join(agg_out, key_names, "left") if key_names else topk.crossJoin(agg_out)
                )
                for n in count_cols:
                    frame = frame.withColumn(n, F.coalesce(F.col(n), F.lit(0).cast("long")))
            # row output: group keys + the limited pipe's tuple/column
            selects: list[Column] = []
            for kind, payload in layout:
                if kind == "group":
                    selects.extend(group_selects(payload))
                elif kind == "flatten":
                    ref = payload.expr.name if isinstance(payload.expr, G.Col) else None
                    _, _, rest = (ref or "").partition(".")
                    if rest:
                        cname = fproj.get(rest, rest)
                        aname, atype = _single_alias(payload.alias)
                        c = F.col(cname)
                        if atype is not None:
                            c = c.try_cast(PIG_TO_SPARK_TYPE.get(atype, atype))
                        selects.append(c.alias(aname or rest))
                    elif isinstance(payload.alias, list):
                        # FLATTEN(l) AS (a[:t], ...) — positional splat
                        # rename (+ casts), arity-checked like the
                        # multiflatten path
                        if len(payload.alias) != len(others):
                            raise ValueError(
                                f"pig latin: FLATTEN AS schema has "
                                f"{len(payload.alias)} fields, got {len(others)}"
                            )
                        for c, (new_name, ftype) in zip(others, payload.alias):
                            col = F.col(c)
                            if ftype is not None:
                                col = col.try_cast(PIG_TO_SPARK_TYPE.get(ftype, ftype))
                            selects.append(col.alias(new_name))
                    elif isinstance(payload.alias, str) and len(others) == 1:
                        # FLATTEN(l) AS name — single flattened field
                        selects.append(F.col(others[0]).alias(payload.alias))
                    else:
                        selects.extend(F.col(c).alias(frename.get(c, c)) for c in others)
                else:  # "col" / "combo" — stitched aggregate column
                    selects.append(F.col(payload))
            return Relation(frame.select(*selects))

        selects = []
        for kind, payload in layout:
            if kind == "group":
                selects.extend(group_selects(payload))
            else:
                selects.append(F.col(payload))
        return Relation(agg_out.select(*selects))

    def _topk_agg(self, e, topk, lname: str, g: GroupedInfo, pipes: dict[str, "_Pipe"] | None = None) -> Column:
        """Aggregate expression over the top-k survivors (references to
        the LIMIT pipe resolve against the topk DataFrame's columns)."""
        if isinstance(e, _SortedCollect):
            # bag-value array for a multi-bag aggregate (COR/COV):
            # collect (order keys, value), sort in bag iteration order,
            # strip to the values — bounded by limit_n, pure codegen
            pipe = pipes[lname] if pipes else _Pipe()
            src = pipe.proj.get(e.col, e.col) if pipe.proj else e.col
            if src not in topk.columns:
                raise NameError(f"nested pipe {lname!r} has no field {e.col!r}")
            ocols = [(c, a) for c, a in (e.order or []) if c in topk.columns]
            bag = F.collect_list(
                F.struct(
                    *[topk[c].alias(f"__o{i}") for i, (c, _) in enumerate(ocols)],
                    topk[src].alias("__v"),
                )
            )
            if ocols:
                bag = _bag_sort(bag, [(f"__o{i}", a) for i, (_, a) in enumerate(ocols)])
            return F.transform(bag, lambda t: t["__v"])
        if isinstance(e, G.Col) and e.name.partition(".")[0] == lname:
            # GENERATE <limit-pipe>[.field] — the survivors as a BAG
            # (bag of top-k tuples, ordered by the pipe's ORDER keys);
            # ≤ limit_n elements, so the collected state is bounded
            rest = e.name.partition(".")[2] or None
            pipe = pipes[lname] if pipes else _Pipe()
            rename = {v: k for k, v in pipe.proj.items()} if pipe.proj else {}
            keyset = {n for n, _ in g.key_exprs}
            if rest:
                src = pipe.proj.get(rest, rest) if pipe.proj else rest
                cols = [(rest.split("::")[-1], topk[src])]
            elif pipe.proj or pipe.col or pipe.distinct:
                cols = [
                    (rename.get(c, c).split("::")[-1], topk[c])
                    for c in topk.columns
                    if c not in keyset
                ]
            else:
                # whole-tuple pipe: bag elements follow the CHILD's
                # column order (LogicalSchema keeps the inner bag's
                # tuple layout), key columns included
                child_cols = [c for c in g.child.df.columns if c in topk.columns]
                extra = [c for c in topk.columns if c not in child_cols]
                cols = [(c.split("::")[-1], topk[c]) for c in child_cols + extra]
            bag = F.collect_list(F.struct(*[c.alias(n) for n, c in cols]))
            if pipe.ordered and pipe.order_keys:
                field_names = [n for n, _ in cols]
                order = []
                for ok in pipe.order_keys:
                    cname, a = ok if isinstance(ok, tuple) else (ok, True)
                    if cname.startswith(g.child_alias + "."):
                        cname = cname.split(".", 1)[1]
                    fld = rename.get(cname, cname).split("::")[-1]
                    if fld in field_names:
                        order.append((fld, a))
                if order:
                    bag = _bag_sort(bag, order)
            return bag
        if isinstance(e, G.Bin):
            return _binop(e.op, self._topk_agg(e.left, topk, lname, g, pipes), self._topk_agg(e.right, topk, lname, g, pipes))
        if isinstance(e, (G.Num, G.Str)):
            return self._expr(e, g.child)
        if isinstance(e, G.Cast):
            return self._topk_agg(e.operand, topk, lname, g, pipes).cast(PIG_TO_SPARK_TYPE[e.type])
        if isinstance(e, G.Call) and e.func.lower() in AGG_FUNCS:
            fn = e.func.lower()
            if not e.args:
                return F.count(F.lit(1))
            arg = e.args[0]
            if not isinstance(arg, G.Col):
                # SUM(l.a * l.b + 2) over the survivors: rewrite every
                # l.x ref to the topk frame's x and evaluate the scalar
                # expression there, then aggregate (QueryParser.g lets
                # nested aggregates take arbitrary projections)
                from ..dsl import Relation as _Rel

                stripped = self._strip_pipe_prefix(arg, lname)
                scalar = self._expr(stripped, _Rel(topk))
                return {
                    "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
                    "count": F.count, "count_star": lambda _c: F.count(F.lit(1)),
                }[fn](scalar)
            head, _, rest = arg.name.partition(".")
            if head != lname:
                raise NotImplementedError(f"aggregate over {head!r} mixed into the LIMIT-pipe expression")
            if rest:
                val: Column = topk[rest]
            elif fn in ("count", "count_star"):
                # COUNT(bag) counts non-null first fields (COUNT.java:40).
                # Whole-tuple pipes follow the CHILD's column order
                # (key columns included since the r5 divergence fix);
                # DISTINCT/proj-narrowed pipes fall back to the first
                # non-key frame column.
                keyset = {n for n, _ in g.key_exprs}
                cand = [c for c in g.child.df.columns if c in topk.columns and c not in g.derived]
                first = (
                    cand[0]
                    if cand
                    else next((c for c in topk.columns if c not in keyset), topk.columns[0])
                )
                val = topk[first] if fn == "count" else F.lit(1)
            else:
                raise SyntaxError(f"{fn.upper()} over a whole-tuple pipe needs a column (e.g. {lname}.field)")
            return {"count": F.count, "count_star": F.count, "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[fn](val)
        raise NotImplementedError(f"unsupported expression over LIMIT pipe: {e}")

    def _scalar_value(self, e):
        """LIMIT/SAMPLE argument: a constant expression, optionally
        referencing single-row relation scalars (``LIMIT r c.total /
        100`` — ScalarVisitor.java / QueryParser.g:975 scalar
        projection). The scalar relation is materialized at plan time
        (1 row — Pig's runtime contract, enforced here too) and folded
        into the constant."""
        try:
            return _const(e)
        except ValueError:
            pass
        if isinstance(e, G.Col) and "." in e.name:
            head, _, rest = e.name.partition(".")
            info = self.aliases.get(head)
            if info is not None:
                rows = info.rel.df.limit(2).collect()
                if len(rows) != 1:
                    raise ValueError(
                        f"pig latin: scalar reference {e.name!r} requires exactly one row "
                        f"(got {'multiple' if len(rows) > 1 else 'none'}) — ScalarVisitor contract"
                    )
                return rows[0][int(rest[1:])] if rest.startswith("$") else rows[0][rest]
        if isinstance(e, G.Bin):
            import operator as _o

            ops = {"+": _o.add, "-": _o.sub, "*": _o.mul, "/": _o.truediv, "%": _o.mod}
            return ops[e.op](self._scalar_value(e.left), self._scalar_value(e.right))
        if isinstance(e, G.Cast):
            return self._scalar_value(e.operand)
        raise ValueError("pig latin: LIMIT/SAMPLE takes a constant or single-row scalar expression")

    def _pipe_schema(self, p: "_Pipe", g: GroupedInfo) -> str:
        """Pig-style schema string for a nested pipe's tuple —
        DESCRIBE of an inner alias (describe C::D)."""
        ch = g.child.df
        if p.arr:
            elem = ch.schema[p.arr].dataType.elementType
            fields = [(f.name, f.dataType.simpleString()) for f in elem.fields]
        elif p.proj:
            fields = [
                (out, ch.schema[m].dataType.simpleString()) for out, m in p.proj.items()
            ]
        elif p.col is not None:
            leaf = p.col.split("::")[-1]
            t = ch.schema[p.col].dataType.simpleString() if p.col in ch.columns else "bytearray"
            fields = [(leaf, t)]
        else:
            fields = [
                (c, ch.schema[c].dataType.simpleString())
                for c in ch.columns
                if c not in g.derived
            ]
        return "{(" + ", ".join(f"{n}: {t}" for n, t in fields) + ")}"

    def _resolve_pipe(self, source: str, g: GroupedInfo, pipes: dict[str, "_Pipe"]) -> "_Pipe":
        head, _, rest = source.partition(".")
        if head in pipes:
            p = pipes[head].copy()
            if rest:
                if p.col is not None:
                    raise SyntaxError(f"nested ref {source!r}: {head!r} is already a column pipe")
                if p.proj is not None:
                    if rest not in p.proj:
                        raise NameError(
                            f"nested FOREACH {head!r} has no field {rest!r} "
                            f"(fields: {sorted(p.proj)})"
                        )
                    p.col = p.proj[rest]
                else:
                    p.col = rest
            return p
        if head == g.child_alias or head == "$1":
            # $1 after GROUP = the bag field (LogicalSchema positional)
            return _Pipe(col=rest or None)
        raise NameError(f"nested FOREACH: unknown inner source {source!r}")

    def _nforeach_flatten_pipe(self, st, base: "_Pipe", g: GroupedInfo) -> tuple[GroupedInfo, "_Pipe"]:
        """Build the array-pipe for an inner FOREACH containing
        FLATTEN: one FLATTEN item over an array-typed expression, plus
        any per-row scalar items (replicated per element — Pig's
        flatten × scalar cross within the tuple)."""
        from pyspark.sql import types as T

        flat_items = [(i, it) for i, it in enumerate(st.cond) if it.flatten]
        if len(flat_items) != 1:
            raise NotImplementedError("exactly one FLATTEN per inner FOREACH is supported")
        if base.distinct or base.ordered or base.limited or base.proj or base.arr:
            raise NotImplementedError(
                "FLATTEN inside an inner FOREACH over an already-transformed pipe; "
                "restructure as FOREACH first, then the pipe ops"
            )
        fi, fitem = flat_items[0]
        ch = g.child
        arr_expr = self._expr(fitem.expr, ch)
        dtype = ch.df.select(arr_expr.alias("__nfa")).schema[0].dataType
        if not isinstance(dtype, T.ArrayType):
            raise NotImplementedError(
                "FLATTEN inside an inner FOREACH needs a bag-typed expression "
                f"(got {dtype.simpleString()})"
            )
        elem = dtype.elementType
        scalars = [
            (it.alias or _default_name(it.expr, i), self._expr(it.expr, ch))
            for i, it in enumerate(st.cond)
            if not it.flatten
        ]

        def make(el):
            if isinstance(elem, T.StructType):
                if isinstance(fitem.alias, list):
                    if len(fitem.alias) != len(elem.names):
                        raise ValueError(
                            f"pig latin: FLATTEN AS schema has {len(fitem.alias)} "
                            f"fields, got {len(elem.names)}"
                        )
                    cols = []
                    for f, (n2, t2) in zip(elem.names, fitem.alias):
                        c = el[f]
                        if t2 is not None:
                            c = c.try_cast(PIG_TO_SPARK_TYPE.get(t2, t2))
                        cols.append(c.alias(n2))
                elif isinstance(fitem.alias, str) and len(elem.names) == 1:
                    # FLATTEN(<bag of 1-field tuples>) AS name — the AS
                    # renames the single flattened field (LogicalSchema;
                    # r6 fuzzer find: the rename was dropped for
                    # struct-element bags, breaking downstream refs)
                    cols = [el[elem.names[0]].alias(fitem.alias)]
                else:
                    cols = [el[f].alias(f) for f in elem.names]
            else:
                aname, atype = _single_alias(fitem.alias)
                if atype is not None:
                    el = el.try_cast(PIG_TO_SPARK_TYPE.get(atype, atype))
                cols = [el.alias(aname or _default_name(fitem.expr, fi))]
            return F.struct(*cols, *[c.alias(n) for n, c in scalars])

        build = F.transform(arr_expr, make)
        if base.cond is not None:
            build = F.when(self._expr(base.cond, ch), build)
        mangled = f"__nfa_{st.alias}"
        g = G_replace(
            g,
            child=Relation(ch.df.withColumn(mangled, build)),
            derived=g.derived + (mangled,),
        )
        return g, _Pipe(arr=mangled)

    def _arr_pipe_agg(self, fn: str, arg: "G.Col", pipe: "_Pipe", g: GroupedInfo) -> Column:
        """Aggregate over an array-pipe: per-ROW partials via array
        functions (size/aggregate — codegen, the bag never explodes),
        then the cross-row aggregate. COUNT skips null first fields
        (COUNT.java:40); SUM/AVG over untyped fields coerce to double
        like _bag_agg."""
        from pyspark.sql import types as T

        arr = g.child.df[pipe.arr]
        elem = g.child.df.schema[pipe.arr].dataType.elementType
        rest = arg.name.partition(".")[2]
        fld = rest or elem.names[0]
        vals = F.transform(arr, lambda t: t[fld])
        velem = elem[fld].dataType
        nn = F.filter(vals, lambda x: x.isNotNull())
        if fn == "count_star":
            return F.coalesce(F.sum(F.size(arr)), F.lit(0)).cast("long")
        if fn == "count":
            return F.coalesce(F.sum(F.size(nn)), F.lit(0)).cast("long")
        if fn == "min":
            return F.min(F.array_min(nn))
        if fn == "max":
            return F.max(F.array_max(nn))
        if isinstance(velem, (T.StringType, T.BinaryType)):
            nn = F.filter(F.transform(nn, lambda x: x.try_cast("double")), lambda x: x.isNotNull())
            velem = T.DoubleType()
        zero = F.lit(0).cast(velem.simpleString())
        row_sum = F.when(F.size(nn) > 0, F.aggregate(nn, zero, lambda a, x: a + x))
        if fn == "sum":
            return F.sum(row_sum)
        return F.sum(row_sum).cast("double") / F.sum(F.size(nn))

    def _apply_post_ops(self, bag: Column, post_ops: list, enames: list[str]) -> Column:
        """Replay ops chained after a LIMIT on the already-sliced bag,
        in statement order (Pig's dataflow order): each is a pure
        array op over the collected bag — same footprint as the flags."""
        def _pred(cond):
            # closure factory, NOT a default arg: pyspark counts lambda
            # params, and a `c=cond` default would make it the 2-arg
            # (element, index) form with the index bound into c
            return lambda el: self._elem_expr(cond, el, enames)

        for kind, payload in post_ops:
            if kind == "filter":
                bag = F.filter(bag, _pred(payload))
            elif kind == "distinct":
                bag = F.array_distinct(bag)
            elif kind == "order":
                for cname, _a in payload:
                    if cname not in enames:
                        raise NameError(
                            f"nested ORDER after LIMIT: no field {cname!r} "
                            f"(fields: {enames})"
                        )
                bag = _bag_sort(bag, payload)
            elif kind == "limit":
                bag = F.slice(bag, 1, payload)
        return bag

    def _pipe_bag(self, lname: str, rest: str | None, g: GroupedInfo, pipes: dict[str, "_Pipe"]) -> Column:
        """GENERATE <pipe> — the pipe itself as a BAG column (Pig emits
        the inner relation as a bag of tuples; POForEach inner-plan
        output). Lowered to collect_list of the pipe's tuple struct
        (FILTER → when(cond), DISTINCT → array_distinct, ORDER →
        array_sort with a null-first comparator matching Pig's null
        ordering). Scale note: the bag is the WHOLE group in executor
        memory — exactly Pig's reducer-bag footprint for the same
        statement; prefer FLATTEN/aggregate forms for giant groups."""
        pipe = pipes[lname]
        child = g.child
        df = child.df
        if pipe.arr:
            # array-pipe: the per-row arrays concatenate into the
            # group's bag (collect_list skips FILTER-nulled rows).
            # Chained DISTINCT/ORDER/LIMIT (QueryParser.g:921-971
            # residual corner, closed r6) run on the CONCATENATED
            # group bag in Pig's stage order: pipe-level projection
            # first (d = DISTINCT p.x), then dedupe/sort/slice, then
            # the consumption-time projection — pure array ops over
            # ONE collect, the same reducer-bag footprint Pig uses.
            bag = F.flatten(F.collect_list(df[pipe.arr]))
            if pipe.col is not None:
                pleaf = pipe.col.split("::")[-1]
                bag = F.transform(bag, lambda t: F.struct(t[pleaf].alias(pleaf)))
            if pipe.distinct:
                bag = F.array_distinct(bag)
            if pipe.ordered and pipe.order_keys:
                bag = _bag_sort(bag, pipe.order_keys)
            elif pipe.limited:
                # LIMIT without ORDER = Pig's "any n rows"; pin a
                # deterministic slice order (orderable fields asc)
                from pyspark.sql import types as T

                elem = df.schema[pipe.arr].dataType.elementType
                names = [pipe.col.split("::")[-1]] if pipe.col is not None else elem.names
                pin = [
                    (n, True) for n in names
                    if _orderable(elem[n].dataType if isinstance(elem, T.StructType) else elem)
                ]
                if pin:
                    bag = _bag_sort(bag, pin)
            if pipe.limited and pipe.limit_n is not None:
                bag = F.slice(bag, 1, pipe.limit_n)
            if pipe.post_ops:
                elem = df.schema[pipe.arr].dataType.elementType
                enames = [pipe.col.split("::")[-1]] if pipe.col is not None else list(elem.names)
                bag = self._apply_post_ops(bag, pipe.post_ops, enames)
            if rest:
                leaf = rest.split("::")[-1]
                bag = F.transform(bag, lambda t: F.struct(t[leaf].alias(leaf)))
            return bag
        cond = self._expr(pipe.cond, child) if pipe.cond is not None else None
        rename = {v: k for k, v in pipe.proj.items()} if pipe.proj else {}
        if rest:
            src = pipe.proj.get(rest, rest) if pipe.proj else rest
            cols = [(rest.split("::")[-1], self._expr(G.Col(src), child))]
        elif pipe.col is not None:
            cols = [(pipe.col.split("::")[-1], self._expr(G.Col(pipe.col), child))]
        elif pipe.proj:
            cols = [(out, F.col(m)) for out, m in pipe.proj.items()]
        else:
            # whole-tuple pipe: the bag element is the FULL child tuple
            # (LogicalSchema: the inner bag carries every field,
            # including the group key's source columns)
            cols = [(c, df[c]) for c in df.columns if c not in g.derived]
        # ORDER keys resolved up front: a key OUTSIDE the projected
        # fields (ORDER by acctbal, project custkey) rides along as a
        # HIDDEN struct field so the sort — and any LIMIT slice — sees
        # it, then strips after (dropping the order silently returned
        # arbitrary LIMIT survivors; r5 review finding #1)
        field_names = [n for n, _ in cols]
        order: list[tuple[str, bool]] = []
        hidden: list[tuple[str, Column]] = []
        if pipe.ordered and pipe.order_keys and not pipe.distinct:
            for idx, ok in enumerate(pipe.order_keys):
                cname, a = ok if isinstance(ok, tuple) else (ok, True)
                if cname.startswith(g.child_alias + "."):
                    cname = cname.split(".", 1)[1]
                fld = rename.get(cname, cname).split("::")[-1]
                if fld in field_names:
                    order.append((fld, a))
                else:
                    hname = f"__ok{idx}"
                    hidden.append((hname, self._expr(G.Col(cname), child)))
                    order.append((hname, a))
        elif pipe.ordered and pipe.order_keys:
            # DISTINCT + ORDER: valid Pig orders by the distinct
            # projection's own fields — no hidden keys possible
            for ok in pipe.order_keys:
                cname, a = ok if isinstance(ok, tuple) else (ok, True)
                if cname.startswith(g.child_alias + "."):
                    cname = cname.split(".", 1)[1]
                fld = rename.get(cname, cname).split("::")[-1]
                if fld in field_names:
                    order.append((fld, a))
        el = F.struct(*[c.alias(n) for n, c in cols], *[c.alias(n) for n, c in hidden])
        if cond is not None:
            el = F.when(cond, el)  # collect_list skips nulls
        bag = F.collect_list(el)
        if pipe.distinct:
            bag = F.array_distinct(bag)
        if order:
            bag = _bag_sort(bag, order)
        if pipe.limited and pipe.limit_n is not None:
            # LIMIT inside the bag form: first n of the sorted bag
            # (unordered = Pig's "any n rows", here collection order)
            bag = F.slice(bag, 1, pipe.limit_n)
        if hidden:
            bag = F.transform(
                bag, lambda t: F.struct(*[t[n].alias(n) for n in field_names])
            )
        if pipe.post_ops:
            bag = self._apply_post_ops(bag, pipe.post_ops, field_names)
        return bag

    def _foreach_nested_multiflatten(self, op: G.Foreach, g: GroupedInfo, pipes: dict[str, "_Pipe"]) -> Relation:
        """TWO+ FLATTEN(<pipe>) in one nested GENERATE — Pig's
        per-group CROSS PRODUCT of the bags (POForEach cross of inner
        plan outputs; the limit_desc × limit_asc idiom in
        nightly.conf). Each pipe materializes as an ordered (and
        LIMIT-sliced) bag column in ONE grouped frame, then the bags
        explode sequentially — explode × explode IS the per-row cross
        product, and FLATTEN of an empty bag drops the group, matching
        Pig. Closes the r4 'exactly one FLATTEN per nested GENERATE'
        corner. Scale: the collected bags are the same reducer-bag
        footprint Pig uses for this statement; LIMIT pipes slice to
        ≤ n elements before the explode."""
        key_cols = [c.alias(n) for n, c in g.key_exprs]
        aggs: list[Column] = []
        layout: list[tuple[str, object]] = []
        seen: set[str] = set()
        for i, item in enumerate(op.items):
            e = item.expr
            if isinstance(e, G.Col) and (e.name == "group" or e.name.startswith("group.")):
                layout.append(("group", item))
                continue
            name = item.alias if isinstance(item.alias, str) else _default_name(e, i)
            if name in seen:
                name = f"{name}_{i}"
            seen.add(name)
            if item.flatten and (self._pipe_heads(e) & set(pipes)):
                if not isinstance(e, G.Col):
                    raise NotImplementedError("FLATTEN of an inner pipe takes the pipe or pipe.column")
                head, _, rest = e.name.partition(".")
                bag_name = f"__mfb{i}"
                aggs.append(self._pipe_bag(head, rest or None, g, pipes).alias(bag_name))
                layout.append(("bag", (bag_name, head, item)))
            else:
                aggs.append(self._nested_agg(e, g, pipes).alias(name))
                layout.append(("col", name))
        grouped = g.child.df.groupBy(*key_cols) if key_cols else g.child.df.groupBy()
        out = Relation(grouped.agg(*aggs))
        selects: list[Column] = []
        for kind, payload in layout:
            if kind == "group":
                item = payload
                if isinstance(item.expr, G.Col) and item.expr.name.startswith("group."):
                    kname = _group_key(item.expr.name.split(".", 1)[1], g.key_exprs)
                    selects.append(F.col(kname).alias(item.alias or kname))
                elif len(g.key_exprs) == 1:
                    selects.append(F.col(g.key_exprs[0][0]).alias(item.alias or "group"))
                elif not g.key_exprs:
                    # GROUP ALL: Pig's group value is the literal
                    # 'all' (LOCogroup GROUP ALL semantics)
                    selects.append(F.lit("all").alias(item.alias or "group"))
                else:
                    selects.extend(F.col(n) for n, _ in g.key_exprs)
            elif kind == "col":
                selects.append(F.col(payload))
        # explode the bags one by one (cross product), splatting each
        # element struct's fields qualified <pipe>::<field> on collision
        flat_cols: list[Column] = []
        df = out.df
        for j, (kind, payload) in enumerate(x for x in layout if x[0] == "bag"):
            bag_name, head, item = payload
            df = df.withColumn(bag_name, F.explode(df[bag_name]))
            elem = df.schema[bag_name].dataType
            fields = list(elem.names)
            if isinstance(item.alias, list):
                if len(item.alias) != len(fields):
                    raise ValueError(
                        f"pig latin: FLATTEN AS schema has {len(item.alias)} fields, got {len(fields)}"
                    )
                for fld, (new_name, ftype) in zip(fields, item.alias):
                    c = df[bag_name][fld]
                    if ftype is not None:
                        c = c.try_cast(PIG_TO_SPARK_TYPE.get(ftype, ftype))
                    flat_cols.append(c.alias(new_name))
            elif isinstance(item.alias, str) and len(fields) == 1:
                # FLATTEN(pipe.col) AS name — single flattened field
                flat_cols.append(df[bag_name][fields[0]].alias(item.alias))
            else:
                for fld in fields:
                    out_name = fld if fld not in seen else f"{head}::{fld}"
                    seen.add(out_name)
                    flat_cols.append(df[bag_name][fld].alias(out_name))
        return Relation(df.select(*selects, *flat_cols))

    def _nested_agg(self, e, g: GroupedInfo, pipes: dict[str, "_Pipe"]) -> Column:
        if isinstance(e, G.Col) and not (e.name == "group" or e.name.startswith("group.")):
            head, _, rest = e.name.partition(".")
            if head in pipes:
                return self._pipe_bag(head, rest or None, g, pipes)
        if isinstance(e, G.Bin):
            return _binop(e.op, self._nested_agg(e.left, g, pipes), self._nested_agg(e.right, g, pipes))
        if isinstance(e, (G.Num, G.Str)):
            return self._expr(e, g.child)
        if isinstance(e, G.Cast):
            return self._nested_agg(e.operand, g, pipes).cast(PIG_TO_SPARK_TYPE[e.type])
        if not (isinstance(e, G.Call) and e.func.lower() in AGG_FUNCS and e.args):
            hooked = self._bag_udf(e, g, pipes)
            if hooked is not None:
                return hooked
            # not a pipe aggregate — fall back to the plain grouped path
            return self._agg_expr(e, g)
        fn = e.func.lower()
        arg = e.args[0]
        if not isinstance(arg, G.Col):
            return self._agg_expr(e, g)
        head = arg.name.split(".", 1)[0]
        if head not in pipes and head != g.child_alias:
            return self._agg_expr(e, g)
        if head in pipes and pipes[head].arr:
            p = pipes[head]
            if p.distinct or p.limited:
                # chained DISTINCT/LIMIT change the bag's multiset, so
                # the per-row-partials shortcut is wrong; aggregate
                # over the assembled group bag instead (the same
                # reducer-bag footprint Pig uses for these statements)
                from pyspark.sql import types as T

                rest = arg.name.partition(".")[2]
                elem = g.child.df.schema[p.arr].dataType.elementType
                if p.col is not None:
                    pleaf = p.col.split("::")[-1]
                    elem = T.StructType([elem[pleaf]])
                bag = self._pipe_bag(head, None, g, pipes)
                return self._agg_over_bag(fn, bag, elem, rest or None)
            return self._arr_pipe_agg(fn, arg, p, g)
        pipe = self._resolve_pipe(arg.name, g, pipes)
        if pipe.limited and pipe.post_ops:
            # ops chained after the LIMIT (d = DISTINCT l; COUNT(d)):
            # aggregate over the assembled bag — slice first, then the
            # replayed post-ops, exactly Pig's dataflow order and its
            # reducer-bag footprint (the topk window path can't replay
            # ops that must see the sliced bag)
            hd, _, rst = arg.name.partition(".")
            bag = self._pipe_bag(hd, None, g, pipes)
            elem = (
                g.child.df.limit(0)
                .groupBy()
                .agg(bag.alias("__pb"))
                .schema["__pb"]
                .dataType.elementType
            )
            return self._agg_over_bag(fn, bag, elem, rst or None)
        if pipe.limited:
            raise NotImplementedError(
                "LIMIT inside FOREACH {} is not algebraic; use "
                "pig_spark.operators.nested.topk_per_group for nested top-k"
            )
        cond = self._expr(pipe.cond, g.child) if pipe.cond is not None else None
        if pipe.col is not None:
            val: Column = self._expr(G.Col(pipe.col), g.child)
        else:
            # whole-tuple pipe: COUNT uses the non-null first field
            # (COUNT.java:40); other aggs need a column
            if fn in ("count", "count_star"):
                val = g.child.df[g.child.df.columns[0]] if fn == "count" else F.lit(1)
            else:
                raise SyntaxError(f"{fn.upper()} over a whole-tuple pipe needs a column (e.g. x.field)")
        if cond is not None:
            val = F.when(cond, val)
        if pipe.distinct:
            if fn == "count":
                return F.countDistinct(val)
            if fn == "sum":
                return F.sum_distinct(val)
            if fn == "avg":
                return F.sum_distinct(val).cast("double") / F.countDistinct(val)
            if fn in ("min", "max"):  # distinct is a no-op for min/max
                return {"min": F.min, "max": F.max}[fn](val)
            raise NotImplementedError(f"DISTINCT pipe with {fn.upper()}")
        mapping = {"count": F.count, "count_star": F.count, "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
        return mapping[fn](val)

    def _hive_udaf(self, e) -> str | None:
        """Hive function name if ``e`` is a call to a DEFINEd
        HiveUDAF alias (builtin/HiveUDAF.java), else None. Checked
        BEFORE the builtin AGG_FUNCS table so a define shadowing a
        builtin name (``define avg HiveUDAF('percentile')``) resolves
        to the Hive function, matching Pig's alias precedence."""
        if not isinstance(e, G.Call):
            return None
        spec = self.defines.get(e.func)
        if isinstance(spec, tuple) and len(spec) == 3 and spec[0] == "__hive__" and spec[1] == "HiveUDAF":
            return spec[2]
        return None

    # Hive UDAFs whose trailing arguments must be compile-time
    # constants (Hive's GenericUDAFPercentile* reject non-constant
    # fractions); Spark's matching aggregates require them foldable
    _HIVE_CONST_TAIL = {"percentile", "percentile_approx", "approx_percentile"}

    def _hive_agg(self, hname: str, e: G.Call, g: GroupedInfo) -> Column:
        """Lower a HiveUDAF call over a grouped relation to the
        Spark aggregate of the same name (Spark's FunctionRegistry
        implements the Hive builtin aggregate surface — avg,
        percentile, collect_set, histogram_numeric, …), staying
        JVM-side with map-side partial aggregation instead of Pig's
        GenericUDAFEvaluator PARTIAL1/FINAL bridge modes.

        Pig feeds a UDAF one bag argument, possibly of n-field tuples
        (``percentile(B.(age, perc))``, nightly.conf HiveUDF #5) —
        each tuple field becomes one positional Spark argument.
        Trailing args of the percentile family must be constants
        (Hive rejects non-constant fractions) so they are folded to
        literals: from the optimized plan when Catalyst can constant-
        fold them, else via a distinct-check scan that raises on
        non-constant input exactly like Hive does."""
        child = g.child
        if "." in hname or not self.spark.catalog.functionExists(hname):
            # scope decision (COVERAGE.md §2.4, r6): only the Hive
            # BUILTIN aggregate surface (Spark's Hive-compatible
            # registry) resolves; arbitrary custom-jar
            # GenericUDAFEvaluator classes (HiveUDAF.java
            # PARTIAL1/FINAL bridge) are version-interop, out of
            # scope like MAPREDUCE/HBase
            raise NotImplementedError(
                f"HiveUDAF({hname!r}): only Hive BUILTIN aggregates resolve "
                "(Spark's Hive-compatible registry); custom-jar evaluator "
                "classes are out of scope — re-express with builtin "
                "aggregates or a pandas agg_func UDF"
            )

        def resolve(a) -> list[Column]:
            if isinstance(a, G.MultiCol):
                base = a.rel
                if base != g.child_alias:
                    # base is a COLUMN of the child (r5 review finding:
                    # falling through projected same-named top-level
                    # columns instead): resolve tuple fields through
                    # the struct; bag columns need a row-per-element
                    # shape first
                    from pyspark.sql import types as T

                    if base not in child.df.columns:
                        raise SyntaxError(f"{hname}: unknown bag {base!r} in UDAF argument")
                    dt = child.df.schema[base].dataType
                    if isinstance(dt, T.StructType):
                        names = dt.fieldNames()
                        return [
                            child.df[base][names[int(c[1:])] if c.startswith("$") else c]
                            for c in a.cols
                        ]
                    raise NotImplementedError(
                        f"HiveUDAF {hname} over the nested bag column {base!r}; "
                        "FLATTEN the bag into rows first, then GROUP and call the UDAF"
                    )
                return [self._expr(G.Col(c), child) for c in a.cols]
            if isinstance(a, G.Col):
                name = a.name
                if name == g.child_alias:
                    if len(child.df.columns) != 1:
                        raise SyntaxError(
                            f"HiveUDAF {hname}({name}) needs a single-field bag; "
                            f"project the field first ({name}.field)"
                        )
                    return [child.df[child.df.columns[0]]]
                if name.startswith(g.child_alias + "."):
                    return [self._expr(G.Col(name.split(".", 1)[1]), child)]
            return [self._expr(a, child)]

        cols: list[Column] = []
        for a in e.args:
            cols.extend(resolve(a))
        if hname.lower() in self._HIVE_CONST_TAIL and len(cols) > 1:
            cols = [cols[0]] + [self._fold_constant(c, child, hname) for c in cols[1:]]
        return F.call_function(hname, *cols)

    def _fold_constant(self, c: Column, child: Relation, ctx: str) -> Column:
        """Fold a column the callee requires to be a constant into a
        literal. Fast path: Catalyst's optimized plan of a 1-column
        projection — a constant column folds to a Literal node with
        zero data scanned; primitive/UTF8String/Decimal literal values
        convert natively, other internal literal encodings (dates,
        timestamps eval to raw ints) fall through to the probe.
        Fallback (plan introspection unavailable or non-primitive
        literal): a 2-row distinct probe — note this runs an EAGER
        Spark job at translation time — that raises on genuinely
        non-constant input (the same contract violation Hive reports)
        and on an empty relation (the fraction would otherwise surface
        later as an opaque 'percentage must not be null' error)."""
        try:
            jplan = child.df.select(c.alias("__v"))._jdf.queryExecution().optimizedPlan()
            exprs = jplan.expressions()
            if exprs.size() == 1:
                je = exprs.apply(0)
                while je.getClass().getSimpleName() == "Alias":
                    je = je.child()
                if je.getClass().getSimpleName() == "Literal":
                    v = je.eval(None)
                    if v is None or isinstance(v, (int, float, bool, str)):
                        return F.lit(v)
                    cls = v.getClass().getSimpleName() if hasattr(v, "getClass") else ""
                    if cls == "UTF8String":
                        return F.lit(v.toString())
                    if cls == "Decimal":  # e.g. a 0.5 fraction typed decimal
                        return F.lit(float(v.toJavaBigDecimal().doubleValue()))
                    # other internal encodings: let the probe handle it
        except Exception:
            pass
        rows = child.df.select(c.alias("__v")).distinct().limit(2).collect()
        if len(rows) > 1:
            raise ValueError(
                f"{ctx}: argument must be constant across all rows "
                f"(Hive constant-argument contract); found ≥2 values"
            )
        if not rows:
            raise ValueError(
                f"{ctx}: constant argument cannot be derived from an EMPTY "
                "relation (the aggregate's fraction/parameter would be null)"
            )
        return F.lit(rows[0][0])

    def _agg_expr(self, e, g: GroupedInfo) -> Column:
        child = g.child
        hname = self._hive_udaf(e)
        if hname is not None:
            return self._hive_agg(hname, e, g)
        if (
            isinstance(e, G.Call)
            and e.func.lower() in ("cor", "cov")
            and len(e.args) >= 2
            and all(
                isinstance(a, G.Col) and a.name.startswith(g.child_alias + ".")
                for a in e.args
            )
        ):
            # COR/COV over same-bag projections (builtin/COR.java exec:
            # bag of (var_i, var_j, stat) per pair i<j). Positional
            # pairing of same-bag projections IS row pairing, so the
            # stats lower to native corr/covar_pop — COV.java's
            # (n·Σxy − ΣxΣy)/n² is exactly covar_pop; COR.java's
            # formula is Pearson r ≡ Spark corr. Map-side partials,
            # no bag ever materializes.
            cols = [
                self._expr(G.Col(a.name.split(".", 1)[1]), child) for a in e.args
            ]
            fn = e.func.lower()
            pairs = []
            for i in range(len(cols)):
                for j in range(i + 1, len(cols)):
                    stat = (
                        F.corr(cols[i], cols[j]) if fn == "cor"
                        else F.covar_pop(cols[i], cols[j])
                    )
                    pairs.append(
                        F.struct(
                            F.lit(f"var{i}").alias("var_x"),
                            F.lit(f"var{j}").alias("var_y"),
                            stat.alias(fn),
                        )
                    )
            return F.array(*pairs)
        if isinstance(e, G.Call):
            fn = e.func.lower()
            if (
                fn in ("size", "arity")
                and len(e.args) == 1
                and isinstance(e.args[0], G.Col)
                and e.args[0].name == g.child_alias
            ):
                # SIZE(bag) over the grouped relation ≡ COUNT_STAR
                return F.count(F.lit(1))
            if fn in AGG_FUNCS:
                if fn == "count_star" or not e.args:
                    return F.count(F.lit(1))
                arg = e.args[0]
                if isinstance(arg, G.Col):
                    name = arg.name
                    if name == g.child_alias:
                        if fn == "count":
                            # COUNT(rel): counts tuples with non-null first field (COUNT.java:40)
                            return F.count(child.df[child.df.columns[0]])
                        if fn == "count_star":
                            return F.count(F.lit(1))
                        # SUM/AVG/MIN/MAX(rel): Pig requires a bag of
                        # single-field tuples and aggregates that field
                        # (SUM.java:58 input schema check)
                        if len(child.df.columns) != 1:
                            raise SyntaxError(
                                f"{fn.upper()}({name}) needs a single-field bag "
                                f"(got {len(child.df.columns)} fields); project the "
                                f"field first or use {name}.field"
                            )
                        return {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[fn](
                            child.df[child.df.columns[0]]
                        )
                    if name.startswith(g.child_alias + "."):
                        inner: Column = self._expr(G.Col(name.split(".", 1)[1]), child)
                    else:
                        inner = self._expr(arg, child)
                else:
                    inner = self._expr(arg, child)
                return {"count": F.count, "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[fn](inner)
        if isinstance(e, G.Bin):
            return _binop(e.op, self._agg_expr(e.left, g), self._agg_expr(e.right, g))
        if isinstance(e, (G.Num, G.Str)):
            return self._expr(e, g.child)
        hooked = self._bag_udf(e, g, {})
        if hooked is not None:
            return hooked
        raise NotImplementedError(f"aggregate expression {e}")

    def _bag_udf(self, e, g: GroupedInfo, pipes: dict) -> Column | None:
        """Registry eval funcs in AGGREGATE position over a pipe or
        the grouped relation (the test-UDF jar surface —
        AllFirstLetter(d), NonAlgNonAccCount(a), DEFINEd
        TestingAccumulatorHelper aliases): the argument bag ASSEMBLES
        (the order-preserving pipe assembly, so nested-ORDER feeds a
        sorted bag) and the function evaluates over it IN-ROW —
        EvalFunc-over-DataBag semantics with Pig's own reducer-bag
        footprint. Only functions declaring ``__wants_elem_type__``
        participate (functions/testudf.py protocol); the probed bag
        element type makes field-0 access schema-safe."""
        if not (isinstance(e, G.Call) and e.args and isinstance(e.args[0], G.Col)):
            return None
        fname = self.defines.get(e.func, e.func)
        fn = None
        if callable(fname) and not isinstance(fname, (str, tuple, dict)):
            fn = fname
        elif isinstance(fname, str) and fname.count(".") >= 2:
            fn = getattr(PF, fname.rsplit(".", 1)[-1], None)
        if fn is None or not getattr(fn, "__wants_elem_type__", False):
            return None
        head, _, rest = e.args[0].name.partition(".")
        if pipes and head in pipes:
            bag = self._pipe_bag(head, rest or None, g, pipes)
        elif head == g.child_alias:
            child = g.child
            if rest:
                leaf = rest.split("::")[-1]
                bag = F.collect_list(
                    F.struct(self._expr(G.Col(rest), child).alias(leaf))
                )
            else:
                bag = F.collect_list(
                    F.struct(*[child.df[c] for c in child.df.columns])
                )
        else:
            return None
        elem = (
            g.child.df.limit(0)
            .groupBy()
            .agg(bag.alias("__pb"))
            .schema["__pb"]
            .dataType.elementType
        )
        return fn(bag, _elem=elem)

    # ------------------------------------------------------------------
    def _join(self, op: G.Join) -> Relation:
        if len(op.rels) < 2:
            raise SyntaxError("JOIN needs ≥2 inputs")
        if op.how != "inner" and len(op.rels) != 2:
            raise SyntaxError("outer JOIN is 2-way only (Pig restriction)")
        strategy = None
        if op.strategy in ("replicated", "repl"):
            strategy = "replicated"
        elif op.strategy in ("merge", "merge-sparse"):
            strategy = "merge"
        elif op.strategy == "auto":
            # size-statistics broadcast decision (advise_join_strategy);
            # the join condition is a Column here, so the skew probe is
            # skipped — skew falls to AQE either way
            strategy = "auto"
        # qualify columns alias::col (Pig join output naming)
        sides = []
        for rel_alias, keys in zip(op.rels, op.keys):
            rel = self._rel(rel_alias)
            qdf = rel.df.select(*[rel.df[c].alias(f"{rel_alias}::{c}") for c in rel.df.columns])
            ginfo = self.aliases.get(rel_alias)
            if (
                ginfo is not None
                and ginfo.grouped is not None
                and len(ginfo.grouped.key_exprs) > 1
                and "group" not in rel.df.columns
                and all(n in rel.df.columns for n, _ in ginfo.grouped.key_exprs)
            ):
                # tuple-key grouped side: Pig's field 0 is the 'group'
                # TUPLE (LogicalSchema), which our bag-form lays out as
                # flattened key columns — synthesize the struct so
                # `join c by $0` keys on the whole tuple and
                # `c::group` resolves downstream
                kn = [n for n, _ in ginfo.grouped.key_exprs]
                qdf = qdf.select(
                    F.struct(*[qdf[f"{rel_alias}::{k}"].alias(k) for k in kn]).alias(
                        f"{rel_alias}::group"
                    ),
                    "*",
                )
            qrel = Relation(qdf)
            key_cols = [self._expr(k, qrel) for k in keys]
            sides.append((qrel, key_cols))
        out, out_keys = sides[0]
        for qrel, key_cols in sides[1:]:
            if op.strategy == "bloom":
                # Tez bloom join (BuildBloom.java): broadcast a bloom of
                # one side's keys and pre-filter the other before the
                # shuffle — exact semantics, only the probe side shrinks.
                from pig_spark.functions.bloom import bloom_filter

                def _bkey(cols):
                    return cols[0] if len(cols) == 1 else F.concat_ws(
                        "\x1f", *[c.cast("string") for c in cols]
                    )

                if op.how in ("inner", "right"):
                    out = Relation(bloom_filter(out.df, qrel.df, _bkey(out_keys), _bkey(key_cols)))
                elif op.how == "left":
                    qrel = Relation(bloom_filter(qrel.df, out.df, _bkey(key_cols), _bkey(out_keys)))
            cond = None
            for a, b in zip(out_keys, key_cols):
                c = a == b
                cond = c if cond is None else (cond & c)
            out = out.join(qrel, on=cond, how=op.how, strategy=strategy)
        return out

    # ------------------------------------------------------------------
    # expressions
    # ------------------------------------------------------------------
    def _hive_call(self, kind: str, hname: str, e: G.Call, rel: Relation) -> Column:
        """DEFINE f HiveUDF('name') (builtin/HiveUDF.java — Pig wraps
        Hive functions via the Hive bridge). Spark's SQL function
        registry is Hive-compatible, so the call lowers to
        F.call_function(name, args) — built-in, codegen, no bridge.
        HiveUDTF output is a BAG of 1-field tuples (one per emitted
        row); 'explode' over an array is the supported shape —
        FLATTEN then restores Pig's row-per-element semantics.
        HiveUDAF lowers to the same-named Spark aggregate in grouped
        FOREACH (_hive_agg); in a per-row position it is a semantic
        error in Pig too — raises with the pointer."""
        args = [self._expr(a, rel) for a in e.args]
        if kind == "HiveUDF":
            return F.call_function(hname, *args)
        if kind == "HiveUDTF":
            if hname.lower() == "explode" and len(args) == 1:
                return F.transform(args[0], lambda x: F.struct(x.alias("x")))
            raise NotImplementedError(
                f"HiveUDTF({hname!r}): only 'explode' over a bag maps to a "
                "Spark-side bag; other UDTFs need the Hive bridge"
            )
        raise SyntaxError(
            f"HiveUDAF({hname!r}) is an aggregate — call it in a FOREACH over a "
            "plain GROUP alias whose GENERATE holds only aggregate calls and "
            "group keys (it lowers to the Spark aggregate of the same name); "
            "for COGROUP bags or GENERATEs mixing per-row expressions, aggregate "
            "in a separate FOREACH first"
        )

    def _bool_expr(self, e, rel: Relation) -> Column:
        """A FILTER condition. An untyped (string-backed bytearray)
        operand in boolean position gets Pig's implicit
        bytearray→boolean cast (POCast.java / FILTER BY boolcol),
        null/garbage → null → row dropped. Recurses through not/and/or
        so the coercion lands on the leaves BEFORE the boolean op —
        probing after NOT(stringcol) would already be an analysis
        error."""
        from pyspark.sql import types as T

        if isinstance(e, G.Un) and e.op == "not":
            return ~self._bool_expr(e.operand, rel)
        if isinstance(e, G.Bin) and e.op in ("and", "or"):
            lc, rc = self._bool_expr(e.left, rel), self._bool_expr(e.right, rel)
            return (lc & rc) if e.op == "and" else (lc | rc)
        c = self._expr(e, rel)
        if isinstance(e, (G.Col, G.Call)):
            try:
                dtype = rel.df.select(c.alias("__b")).schema[0].dataType
            except Exception:
                return c
            if isinstance(dtype, T.StringType):
                return c.try_cast("boolean")
        return c

    def _elem_expr(self, e, el: Column, names: list[str]) -> Column:
        """Expression over ONE bag element (array-HOF lambda variable
        ``el``) — the _expr subset a nested FILTER chained onto a
        FLATTENed inner-FOREACH pipe can reference: element fields,
        positional $N, literals, comparisons, matches, bincond, casts.
        No relation context exists inside a lambda, so scalar/UDF
        references raise with guidance."""
        if isinstance(e, G.Num):
            t = e.value.lower()
            return F.lit(float(t.rstrip("f")) if "." in t or "e" in t else int(t.rstrip("l")))
        if isinstance(e, G.Str):
            return F.lit(e.value)
        if isinstance(e, G.Bool):
            return F.lit(e.value)
        if isinstance(e, G.Null):
            return F.lit(None)
        if isinstance(e, G.Col):
            nm = e.name.split(".")[-1]
            if nm.startswith("$"):
                return el[names[int(nm[1:])]]
            leaf = nm.split("::")[-1]
            if leaf in names:
                return el[leaf]
            raise NameError(
                f"nested FILTER over FLATTENed pipe: no field {nm!r} (fields: {names})"
            )
        if isinstance(e, G.Bin):
            if e.op == "and":
                return self._elem_expr(e.left, el, names) & self._elem_expr(e.right, el, names)
            if e.op == "or":
                return self._elem_expr(e.left, el, names) | self._elem_expr(e.right, el, names)
            return _binop(
                e.op, self._elem_expr(e.left, el, names), self._elem_expr(e.right, el, names)
            )
        if isinstance(e, G.Un):
            c = self._elem_expr(e.operand, el, names)
            return ~c if e.op == "not" else -c
        if isinstance(e, G.IsNull):
            c = self._elem_expr(e.operand, el, names)
            return c.isNotNull() if e.negated else c.isNull()
        if isinstance(e, G.Matches):
            return PF.MATCHES(self._elem_expr(e.operand, el, names), e.pattern)
        if isinstance(e, G.InList):
            return self._elem_expr(e.operand, el, names).isin(*[_const(o) for o in e.options])
        if isinstance(e, G.BinCond):
            return F.when(
                self._elem_expr(e.cond, el, names), self._elem_expr(e.then, el, names)
            ).otherwise(self._elem_expr(e.otherwise, el, names))
        if isinstance(e, G.Cast):
            return self._elem_expr(e.operand, el, names).try_cast(
                PIG_TO_SPARK_TYPE.get(e.type, e.type)
            )
        raise NotImplementedError(
            "nested FILTER chained onto a FLATTENed pipe supports field/literal/"
            f"comparison expressions (got {type(e).__name__}); move the FILTER "
            "before the inner FOREACH for the full expression surface"
        )

    def _expr(self, e, rel: Relation) -> Column:
        if isinstance(e, G.Num):
            t = e.value.lower()
            if "." in t or "e" in t:
                return F.lit(float(t.rstrip("f")))
            return F.lit(int(t.rstrip("l")))
        if isinstance(e, G.Str):
            return F.lit(e.value)
        if isinstance(e, G.Bool):
            return F.lit(e.value)
        if isinstance(e, G.Null):
            return F.lit(None)
        if isinstance(e, G.Col):
            head, _, scalar_field = e.name.partition(".")
            if (
                scalar_field
                and head in self.aliases
                and head not in rel.df.columns
                and not any(c == head or c.startswith(head + "::") for c in rel.df.columns)
            ):
                # scalar projection other_rel.field (ScalarVisitor.java
                # / ReadScalars.java): the referenced relation must
                # have exactly ONE row — Pig materializes it as its own
                # job and reads the value; we fold it at plan time
                # (same O(1) driver contract, runtime >1-row error
                # becomes a plan-time error)
                rows = self.aliases[head].rel.df.limit(2).collect()
                if len(rows) != 1:
                    raise ValueError(
                        f"pig latin: scalar reference {e.name!r} requires exactly one "
                        f"row (got {'multiple' if len(rows) > 1 else 'none'}) — "
                        "ScalarVisitor contract"
                    )
                if scalar_field.startswith("$"):  # positional scalar deref
                    return F.lit(rows[0][int(scalar_field[1:])])
                return F.lit(rows[0][scalar_field])
            return self._resolve(e.name, rel)
        if isinstance(e, G.Bin):
            if e.op == "and":
                return self._expr(e.left, rel) & self._expr(e.right, rel)
            if e.op == "or":
                return self._expr(e.left, rel) | self._expr(e.right, rel)
            return _binop(e.op, self._expr(e.left, rel), self._expr(e.right, rel))
        if isinstance(e, G.Un):
            if e.op == "not":
                return ~self._expr(e.operand, rel)
            return -self._expr(e.operand, rel)
        if isinstance(e, G.IsNull):
            c = self._expr(e.operand, rel)
            return c.isNotNull() if e.negated else c.isNull()
        if isinstance(e, G.Matches):
            return PF.MATCHES(self._expr(e.operand, rel), e.pattern)
        if isinstance(e, G.InList):
            return self._expr(e.operand, rel).isin(*[_const(o) for o in e.options])
        if isinstance(e, G.BinCond):
            then_c = self._expr(e.then, rel)
            else_c = self._expr(e.otherwise, rel)
            try:
                from pyspark.sql import types as T

                if not any(
                    isinstance(b, (G.Col, G.Call, G.Cast, G.MultiCol))
                    for b in (e.then, e.otherwise)
                ):
                    raise ValueError  # scalar-literal branches: no probe needed
                sch = rel.df.select(then_c.alias("__t"), else_c.alias("__e")).schema
                tt, et = sch[0].dataType, sch[1].dataType
                if (
                    isinstance(tt, (T.ArrayType, T.StructType))
                    and isinstance(et, (T.ArrayType, T.StructType))
                    and tt.simpleString() != et.simpleString()
                ):
                    # complex branches reconcile POSITIONALLY (Pig's
                    # bincond branch unification — the empty-bag-default
                    # idiom's (bag{tuple(...)}) cast names fields f0..fn,
                    # the other branch carries real names; Spark CaseWhen
                    # requires identical types, Pig matches by position).
                    # The explicitly-CAST branch converges on the other
                    # side's names, so real field names survive.
                    def _complex_cast(b) -> bool:
                        return isinstance(b, G.Cast) and b.type.lower().startswith(
                            ("bag{", "tuple(", "map[", "{", "(")
                        )

                    if _complex_cast(e.then) and not _complex_cast(e.otherwise):
                        then_c = then_c.try_cast(et.simpleString())
                    else:
                        else_c = else_c.try_cast(tt.simpleString())
            except Exception:
                pass
            return F.when(self._expr(e.cond, rel), then_c).otherwise(else_c)
        if isinstance(e, G.CaseWhen):
            out = None
            for w, t in e.whens:
                cond = self._expr(w, rel) if e.subject is None else (self._expr(e.subject, rel) == self._expr(w, rel))
                out = F.when(cond, self._expr(t, rel)) if out is None else out.when(cond, self._expr(t, rel))
            return out.otherwise(self._expr(e.otherwise, rel)) if e.otherwise is not None else out
        if isinstance(e, G.Cast):
            # try_cast: Pig casts garbage to null (POCast.java), on any
            # session — must not depend on spark.sql.ansi.enabled.
            spark_t = PIG_TO_SPARK_TYPE.get(e.type, None)
            if spark_t is None:
                lt = e.type.lower()
                spark_t = (
                    pig_cast_ddl(e.type)
                    if lt.startswith(("bag{", "tuple(", "map[", "{", "("))
                    else e.type
                )
            return self._expr(e.operand, rel).try_cast(spark_t)
        if isinstance(e, G.MapLookup):
            # try_element_at: missing map key → null even under ANSI
            # (POMapLookUp.java returns null, never throws).
            return F.try_element_at(self._expr(e.operand, rel), F.lit(e.key))
        if isinstance(e, G.Call):
            return self._call(e, rel)
        if isinstance(e, G.Star):
            return F.struct(*[rel.df[c] for c in rel.df.columns])
        if isinstance(e, G.MultiCol):
            return self._multicol(e, rel)
        raise NotImplementedError(f"expression {e}")

    def _multicol(self, e: "G.MultiCol", rel: Relation) -> Column:
        """rel.(c1, c2): project a bag of structs to a bag of narrower
        tuples (POProject over inner plans) — F.transform keeps it
        JVM-side; a plain struct (tuple) projects directly."""
        from pyspark.sql import types as T

        head = self._resolve(e.rel, rel)
        name = e.rel if e.rel in rel.df.columns else None
        dtype = rel.df.schema[name].dataType if name else None

        def field(t, c, names):
            if c.startswith("$"):
                return t[names[int(c[1:])]].alias(names[int(c[1:])])
            return t[c].alias(c)

        if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
            names = dtype.elementType.fieldNames()
            return F.transform(head, lambda t: F.struct(*[field(t, c, names) for c in e.cols]))
        if isinstance(dtype, T.StructType):
            names = dtype.fieldNames()
            return F.struct(*[field(head, c, names) for c in e.cols])
        raise TypeError(f"pig latin: {e.rel}.({', '.join(e.cols)}) needs a bag or tuple column")

    def _resolve(self, name: str, rel: Relation) -> Column:
        cols = rel.df.columns
        if name.startswith("$"):
            idx = int(name[1:])
            if idx >= len(cols) and all(c.startswith("_c") for c in cols):
                # schemaless load (PigStorage() with no AS): rows may
                # have ANY arity, so $N beyond the sampled width is a
                # null field, not an error (Pig's untyped-tuple access)
                return F.lit(None)
            return rel.df[cols[idx]]
        if name in cols:
            return rel.df[name]
        # alias::col written with dots or ::; also bare suffix match
        if "." in name:
            head, rest = name.split(".", 1)
            q = f"{head}::{rest}"
            if q in cols:
                return rel.df[q]
            if head in cols:  # struct/bag field access
                if rest.startswith("$"):
                    # positional deref — tuple fields by index (t.$0),
                    # and bag-element projection by index (b.$0 over
                    # array<struct>: field 0 of every element, Pig's
                    # positional bag projection)
                    from pyspark.sql import types as T

                    dtype = rel.df.schema[head].dataType
                    if isinstance(dtype, T.StructType):
                        return rel.df[head].getField(dtype.names[int(rest[1:])])
                    if isinstance(dtype, T.ArrayType) and isinstance(
                        dtype.elementType, T.StructType
                    ):
                        return rel.df[head].getField(
                            dtype.elementType.names[int(rest[1:])]
                        )
                return rel.df[head].getField(rest)
        suffix = [c for c in cols if c.endswith("::" + name)]
        if len(suffix) == 1:
            return rel.df[suffix[0]]
        if len(suffix) > 1:
            raise ValueError(f"pig latin: ambiguous field {name!r}: {suffix}")
        if "::" in name:
            # full qualifier-chain match: Pig's LogicalSchema names can
            # carry MORE history than ours (hourA::group::ngram when our
            # flatten stored hourA::ngram) — a column whose ::-chain is
            # an order-preserving subsequence of the requested chain,
            # sharing the leaf, is the same field
            segs = name.split("::")

            def _subseq(short: list[str]) -> bool:
                it = iter(segs)
                return all(s in it for s in short)

            chain = [
                c for c in cols
                if c.split("::")[-1] == segs[-1] and _subseq(c.split("::"))
            ]
            if len(chain) == 1:
                return rel.df[chain[0]]
            # qualified alias::field where flatten kept the bare name
            # (no collision) — Pig resolves either form (LogicalSchema
            # disambiguation); strip qualifiers left-to-right
            rest = name.split("::", 1)[1]
            if rest in cols or "::" in rest:
                return self._resolve(rest, rel)
            raise NameError(
                f"pig latin: unknown field {name!r}{_suggest(name, cols)} (columns: {cols})"
            )
        return F.expr(name)

    def _call(self, e: G.Call, rel: Relation) -> Column:
        fname = self.defines.get(e.func, e.func)  # DEFINE alias → func
        if isinstance(fname, tuple) and fname[0] == "__hive__":
            return self._hive_call(fname[1], fname[2], e, rel)
        if isinstance(fname, tuple) and fname[0] == "__invoke__":
            # Invoker.java static-method reflection → java_method
            # (JVM-side reflection per row; the result crosses back as
            # a string — Java's shortest-roundtrip toString — and casts
            # to the InvokeForX return type losslessly)
            _, ret, full, params = fname
            cls, _, method = full.rpartition(".")
            args = [self._expr(a, rel) for a in e.args]
            ptypes = params.split() if params else []
            for i, pt in enumerate(ptypes[: len(args)]):
                args[i] = args[i].cast(pig_field_ddl(pt))
            return F.java_method(F.lit(cls), F.lit(method), *args).cast(ret)
        if callable(fname) and not isinstance(fname, (str, tuple, dict)):
            # DEFINE-bound column function (ctor-arg eval classes)
            args = [self._expr(a, rel) for a in e.args]
            if getattr(fname, "__wants_rel__", False):
                return fname(*args, _rel=rel)
            return fname(*args)
        if not isinstance(fname, str):  # exec-command DEFINE used as a UDF
            raise NameError(
                f"{e.func!r} is DEFINEd as a stream command; it can only follow STREAM ... THROUGH"
            )
        if "." in fname:
            ns, _, leaf = fname.partition(".")
            funcs = self.script_udfs.get(ns)
            if funcs is None and fname.count(".") >= 2:
                # fully-qualified Java class call (org.apache.pig.
                # builtin.X / piggybank evaluation classes): resolve
                # the LEAF against the builtin/piggybank registry —
                # Pig scripts habitually call piggybank by class path
                java_leaf = fname.rsplit(".", 1)[-1]
                fn = getattr(PF, java_leaf, None) or getattr(PF, java_leaf.upper(), None)
                if fn is None:
                    # case-insensitive fallback: the lexer lowercases
                    # leaves that collide with statement keywords
                    # (…piggybank.evaluation.string.Split arrives as
                    # 'split'), but class-path resolution is by name
                    match = next(
                        (n for n in dir(PF) if not n.startswith("_") and n.lower() == java_leaf.lower()),
                        None,
                    )
                    if match is not None:
                        fn = getattr(PF, match)
                if fn is not None:
                    args = [self._expr(a, rel) for a in e.args]
                    if getattr(fn, "__wants_rel__", False):
                        return fn(*args, _rel=rel)
                    return fn(*args)
                raise NameError(
                    f"pig latin: {fname!r} is a Java UDF class — this engine cannot load "
                    f"JVM classes; no builtin named {java_leaf!r} matches. Port it as a "
                    "scripting UDF (REGISTER 'x.py' USING jython AS ns) or use a builtin."
                )
            if funcs is None:
                raise NameError(
                    f"pig latin: unknown UDF namespace {ns!r} — REGISTER 'file.py' USING jython AS {ns};"
                )
            udf_col = funcs.get(leaf)
            if udf_col is None:
                raise NameError(
                    f"pig latin: no function {leaf!r} in namespace {ns!r}{_suggest(leaf, sorted(funcs))}"
                )
            return udf_col(*[self._expr(a, rel) for a in e.args], _rel=rel)
        if fname.upper() == "TOTUPLE" and e.args:
            # TOTUPLE.java: fields inherit the argument names; repeated
            # columns (TOTUPLE($0,$0,$0)) and expressions get POSITIONAL
            # names so later field access / storage isn't ambiguous.
            # Untyped null constants become chararray nulls (bytearray).
            cols = []
            used: set[str] = set()
            for i, a in enumerate(e.args):
                c = self._expr(a, rel)
                if isinstance(a, G.Null):
                    c = c.cast("string")
                nm = _default_name(a, i)
                if not nm or nm.startswith("$") or not nm.replace("_", "a").isalnum():
                    nm = f"col{i}"
                if nm in used:
                    nm = f"{nm}_{i}"
                used.add(nm)
                cols.append(c.alias(nm))
            return F.struct(*cols)
        if fname.upper() == "TOBAG" and e.args:
            # TOBAG.java: tuple arguments insert as-is, scalars wrap
            # into single-field tuples. Spark arrays need ONE element
            # type, so tuple schemas unify positionally — names from
            # the widest tuple, numeric widening, chararray fallback
            # (Pig's merged-or-bytearray output schema), null-padding
            # for shorter tuples; scalar bags unify the same way.
            from pyspark.sql import types as T

            arg_cols = [self._expr(a, rel) for a in e.args]
            for i, a in enumerate(e.args):
                if isinstance(a, G.Null):
                    arg_cols[i] = arg_cols[i].cast("string")
            try:
                probe = rel.df.select(*[c.alias(f"__tb{i}") for i, c in enumerate(arg_cols)]).schema
                types = [f.dataType for f in probe.fields]
            except Exception:
                types = []
            if types and all(isinstance(t, T.StructType) for t in types):
                arity = max(len(t.fields) for t in types)
                base = next(t for t in types if len(t.fields) == arity)
                names = list(base.names)
                targets = [
                    _common_type([
                        t[t.names[i]].dataType if i < len(t.fields) else None
                        for t in types
                    ]).simpleString()
                    for i in range(arity)
                ]
                elems = []
                for c, t in zip(arg_cols, types):
                    fields = [
                        (c[t.names[i]] if i < len(t.fields) else F.lit(None))
                        .cast(targets[i])
                        .alias(names[i])
                        for i in range(arity)
                    ]
                    elems.append(F.struct(*fields))
                return F.array(*elems)
            if types and not any(isinstance(t, T.StructType) for t in types):
                target = _common_type(types).simpleString()
                return F.array(
                    *[F.struct(c.cast(target).alias("t")) for c in arg_cols]
                )
            return F.array(*arg_cols)  # schema probe unavailable / mixed
        anon = self.script_udfs.get("")
        if anon is not None and fname in anon:
            # bare-name scripting UDF (REGISTER ... USING <engine>;
            # with no AS clause) — exact-case match, so lowercase
            # script functions never shadow the UPPERCASE builtins
            return anon[fname](*[self._expr(a, rel) for a in e.args], _rel=rel)
        fn = getattr(PF, fname, None) or getattr(PF, fname.upper(), None)
        if fn is None:
            known = [n for n in dir(PF) if not n.startswith("_")]
            raise NameError(f"pig latin: unknown function {fname!r}{_suggest(fname, known)}")
        bag_agg = self._bag_agg(fname, e, rel)
        if bag_agg is not None:
            return bag_agg
        if fname.upper() in ("SIZE", "ARITY"):
            # SIZE is type-polymorphic in Pig (StringSize/TupleSize/
            # BagSize/MapSize dispatched by the frontend) — resolve the
            # argument's Spark type here, where the schema is known
            from pyspark.sql import types as T

            if len(e.args) > 1:
                # ARITY(a, b, c): the args form an implicit tuple —
                # its SIZE is the field count (TupleSize.java)
                return F.lit(len(e.args)).cast("long")
            c = self._expr(e.args[0], rel)
            if isinstance(e.args[0], G.Col) and e.args[0].name in rel.df.columns:
                dtype = rel.df.schema[e.args[0].name].dataType
            else:  # Cast/Call/arith arg: probe the expression's type
                dtype = rel.df.select(c.alias("__sz")).schema[0].dataType
            if isinstance(dtype, T.StringType):
                return F.length(c).cast("long")
            if isinstance(dtype, T.BinaryType):
                return F.octet_length(c).cast("long")
            if isinstance(dtype, (T.ArrayType, T.MapType)):
                return F.size(c).cast("long")
            if isinstance(dtype, T.StructType):
                return F.lit(len(dtype.fields)).cast("long")
            # numeric/bool/datetime scalar: SIZE = 1 (SIZE.java:52),
            # null-propagating like the Java impl
            return F.when(c.isNotNull(), F.lit(1).cast("long"))
        if (
            fname.upper() == "TOP"
            and len(e.args) >= 3
            and isinstance(e.args[1], G.Num)
            and isinstance(e.args[2], G.Col)
        ):
            # TOP(n, column_INDEX, bag) — Pig's positional field arg
            # (TOP.java). Resolve the index against the bag's element
            # struct here, where the schema is known.
            from pyspark.sql import types as T

            bag_name = e.args[2].name
            if bag_name in rel.df.columns:
                dtype = rel.df.schema[bag_name].dataType
                if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
                    field = dtype.elementType.fieldNames()[int(e.args[1].value)]
                    return PF.TOP(int(e.args[0].value), field, self._expr(e.args[2], rel))
        args = []
        for a in e.args:
            if isinstance(a, G.Num):
                t = a.value.lower().rstrip("lf")
                args.append(float(t) if "." in t or "e" in t else int(t))
            elif isinstance(a, G.Str):
                args.append(a.value)
            else:
                args.append(self._expr(a, rel))
        return fn(*args)


def _range_span(rel: Relation, rp) -> list[str]:
    """Expand ``a .. c`` to the positional column span (QueryParser.g
    col_range; open ends cover to the schema edge)."""
    names = rel.df.columns

    def idx(ref: str | None, default: int) -> int:
        if ref is None:
            return default
        if ref.startswith("$"):
            return int(ref[1:])
        if ref not in names:
            raise NameError(f"pig latin: range endpoint {ref!r} not in schema {names}")
        return names.index(ref)

    lo = idx(rp.start, 0)
    hi = idx(rp.end, len(names) - 1)
    if lo > hi:
        raise SyntaxError(f"pig latin: range projection {rp.start}..{rp.end} is reversed")
    return names[lo : hi + 1]


def _unescape_delim(s: str) -> str:
    """PigStorage('\\u0001') / ('\\t'): Pig decodes backslash escapes
    in delimiter arguments (PigStorage.java StorageUtil.parseFieldDel);
    the string lexer keeps them raw, so decode here — twice when the
    source was itself backslash-escaped (scripts embedded in other
    quoting layers write '\\\\u0001')."""
    out = s
    for _ in range(2):
        if "\\" not in out:
            break
        try:
            out = out.encode("utf-8").decode("unicode_escape")
        except Exception:  # noqa: BLE001 — malformed escape: literal
            break
    return out


def _single_alias(alias) -> tuple[str | None, str | None]:
    """(name, pig_type) for a single-field AS schema ([('f','int')]);
    (alias, None) for a bare-name or absent alias."""
    if isinstance(alias, list) and len(alias) == 1:
        return alias[0]
    if isinstance(alias, str) or alias is None:
        return alias, None
    return None, None  # multi-field schema — caller splats positionally


def _common_type(ts):
    """Widest common Spark type for TOBAG element unification
    (TOBAG.java output schema: mergeable field types merge, otherwise
    the field degrades to bytearray ≅ chararray here): identical →
    itself, all-numeric → the widest, else string. Nulls/voids defer
    to the other elements."""
    from pyspark.sql import types as T

    nn = [t for t in ts if t is not None and not isinstance(t, T.NullType)]
    if not nn:
        return T.StringType()
    if all(t.simpleString() == nn[0].simpleString() for t in nn):
        return nn[0]
    order = [T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType]

    def rank(t):
        for i, cls in enumerate(order):
            if isinstance(t, cls):
                return i
        return None

    ranks = [rank(t) for t in nn]
    if all(r is not None for r in ranks):
        return order[max(ranks)]()
    return T.StringType()


def _bag_sort(bag: Column, order: list[tuple[str, bool]]) -> Column:
    """Sort a bag (array<struct>) by struct fields with Pig's null
    ordering (null smallest: first under asc, last under desc) —
    array_sort with a lexicographic comparator, pure codegen."""

    def cmp(x: Column, y: Column) -> Column:
        out = F.lit(0)
        for fld, asc in reversed(order):
            xa, ya = x[fld], y[fld]
            lt, gt = (F.lit(-1), F.lit(1)) if asc else (F.lit(1), F.lit(-1))
            out = (
                F.when(xa.isNull() & ya.isNull(), out)
                .when(xa.isNull(), lt)
                .when(ya.isNull(), gt)
                .when(xa < ya, lt)
                .when(xa > ya, gt)
                .otherwise(out)
            )
        return out

    return F.array_sort(bag, cmp)


def _binop(op: str, a: Column, b: Column) -> Column:
    return {
        "+": lambda: a + b,
        "-": lambda: a - b,
        "*": lambda: a * b,
        "/": lambda: a / b,
        "%": lambda: a % b,
        "==": lambda: a == b,
        "!=": lambda: a != b,
        "<": lambda: a < b,
        "<=": lambda: a <= b,
        ">": lambda: a > b,
        ">=": lambda: a >= b,
    }[op]()


def _const(e):
    if isinstance(e, G.Num):
        t = e.value.lower().rstrip("lf")
        return float(t) if "." in t or "e" in t else int(t)
    if isinstance(e, G.Str):
        return e.value
    if isinstance(e, G.Bin) and e.op in ("+", "-", "*", "/", "%"):
        # LIMIT/SAMPLE take scalar expressions (QueryParser.g rel_op
        # integer expr); fold constant arithmetic here
        l, r = _const(e.left), _const(e.right)
        if e.op == "/":
            return l / r
        import operator as _o

        return {"+": _o.add, "-": _o.sub, "*": _o.mul, "%": _o.mod}[e.op](l, r)
    raise ValueError("pig latin: constant expected")


def _default_name(e, i: int) -> str:
    if isinstance(e, G.Col):
        return e.name.split(".")[-1].split("::")[-1]
    if isinstance(e, G.Call):
        # namespace UDF calls: the dot would read as struct access in
        # later projections — keep the leaf name only
        return e.func.lower().split(".")[-1]
    return f"c{i}"
