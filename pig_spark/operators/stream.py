"""STREAM rel THROUGH 'cmd' AS schema (QueryParser.g:487,
POStream.java:43-127, impl/streaming/ExecutableManager.java).

Pig pipes tab-delimited rows through an external executable with async
stdin/stdout pumps. Spark equivalent: ``rdd.pipe`` — one process per
partition, rows serialized tab-delimited (Pig's PigStreaming default
serializer), output lines parsed back by the declared schema with
Pig-style cast-to-null on garbage.

Scale: one subprocess per partition, streaming both directions — the
same process model as Pig's per-task ExecutableManager. Repartition
first if the command benefits from more/fewer parallel instances
(Pig: PARALLEL clause).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# scalar Spark → Pig type names, for re-parsing complex stdout fields
# through utf8_cast's Pig textual forms (Utf8StorageConverter.java)
_SPARK_TO_PIG_SCALAR = {
    "string": "chararray",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "timestamp": "datetime",
    "decimal(38,0)": "biginteger",
    "decimal(38,18)": "bigdecimal",
}


def _pig_type_ddl(dt: T.DataType) -> str:
    """Spark DataType → the Pig type string utf8_cast understands.
    Decimal/date pass through as Spark DDL (utf8_cast try_casts any
    castable scalar name) so nested precisions survive instead of
    degrading to chararray."""
    if isinstance(dt, T.MapType):
        return f"map[{_pig_type_ddl(dt.valueType)}]"
    if isinstance(dt, T.StructType):
        return "(" + ",".join(f"{f.name}:{_pig_type_ddl(f.dataType)}" for f in dt.fields) + ")"
    if isinstance(dt, T.ArrayType):
        el = dt.elementType
        inner = _pig_type_ddl(el) if isinstance(el, T.StructType) else f"(v:{_pig_type_ddl(el)})"
        return "{" + inner + "}"
    if isinstance(dt, (T.DecimalType, T.DateType)):
        return dt.simpleString()
    return _SPARK_TO_PIG_SCALAR.get(dt.simpleString(), "chararray")


def stream_through(
    df: DataFrame,
    cmd: str,
    schema: str | T.StructType | None = None,
    ship: list[str] | None = None,
    serialize: Callable[[tuple], str] | None = None,
    deserialize: Callable[[str], Sequence[str | None]] | None = None,
    in_sep: str = "\t",
    out_sep: str = "\t",
) -> DataFrame:
    """``ship`` ≅ DEFINE ... SHIP('file') — distribute scripts/binaries
    via ``SparkContext.addFile``. On YARN/K8s, spark.files localize
    into the task working directory, so ``cmd`` invokes them as
    ``./name`` — exactly Pig's ship-to-task-cwd contract. (local mode
    keeps them under SparkFiles.getRootDirectory(); resolve with
    ``pyspark.SparkFiles.get(name)``.)

    ``serialize``/``deserialize`` are the PigStreamingBase hooks
    (PigStreamingBase.java — DEFINE ... INPUT(stdin USING serde)
    OUTPUT(stdout USING serde)): ``serialize(row_tuple) -> line`` fed
    to the command's stdin; ``deserialize(line) -> field strings``
    parsed from its stdout, each field then cast by the declared
    schema with Pig's cast-to-null (garbage never throws). Defaults =
    PigStreaming.java's tab-delimited contract, which stays in
    codegen on the serialize side; custom hooks run in the pipe's
    per-partition Python stage, which the pipe already occupies — no
    extra plan hop either way."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    spark = df.sparkSession
    for path in ship or []:
        spark.sparkContext.addFile(path)

    if serialize is None:
        # delimited text, null → empty field (PigStreaming.java with
        # its delimiter argument) — pure Column ops; complex columns
        # render in Pig's text forms ([k#v], (a,b), {(a,b)}) so the
        # command sees what PigStorage would write (and utf8_cast can
        # parse the declared types back from its stdout)
        from ..sources import _complex_to_pig_text

        dfs = _complex_to_pig_text(df)
        serialized = dfs.select(
            F.concat_ws(in_sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in dfs.columns])
        ).rdd.map(lambda r: r[0])
    else:
        ser = serialize
        serialized = df.rdd.map(lambda row: ser(tuple(row)))
    # checkCode: non-zero exit of the external command fails the job,
    # as Pig's ExecutableManager does (POStream error contract).
    # The command runs through a SHELL (Pig's ExecutableManager wraps
    # commands likewise), so pipelines/redirection in backticks work —
    # `cut -f 1 | sort` is a reference e2e shape. The best-effort cd
    # into the launching process's cwd mirrors Pig's run-in-task-cwd
    # contract for SHIPped relative script names; on a real cluster
    # the path may not exist on executors and the cd silently no-ops.
    import os
    import shlex

    shell_cmd = f"cd {shlex.quote(os.getcwd())} 2>/dev/null; {cmd}"
    piped = serialized.pipe(f"/bin/sh -c {shlex.quote(shell_cmd)}", checkCode=True)
    deser = deserialize if deserialize is not None else (lambda line, d=out_sep: line.split(d))
    if schema is None:
        # STREAM without AS (QueryParser.g stream_clause): untyped
        # output, arity discovered at runtime — sample the first
        # output line (one partial job over partition 0; Pig discovers
        # the same shape tuple-by-tuple) and land every field as a
        # string ($N positional access, bytearray gradual typing)
        try:
            first_line = piped.first()
        except Exception:  # empty output
            first_line = ""
        n = max(1, len(list(deser(first_line))))
        schema = T.StructType([T.StructField(f"_c{i}", T.StringType(), True) for i in range(n)])
    n_fields = len(schema.fields)
    split_rows = piped.map(lambda line: (list(deser(line)) + [None] * n_fields)[:n_fields])
    str_schema = T.StructType([T.StructField(f.name, T.StringType(), True) for f in schema.fields])
    raw = spark.createDataFrame(split_rows, schema=str_schema)
    # Pig LoadCaster semantics: cast each field, null on failure —
    # try_cast (never .cast: plain cast raises on garbage under an
    # ANSI-on session) for scalars; utf8_cast's Pig textual-form
    # parsers ([k#v], (a,b), {(a,b)}) for complex declared types.
    from ..latin.translate import utf8_cast

    out_cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.MapType, T.StructType, T.ArrayType)):
            out_cols.append(utf8_cast(c, _pig_type_ddl(f.dataType)).alias(f.name))
        else:
            out_cols.append(c.try_cast(f.dataType).alias(f.name))
    return raw.select(*out_cols)
