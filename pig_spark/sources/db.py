"""DBStorage: write a relation into an SQL database from the executors.

Reference: piggybank ``org.apache.pig.piggybank.storage.DBStorage`` — a
StoreFunc (sink-only) that opens one JDBC connection per writer task,
accumulates rows into a ``PreparedStatement`` batch, and flushes with
``executeBatch`` every N rows (DBStorage.java: putNext/writeBatch).

Spark-first mapping
-------------------
On a real cluster the canonical path is ``df.write.jdbc(url, table,
properties)`` — Spark's JDBC sink does exactly DBStorage's contract
(per-partition connection, ``rewriteBatchedStatements`` batching) with
the driver jar on the executor classpath. This container ships no JDBC
driver jar, so the concrete tested implementation targets SQLite through
Python's stdlib ``sqlite3`` with the *same* executor-side shape:

- ``foreachPartition`` → one connection per partition task (distributed,
  no driver-side collect),
- batched ``executemany`` INSERTs, commit per batch,
- WAL + busy_timeout so concurrent partition writers queue safely, the
  way a server DB accepts concurrent sessions.

At 100 TB you would never funnel a full fact table through row INSERTs
(neither would Pig) — this sink is for dimension/result tables; the
fact-scale path is a columnar store().
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json as _json

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SQLITE_PREFIX = "sqlite:///"


def _sqlite_path(url: str) -> str:
    if not url.startswith(_SQLITE_PREFIX):
        raise ValueError(
            f"store_db supports {_SQLITE_PREFIX}<path> URLs in-container; "
            "for server databases use df.write.jdbc with the driver jar"
        )
    return url[len(_SQLITE_PREFIX):]


def _affinity(dtype: T.DataType) -> str:
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)):
        return "INTEGER"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "REAL"
    if isinstance(dtype, T.DecimalType):
        return "NUMERIC"
    if isinstance(dtype, T.BinaryType):
        return "BLOB"
    return "TEXT"


def _converter(dtype: T.DataType):
    """Python-value → sqlite-bindable. Complex types serialize to JSON
    text (DBStorage casts unsupported types to String the same way)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return lambda v: None if v is None else v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if isinstance(dtype, T.DecimalType):
        return lambda v: None if v is None else str(v)
    if isinstance(dtype, T.BinaryType):
        return lambda v: None if v is None else bytes(v)
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        return lambda v: None if v is None else _json.dumps(v, default=_json_default)
    if isinstance(dtype, T.BooleanType):
        return lambda v: None if v is None else int(v)
    return lambda v: v


def _json_default(v):
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, _decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if hasattr(v, "asDict"):  # Row
        return v.asDict(recursive=True)
    return str(v)


def store_db(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
) -> None:
    """STORE rel INTO 'table' USING DBStorage(driver, url, insert_sql).

    ``mode``: 'append' (DBStorage behavior), 'overwrite' (drop+recreate).
    The table is created from the DataFrame schema if absent — Pig users
    pre-create theirs; auto-create is a convenience, types map to SQLite
    affinities.
    """
    import sqlite3

    db_path = _sqlite_path(url)
    cols = df.schema.fields
    col_list = ", ".join(f'"{f.name}"' for f in cols)
    ddl_cols = ", ".join(f'"{f.name}" {_affinity(f.dataType)}' for f in cols)
    insert_sql = f'INSERT INTO "{table}" ({col_list}) VALUES ({", ".join("?" * len(cols))})'
    convs = [_converter(f.dataType) for f in cols]

    # DDL runs once, driver-side (DBStorage leaves DDL to the user; we
    # additionally auto-create so round-trip tests are self-contained)
    con = sqlite3.connect(db_path)
    try:
        con.execute("PRAGMA journal_mode=WAL")
        if mode == "overwrite":
            con.execute(f'DROP TABLE IF EXISTS "{table}"')
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({ddl_cols})')
        con.commit()
    finally:
        con.close()

    def write_partition(rows):
        import sqlite3

        conn = sqlite3.connect(db_path, timeout=120)
        try:
            conn.execute("PRAGMA busy_timeout=120000")
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(c(v) for c, v in zip(convs, row)))
                if len(batch) >= batch_size:
                    cur.executemany(insert_sql, batch)
                    conn.commit()
                    batch.clear()
            if batch:
                cur.executemany(insert_sql, batch)
                conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)


def load_db(spark, url: str, table: str, schema: str | T.StructType | None = None) -> DataFrame:
    """Round-trip convenience (DBStorage itself is store-only). Reads
    driver-side through one connection — fine for dimension-sized
    tables; a cluster-parallel read is ``spark.read.jdbc`` with
    ``partitionColumn/lowerBound/upperBound/numPartitions``.
    """
    import sqlite3

    db_path = _sqlite_path(url)
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f'SELECT * FROM "{table}"')
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    return spark.createDataFrame(rows, schema=names)
