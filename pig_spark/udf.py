"""UDF surface — Pig's EvalFunc/FilterFunc/Algebraic/Accumulator
machinery (EvalFunc.java:57, Algebraic.java:53-67, Accumulator.java:44)
as decorators over Spark UDFs.

Guidance baked into the API: row-at-a-time Python UDFs are the slow
path; ``@pandas_eval_func`` (Arrow-batched) is the default offered for
anything numeric, and builtins from pig_spark.functions should always
be preferred. Pig's Algebraic (combiner-enabled 2-phase agg): builtins
get partial aggregation from Spark for free; for genuinely custom math
use ``algebraic_agg`` — pandas GROUPED_AGG has NO combiner (it ships
raw group rows), while ``algebraic_agg`` restores the Initial/
Intermed/Final two-phase shape with `mapInPandas` partials before the
exchange.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf


def eval_func(returns: str | T.DataType, deterministic: bool = True) -> Callable:
    """EvalFunc<T> equivalent: scalar Python UDF (row-at-a-time).

    Prefer ``pandas_eval_func`` — this exists for API parity and for
    functions with true per-row Python object logic."""

    def deco(fn: Callable):
        u = udf(fn, returnType=returns)
        if not deterministic:
            u = u.asNondeterministic()  # builtin/Nondeterministic.java
        return u

    return deco


def pandas_eval_func(returns: str | T.DataType) -> Callable:
    """Arrow-batched scalar UDF (pandas Series → Series) — the fast
    Python boundary (10-100× over row-at-a-time)."""

    def deco(fn: Callable):
        return pandas_udf(returns)(fn)

    return deco


def filter_func(fn: Callable) -> Callable:
    """FilterFunc.java — boolean EvalFunc."""
    return udf(fn, returnType=T.BooleanType())


def agg_func(returns: str | T.DataType) -> Callable:
    """Algebraic/Accumulator equivalent: grouped-agg pandas UDF
    (Series → scalar). Spark evaluates it per group without
    materializing bags — the Accumulator.java streaming contract."""

    from pyspark.sql.functions import PandasUDFType

    def deco(fn: Callable):
        return pandas_udf(returns, PandasUDFType.GROUPED_AGG)(fn)

    return deco


def monitored_udf(
    returns: str | T.DataType,
    timeout_ms: int = 10_000,
    default=None,
) -> Callable:
    """@MonitoredUDF (org.apache.pig.builtin.MonitoredUDF annotation,
    MonitoredUDFExecutor.java): evaluate the UDF under a wall-clock
    timeout; a row that exceeds it yields ``default`` instead of
    stalling the task — Pig's guard against pathological inputs
    (catastrophic regex, runaway parser) taking down a job.

    Same mechanism as the reference: a single-thread executor per
    worker runs the call, the caller waits with a timeout and falls
    back to the default. Same limitation too (Java can't stop a
    running thread either): a truly hung call occupies the worker
    thread until it returns, so subsequent timed-out rows fail fast
    but the hot thread lingers. For CPU-bound per-row Python, prefer
    builtins or pandas UDFs; this is a safety net, not a fast path.
    """
    import concurrent.futures as _cf
    import queue
    import threading

    class _DaemonWorker:
        """Single DAEMON worker thread + queue (not ThreadPoolExecutor:
        since Python 3.9 its non-daemon threads are joined at
        interpreter exit, so one truly hung UDF call would block Python
        worker shutdown forever — the exact leak ADVICE flagged).
        Daemon threads die with the process; a timed-out worker is
        simply abandoned and replaced."""

        def __init__(self):
            self.q: queue.Queue = queue.Queue()
            t = threading.Thread(target=self._run, daemon=True)
            t.start()

        def _run(self):
            while True:
                fn, args, fut = self.q.get()
                if not fut.set_running_or_notify_cancel():
                    continue
                try:
                    fut.set_result(fn(*args))
                except BaseException as e:  # noqa: BLE001 — relayed via Future
                    fut.set_exception(e)

        def submit(self, fn, *args) -> "_cf.Future":
            fut: _cf.Future = _cf.Future()
            self.q.put((fn, args, fut))
            return fut

    def deco(fn: Callable):
        cell = {"w": None}  # created lazily per executor process

        def wrapped(*args):
            w = cell["w"]
            if w is None:
                w = cell["w"] = _DaemonWorker()
            fut = w.submit(fn, *args)
            try:
                return fut.result(timeout=timeout_ms / 1000.0)
            except _cf.TimeoutError:
                fut.cancel()
                # abandon the clogged daemon worker (nothing can stop a
                # running call) so later rows aren't queued behind it
                cell["w"] = _DaemonWorker()
                return default

        return udf(wrapped, returnType=returns)

    return deco


def algebraic_agg(
    df,
    keys: list[str],
    seed,
    merge,
    finish,
    state_schema: str,
    result_schema: str,
):
    """Pig ``Algebraic`` (Initial/Intermed/Final — Algebraic.java:53-67)
    for CUSTOM Python aggregations, with the combiner property Spark
    cannot plan for opaque Python aggs.

    ``pandas_udf`` GROUPED_AGG ships EVERY raw group row to one
    executor (no partial aggregation for black-box Python), so a hot
    key at 100 TB concentrates its whole bag, exactly what Pig's
    combiner existed to avoid. This helper restores the two-phase
    shape:

    1. **seed** (≅ Initial+Intermed over one Arrow batch):
       ``seed(pdf) -> pd.DataFrame`` of one state row per key present
       in the batch — runs inside ``mapInPandas`` BEFORE the exchange,
       so the shuffle carries per-(batch × key) states, not raw rows.
    2. **merge** (≅ Intermed): ``merge(states_pdf) -> pd.Series|dict``
       one combined state from that key's partial states.
    3. **finish** (≅ Final): ``finish(state) -> pd.Series|dict`` maps
       the final state to result columns.

    State must be decomposable into columns (``state_schema``) —
    additive numbers, small lists — the same discipline Pig's
    combiner imposed (Initial output had to be a Tuple the combiner
    could re-consume).

    Returns a DataFrame with ``keys + result_schema`` columns.
    """
    import pandas as pd  # noqa: F401 — callers' fns operate on pandas

    key_fields = ", ".join(f"{k} {df.schema[k].dataType.simpleString()}" for k in keys)
    partial_schema = f"{key_fields}, {state_schema}"
    out_schema = f"{key_fields}, {result_schema}"

    def _partial(batches):
        for pdf in batches:
            if len(pdf):
                yield seed(pdf)

    def _combine(pdf):
        state = merge(pdf)
        result = finish(state)
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update(dict(result))
        import pandas as _pd

        return _pd.DataFrame([row])

    partials = df.mapInPandas(_partial, schema=partial_schema)
    return partials.groupBy(*keys).applyInPandas(_combine, schema=out_schema)
