"""Run statistics — the PigStats / progress-notification surface.

Parity target: `tools/pigstats/` in the reference (PigStats.java,
JobStats.java, PigProgressNotificationListener.java — job counts,
task counts, wall time, success flag, reported to the caller after
each launch; SURVEY §3.3). Spark equivalent: a job group around the
action + `SparkContext.statusTracker()` for per-job/stage task
counts, which is exactly the granularity Pig reports per MR job.

    from pig_spark.stats import run_with_stats
    stats = run_with_stats(spark, lambda: rel.store(path))
    stats.duration_s, stats.num_jobs, stats.num_tasks, stats.is_successful()
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


@dataclass
class JobStats:
    """≅ org.apache.pig.tools.pigstats.JobStats (one Spark job ≅ one MR job)."""

    job_id: int
    num_stages: int
    num_tasks: int
    num_failed_tasks: int


@dataclass
class RunStats:
    """≅ PigStats: one launched action's summary."""

    duration_s: float
    jobs: list[JobStats] = field(default_factory=list)
    result: Any = None
    error: Exception | None = None

    def is_successful(self) -> bool:
        return self.error is None

    @property
    def num_jobs(self) -> int:
        return len(self.jobs)

    @property
    def num_tasks(self) -> int:
        return sum(j.num_tasks for j in self.jobs)


def run_with_stats(spark: SparkSession, action: Callable[[], Any], description: str = "pig_spark") -> RunStats:
    """Execute `action` (anything that triggers Spark jobs) inside a
    dedicated job group; harvest per-job stage/task counts afterward
    from the status tracker. The progress-listener pattern
    (PigProgressNotificationListener) maps to polling the same
    tracker from another thread — the data source is identical."""
    sc = spark.sparkContext
    group = f"pigstats-{uuid.uuid4().hex[:8]}"
    tracker = sc.statusTracker()
    t0 = time.time()
    err: Exception | None = None
    result = None
    sc.setJobGroup(group, description, interruptOnCancel=False)
    try:
        result = action()
    except Exception as e:
        err = e
    finally:
        sc.setJobGroup("", "")
    dur = time.time() - t0

    jobs: list[JobStats] = []
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        num_stages = len(info.stageIds)
        n_tasks = n_failed = 0
        for sid in info.stageIds:
            s = tracker.getStageInfo(sid)
            if s is not None:
                n_tasks += s.numTasks
                n_failed += s.numFailedTasks
        jobs.append(JobStats(jid, num_stages, n_tasks, n_failed))
    return RunStats(round(dur, 3), jobs, result, err)
