"""Pipeline metrics via ``Observation`` — row counts and value stats
per named stage with ZERO extra Spark jobs (metrics piggyback the
action that executes the plan; nothing is recomputed).

The snapshot layer (plans.snapshot) already persists per-partition
lineage AFTER a stage commits; this meter covers the in-flight side of
the north rule's "row-count/latency metrics": tag any intermediate
DataFrame, run the pipeline's single action, then read every stage's
row count + stats and the action's wall time from one place.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class Meter:
    """Named observation points over a lazy pipeline.

    >>> meter = Meter()
    >>> df = meter.observe(df, "decoded")          # count only
    >>> df = meter.observe(df, "joined", F.sum("n").alias("n_sum"))
    >>> out = df.collect()                          # ONE action
    >>> meter.collect()["joined"]["rows"]
    """

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}
        self._t0: float | None = None
        self._wall: float | None = None

    def observe(self, df: DataFrame, name: str, *stats: Column) -> DataFrame:
        """Attach an observation point; always records ``rows``, plus
        any extra aggregate expressions."""
        if name in self._obs:
            raise ValueError(f"duplicate metric stage {name!r}")
        obs = Observation(name)
        self._obs[name] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"), *stats)

    def timed(self, action):
        """Run ``action()`` (the pipeline's single materializing call)
        recording wall latency; returns the action's result."""
        self._t0 = time.perf_counter()
        try:
            return action()
        finally:
            self._wall = time.perf_counter() - self._t0

    def collect(self, wait_ms: int = 2000) -> dict:
        """Metrics of every stage whose plan fragment executed (stages
        pruned out of the executed plan report no metrics — absent key),
        plus ``_wall_sec`` when the action ran through ``timed``.

        Checks the JVM observation's ``future().isCompleted()`` —
        NON-blocking, unlike ``Observation.get``, whose ``getRow()``
        call waits forever for a stage whose DataFrame never ran an
        action.  The listener that posts metrics fires asynchronously
        just after the action returns, so not-yet-complete observations
        get up to ``wait_ms`` of grace (poll loop, bounded); stages
        still incomplete after that are OMITTED, never hung on."""
        from pyspark.serializers import CPickleSerializer
        from pyspark.sql import Row

        out: dict = {}
        deadline = time.perf_counter() + wait_ms / 1000.0
        for name, obs in self._obs.items():
            jo = getattr(obs, "_jo", None)
            if jo is None:
                continue  # never attached to a DataFrame
            try:
                while (not jo.future().isCompleted()
                       and time.perf_counter() < deadline):
                    time.sleep(0.05)
                if not jo.future().isCompleted():
                    continue  # plan fragment never executed
                utils = getattr(
                    obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
                )
                row: Row = CPickleSerializer().loads(utils.toPyRow(jo.getRow()))
                out[name] = row.asDict(recursive=False)
            except Exception:
                pass
        if self._wall is not None:
            out["_wall_sec"] = round(self._wall, 6)
        return out
