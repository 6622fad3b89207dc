"""Pipeline observability: named metrics collected DURING a job, not by
re-running it.

`df.observe(Observation, ...)` attaches aggregate expressions that Spark
evaluates as rows flow through the plan — a 100 TB ETL gets its row
counts, null rates, and value ranges for free on the write pass, instead
of paying a second full scan to audit what it just produced (the
reference's pipelines produce no metrics at all; its README's own TODO
asks for logging — reference README.md:117-121).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric expressions to a frame.

    Returns the instrumented frame and the Observation handle; after ANY
    action on the frame, ``observation.get`` yields the metric dict.
    Metrics must be aggregate expressions over the observed frame.
    """
    obs = Observation(name)
    aliased = [m.alias(k) for k, m in metrics.items()]
    return df.observe(obs, *aliased), obs
