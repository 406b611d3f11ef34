"""Stage/Pipeline: deterministic DataFrame pipeline with .halg-style resume.

Reference semantics being reproduced:
- one named stage per `hc` invocation in a `.halg` script
  (/root/reference/hypercane/packaged_algorithms/dsa1.halg:35-126);
- a stage is SKIPPED when its output file already exists
  (`if [ ! -e $FILE ]` — dsa1.halg:39,49,60,…), which is the reference's
  whole resume story;
- user-registered algorithms are auto-discovered scripts
  (/root/reference/hypercane/args/sample.py:33-139) — here, plain Python
  functions returning a Pipeline, registered in ``ALGORITHMS``.

Spark-first: with no ``workdir`` the stages stay lazy and Catalyst fuses
them into a single plan (filters pushed through, projections pruned). With
a ``workdir`` each stage materializes to parquet — resume = read the last
complete stage, recompute only what follows; this also truncates lineage
for the iterative/ML stages.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

StageFn = Callable[[DataFrame], DataFrame]


@dataclass
class Stage:
    name: str
    fn: StageFn


class Pipeline:
    def __init__(self, name: str, stages: list[Stage | tuple[str, StageFn]]):
        self.name = name
        self.stages = [
            s if isinstance(s, Stage) else Stage(s[0], s[1]) for s in stages
        ]

    def stage_names(self) -> list[str]:
        return [s.name for s in self.stages]

    def _stage_path(self, workdir: str, i: int, name: str) -> str:
        return os.path.join(workdir, f"{i:02d}-{name}")

    def _complete(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_SUCCESS"))

    def run(
        self,
        df: DataFrame,
        workdir: str | None = None,
        resume: bool = True,
    ) -> DataFrame:
        """Run all stages over ``df``.

        With ``workdir``: each stage writes ``{i:02d}-{name}`` parquet; on
        ``resume`` the run fast-forwards to the LAST complete stage output
        and recomputes only later stages (exactly the `.halg` skip rule).
        Without ``workdir``: fully lazy, single fused plan.
        """
        spark = df.sparkSession
        start = 0
        if workdir and resume:
            for i, st in enumerate(self.stages):
                if self._complete(self._stage_path(workdir, i, st.name)):
                    start = i + 1
                else:
                    break
            if start > 0:
                df = spark.read.parquet(
                    self._stage_path(workdir, start - 1, self.stages[start - 1].name)
                )
        for i in range(start, len(self.stages)):
            st = self.stages[i]
            df = st.fn(df)
            if workdir:
                path = self._stage_path(workdir, i, st.name)
                df.write.mode("overwrite").parquet(path)
                df = spark.read.parquet(path)
        return df


# algorithm registry — the analogue of `.halg` auto-discovery
ALGORITHMS: dict[str, Callable[..., Pipeline]] = {}


def register(name: str):
    def deco(fn: Callable[..., Pipeline]):
        ALGORITHMS[name] = fn
        return fn

    return deco
