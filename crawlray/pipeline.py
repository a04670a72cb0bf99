"""Declared user-extension surface (SURVEY.md §2.10): a ``Pipeline`` is
an ordered list of named ``Step``s, each a batch transform, compiled onto
a ``ray.data.Dataset`` as chained ``map_batches`` stages.

The reference extends per-row behavior through CSV config columns and a
format registry (``backend/api/models.py``, ``backend/main.py``); this is
the batch-engine generalization: users compose stock stages
(``crawlray.pipelines.*``, ``crawlray.stages.*``) with their own callables
without touching engine code. A ``Step`` whose ``fn`` is a CLASS becomes
an actor-pool stage (state built once per actor in ``__init__`` — the
ray_guide stateful-stage rule); a plain function becomes a stateless task
stage. Laziness is preserved: ``apply`` only builds the plan.

Example::

    pipe = Pipeline([
        Step("stats", doc_stats),
        Step("quality", QualityScorer, concurrency=4),
        Step("short", lambda t: t.filter(pc.greater(t["word_count"], 10))),
    ])
    out = pipe.apply(ray.data.read_parquet(path))
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field

import ray.data as rd


@dataclass(frozen=True)
class Step:
    """One pipeline stage.

    ``fn``: a batch callable ``(batch) -> batch`` or a callable CLASS
    (stateful; constructed once per actor with ``fn_args``).
    ``batch_format``: "pyarrow" (default, zero-copy) or "pandas"/"numpy"
    when the kernel needs it. ``concurrency``/``num_cpus``/``batch_size``
    pass straight to ``map_batches`` (size stateful stages explicitly).
    """

    name: str
    fn: object
    batch_format: str = "pyarrow"
    fn_args: tuple = field(default=())
    batch_size: int | None = None
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float | None = None

    def kwargs(self) -> dict:
        kw: dict = {"batch_format": self.batch_format}
        if inspect.isclass(self.fn):
            kw["fn_constructor_args"] = self.fn_args
            kw["concurrency"] = self.concurrency or 2
        elif self.concurrency is not None:
            kw["concurrency"] = self.concurrency
        if self.batch_size is not None:
            kw["batch_size"] = self.batch_size
        if self.num_cpus is not None:
            kw["num_cpus"] = self.num_cpus
        return kw


class Pipeline:
    def __init__(self, steps: list[Step]):
        names = [s.name for s in steps]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate step names: {names}")
        self.steps = list(steps)

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        """Compile the steps onto ``ds`` (lazy — nothing executes here)."""
        for s in self.steps:
            ds = ds.map_batches(s.fn, **s.kwargs())
        return ds

    def describe(self) -> list[str]:
        return [
            f"{s.name}: {'actor-pool' if inspect.isclass(s.fn) else 'task'}"
            f" [{s.batch_format}]"
            for s in self.steps
        ]

    def __or__(self, other: "Pipeline") -> "Pipeline":
        return Pipeline(self.steps + other.steps)
