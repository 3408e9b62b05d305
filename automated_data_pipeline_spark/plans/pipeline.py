"""The orders dataflow plan: Data Pull -> Extract -> Transform -> Migrate.

Each stage declares its name, its DataFrame transformation, and how it
materializes. The runner walks this plan; SURVEY.md §3.1 step order
(python_code/orchestrator/index.js:43)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame

from ..operators import stages


@dataclass(frozen=True)
class StagePlan:
    number: int
    name: str
    transform: Callable[..., DataFrame] | None
    materialize: str  # "append_by_run" | "target_merge"


ORDERS_PIPELINE: list[StagePlan] = [
    StagePlan(1, "Data Pull", stages.pull, "append_by_run"),
    StagePlan(2, "Extract", stages.extract, "append_by_run"),
    StagePlan(3, "Transform", stages.transform, "append_by_run"),
    StagePlan(4, "Migrate", stages.migrate_updates, "target_merge"),
]
