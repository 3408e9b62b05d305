"""Declared dataflow plans. The reference's 'logical plan' is a fixed
4-node linear DAG materialized as control rows (index.js:43,67); here it
is data, so alternate dataflows can reuse the runner."""

from .pipeline import ORDERS_PIPELINE, StagePlan  # noqa: F401
