"""Evaluation-result frames.

Every query (sub)expression lowers to one of these — the DataFrame-native
analogue of the reference's ``QueryValue`` kinds
(reference: src/query/value.rs:8-13):

- ``ScalarResult``  — a plan-time-folded f64 (pq scalars are pure literals).
- ``VectorFrame``   — instant vector per grid instant:
    ``grid``  : DF[instant: long] — every emitted instant, including ones
                whose vector is empty (pq emits empty vectors).
    ``cells`` : DF[instant: long, sig: string, labels: map<string,string>,
                   ord: string, value: double] — the non-empty samples.
                ``sig`` is the series identity (sorted ``k\\xffv`` concat,
                reference: src/model/labels.rs:51-57); ``ord`` is the output
                sort key reproducing the reference's BTreeMap iteration
                order at each instant.
- ``RangeFrame``    — range vector: one row per window point:
    ``points``: DF[instant, sig, labels, ord, value, ts: long, seq: long].

``checks`` carries deferred strict-mode validations (duplicate-series /
many-to-one panics in the reference, src/query/value.rs:86-92,114-116);
they are executed right before results are collected.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Check:
    df: DataFrame  # non-empty ⇒ violation
    message: str


@dataclass
class ScalarResult:
    value: float
    checks: list[Check] = field(default_factory=list)


@dataclass
class VectorFrame:
    grid: DataFrame
    cells: DataFrame
    checks: list[Check] = field(default_factory=list)


@dataclass
class RangeFrame:
    grid: DataFrame
    points: DataFrame
    checks: list[Check] = field(default_factory=list)
