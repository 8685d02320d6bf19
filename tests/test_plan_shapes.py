"""Physical-plan regression gates for the star-schema planner claims
(PLANS.md): zero SortAggregates and no label maps / signature strings in
any shuffle Exchange for the headline queries. These are the properties
that make the plans survive a 100× scale-up; pin them so a future change
can't silently regress to wide shuffles or per-partition sorts."""

import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()

HEADLINE = [
    "pq_instant_vector",
    "pq_sum_by_et",
    "pq_vector_matching",
    "pq_count_over_time",
    "pq_rate_1h",
    "pq_topk2_by_et",
    "pq_count_quirk_by_et",
    "pq_last_over_time",
]


def _formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", HEADLINE)
def test_no_sort_aggregate_and_narrow_exchanges(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    lines = plan.splitlines()

    sort_aggs = [l for l in lines if re.match(r"^\(\d+\) SortAggregate", l)]
    assert not sort_aggs, f"{name}: SortAggregate in plan\n" + "\n".join(sort_aggs)

    # FACT-shaped shuffle Exchanges (anything carrying sample values or
    # grid instants) must move no map<string,string> and no signature
    # strings. Dim-shaped exchanges (no value/instant columns — series-
    # count rows by construction: the _sig2 discovery distinct and the
    # _ordn per-group rank) are allowed to carry signature strings.
    bad = []
    for i, l in enumerate(lines):
        if re.match(r"^\(\d+\) Exchange", l):
            blk = " ".join(lines[i : i + 3])
            fact_shaped = re.search(r"\b(value|_lvalue|_rvalue|instant)#", blk) or (
                "valueWithExtremumOrdering" in blk
            )
            if not fact_shaped:
                continue
            if "map<" in blk or re.search(r"\blabels#", blk) or re.search(
                r"\b_?[gm]?sig2?#", blk
            ):
                bad.append(blk[:200])
    assert not bad, f"{name}: wide fact exchange\n" + "\n".join(bad)
