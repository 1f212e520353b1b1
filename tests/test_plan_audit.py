"""Physical-plan audit: every catalog query is checked for 100 TB red
flags, not just correct rows.

Red flags:
- CartesianProduct — never acceptable.
- BroadcastNestedLoopJoin — acceptable ONLY where a brute-force scoring
  pass over a broadcast query/plane set is the declared design (the exact
  baselines the approximate paths are measured against); those queries are
  allowlisted by name with the approximate scale-path sibling noted.
- BatchEvalPython — row-at-a-time Python UDF in the data plane; all
  Python must cross via Arrow (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas...).

Plus spot checks that predicate pushdown and column pruning actually
reach the parquet scans on representative queries.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all
from tests.conftest import SF_DIR

load_all()

#: brute-force baselines whose broadcast cross product IS the design;
#: each has an LSH/IVF bucketed sibling as the scale path.
_NESTED_LOOP_OK = {
    "knn_brute_force",  # scale path: knn_ivf / knn_rp_lsh
    # The ANN quality scorecards compose brute_force_topk as ground truth
    # (that is their whole point: certify the approximate path against the
    # exact one), so they inherit its allowlisted BNLJ; at 100 TB they run
    # on a sampled stratum per their docstrings.
    "knn_ivf_eval",
    "knn_rp_lsh_eval",
    # Same inheritance: the persisted-IVF scorecard composes brute-force
    # ground truth AND the expression router's broadcast-centroid cross
    # (constant-size build side — the router table a serving tier holds).
    "knn_ivf_persisted_eval",
    "knn_ivf",  # centroid assignment broadcasts the centroid set
    # SemDeDup scorecard: the truth arm is global brute-force >= tau
    # pairs — quadratic BY DESIGN (the face's docstring says it runs on a
    # sampled stratum at scale, like the ANN eval twins) — and the
    # non-equi id_a < id_b condition makes the broadcast nested loop the
    # intended plan. The measured face (dedup_semdedup) carries no
    # nested loop; only its scorecard does.
    "dedup_semdedup_eval",
    # k-means assignment: the broadcast side is the k-centroid table
    # (k × dim values — constant-size at any corpus scale); every vector
    # must score against every centroid by definition, so the nested loop
    # is the intended plan, not a missing equi-join key.
    "kmeans_step_centroids",
    # Scalar-subquery shape: the broadcast side is the 1-row global-stats
    # aggregate (sum/count of balances) — a constant-size build side at any
    # data scale, exactly how engines plan uncorrelated scalar subqueries.
    "q22_dormant_rich_customers",
    # Same scalar-subquery shape: every nested-loop side is a broadcast
    # 1-row aggregate (corpus token total; the 1-row missed/violation
    # scorecard counts) — constant-size build sides at any corpus scale.
    "text_heavy_hitters_eval",
}


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_plan_has_no_scale_red_flags(spark, name):
    df = CATALOG[name].spark_fn(spark, SF_DIR)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in _NESTED_LOOP_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_pushdown_reaches_scan_asof(spark):
    """The event_type filters of the as-of join must be pushed into both
    parquet scans (the join reads 2 of 5 event types, not the table)."""
    plan = _formatted_plan(CATALOG["asof_join_click_error"].spark_fn(spark, SF_DIR))
    assert "EqualTo(event_type,click)" in plan
    assert "EqualTo(event_type,error)" in plan


def test_column_pruning_reaches_scan_w1(spark):
    """w1 needs 4 of 6 event columns; props (the widest column) must not
    be read."""
    plan = _formatted_plan(CATALOG["w1_rolling_mean"].spark_fn(spark, SF_DIR))
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schemas and all("props" not in l for l in scan_schemas)


def test_single_exchange_flagship(spark):
    """The flagship scale->window->label chain is one shuffle + one sort."""
    import re

    plan = _formatted_plan(CATALOG["turbofan_rul_pipeline"].spark_fn(spark, SF_DIR))
    # formatted plans name each node twice (tree + detail); count the
    # numbered detail headers only
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1
    assert len(re.findall(r"\(\d+\) Sort", plan)) <= 1


@pytest.mark.parametrize(
    "name", ["q3_shipping_priority", "q10_returned_items", "q18_large_orders", "text_vocab_top_terms"]
)
def test_topk_plans_take_ordered(spark, name):
    """Every global top-k face must plan TakeOrderedAndProject (per-
    partition top-k + merge), never a single-partition global window/sort
    (the r01 q3 weakness)."""
    plan = _formatted_plan(CATALOG[name].spark_fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, name


def test_q14_broadcasts_part(spark):
    """The part dimension must broadcast — the fact side never shuffles
    for a dim join."""
    plan = _formatted_plan(CATALOG["q14_promo_revenue"].spark_fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_no_unpartitioned_window_resample(spark):
    """The resample chain's windows are all per-key — a global window here
    would single-partition the whole grid. Every windowspecdefinition in
    the plan must name a partitioning column."""
    import re

    plan = _formatted_plan(CATALOG["resample_ffill_6h"].spark_fn(spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no window nodes found — plan shape changed?"
    for args in specs:
        assert "key" in args or "user_id" in args, f"unpartitioned window: {args}"


def test_unpivot_is_expand_no_shuffle(spark):
    """Unpivot must plan an Expand over one scan with zero Exchanges."""
    import re

    plan = _formatted_plan(CATALOG["unpivot_lineitem_measures"].spark_fn(spark, SF_DIR))
    assert "Expand" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0


def test_column_pruning_reaches_scan_mad(spark):
    """events_anomaly_mad needs 3 of 6 event columns; props (the widest)
    and the timestamp must not be read by any of its scans."""
    plan = _formatted_plan(CATALOG["events_anomaly_mad"].spark_fn(spark, SF_DIR))
    scan_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schemas
    assert all("props" not in l and "ts:" not in l for l in scan_schemas)


def test_ohlc_windows_share_one_exchange(spark):
    """The ascending and descending endpoint row_numbers sort twice (one
    Sort per window direction — unavoidable) but must share ONE hash
    Exchange on (type, hour): a second shuffle would double the face's
    network cost."""
    import re as _re

    plan = _formatted_plan(CATALOG["events_ohlc_bars"].spark_fn(spark, SF_DIR))
    n_exchanges = len(_re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan  # scan->window shuffle + final agg shuffle


def test_repetition_signals_two_aggregates_no_window(spark):
    """text_repetition_signals must plan as explode → two hash aggregates
    (each with a map-side partial, so four HashAggregate nodes around two
    Exchanges for the agg chain + one broadcast-side restore join) and NO
    Window node — a window over (doc, gram) would sort the whole gram
    relation instead of partially aggregating it."""
    import re as _re

    plan = _formatted_plan(
        CATALOG["text_repetition_signals"].spark_fn(spark, SF_DIR)
    )
    assert "Window" not in plan, "gram counting must not use a window"
    assert "Generate" in plan  # the single explode
    n_aggs = len(_re.findall(r"\(\d+\) HashAggregate", plan))
    assert n_aggs >= 4, f"expected partial+final for both aggs, got {n_aggs}"
    # the doc-restore join broadcasts (per-doc aggregates are small
    # relative to the corpus side at any scale); no sort-merge join
    assert "SortMergeJoin" not in plan
