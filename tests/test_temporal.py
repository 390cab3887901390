"""Temporal event operators: semantics vs driver-side reference models
(oracle parity is covered by test_registry — notably events_asof_join is
checked there against DuckDB's native ASOF JOIN)."""

from bisect import bisect_right
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from databricks_incremental_lakehouse_spark.streaming.temporal import (
    asof_join,
    events_asof_join,
    events_rolling_5min,
)
from databricks_incremental_lakehouse_spark.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").collect()


def test_asof_join_reference_model(spark, sf_smoke):
    """Each purchase must match the same user's latest click with
    click.ts <= purchase.ts, found by binary search in a sorted list."""
    rows = _events(spark, sf_smoke)
    clicks = defaultdict(list)
    for r in rows:
        if r.event_type == "click":
            clicks[r.user_id].append((r.ts, r.event_id, r.value))
    for lst in clicks.values():
        lst.sort()

    got = {r.event_id: r for r in events_asof_join(spark, sf_smoke).collect()}
    purchases = [r for r in rows if r.event_type == "purchase"]
    assert set(got) == {r.event_id for r in purchases}
    n_matched = n_unmatched = 0
    for p in purchases:
        lst = clicks.get(p.user_id, [])
        i = bisect_right(lst, (p.ts, float("inf"), float("inf")))
        g = got[p.event_id]
        if i == 0:
            assert g.click_event_id is None and g.click_ts is None
            n_unmatched += 1
        else:
            ts, eid, val = lst[i - 1]
            assert (g.click_ts, g.click_event_id, g.click_value) == (ts, eid, val)
            n_matched += 1
    assert n_matched > 0 and n_unmatched > 0, "both match paths must be exercised"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=20),  # ts
        ),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=20),  # ts
            st.integers(min_value=0, max_value=99),  # payload
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),  # asof tie choice is unspecified
    ),
)
def test_asof_join_property(spark, left, right):
    """Generic asof_join on adversarial integer timelines: every left row
    matches the greatest right (key, ts<=left.ts) row or NULL."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid int, k int, ts int"
    )
    rdf = spark.createDataFrame(right, "k int, ts int, pay int")
    out = {r.lid: r for r in asof_join(ldf, rdf, by=["k"], ts="ts").collect()}
    by_key = defaultdict(list)
    for k, t, p in right:
        by_key[k].append((t, p))
    for lst in by_key.values():
        lst.sort()
    assert len(out) == len(left)
    for i, (k, t) in enumerate(left):
        lst = by_key.get(k, [])
        j = bisect_right(lst, (t, float("inf")))
        g = out[i]
        if j == 0:
            assert g.right_ts is None and g.right_pay is None
        else:
            assert (g.right_ts, g.right_pay) == lst[j - 1]


def test_rolling_5min_reference_model(spark, sf_smoke):
    """Count/sum over the strictly-preceding 5-minute window must equal a
    direct per-user scan."""
    rows = _events(spark, sf_smoke)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for lst in by_user.values():
        lst.sort(key=lambda r: r.ts)

    got = {r.event_id: r for r in events_rolling_5min(spark, sf_smoke).collect()}
    assert len(got) == len(rows)
    checked_nonzero = False
    for user, lst in by_user.items():
        for i, r in enumerate(lst):
            lo = r.ts.timestamp() * 1e6 - 300e6
            prev = [
                x
                for x in lst[:i]
                if lo <= x.ts.timestamp() * 1e6 < r.ts.timestamp() * 1e6
            ]
            g = got[r.event_id]
            assert g.n_prev_5min == len(prev)
            if prev:
                assert abs(g.value_prev_5min - sum(x.value for x in prev)) < 1e-6
                checked_nonzero = True
            else:
                assert g.value_prev_5min is None
    assert checked_nonzero


def test_funnel_reference_model(spark, sf_smoke):
    """Per-user python scan: earliest view, earliest click after it,
    earliest purchase after that — every user's step times and
    reached_step must match, and the corpus must exercise all of
    reached_step 1, 2 and 3 (0 needs a user with zero view events)."""
    from databricks_incremental_lakehouse_spark.streaming.temporal import (
        events_funnel,
    )

    rows = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)

    expect = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda e: e.ts)
        from datetime import timedelta

        from databricks_incremental_lakehouse_spark.streaming.temporal import (
            FUNNEL_WINDOW_HOURS,
        )

        horizon = timedelta(hours=FUNNEL_WINDOW_HOURS)
        t1 = min((e.ts for e in evs if e.event_type == "view"), default=None)
        t2 = (
            min(
                (
                    e.ts
                    for e in evs
                    if e.event_type == "click" and t1 < e.ts <= t1 + horizon
                ),
                default=None,
            )
            if t1
            else None
        )
        t3 = (
            min(
                (
                    e.ts
                    for e in evs
                    if e.event_type == "purchase" and t2 < e.ts <= t2 + horizon
                ),
                default=None,
            )
            if t2
            else None
        )
        expect[user] = (t1, t2, t3, 3 if t3 else 2 if t2 else 1 if t1 else 0)

    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.reached_step)
        for r in events_funnel(spark, sf_smoke).collect()
    }
    assert got == expect
    assert {v[3] for v in got.values()} >= {1, 2, 3}


def test_retention_reference_model(spark, sf_smoke):
    """Cohort triangle vs a python reference: every (cohort, offset) cell
    count, cohort sizes summing to the distinct-user total, offset-0
    retention always 1.0, and rates monotonically bounded by 1."""
    from databricks_incremental_lakehouse_spark.streaming.temporal import (
        events_retention,
    )

    rows = load_table(spark, sf_smoke, "events").select("user_id", "ts").collect()
    first = {}
    days = {}
    for r in rows:
        d = r.ts.date()
        days.setdefault(r.user_id, set()).add(d)
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d

    expect = {}
    for user, ds in days.items():
        c = first[user]
        for d in ds:
            key = (c, (d - c).days)
            expect[key] = expect.get(key, 0) + 1

    got = {
        (r.cohort_day, r.day_offset): r for r in events_retention(spark, sf_smoke).collect()
    }
    assert {k: r.n_active for k, r in got.items()} == expect
    sizes = {}
    for user, c in first.items():
        sizes[c] = sizes.get(c, 0) + 1
    assert sum(sizes.values()) == len(first)
    for (c, off), r in got.items():
        assert r.cohort_size == sizes[c]
        assert 0 < r.retention_rate <= 1
        if off == 0:
            assert r.retention_rate == 1.0
