"""Pin the funnel operator's staged-ordering semantics on adversarial
user histories — the synthetic corpus has every user completing every
stage, so these edges are only exercised here. The window form must
agree with a direct per-user reference evaluation."""

import datetime


def _ref_funnel(events):
    """Reference semantics: first view; first click at-or-after it;
    first purchase at-or-after that click."""
    by_user = {}
    for u, typ, ts in events:
        by_user.setdefault(u, []).append((typ, ts))
    n_view = n_click = n_purchase = 0
    for evs in by_user.values():
        views = [ts for t, ts in evs if t == "view"]
        if not views:
            continue
        n_view += 1
        tv = min(views)
        clicks = [ts for t, ts in evs if t == "click" and ts >= tv]
        if not clicks:
            continue
        n_click += 1
        tc = min(clicks)
        purchases = [ts for t, ts in evs if t == "purchase" and ts >= tc]
        if purchases:
            n_purchase += 1
    return (n_view, n_click, n_purchase)


def test_funnel_stage_skips_and_ties(spark, tmp_path):
    import os

    # (user, type, second-offset): covers click-before-view, view-only,
    # purchase-before-click, no-view users, and an exact t_view tie
    events = [
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),   # full funnel
        (2, "click", 5), (2, "view", 10), (2, "purchase", 20),    # click precedes view -> no click stage
        (3, "view", 10),                                          # view only
        (4, "view", 10), (4, "purchase", 15), (4, "click", 20),   # purchase precedes click -> no purchase stage
        (5, "click", 10), (5, "purchase", 20),                    # never viewed -> counted nowhere
        (6, "view", 10), (6, "click", 10), (6, "purchase", 10),   # exact ties: >= admits all stages
        (7, "view", 50), (7, "view", 10), (7, "click", 30),       # first view is min(view), not first row
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, typ, base + datetime.timedelta(seconds=s), i, 0.0)
        for i, (u, typ, s) in enumerate(events)
    ]
    spark.createDataFrame(
        rows, "user_id: long, event_type: string, ts: timestamp, event_id: long, value: double"
    ).write.parquet(f"{sf}/events.parquet")

    import __spark_entry__ as E

    E._TABLE_CACHE.clear()
    got = tuple(E.queries()["funnel_conversion"](spark, sf).first())
    want = _ref_funnel([(u, t, s) for (u, t, s) in events])
    # stage counts: views u{1,2,3,4,6,7}; clicks-after-view u{1,4,6,7};
    # purchases-after-click u{1,6} (u4's purchase precedes its click)
    assert got == want == (6, 4, 2)
