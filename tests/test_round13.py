"""Round-13 tests: the driver-window pin (VERDICT r12 #1) plus this
round's build items as they land."""


def test_r13_window_composition():
    """VERDICT r12 #1 done-criterion, pinned: the r13 driver window
    opens with EXACTLY the 5 never-verified queries — the 3 r12-window
    spills (r7-stale tier tail) then the 2 r12 registrations — followed
    by any new r13 registrations, then the r8-stale tier in
    registration order. No verdict older than the r8 era may hide
    behind the window boundary except r8-tier spills themselves."""
    from tsod_spark import registry

    names = list(registry.ordered_queries())
    window = names[:50]
    prio = [
        "ts_hw_anomaly",
        "ts_peaks",
        "orders_km_segment_summary",
        "dedup_governance_pipeline",
        "emb_ivfpq_build_stats",
    ]
    assert window[:5] == prio
    # after the 5: new r13 registrations (never-verified), then r8-stale
    rest = window[5:]
    ages = [registry._latest_verified_round(n) for n in rest]
    n_new = sum(1 for a in ages if a == 0)
    assert ages == [0] * n_new + [8] * (len(rest) - n_new), list(
        zip(rest, ages)
    )
    # everything outside the window is r8-or-younger (only r8-tier
    # names may spill; nothing staler than r8 remains unburned)
    outside = names[50:]
    assert all(
        registry._latest_verified_round(n) >= 8 for n in outside
    ), [(n, registry._latest_verified_round(n)) for n in outside
        if registry._latest_verified_round(n) < 8]


def test_tight_median_drift_trigger():
    """VERDICT r12 #4: a median3 whose median exceeds prior by >1.5x
    with spread <30% of the median must be adjudicated (the
    1.5x-2.5x/tight-spread blind spot); loose spreads, sub-floor
    times, prior-less names, and in-band medians must not fire."""
    import bench

    prior = {"a": 5.0, "b": 5.0, "c": 5.0, "d": 5.0, "f": 0.4}
    timings = {"a": 7.04, "b": 7.0, "c": 13.0, "d": 5.5, "e": 9.0,
               "f": 0.9}
    median3 = {
        # r12's real signature: 1.41x prior... use >1.5x: 7.04/5.0=1.408
        # -> NOT flagged (below 1.5x); bump prior to make the case
        "a": {"runs": [7.04, 7.88, 6.99], "spread": 0.89},   # 1.408x: no
        "b": {"runs": [6.9, 7.0, 7.1], "spread": 0.2},       # 1.4x: no
        "c": {"runs": [12.0, 13.0, 14.0], "spread": 2.0},    # 2.6x tight
        "d": {"runs": [5.4, 5.5, 5.6], "spread": 0.2},       # 1.1x: no
        "e": {"runs": [8.9, 9.0, 9.1], "spread": 0.2},       # no prior
        "f": {"runs": [0.88, 0.9, 0.92], "spread": 0.04},    # sub-floor
    }
    # c is 2.6x with tight spread — normally caught by the 2.5x
    # excursion trigger, but _flag_tight_drift itself must fire on any
    # >1.5x tight case; the caller dedups against the other triggers.
    assert bench._flag_tight_drift(median3, timings, prior) == ["c"]

    # the blind-spot case proper: 1.8x prior, spread 12% of median
    prior2 = {"g": 5.0}
    timings2 = {"g": 9.0}
    median32 = {"g": {"runs": [8.5, 9.0, 9.5], "spread": 1.0}}
    assert bench._flag_tight_drift(median32, timings2, prior2) == ["g"]
    # same median with a LOOSE spread (55%) stays with median3_spread
    median33 = {"g": {"runs": [6.0, 9.0, 11.0], "spread": 5.0}}
    assert bench._flag_tight_drift(median33, timings2, prior2) == []
