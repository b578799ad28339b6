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
