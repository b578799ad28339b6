"""Round-8 ADVICE regressions: degenerate-input ANSI divide guards
(Theil-Sen tied totals, runs test with one non-median observation,
Mann-Whitney with all pooled values tied) and the streaming cent
quantizer's half-even-vs-half-up divergence on exact .5 doubles.

Each test is the concrete crash/divergence input from the r7 advice;
all must yield the oracle's NULL/FALSE (or the batch twin's bits), not
DIVIDE_BY_ZERO or a one-cent drift.
"""

import datetime
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tsod_spark.analytics import stattests, temporal


def _mk_events(spark, triples):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (int(i), int(u), t0 + datetime.timedelta(hours=int(h)), float(v))
        for i, (u, h, v) in enumerate(triples)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_theil_sen_tied_daily_totals_null_z(spark):
    # two days with EQUAL daily sums -> mk_s = 0 and the tie-corrected
    # variance is exactly 0 -> z must be NULL and trend_flag False
    # (previously: unguarded num/sqrt(var) crashed the whole query).
    triples = [(1, 0, 3.0), (1, 24, 3.0)]
    r = temporal.robust_trend(_mk_events(spark, triples)).collect()[0]
    assert r.n_days == 2
    assert r.mk_s == 0
    assert r.mk_z is None
    assert r.trend_flag is False
    assert r.sen_slope == pytest.approx(0.0)


def test_theil_sen_mixed_degenerate_and_real_series(spark):
    # the guarded branch must not disturb a genuinely trending series
    # computed in the same plan
    triples = [(1, 0, 3.0), (1, 24, 3.0)]  # degenerate
    triples += [(2, 24 * d, float(d)) for d in range(6)]  # clean trend
    out = {r.user_id: r for r in temporal.robust_trend(_mk_events(spark, triples)).collect()}
    assert out[1].mk_z is None and out[1].trend_flag is False
    assert out[2].mk_z is not None and out[2].trend_flag is True
    assert out[2].sen_slope == pytest.approx(100.0, abs=1e-6)  # cents/day


def test_runs_test_single_nonmedian_observation(spark):
    # [5, 5, 9]: median 5 -> exactly ONE signed observation -> n = 1,
    # the variance's n^2(n-1) denominator is 0; runs_z must be NULL
    # (previously the compound (n>1)&(v>0) condition still evaluated v).
    triples = [(1, 0, 5.0), (1, 1, 5.0), (1, 2, 9.0)]
    r = temporal.runs_test(_mk_events(spark, triples)).collect()[0]
    assert (r.n_pos, r.n_neg, r.runs) == (1, 0, 1)
    assert r.runs_z is None


def test_runs_test_degenerate_beside_real_series(spark):
    triples = [(1, 0, 5.0), (1, 1, 5.0), (1, 2, 9.0)]
    triples += [(2, h, v) for h, v in enumerate([10.0, -10.0] * 4)]
    out = {r.user_id: r for r in temporal.runs_test(_mk_events(spark, triples)).collect()}
    assert out[1].runs_z is None
    assert out[2].runs_z is not None


def test_mann_whitney_all_ties_false_flag(spark):
    # every pooled value identical -> rank variance den = 0 -> mw_z
    # NULL and shift_flag FALSE (previously abs(num/den) was unguarded).
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, t0, "a" if i < 4 else "b", 2.5) for i in range(8)]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    for r in stattests.mann_whitney(df).collect():
        assert r.mw_z is None
        assert r.shift_flag is False


def test_mann_whitney_one_group_spans_population(spark):
    # a group key whose rows ARE the whole population in the other
    # direction: one group empty of contrast -> n1*n2 term drives den=0
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, t0, "a", float(i)) for i in range(6)]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    for r in stattests.mann_whitney(df).collect():
        assert r.mw_z is None
        assert r.shift_flag is False


# ---------------------------------------------------------------------------
# streaming cent quantizer: exact .5 doubles must round half-away like
# the batch twins' F.round, not Python banker's rounding


def _crafted_batches(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    tmp = tempfile.mkdtemp(prefix="stream_q_")
    ordered = df.orderBy("ts").collect()
    half = (len(ordered) + 1) // 2
    for i, part in enumerate((ordered[:half], ordered[half:])):
        if part:
            spark.createDataFrame(part, df.schema).coalesce(1).write.parquet(
                f"{tmp}/batch_{i}", mode="overwrite"
            )
    return tmp, df


def _run_update_stream(spark, tmp, schema, build, qname):
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/batch_*")
    )
    q = (
        build(src)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {qname}").collect()


def test_stream_holt_winters_half_cent_quantizer(spark):
    """Values whose v*100 is an exact .5 double (multiples of 1/8 such
    as 0.125 -> 12.5) must quantize half-away-from-zero in the stream
    kernel exactly like F.round in the batch twin — the one-cent skew
    otherwise propagates through level/trend/season state forever."""
    from tsod_spark.analytics.temporal import holt_winters
    from tsod_spark.streaming import stream_holt_winters

    t0 = datetime.datetime(2024, 1, 1)
    vals = [0.125, -0.125, 0.375, 1.625, 0.125, 2.0, -0.375, 0.875, 3.125, 0.625]
    rows = []
    for u in (1, 2):
        for h, v in enumerate(vals):
            rows.append((u * 100 + h, u, t0 + datetime.timedelta(hours=h), float(v) * u))
    tmp, df = _crafted_batches(spark, rows)
    try:
        got = {
            (r.user_id, r.hour_bucket): (r.level, r.trend, r.season)
            for r in _run_update_stream(
                spark, tmp, df.schema,
                lambda src: stream_holt_winters(src, series=["user_id"]),
                "t_hw_q",
            )
        }
        batch_rows = holt_winters(df).collect()
        last = {}
        for r in batch_rows:
            last[r.user_id] = max(last.get(r.user_id, -1), r.hour_bucket)
        expected = {
            (r.user_id, r.hour_bucket): (r.level, r.trend, r.season)
            for r in batch_rows
            if r.hour_bucket < last[r.user_id]
        }
        assert set(got) == set(expected)
        assert len(got) >= 18  # 9 closed buckets x 2 users
        for k, v in expected.items():
            assert got[k] == v, k  # bit-identical
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_peaks_half_cent_quantizer(spark):
    """Same exact-.5 regression for the streaming peak detector: the
    spike heights are built from x.125-style values, so a half-even
    quantizer shifts y_cents/height_cents by one."""
    from tsod_spark.queries.round8 import peaks
    from tsod_spark.streaming import stream_peaks

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(30):
        v = 50.125 if h == 6 else (-40.375 if h == 20 else 0.125)
        rows.append((h, 1, t0 + datetime.timedelta(hours=h), v))
    tmp, df = _crafted_batches(spark, rows)
    try:
        got = {
            (r.user_id, r.hour_bucket): (r.y_cents, r.kind, r.height_cents)
            for r in _run_update_stream(
                spark, tmp, df.schema,
                lambda src: stream_peaks(src, series=["user_id"]),
                "t_peaks_q",
            )
        }
        # decidability horizon in ABSOLUTE epoch-hour buckets
        maxhb = df.select(
            F.expr("max(unix_micros(ts) div 3600000000)").alias("mx")
        ).collect()[0].mx
        expected = {
            (r.user_id, r.hour_bucket): (r.y_cents, r.kind, r.height_cents)
            for r in peaks(df).collect()
            if r.hour_bucket + 12 < maxhb
        }
        assert set(got) == set(expected)
        assert len(got) >= 1  # the hour-6 spike is decided
        for k, v in expected.items():
            assert got[k] == v, k
        # the spike row itself quantizes 50.125 -> 5013 (half-away)
        assert any(v[0] == 5013 for v in got.values())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_kmeans_fit_sample_deterministic(spark):
    """KMeansDistanceDetector.fit's bounded training sample is ordered
    by (series, ts) before limit(), so two fits over differently-
    partitioned copies of the same data learn identical centroids."""
    from tsod_spark.detectors.mllib import KMeansDistanceDetector

    t0 = datetime.datetime(2024, 1, 1)
    import random

    rng = random.Random(17)
    rows = [
        (i, 1, t0 + datetime.timedelta(hours=i), rng.gauss(0, 1))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    d1 = KMeansDistanceDetector(time_steps=4, k=4).fit(df.repartition(7))
    d2 = KMeansDistanceDetector(time_steps=4, k=4).fit(
        df.orderBy(F.desc("ts")).repartition(3)
    )
    assert d1._centers == d2._centers
    assert d1._threshold == d2._threshold


# ---------------------------------------------------------------------------
# PPJoin prefix-filtered threshold Jaccard: result-invariance


def _pure_jaccard_pairs(docs, pct):
    """Exact in-block threshold Jaccard in pure python."""
    import itertools

    by_blk = {}
    for doc_id, blk, text in docs:
        toks = frozenset(t for t in text.lower().split() if t)
        if toks:
            by_blk.setdefault(blk, []).append((doc_id, toks))
    out = {}
    for blk, members in by_blk.items():
        for (ida, ta), (idb, tb) in itertools.combinations(sorted(members), 2):
            inter = len(ta & tb)
            union = len(ta) + len(tb) - inter
            if 100 * inter >= pct * union:
                out[(ida, idb)] = round(inter / union, 6)
    return out


def test_ppjoin_matches_pure_python_random(spark):
    """Random small-vocab corpus (forces shared grams, df ties, and
    integer ceil boundaries): the prefix-filtered join must return
    EXACTLY the pure-python threshold pairs — prefix filtering is a
    candidate optimization, never a semantics change."""
    import random

    from tsod_spark.pipeline import dedup

    rng = random.Random(83)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(120):
        n = rng.randint(1, 12)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        docs.append((i, f"s{rng.randint(0, 2)}", text))
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    for pct in (40, 60, 75, 100):
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup.ppjoin_pairs(df, thr_pct=pct, shingle_n=1).collect()
        }
        expected = _pure_jaccard_pairs(docs, pct)
        assert got == expected, f"pct={pct}"


def test_ppjoin_matches_index_engine(spark):
    """Equality against the full inverted-index engine at the same cut
    (int64 threshold test applied to the index's unrounded ratio)."""
    import random

    from tsod_spark.pipeline import dedup

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(15)]
    docs = [
        (i, "one", " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 9))))
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    pp = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ppjoin_pairs(df, thr_pct=50, shingle_n=1).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs_index(df, shingle_n=1).collect()
        if r.jaccard >= 0.5  # 0.5 dyadic: round6 cannot cross the cut
    }
    assert pp == full


# ---------------------------------------------------------------------------
# KM survival quartiles and Davies-Bouldin


def test_km_quartiles_null_when_curve_never_drops(spark):
    """Single-order customers only -> every duration censored -> the
    curve stays at 1.0 and all three levels emit NULL durations (the
    left-join-back-onto-the-grid path)."""
    from tsod_spark.queries.round8 import km_quartiles

    rows = [(i, i, f"2024-01-{(i % 28) + 1:02d}") for i in range(10)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string"
    )
    out = km_quartiles(orders).collect()
    assert [r.level_pct for r in out] == [25, 50, 75]
    assert all(r.dur_days is None and r.survival_at is None for r in out)


def test_km_quartiles_known_curve(spark):
    """5 customers with uncensored-dominated gaps of 10/20/30/40/50
    days: with one censored tail per customer the KM survival after
    the k-th event is prod((n-d)/n) over a known risk set — check the
    median lands where the hand-computed curve first hits 0.5."""
    from tsod_spark.queries.round8 import km_quartiles, km_survival

    rows = []
    k = 0
    for c, gap in enumerate([10, 20, 30, 40, 50]):
        rows.append((k, c, "2024-01-01")); k += 1
        import datetime as dt

        d2 = dt.date(2024, 1, 1) + dt.timedelta(days=gap)
        rows.append((k, c, d2.isoformat())); k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string"
    )
    curve = {r.dur_days: r.survival for r in km_survival(orders).collect()}
    out = {r.level_pct: r for r in km_quartiles(orders).collect()}
    # verify against the curve itself: quartile = min dur with S <= 1-q
    for lvl in (25, 50, 75):
        thr = 1.0 - lvl / 100.0
        cands = [d for d, s in curve.items() if s <= thr]
        if cands:
            assert out[lvl].dur_days == min(cands)
            assert out[lvl].survival_at == curve[min(cands)]
        else:
            assert out[lvl].dur_days is None


def test_davies_bouldin_separated_vs_overlapping(spark):
    """Two tight, far-apart label clusters must score a (much) lower
    DB index than two interleaved ones, and the per-label terms must
    match a pure-python evaluation of the same rounded pipeline."""
    import math

    from tsod_spark.pipeline.similarity import label_davies_bouldin

    def mk(vectors_by_label):
        rows = []
        i = 0
        for lab, vecs in vectors_by_label.items():
            for v in vecs:
                rows.append((i, [float(x) for x in v], lab))
                i += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label string"
        )

    far = mk({
        "a": [[0.0, 0.1], [0.1, 0.0], [0.05, 0.05], [0.1, 0.1]],
        "b": [[10.0, 10.1], [10.1, 10.0], [10.05, 10.05], [10.1, 10.1]],
    })
    near = mk({
        "a": [[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]],
        "b": [[0.5, 0.5], [1.0, 0.0], [0.0, 1.0], [0.6, 0.4]],
    })
    db_far = label_davies_bouldin(far).collect()[0].db_index
    db_near = label_davies_bouldin(near).collect()[0].db_index

    def pure_db(vectors_by_label):
        # mirror the rounded pipeline: micro-unit centroid means,
        # round-6 scatters and centroid distances
        cents, scat = {}, {}
        for lab, vecs in vectors_by_label.items():
            dims = len(vecs[0])
            cents[lab] = [
                round(sum(round(v[p] * 1e6) for v in vecs) / (1e6 * len(vecs)), 6)
                for p in range(dims)
            ]
            scat[lab] = round(
                sum(
                    math.sqrt(sum((x - c) ** 2 for x, c in zip(v, cents[lab])))
                    for v in vecs
                )
                / len(vecs),
                6,
            )
        labs = sorted(cents)
        terms = {}
        for i in labs:
            best = None
            for j in labs:
                if i == j:
                    continue
                m = round(
                    math.sqrt(
                        sum((a - b) ** 2 for a, b in zip(cents[i], cents[j]))
                    ),
                    6,
                )
                if m > 0:
                    t = (scat[i] + scat[j]) / m
                    best = t if best is None else max(best, t)
            terms[i] = best
        return round(sum(terms.values()) / len(labs), 6), {
            i: round(terms[i], 6) for i in labs
        }

    exp_far, terms_far = pure_db({
        "a": [[0.0, 0.1], [0.1, 0.0], [0.05, 0.05], [0.1, 0.1]],
        "b": [[10.0, 10.1], [10.1, 10.0], [10.05, 10.05], [10.1, 10.1]],
    })
    assert db_far == pytest.approx(exp_far, abs=1e-6)
    got_terms = {r.label: r.db_term for r in label_davies_bouldin(far).collect()}
    for lab, t in terms_far.items():
        assert got_terms[lab] == pytest.approx(t, abs=1e-6)
    assert db_far < db_near / 10  # separation dominates


def test_containment_matches_pure_python(spark):
    """Random small-vocab corpus: containment pairs (at several
    thresholds) must match a pure-python evaluation — including the
    asymmetric ratios and the int64 threshold boundary."""
    import itertools
    import random

    from tsod_spark.pipeline import dedup

    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(20)]
    docs = []
    for i in range(100):
        n = rng.randint(1, 10)
        docs.append((i, f"s{rng.randint(0, 1)}", " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")

    def pure(pct):
        by_blk = {}
        for doc_id, blk, text in docs:
            toks = frozenset(t for t in text.lower().split() if t)
            by_blk.setdefault(blk, []).append((doc_id, toks))
        out = {}
        for blk, members in by_blk.items():
            for (ida, ta), (idb, tb) in itertools.combinations(sorted(members), 2):
                inter = len(ta & tb)
                if inter > 0 and 100 * inter >= pct * min(len(ta), len(tb)):
                    out[(ida, idb)] = (
                        inter,
                        round(inter / len(ta), 6),
                        round(inter / len(tb), 6),
                    )
        return out

    for pct in (60, 80, 100):
        got = {
            (r.doc_a, r.doc_b): (r.shared_grams, r.containment_a, r.containment_b)
            for r in dedup.containment_pairs(df, thr_pct=pct, shingle_n=1).collect()
        }
        assert got == pure(pct), f"pct={pct}"


def test_permutation_entropy_matches_pure_python(spark):
    """Known + random hourly series, including gaps (triples must not
    span them), ties (position-ranked), and a monotone ramp (exactly
    one pattern, H = 0)."""
    import math
    import random

    from tsod_spark.queries.round8 import permutation_entropy

    rng = random.Random(31)
    series = {
        1: [(h, float(h)) for h in range(20)],  # ramp: one pattern
        2: [(h, 5.0) for h in range(10)],  # constant: all ties
        3: [(h, rng.uniform(-50, 50)) for h in range(40) if h % 7 != 3],  # gaps
        4: [(h, rng.choice([1.0, 2.0])) for h in range(30)],  # heavy ties
    }
    triples = [
        (u, h, v) for u, pts in series.items() for h, v in pts
    ]
    df = _mk_events(spark, [(u, h, v) for u, h, v in triples])
    got = {r.user_id: r for r in permutation_entropy(df).collect()}

    for u, pts in series.items():
        ys = {h: int(round(v * 100)) for h, v in pts}  # one event per hour
        pats = {}
        for h in sorted(ys):
            if h + 1 in ys and h + 2 in ys:
                x = [ys[h], ys[h + 1], ys[h + 2]]
                r1 = (x[1] < x[0]) + (x[2] < x[0])
                r2 = (x[0] <= x[1]) + (x[2] < x[1])
                r3 = (x[0] <= x[2]) + (x[1] <= x[2])
                p = 9 * r1 + 3 * r2 + r3
                pats[p] = pats.get(p, 0) + 1
        n = sum(pats.values())
        if n == 0:
            assert u not in got
            continue
        h_exp = math.log(n) - sum(c * math.log(c) for c in pats.values()) / n
        r = got[u]
        assert r.n_triples == n
        assert r.k_patterns == len(pats)
        assert r.pe_nats == pytest.approx(round(h_exp, 6), abs=1e-9)
        assert r.pe_norm == pytest.approx(round(h_exp / math.log(6.0), 6), abs=1e-9)
    # the ramp and the constant collapse to a single pattern
    assert got[1].k_patterns == 1 and got[1].pe_nats == 0.0
    assert got[2].k_patterns == 1 and got[2].pe_nats == 0.0


def test_sax_motifs_matches_pure_python(spark):
    """Crafted series: a clean daily ramp must be dominated by
    ascending words; pure-python mirror of the z/breakpoint/word/rank
    pipeline must agree exactly (counts and ranks)."""
    import math
    import random

    from tsod_spark.queries.round8 import sax_motifs

    rng = random.Random(41)
    series = {
        1: [(h, float(h % 8)) for h in range(48)],  # sawtooth ramp
        2: [(h, rng.uniform(-10, 10)) for h in range(60) if h % 9 != 4],
        3: [(h, 7.0) for h in range(20)],  # constant: excluded
    }
    df = _mk_events(
        spark, [(u, h, v) for u, pts in series.items() for h, v in pts]
    )
    got = {}
    for r in sax_motifs(df).collect():
        got.setdefault(r.user_id, []).append((r.rank, r.word, r.n_word, r.share))

    brk = 0.6744897501960817
    for u, pts in series.items():
        ys = {h: int(round(v * 100)) for h, v in pts}
        n = len(ys)
        t = sum(ys.values())
        q = sum(y * y for y in ys.values())
        var = (q - t * t / n) / n
        if var <= 0:
            assert u not in got
            continue
        mu, sd = t / n, math.sqrt(var)
        sym = {}
        for h, y in ys.items():
            z = (y - mu) / sd
            sym[h] = "a" if z < -brk else ("b" if z < 0 else ("c" if z < brk else "d"))
        words = {}
        for h in sorted(sym):
            if h + 1 in sym and h + 2 in sym:
                w = sym[h] + sym[h + 1] + sym[h + 2]
                words[w] = words.get(w, 0) + 1
        tot = sum(words.values())
        top = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        exp = [
            (i + 1, w, c, round(c / tot, 6)) for i, (w, c) in enumerate(top)
        ]
        assert got[u] == exp, u
    # the sawtooth's dominant motif is a nondecreasing (ascending-
    # staircase) word — an 8-step ramp quantizes to aabbccdd, so the
    # top words are 'aab'/'abb'/... style
    w0 = got[1][0][1]
    assert all(w0[i] <= w0[i + 1] for i in range(2)), w0


def test_conformal_snaive_matches_pure_python(spark):
    """Dense crafted series: the conformal quantile must be the exact
    ceil((n+1)*0.8)-th smallest calibration residual, coverage the
    exact test-side share, and a too-short series must emit NO row
    (refusing to certify is the conformal contract)."""
    import math
    import random

    from tsod_spark.queries.round8 import conformal_snaive

    rng = random.Random(53)
    rows = []
    # user 1: 300 consecutive hours -> plenty of 24h pairs
    for h in range(300):
        rows.append((1, h, 10.0 + rng.uniform(-5, 5)))
    # user 2: 20 hours only -> some pairs but n_cal < 9 -> no row
    for h in range(20):
        rows.append((2, h, 3.0))
    df = _mk_events(spark, rows)
    got = {r.user_id: r for r in conformal_snaive(df).collect()}
    assert 2 not in got

    # pure-python mirror for user 1
    ys = {}
    for u, h, v in rows:
        if u == 1:
            ys[h] = ys.get(h, 0) + int(round(v * 100))
    base_hb = 473352  # 2024-01-01T00 in epoch hours (ts fixture origin)
    resid = {}
    for h, y in ys.items():
        if h - 24 in ys:
            resid[h] = abs(y - ys[h - 24])
    cal = sorted(
        (resid[h], base_hb + h) for h in resid if (base_hb + h) % 5 != 0
    )
    test = [resid[h] for h in resid if (base_hb + h) % 5 == 0]
    n_cal = len(cal)
    k = ((n_cal + 1) * 8 + 9) // 10
    qhat = cal[k - 1][0]
    r = got[1]
    assert r.n_cal == n_cal
    assert r.qhat_cents == qhat
    assert r.n_test == len(test)
    covered = sum(1 for x in test if x <= qhat)
    assert r.n_flagged == len(test) - covered
    assert r.coverage == pytest.approx(round(covered / len(test), 6), abs=1e-9)
    # the finite-sample guarantee: coverage near or above 0.8
    assert r.coverage >= 0.75


def test_attribution_credit_conservation_and_pure_python(spark):
    """Crafted funnel: each model's total credit equals the number of
    touched conversions; per-type splits match a pure-python mirror
    (incl. the 7-day window edge and the (ts, id) tiebreak)."""
    import datetime as dt

    from tsod_spark.queries.round8 import attribution_credit

    t0 = dt.datetime(2024, 1, 10)
    rows = []  # (event_id, user_id, ts, event_type)
    eid = 0

    def add(u, dh, typ):
        nonlocal eid
        rows.append((eid, u, t0 + dt.timedelta(hours=dh), typ))
        eid += 1

    # user 1: click, view, purchase (both touches in window)
    add(1, 0, "click"); add(1, 1, "view"); add(1, 2, "purchase")
    # user 2: touch EXACTLY 7 days before (included), one outside
    add(2, -7 * 24, "click")          # boundary: conv_ts - 7 days
    add(2, -8 * 24, "view")           # outside the window
    add(2, 0, "purchase")
    # user 3: purchase with no touches
    add(3, 5, "purchase")
    # user 4: simultaneous touches (tiebreak by event_id)
    add(4, 0, "click"); add(4, 0, "view"); add(4, 1, "purchase")
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r.touch_type: r for r in attribution_credit(df).collect()}

    # conservation: 3 touched conversions (user 3 has none)
    assert sum(r.first_touch for r in out.values()) == 3
    assert sum(r.last_touch for r in out.values()) == 3
    assert sum(r.linear_credit for r in out.values()) == pytest.approx(3.0, abs=1e-5)
    # user 1: first=click, last=view; user 2: only click in window;
    # user 4: ts tie -> first = lower event_id (click), last = higher (view)
    assert out["click"].first_touch == 3   # users 1, 2, 4
    assert out["click"].last_touch == 1    # user 2
    assert out["view"].last_touch == 2     # users 1, 4
    assert out["view"].first_touch == 0
    assert out["click"].n_conversions == 3
    assert out["view"].n_conversions == 2
    # linear: u1 k=2 (click .5, view .5), u2 k=1 (click 1), u4 k=2
    assert out["click"].linear_credit == pytest.approx(2.0, abs=1e-6)
    assert out["view"].linear_credit == pytest.approx(1.0, abs=1e-6)
    # decay model also conserves, and the LATER touch earns more:
    # user 1's view (1h before purchase) outweighs its click (2h)
    assert sum(r.decay_credit for r in out.values()) == pytest.approx(3.0, abs=1e-5)
    import math

    w_click = 2 ** (-(2 / 24) / 3.5)
    w_view = 2 ** (-(1 / 24) / 3.5)
    u1_view = w_view / (w_click + w_view)
    # view credit = u1_view (user1) + u4's identical-ts split
    assert out["view"].decay_credit > out["view"].linear_credit - 1e-9


def test_periodogram_finds_planted_period(spark):
    """A planted 12h sinusoid must dominate at period 12; a planted
    weekly square wave at 168; per-row values match a pure-python
    single-bin DFT to round-6."""
    import math

    from tsod_spark.queries.round8 import periodogram

    rows = []
    for h in range(336):  # two weeks
        rows.append((1, h, 10.0 + 5.0 * math.sin(2 * math.pi * h / 12)))
        rows.append((2, h, 3.0 if (h % 168) < 84 else 9.0))
    df = _mk_events(spark, rows)
    out = {}
    for r in periodogram(df).collect():
        out.setdefault(r.user_id, {})[r.period] = r
    dom1 = [p for p, r in out[1].items() if r.is_dominant]
    dom2 = [p for p, r in out[2].items() if r.is_dominant]
    assert dom1 == [12]
    assert dom2 == [168]

    # pure-python mirror for user 1
    base_hb = 473352
    ys = {base_hb + h: int(round((10.0 + 5.0 * math.sin(2 * math.pi * h / 12)) * 100))
          for h in range(336)}
    n = len(ys)
    t = sum(ys.values())
    q = sum(y * y for y in ys.values())
    var = (q - t * t / n) / n
    mu, sd = t / n, math.sqrt(var)
    for p in (6, 8, 12, 24, 48, 168):
        ca = sum(((y - mu) / sd) * math.cos(2 * math.pi * (hb % p) / p)
                 for hb, y in ys.items())
        sb = sum(((y - mu) / sd) * math.sin(2 * math.pi * (hb % p) / p)
                 for hb, y in ys.items())
        exp_power = round((ca * ca + sb * sb) / n, 6)
        assert out[1][p].power == pytest.approx(exp_power, abs=1e-4), p
    # the planted bin carries essentially all spectral mass
    assert out[1][12].power_share > 0.95
