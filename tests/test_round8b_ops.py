"""Unit tests for the round-8 second-wave operators (SURVEY.md §5.3-1):
property checks plus hand-recomputation of representative values on the
sf0.001 fixture (small enough to recompute driver-side)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from splio_etl_aggregations_spark import register_all
from splio_etl_aggregations_spark.sources.loader import load
from splio_etl_aggregations_spark.registry import all_queries

from .conftest import SF_SMALL

register_all()
Q = all_queries()

CH_BIT = {"click": 1, "error": 2, "signup": 4, "view": 8}


def _journeys(spark):
    ev = (
        load(spark, SF_SMALL)["events"]
        .select("user_id", "event_type")
        .collect()
    )
    mask: dict[int, int] = {}
    conv: dict[int, bool] = {}
    for r in ev:
        u = r["user_id"]
        mask[u] = mask.get(u, 0) | CH_BIT.get(r["event_type"], 0)
        conv[u] = conv.get(u, False) or r["event_type"] == "purchase"
    return mask, conv


def test_shapley_efficiency_and_nonnegativity(spark):
    rows = {
        r["channel"]: r
        for r in Q["attribution_shapley"].run(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(CH_BIT)
    mask, conv = _journeys(spark)
    v_full = sum(1 for u, c in conv.items() if c)  # every mask fits N
    v_empty = sum(1 for u, c in conv.items() if c and mask[u] == 0)
    # efficiency axiom: the phis split exactly v(N) - v(empty)
    assert sum(r["phi_24ths"] for r in rows.values()) == 24 * (
        v_full - v_empty
    )
    # v is monotone in S, so every marginal (hence every phi) is >= 0
    assert all(r["phi_24ths"] >= 0 for r in rows.values())
    for r in rows.values():
        assert abs(r["phi"] - r["phi_24ths"] / 24.0) < 5e-5


def test_shapley_hand_recompute(spark):
    mask, conv = _journeys(spark)
    cnt: dict[int, int] = {}
    for u, c in conv.items():
        if c:
            cnt[mask[u]] = cnt.get(mask[u], 0) + 1
    v = [
        sum(n for m, n in cnt.items() if m & ~s == 0) for s in range(16)
    ]
    w24 = {0: 6, 1: 2, 2: 2, 3: 6}
    rows = {
        r["channel"]: r["phi_24ths"]
        for r in Q["attribution_shapley"].run(spark, SF_SMALL).collect()
    }
    for ch, bit in CH_BIT.items():
        phi = sum(
            w24[bin(s).count("1")] * (v[s | bit] - v[s])
            for s in range(16)
            if s & bit == 0
        )
        assert rows[ch] == phi


def test_ols_matches_numpy_lstsq(spark):
    import numpy as np

    row = Q["ml_ols_multifeature"].run(spark, SF_SMALL).collect()[0]
    t = load(spark, SF_SMALL)
    feat = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("x1"),
            F.sum(F.floor("l_quantity")).alias("x2"),
        )
        .select(F.floor("o_totalprice").alias("y"), "x1", "x2")
        .collect()
    )
    X = np.array([[1.0, r["x1"], r["x2"]] for r in feat])
    y = np.array([float(r["y"]) for r in feat])
    b, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_orders"] == len(feat)
    assert abs(row["b0"] - b[0]) < 1e-3
    assert abs(row["b1"] - b[1]) < 1e-3
    assert abs(row["b2"] - b[2]) < 1e-3
    pred = X @ b
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(row["r2"] - r2) < 1e-3


def test_isotonic_is_monotone_and_matches_minimax(spark):
    rows = sorted(
        Q["ml_isotonic_calibration"].run(spark, SF_SMALL).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_q"] for r in rows]
    assert iso == sorted(iso), "PAV output must be nondecreasing"
    # hand-recompute the quantized minimax on the collected bin frame
    bins = [(r["bin"], r["n"], r["pos"]) for r in rows]
    q = 1 << 20

    def frac_q(i, j):
        n = sum(b[1] for b in bins if i <= b[0] <= j)
        p = sum(b[2] for b in bins if i <= b[0] <= j)
        return math.floor(p * q / n)

    ids = [b[0] for b in bins]
    for r in rows:
        k = r["bin"]
        want = max(
            min(frac_q(i, j) for j in ids if j >= k)
            for i in ids
            if i <= k
        )
        assert r["iso_q"] == want
        assert r["raw_q"] == frac_q(k, k)


def test_logistic_gd_hand_recompute(spark):
    row = Q["ml_logistic_regression_gd"].run(spark, SF_SMALL).collect()[0]
    orders = (
        load(spark, SF_SMALL)["orders"]
        .select(
            (F.col("o_orderstatus") == "F").cast("int").alias("y"),
            F.substring("o_orderpriority", 1, 1).cast("int").alias("x1"),
            F.month("o_orderdate").alias("x2"),
        )
        .collect()
    )
    q = 1 << 20
    w = [0, 0, 0]
    n = len(orders)
    for _ in range(3):
        g = [0, 0, 0]
        for o in orders:
            z = (w[0] + w[1] * o["x1"] + w[2] * o["x2"]) / q
            p = 0.5 + z / (2 * (1 + abs(z)))
            rq = math.floor((p - o["y"]) * q)
            g[0] += rq
            g[1] += rq * o["x1"]
            g[2] += rq * o["x2"]
        w = [wj - math.floor(5.0 * gj / (16.0 * n)) for wj, gj in zip(w, g)]
    assert (row["w0_q"], row["w1_q"], row["w2_q"]) == tuple(w)
    correct = sum(
        1
        for o in orders
        if (w[0] + w[1] * o["x1"] + w[2] * o["x2"] >= 0) == (o["y"] == 1)
    )
    assert row["n_correct"] == correct and row["n_rows"] == n


def test_weighted_priority_hand_recompute(spark):
    import hashlib

    rows = Q["sample_weighted_priority"].run(spark, SF_SMALL).collect()
    per = {}
    for r in rows:
        per.setdefault(r["o_orderpriority"], []).append(r)
    orders = (
        load(spark, SF_SMALL)["orders"]
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )

    def ekey(o):
        h = int(
            hashlib.md5(f"wres:{o['o_orderkey']}".encode()).hexdigest()[:15],
            16,
        )
        u = (h + 1) / float(1 << 60)
        return (-math.log(u) / math.floor(o["o_totalprice"]), o["o_orderkey"])

    for pri, sample in per.items():
        pool = sorted(
            (o for o in orders if o["o_orderpriority"] == pri), key=ekey
        )
        want = [o["o_orderkey"] for o in pool[:8]]
        got = [r["o_orderkey"] for r in sorted(sample, key=lambda r: r["rk"])]
        assert got == want
        assert len(sample) == min(8, len(pool))


def test_jl_distortion_mass_concentrates_near_one(spark):
    rows = Q["vec_random_projection_distortion"].run(spark, SF_SMALL).collect()
    total = sum(r["n_pairs"] for r in rows)
    assert total > 0
    # bins 4-19 cover ratio [0.5, 2.5); JL at p=16 concentrates there
    mid = sum(r["n_pairs"] for r in rows if 4 <= r["bin"] < 20)
    assert mid / total > 0.9
    mean = (
        sum(r["mean_ratio"] * r["n_pairs"] for r in rows) / total
    )
    assert 0.6 < mean < 1.6  # E[ratio] = 1


def test_lead_lag_xcorr_hand_recompute(spark):
    from collections import Counter

    rows = Q["ts_lead_lag_xcorr"].run(spark, SF_SMALL).collect()
    ev = load(spark, SF_SMALL)["events"].select(
        F.to_date("ts").alias("d"), "event_type"
    ).collect()
    daily = Counter((r["d"], r["event_type"]) for r in ev)
    types = sorted({r["event_type"] for r in ev})
    days = sorted({r["d"] for r in ev})
    got = {(r["type_a"], r["type_b"]): r for r in rows}
    assert len(rows) == len(types) * (len(types) - 1) // 2
    import datetime

    for ai, a in enumerate(types):
        for b in types[ai + 1:]:
            dots = {}
            for lag in range(-3, 4):
                dots[lag] = sum(
                    daily[(d, a)] * daily[(d + datetime.timedelta(lag), b)]
                    for d in days
                )
            best = max(sorted(dots), key=lambda l: (dots[l], -l))
            r = got[(a, b)]
            assert (r["best_lag"], r["best_dot"], r["dot0"]) == (
                best,
                dots[best],
                dots[0],
            )


def test_hysteresis_episodes_hand_recompute(spark):
    rows = {
        r["user_id"]: r
        for r in Q["win_hysteresis_alerts"].run(spark, SF_SMALL).collect()
    }
    ev = sorted(
        load(spark, SF_SMALL)["events"]
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    per: dict[int, list[float]] = {}
    for r in ev:
        per.setdefault(r["user_id"], []).append(r["value"])
    for u, vals in per.items():
        state, episodes, cur, in_alert = 0, [], 0, 0
        for v in vals:
            prev = state
            if v >= 100.0:
                state = 1
            elif v < 50.0:
                state = 0
            if state == 1:
                in_alert += 1
                if prev == 0:
                    if cur:
                        episodes.append(cur)
                    cur = 0
                cur += 1
        if cur:
            episodes.append(cur)
        if episodes:
            r = rows[u]
            assert r["n_episodes"] == len(episodes)
            assert r["rows_in_alert"] == in_alert
            assert r["longest_episode"] == max(episodes)
        else:
            assert u not in rows


def test_bm25_hand_recompute_top1(spark):
    from splio_etl_aggregations_spark.operators.text import (
        _BM25_B,
        _BM25_K1,
        _BM25_Q,
        _BM25_QUERIES,
    )

    rows = Q["text_bm25_search"].run(spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL)["documents"].select("doc_id", "text").collect()
    toks = {d["doc_id"]: d["text"].split(" ") for d in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, terms in _BM25_QUERIES:
        got = sorted(by_q[qid], key=lambda r: r["rk"])
        assert [r["rk"] for r in got] == list(range(1, len(got) + 1))
        scores = {}
        for d, tk in toks.items():
            s = 0
            for term in terms:
                tf = tk.count(term)
                if not tf:
                    continue
                df = sum(1 for v in toks.values() if term in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                sat = (tf * (_BM25_K1 + 1)) / (
                    tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(tk) / avgdl)
                )
                s += math.floor(idf * sat * _BM25_Q)
            if s:
                scores[d] = s
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [(r["doc_id"], r["score_q"]) for r in got] == want


def test_sax_words_cover_all_users(spark):
    rows = Q["ts_sax_symbolic"].run(spark, SF_SMALL).collect()
    users = (
        load(spark, SF_SMALL)["events"].select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == users
    assert all(set(r["sax_word"]) <= set("abcd") for r in rows)
    # every user has <= 6 five-day segments in the 30-day window
    assert all(1 <= len(r["sax_word"]) <= 6 for r in rows)


def test_modularity_sums_and_bounds(spark):
    rows = Q["graph_modularity_communities"].run(spark, SF_SMALL).collect()
    m2 = sum(r["degree_sum"] for r in rows)  # sum of degrees = 2m
    assert m2 > 0
    # within-edge mass cannot exceed the community's degree mass
    assert all(r["within_edges"] <= r["degree_sum"] for r in rows)
    q = sum(
        (r["within_edges"] * m2 - r["degree_sum"] ** 2) / (m2 * m2)
        for r in rows
    )
    # modularity of any partition lies in [-0.5, 1)
    assert -0.5 <= q < 1.0
    for r in rows:
        want = (r["within_edges"] * m2 - r["degree_sum"] ** 2) / (m2 * m2)
        assert abs(r["q_contrib"] - want) < 5e-6


def test_temperature_mix_hand_recompute(spark):
    from splio_etl_aggregations_spark.operators.corpus import (
        _MIX_BUDGET,
        _MIX_Q,
        _MIX_TAU,
    )

    rows = Q["corpus_temperature_mix"].run(spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL)["documents"].select("source", "text").collect()
    per: dict[str, int] = {}
    for d in docs:
        per[d["source"]] = per.get(d["source"], 0) + len(d["text"].split(" "))
    wq = {
        s: math.floor(math.exp(_MIX_TAU * math.log(float(n))) * _MIX_Q)
        for s, n in per.items()
    }
    wsum = sum(wq.values())
    assert {r["source"] for r in rows} == set(per)
    for r in rows:
        s = r["source"]
        assert r["n_tokens"] == per[s] and r["wq"] == wq[s]
        alloc = math.floor(wq[s] * float(_MIX_BUDGET) / wsum)
        assert r["alloc_tokens"] == alloc
        assert r["epochs_centi"] == math.floor(alloc * 100.0 / per[s])
    # temperature < 1 compresses shares: smaller sources get MORE than
    # their raw-token share, larger get less
    raw_tot = sum(per.values())
    for r in rows:
        raw_share = per[r["source"]] / raw_tot
        if raw_share < 1 / len(per):
            assert r["share"] >= raw_share - 1e-9
        elif raw_share > 1 / len(per):
            assert r["share"] <= raw_share + 1e-9


def test_fixed_width_roundtrip_is_lossless(spark):
    got = sorted(
        Q["scan_fixed_width_roundtrip"].run(spark, SF_SMALL).collect(),
        key=lambda r: r["c_custkey"],
    )
    src = sorted(
        load(spark, SF_SMALL)["customer"]
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        .collect(),
        key=lambda r: r["c_custkey"],
    )
    assert len(got) == len(src)
    for g, s in zip(got, src):
        assert tuple(g) == tuple(s)  # bit-exact incl. the double


def test_audio_vad_hand_recompute(spark):
    rows = {
        r["file_name"]: r
        for r in Q["multimodal_audio_rms_vad"].run(spark, SF_SMALL).collect()
    }
    assert len(rows) == 16
    for i in range(16):
        n = 240 + 97 * i
        v = [(7919 * i + 2027 * tt) % 65536 - 32768 for tt in range(n)]
        flags, total = [], 0
        for k in range(0, n, 256):
            fr = v[k:k + 256]
            ssq = sum(x * x for x in fr)
            total += ssq
            flags.append(12 * ssq >= len(fr) * 4294967296)
        longest = cur = 0
        for fl in flags:
            cur = cur + 1 if fl else 0
            longest = max(longest, cur)
        r = rows[f"clip_{i:04d}.wav"]
        assert r["n_frames"] == len(flags)
        assert r["n_voiced"] == sum(flags)
        assert r["longest_run"] == longest
        assert r["total_energy"] == total


def test_wasserstein_drift_hand_recompute(spark):
    rows = {
        r["event_type"]: r
        for r in Q["dq_wasserstein_drift"].run(spark, SF_SMALL).collect()
    }
    import datetime

    ev = load(spark, SF_SMALL)["events"].select(
        "event_type", "ts", "value"
    ).collect()
    cut = datetime.datetime(2024, 1, 15)
    for et in rows:
        a = [
            min(49, math.floor(e["value"] / 10.0))
            for e in ev
            if e["event_type"] == et and e["ts"] < cut
        ]
        b = [
            min(49, math.floor(e["value"] / 10.0))
            for e in ev
            if e["event_type"] == et and e["ts"] >= cut
        ]
        na, nb = len(a), len(b)
        w1 = 0
        bins = sorted(set(a) | set(b))
        for i, bn in enumerate(bins[:-1]):
            ca = sum(1 for x in a if x <= bn)
            cb = sum(1 for x in b if x <= bn)
            w1 += abs(ca * nb - cb * na) * (bins[i + 1] - bn)
        r = rows[et]
        assert (r["n_a"], r["n_b"], r["w1_scaled"]) == (na, nb, w1)
        assert abs(r["w1"] - w1 * 10.0 / (na * nb)) < 5e-5


def test_delta_method_ratio_hand_recompute(spark):
    import hashlib

    row = Q["agg_delta_method_ratio"].run(spark, SF_SMALL).collect()[0]
    ev = load(spark, SF_SMALL)["events"].select(
        "user_id", "value"
    ).collect()
    per: dict[int, list[int]] = {}
    for e in ev:
        per.setdefault(e["user_id"], [0, 0])
        per[e["user_id"]][0] += math.floor(e["value"] * 100)
        per[e["user_id"]][1] += 1
    groups: dict[int, list[tuple[int, int]]] = {0: [], 1: []}
    for u, (x, y) in per.items():
        h = int(hashlib.md5(f"abratio:{u}".encode()).hexdigest()[:15], 16)
        groups[h % 2].append((x, y))

    def stats(g):
        n = len(g)
        sx = sum(x for x, _ in g)
        sy = sum(y for _, y in g)
        r = sx / sy
        sxx = sum(x * x for x, _ in g) - sx * sx / n
        sxy = sum(x * y for x, y in g) - sx * sy / n
        syy = sum(y * y for _, y in g) - sy * sy / n
        var = (sxx - 2 * r * sxy + r * r * syy) / (
            (n - 1) * (sy / n) ** 2 * n
        )
        return n, r, var

    na, ra, va = stats(groups[0])
    nb, rb, vb = stats(groups[1])
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert abs(row["ratio_a"] - ra) < 1e-5
    assert abs(row["ratio_b"] - rb) < 1e-5
    assert abs(row["z_score"] - (rb - ra) / math.sqrt(va + vb)) < 1e-3


def test_croston_hand_recompute(spark):
    rows = {
        r["p_partkey"]: r
        for r in Q["ts_croston_intermittent"].run(spark, SF_SMALL).collect()
    }
    li = (
        load(spark, SF_SMALL)["lineitem"]
        .filter(F.col("l_partkey") % 97 == 0)
        .select(
            "l_partkey",
            F.datediff(
                F.date_trunc("week", "l_shipdate").cast("date"),
                F.lit("1995-01-02").cast("date"),
            ).alias("dd"),
            F.floor("l_quantity").alias("q"),
        )
        .collect()
    )
    per: dict[int, dict[int, int]] = {}
    for r in li:
        wk = r["dd"] // 7
        per.setdefault(r["l_partkey"], {})
        per[r["l_partkey"]][wk] = per[r["l_partkey"]].get(wk, 0) + int(r["q"])
    assert set(rows) == set(per)
    for pk, weeks in per.items():
        ordered = sorted(weeks)
        z, p = float(weeks[ordered[0]]), 1.0
        for k in range(1, len(ordered)):
            z = 0.5 * weeks[ordered[k]] + 0.5 * z
            p = 0.5 * (ordered[k] - ordered[k - 1]) + 0.5 * p
        r = rows[pk]
        assert r["n_weeks"] == len(ordered)
        assert abs(r["size_smooth"] - z) < 1e-4
        assert abs(r["interval_smooth"] - p) < 1e-4
        assert abs(r["croston_rate"] - z / p) < 1e-4


def test_mann_kendall_hand_recompute(spark):
    rows = {
        r["event_type"]: r
        for r in Q["ts_mann_kendall_trend"].run(spark, SF_SMALL).collect()
    }
    ev = load(spark, SF_SMALL)["events"].select(
        "event_type", F.to_date("ts").alias("d"), "value"
    ).collect()
    per: dict[str, dict] = {}
    for e in ev:
        per.setdefault(e["event_type"], {})
        per[e["event_type"]][e["d"]] = per[e["event_type"]].get(
            e["d"], 0
        ) + math.floor(e["value"] * 100)
    for et, days in per.items():
        xs = [days[d] for d in sorted(days)]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        slopes = sorted(
            (xs[j] - xs[i]) / (j - i)
            for i in range(n)
            for j in range(i + 1, n)
        )
        sen = slopes[(len(slopes) + 1) // 2 - 1]
        zc = s - 1 if s > 0 else s + 1 if s < 0 else 0
        z = zc / math.sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
        r = rows[et]
        assert (r["n_days"], r["s_stat"]) == (n, s)
        assert abs(r["z_mk"] - z) < 1e-3
        assert abs(r["sen_slope"] - sen / 100.0) < 1e-5


def test_eb_shrinkage_pulls_toward_prior_mean(spark):
    rows = Q["agg_empirical_bayes_shrinkage"].run(spark, SF_SMALL).collect()
    assert len(rows) > 1
    alpha, beta = rows[0]["alpha"], rows[0]["beta"]
    assert alpha > 0 and beta > 0
    prior_mean = alpha / (alpha + beta)
    for r in rows:
        # shrinkage moves every raw rate toward the prior mean, more
        # strongly for small segments
        lo, hi = sorted((r["raw_rate"], prior_mean))
        assert lo - 1e-6 <= r["shrunk_rate"] <= hi + 1e-6
        want = (r["n_f_orders"] + alpha) / (r["n_orders"] + alpha + beta)
        assert abs(r["shrunk_rate"] - want) < 1e-3


def test_boilerplate_phrases_hand_recompute(spark):
    rows = Q["corpus_boilerplate_phrases"].run(spark, SF_SMALL).collect()
    docs = load(spark, SF_SMALL)["documents"].select("doc_id", "text").collect()
    reach: dict[str, set] = {}
    occ: dict[str, int] = {}
    for d in docs:
        tk = d["text"].split(" ")
        for i in range(len(tk) - 7):
            g = " ".join(tk[i:i + 8])
            reach.setdefault(g, set()).add(d["doc_id"])
            occ[g] = occ.get(g, 0) + 1
    want = sorted(
        ((g, len(s)) for g, s in reach.items() if len(s) >= 3),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    assert [(r["gram"], r["n_docs"]) for r in rows] == want
    for r in rows:
        assert r["n_occurrences"] == occ[r["gram"]]


def test_stratified_proportional_hand_recompute(spark):
    import hashlib

    rows = {
        r["o_orderpriority"]: r
        for r in Q["sample_stratified_proportional"]
        .run(spark, SF_SMALL)
        .collect()
    }
    orders = (
        load(spark, SF_SMALL)["orders"]
        .select("o_orderkey", "o_orderpriority")
        .collect()
    )
    per: dict[str, list[int]] = {}
    for o in orders:
        per.setdefault(o["o_orderpriority"], []).append(o["o_orderkey"])
    n = len(orders)
    for pri, keys in per.items():
        alloc = math.floor(1000.0 * len(keys) / n)
        picked = sorted(
            keys,
            key=lambda k: (
                int(
                    hashlib.md5(f"strat:{k}".encode()).hexdigest()[:15], 16
                ),
                k,
            ),
        )[:alloc]
        r = rows[pri]
        assert (r["n_pop"], r["alloc"]) == (len(keys), alloc)
        assert r["n_sampled"] == len(picked)
        assert r["key_checksum"] == sum(picked)
        assert r["min_key"] == min(picked)


def test_assortativity_matches_numpy_pearson(spark):
    import numpy as np

    row = Q["graph_degree_assortativity"].run(spark, SF_SMALL).collect()[0]
    li = (
        load(spark, SF_SMALL)["lineitem"]
        .filter(F.col("l_quantity") <= 8)
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    ja = np.array([deg[a] for a, b in edges], dtype=float)
    jb = np.array([deg[b] for a, b in edges], dtype=float)
    assert row["m2_edges"] == len(edges)
    want = np.corrcoef(ja, jb)[0, 1]
    assert abs(row["assortativity"] - want) < 1e-4
    assert -1.0 <= row["assortativity"] <= 1.0


def test_interrupted_series_matches_numpy_ols(spark):
    import numpy as np

    row = Q["ts_interrupted_series"].run(spark, SF_SMALL).collect()[0]
    import datetime

    ev = load(spark, SF_SMALL)["events"].select("ts", "value").collect()
    daily: dict[datetime.date, int] = {}
    for e in ev:
        d = e["ts"].date()
        daily[d] = daily.get(d, 0) + math.floor(e["value"] * 100)
    cut = datetime.date(2024, 1, 15)
    base = datetime.date(2024, 1, 1)

    def fit(days):
        tt = np.array([(d - base).days for d in days], dtype=float)
        y = np.array([daily[d] for d in days], dtype=float)
        A = np.vstack([np.ones_like(tt), tt]).T
        (b0, b1), *_ = np.linalg.lstsq(A, y, rcond=None)
        return b0, b1, len(days)

    pre = sorted(d for d in daily if d < cut)
    post = sorted(d for d in daily if d >= cut)
    b0a, b1a, na = fit(pre)
    b0b, b1b, nb = fit(post)
    assert (row["n_pre"], row["n_post"]) == (na, nb)
    assert abs(row["slope_pre"] - b1a / 100) < 1e-3
    assert abs(row["slope_post"] - b1b / 100) < 1e-3
    assert (
        abs(row["level_jump"] - ((b0b + b1b * 14) - (b0a + b1a * 14)) / 100)
        < 1e-2
    )


def test_price_index_sanity_and_fisher_mean(spark):
    row = Q["agg_price_index_laspeyres"].run(spark, SF_SMALL).collect()[0]
    assert row["n_parts"] > 0
    assert 0.1 < row["laspeyres"] < 10
    assert 0.1 < row["paasche"] < 10
    want = math.sqrt(row["laspeyres"] * row["paasche"])
    assert abs(row["fisher"] - want) < 1e-4
