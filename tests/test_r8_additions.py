"""Round-8 additions: reference tests beyond the DuckDB oracles.

Each query's oracle proves cross-engine agreement; these tests prove
the SEMANTICS against independent pure-Python references on the
sf0.001 fixtures (the test strategy of every other family)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from etl_his_spark.plans.queries_analytics import events_rate_anomaly
from etl_his_spark.plans.queries_lm import quality_bigram_likelihood
from etl_his_spark.plans.queries_retrieval import (
    RRF_K,
    RRF_LANE_N,
    RRF_TOP_K,
    retrieval_hybrid_rrf,
)


def test_hybrid_rrf_scores_are_rank_fusions(spark, sf_dir):
    rows = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP_K
    for r in rows:
        assert r.lex_rank is not None or r.sem_rank is not None
        want = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= RRF_LANE_N
            want += 1.0 / (RRF_K + r.lex_rank)
        if r.sem_rank is not None:
            assert 1 <= r.sem_rank <= RRF_LANE_N
            want += 1.0 / (RRF_K + r.sem_rank)
        assert r.rrf_score == pytest.approx(want, abs=1e-9)
    # result is sorted-by-construction top-k: scores non-increasing
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc present in both lanes must outrank one with a single,
    # deeper rank — spot the invariant rather than one fixture value
    both = [r for r in rows if r.lex_rank and r.sem_rank]
    only = [r for r in rows if (r.lex_rank is None) != (r.sem_rank is None)]
    if both and only:
        assert max(r.rrf_score for r in both) > min(
            r.rrf_score for r in only
        )


def test_bigram_likelihood_matches_python_reference(spark, sf_dir):
    from etl_his_spark.sources.readers import read_table

    docs = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
        if r.text is not None
    }
    toks = {d: [t for t in txt.strip().split(" ") if t] for d, txt in docs.items()}
    uni = Counter(t for ts in toks.values() for t in ts)
    big = Counter(
        (ts[i], ts[i + 1])
        for ts in toks.values()
        for i in range(len(ts) - 1)
    )
    v = len(uni)
    want = {}
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        ppms = [
            ((big[(ts[i], ts[i + 1])] + 1) * 1_000_000)
            // (uni[ts[i]] + v)
            for i in range(len(ts) - 1)
        ]
        want[d] = (len(ppms), sum(ppms))
    got = {
        r.doc_id: (r.n_bigrams, r.score_ppm, r.mean_ppm)
        for r in quality_bigram_likelihood(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d, (n, s) in want.items():
        gn, gs, gm = got[d]
        assert (gn, gs) == (n, s), d
        assert gm == pytest.approx(round(s / n, 6), abs=1e-9)


def test_rate_anomaly_matches_python_reference(spark, sf_dir):
    from etl_his_spark.sources.readers import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "ts")
        .collect()
    )
    buckets: Counter = Counter()
    for r in ev:
        hour = r.ts.replace(minute=0, second=0, microsecond=0)
        buckets[(r.event_type, hour)] += 1
    series: dict[str, list] = {}
    for (et, hour), n in sorted(buckets.items()):
        series.setdefault(et, []).append((hour, n))
    want = {}
    for et, pts in series.items():
        for i, (hour, n) in enumerate(pts):
            base = pts[max(0, i - 24):i]
            if len(base) != 24:
                continue
            s1 = sum(b for _, b in base)
            s2 = sum(b * b for _, b in base)
            mean = s1 / 24
            var = s2 / 24 - mean * mean
            flag = round((n - mean) * (n - mean) - 9 * var, 6) > 0
            want[(et, hour)] = (n, flag)
    got = {
        (r.event_type, r.window_start): (r.n_events, r.is_anomaly)
        for r in events_rate_anomaly(spark, sf_dir).collect()
    }
    # Both the ROWS frame and the python slice are position-based over
    # the sorted EXISTING buckets (gaps skip identically) → exact.
    assert got == want


def test_corpus_line_dedup_matches_python_reference(spark, sf_dir):
    from etl_his_spark.plans.queries_dedup import corpus_line_dedup
    from etl_his_spark.sources.readers import read_table

    docs = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
        if r.text is not None
    }
    # reference: 8-token pseudo-lines, global first occurrence by
    # (doc_id, line_no), reassemble survivors in original order
    lines: dict[int, list] = {}
    for d in sorted(docs):
        ts = [t for t in docs[d].strip().split(" ") if t]
        n = max(-(-len(ts) // 8), 1)
        lines[d] = [" ".join(ts[i * 8 : i * 8 + 8]) for i in range(n)]
    first: dict[str, tuple] = {}
    for d in sorted(lines):
        for i, ln in enumerate(lines[d]):
            first.setdefault(ln, (d, i))
    want = {}
    for d, ls in lines.items():
        kept = [ln for i, ln in enumerate(ls) if first[ln] == (d, i)]
        want[d] = (" ".join(kept), len(kept), len(ls) - len(kept))
    got = {
        r.doc_id: (r.text_deduped, r.n_lines_kept, r.n_lines_dropped)
        for r in corpus_line_dedup(spark, sf_dir).collect()
    }
    assert got == want
    # the op actually removed something on this corpus
    assert sum(v[2] for v in want.values()) > 0


def test_gapfill_locf_matches_python_reference(spark, sf_dir):
    from datetime import timedelta

    from etl_his_spark.plans.queries_events2 import events_gapfill_locf
    from etl_his_spark.sources.readers import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    mn = min(r.ts for r in ev).date()
    mx = max(r.ts for r in ev).date()
    users = sorted({r.user_id for r in ev})
    daily: dict[tuple, int] = {}
    for r in ev:
        if r.value is None:
            continue
        k = (r.user_id, r.ts.date())
        c = round(r.value * 100)
        daily[k] = max(daily.get(k, c), c)
    want = {}
    for u in users:
        last = None
        d = mn
        while d <= mx:
            obs = daily.get((u, d))
            if obs is not None:
                last = obs
            want[(u, d)] = (
                None if last is None else last / 100,
                obs is not None,
            )
            d += timedelta(days=1)
    got = {
        (r.user_id, r.day): (r.value_filled, r.is_observed)
        for r in events_gapfill_locf(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (v, o) in want.items():
        gv, go = got[k]
        assert go == o, k
        if v is None:
            assert gv is None, k
        else:
            assert gv == pytest.approx(v, abs=1e-9), k


def test_collocations_pmi_matches_python_reference(spark, sf_dir):
    from etl_his_spark.plans.queries_text2 import text_collocations_pmi
    from etl_his_spark.sources.readers import read_table

    docs = [
        r.text
        for r in read_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
        if r.text is not None
    ]
    toks = [[t for t in txt.strip().split(" ") if t] for txt in docs]
    uni = Counter(t for ts in toks for t in ts)
    big = Counter(
        (ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1)
    )
    n_uni = sum(uni.values())
    n_bg = sum(big.values())
    scored = []
    for (w1, w2), c_ab in big.items():
        if c_ab < 5:
            continue
        # the query's exact left-associative double chain
        pmi = round(float(c_ab) * n_uni / uni[w1] * n_uni / uni[w2] / n_bg, 6)
        scored.append((-pmi, w1, w2, c_ab, uni[w1], uni[w2]))
    scored.sort()
    want = [
        (w1, w2, c_ab, c_a, c_b, -neg)
        for neg, w1, w2, c_ab, c_a, c_b in scored[:50]
    ]
    got = [
        (r.w1, r.w2, r.c_ab, r.c_a, r.c_b, r.pmi_ratio)
        for r in text_collocations_pmi(spark, sf_dir).collect()
    ]
    assert got == want
    # a collocation actually beats independence on this corpus
    assert want[0][5] > 1.0


def test_phrase_match_matches_python_reference(spark, sf_dir):
    from etl_his_spark.plans.queries_text2 import (
        PHRASES,
        retrieval_phrase_match,
    )
    from etl_his_spark.sources.readers import read_table

    docs = {
        r.doc_id: r.text
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
        if r.text is not None
    }
    want: Counter = Counter()
    for d, txt in docs.items():
        ts = [t for t in txt.strip().split(" ") if t]
        for i in range(len(ts) - 1):
            for p1, p2, label in PHRASES:
                if ts[i] == p1 and ts[i + 1] == p2:
                    want[(d, label)] += 1
    got = {
        (r.doc_id, r.phrase): r.n_matches
        for r in retrieval_phrase_match(spark, sf_dir).collect()
    }
    assert got == dict(want)
    assert len(got) > 0


def test_skipgram_pairs_matches_python_reference(spark, sf_dir):
    from etl_his_spark.plans.queries_training import training_skipgram_pairs
    from etl_his_spark.sources.readers import read_table

    docs = [
        r.text
        for r in read_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
        if r.text is not None
    ]
    want: dict = {}
    for txt in docs:
        ts = [t for t in txt.strip().split(" ") if t]
        for i in range(len(ts)):
            for d in (1, 2):
                if i + d < len(ts):
                    for a, b in ((ts[i], ts[i + d]), (ts[i + d], ts[i])):
                        n, n1, n2 = want.get((a, b), (0, 0, 0))
                        want[(a, b)] = (
                            n + 1,
                            n1 + (d == 1),
                            n2 + (d == 2),
                        )
    want = {k: v for k, v in want.items() if v[0] >= 5}
    got = {
        (r.w_center, r.w_context): (r.n_pairs, r.n_d1, r.n_d2)
        for r in training_skipgram_pairs(spark, sf_dir).collect()
    }
    assert got == want
    # symmetry: the undirected emission makes (a,b) and (b,a) counts equal
    for (a, b), (n, _, _) in want.items():
        assert want[(b, a)][0] == n


def test_skipgram_pairs_edge_docs(spark, tmp_path):
    """Pin the short-document edges the sf fixtures may not exercise:
    1-token docs emit nothing, 2-token docs emit only distance-1 pairs
    (the distance-2 slice degenerates to an EMPTY array, not an error),
    and empty/whitespace/NULL texts drop out — on the real query AND
    its DuckDB oracle (generate_series(1, 0) must be empty there too)."""
    import duckdb

    from etl_his_spark.registry import ORACLES, QUERIES

    docs = [(1, "solo"), (2, "two words"), (3, ""), (4, "   "),
            (5, None), (6, "a b c")]
    # repeat the corpus 5x so every pair clears the min-support 5
    df = spark.createDataFrame(
        [(d + 10 * i, t) for i in range(5) for d, t in docs],
        "doc_id long, text string",
    )
    out = str(tmp_path / "skipgram")
    df.write.parquet(f"{out}/documents.parquet")
    got = sorted(
        (r.w_center, r.w_context, r.n_pairs, r.n_d1, r.n_d2)
        for r in QUERIES["training_skipgram_pairs"](spark, out).collect()
    )
    want = sorted([
        ("two", "words", 5, 5, 0), ("words", "two", 5, 5, 0),
        ("a", "b", 5, 5, 0), ("b", "a", 5, 5, 0),
        ("b", "c", 5, 5, 0), ("c", "b", 5, 5, 0),
        ("a", "c", 5, 0, 5), ("c", "a", 5, 0, 5),
    ])
    assert got == want
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet/*.parquet')"
    )
    oracle = sorted(
        tuple(r)
        for r in con.execute(ORACLES["training_skipgram_pairs"]).fetchall()
    )
    assert oracle == want


def test_negative_sampling_matches_python_reference(spark, sf_dir):
    from etl_his_spark.plans.queries_training import (
        training_negative_sampling,
    )
    from etl_his_spark.sources.readers import read_table

    docs = [
        r.text
        for r in read_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
        if r.text is not None
    ]
    uni = Counter(
        t for txt in docs for t in txt.strip().split(" ") if t
    )
    # the query's chain: c^0.75 = sqrt(sqrt(c^3)) in doubles, then
    # HALF_UP round to integer micro-units (floor(x+0.5) emulates
    # Spark/DuckDB half-away for positives; Python round() is banker's)
    wq = {
        t: math.floor(
            math.sqrt(math.sqrt(float(c) * c * c)) * 1_000_000 + 0.5
        )
        for t, c in uni.items()
    }
    total = sum(wq.values())
    rows = training_negative_sampling(spark, sf_dir).collect()
    assert len(rows) == len(uni)
    cum = 0
    for r in sorted(rows, key=lambda r: r.tok):
        assert r.c == uni[r.tok]
        assert r.w_micro == wq[r.tok], r.tok
        assert r.cum_lo == cum
        cum += r.w_micro
        assert r.cum_hi == cum
        assert r.share == pytest.approx(r.w_micro / total, abs=0)
    # ranges tile [0, total) exactly — a sampler can binary-search any
    # uniform draw into exactly one token
    assert cum == total


def test_interval_coverage_matches_python_reference(spark, sf_dir):
    from datetime import timedelta

    from etl_his_spark.plans.queries_events2 import events_interval_coverage
    from etl_his_spark.sources.readers import read_table

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .collect()
    )
    per_user: dict[int, list] = {}
    dur = timedelta(minutes=30)
    for r in ev:
        per_user.setdefault(r.user_id, []).append(
            (r.ts, r.ts + dur, r.event_id)
        )
    want = {}
    for u, iv in per_user.items():
        iv.sort()
        islands = []
        cur_s, cur_e = iv[0][0], iv[0][1]
        for s, e, _ in iv[1:]:
            if s > cur_e:
                islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        covered = sum(
            int((e - s) / timedelta(microseconds=1)) for s, e in islands
        )
        want[u] = (len(islands), covered)
    got = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in events_interval_coverage(spark, sf_dir).collect()
    }
    assert got == want
    # at least one user actually merged overlapping intervals
    assert any(
        n < len(per_user[u]) for u, (n, _) in want.items()
    )
