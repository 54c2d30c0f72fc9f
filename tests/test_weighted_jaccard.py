"""IDF-weighted Jaccard + weighted MinHash (r10-gate machinery,
behavior pinned ahead of registration).

The property these operators exist for: boilerplate shared by many
docs should NOT make a pair look like a near-dup, while shared rare
content SHOULD. Weights are a global integer function of the shingle
(IDF buckets), which is exactly what makes the replication-based
weighted MinHash an unbiased estimator of weighted Jaccard.
"""

from __future__ import annotations

import itertools

from etl_his_spark.operators.dedup_approx import (
    IDF_WEIGHT_BUCKETS,
    shingle_idf_weights,
    shingle_rows,
    weighted_jaccard_pairs,
    weighted_minhash_signatures,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _python_weighted_jaccard(texts: dict[int, str], df_cap: int = 64):
    """Reference: 3-gram shingles, IDF-bucket weights, pairwise J_w."""
    shingles = {
        d: {
            " ".join(ws[i : i + 3])
            for i in range(len(ws) - 2)
        }
        for d, t in texts.items()
        for ws in [[w for w in t.strip().split(" ") if w]]
    }
    df: dict[str, int] = {}
    for s in itertools.chain.from_iterable(shingles.values()):
        df[s] = df.get(s, 0) + 1

    def weight(s):
        for lim, wt in IDF_WEIGHT_BUCKETS:
            if df[s] <= lim:
                return wt
        return 1

    totals = {d: sum(weight(s) for s in ss) for d, ss in shingles.items()}
    out = {}
    for a, b in itertools.combinations(sorted(shingles), 2):
        shared = {
            s for s in shingles[a] & shingles[b] if df[s] <= df_cap
        }
        sw = sum(weight(s) for s in shared)
        if sw:
            out[(a, b)] = sw * 1_000_000 // (totals[a] + totals[b] - sw)
    return out


def test_weighted_jaccard_matches_python_reference(spark):
    base = ["w%d x%d y%d" % (i, i, i) for i in range(12)]
    boiler = "copyright footer all rights reserved site map"
    texts = {
        1: " ".join(base[:8]) + " " + boiler,
        2: " ".join(base[:8]) + " " + boiler,          # heavy rare overlap
        3: " ".join(base[8:]) + " " + boiler,          # only boilerplate shared
        4: "totally different content here entirely now",
    }
    got = {
        (r["a_id"], r["b_id"]): r["wjacc_micro"]
        for r in weighted_jaccard_pairs(
            _docs(spark, list(texts.items())), threshold_micro=1
        ).collect()
    }
    ref = _python_weighted_jaccard(texts)
    assert got == {k: v for k, v in ref.items() if v >= 1}


def test_boilerplate_downweighted_vs_rare_content(spark):
    """Two pairs with the SAME raw shingle overlap size: the pair
    sharing rare content scores strictly higher than the pair sharing
    corpus-wide boilerplate."""
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7"
    rare = "r0 r1 r2 r3 r4 r5 r6 r7"
    rows = [(i, f"u{i}a u{i}b u{i}c " + boiler) for i in range(1, 9)]
    rows += [
        (100, "p0 p1 p2 " + rare),
        (101, "q0 q1 q2 " + rare),
    ]
    pairs = {
        (r["a_id"], r["b_id"]): r["wjacc_micro"]
        for r in weighted_jaccard_pairs(
            _docs(spark, rows), threshold_micro=1
        ).collect()
    }
    rare_score = pairs[(100, 101)]
    boiler_scores = [v for (a, b), v in pairs.items() if b <= 8]
    assert boiler_scores and rare_score > max(boiler_scores)


def test_idf_weights_buckets(spark):
    rows = [(i, "shared common words here plus u%d" % i) for i in range(5)]
    sh = shingle_rows(_docs(spark, rows))
    w = {
        r["shingle"]: r["w"]
        for r in shingle_idf_weights(sh).collect()
    }
    dfs = (
        sh.groupBy("shingle").count().collect()
    )
    for r in dfs:
        df = r["count"]
        expect = next(
            (wt for lim, wt in IDF_WEIGHT_BUCKETS if df <= lim), 1
        )
        assert w[r["shingle"]] == expect


def test_weighted_minhash_tracks_weighted_jaccard(spark):
    """Signature agreement (fraction of equal mh components) is a
    16-sample estimate of J_w: require the rare-content pair's
    agreement to exceed the boilerplate pair's (the ordering the
    weighting exists to produce), and both within a loose +-0.35
    band of exact J_w."""
    boiler = " ".join(f"b{i}" for i in range(10))
    rare = " ".join(f"r{i}" for i in range(10))
    rows = [(i, f"u{i}x u{i}y u{i}z " + boiler) for i in range(1, 13)]
    rows += [(100, "pp qq rr " + rare), (101, "ss tt uu " + rare)]
    df = _docs(spark, rows)
    sigs = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(16)]
        for r in weighted_minhash_signatures(df).collect()
    }
    exact = {
        (r["a_id"], r["b_id"]): r["wjacc_micro"] / 1e6
        for r in weighted_jaccard_pairs(df, threshold_micro=1).collect()
    }

    def agree(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / 16.0

    rare_pair = agree(100, 101)
    boiler_pair = agree(1, 2)
    assert rare_pair > boiler_pair
    assert abs(rare_pair - exact[(100, 101)]) <= 0.35
    assert abs(boiler_pair - exact.get((1, 2), 0.0)) <= 0.35
