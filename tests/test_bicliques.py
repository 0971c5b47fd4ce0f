"""find_bicliques tests — parity against a pure-pandas reimplementation of
the reference's greedy feature-major loop
(``experimental/structure/bicliques.py:20-150``), with our documented
deterministic tie-break (degree DESC, feature id ASC) applied to both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cugraph_spark.operators.bicliques import find_bicliques


def _oracle(rows, k, offset=0, max_iter=-1, support=1.0, min_features=1,
            min_machines=10):
    """Literal restatement of the reference loop (host-side, small data)."""
    df = pd.DataFrame(rows, columns=["src", "dst", "flag"])
    df["dst"] = df["dst"] - offset
    feat = df.groupby("dst").size().reset_index(name="count")
    feat = feat.sort_values(
        ["count", "dst"], ascending=[False, True]
    ).reset_index(drop=True)
    iters = len(feat) if max_iter == -1 else min(max_iter, len(feat))
    old = None
    answer = 0
    B, S = [], []
    for i in range(iters):
        f = int(feat["dst"][i])
        deg = int(feat["count"][i])
        machines = df[df["dst"] == f][["src", "flag"]]
        mset = set(machines["src"])
        if old is None or mset != old:
            all_feats = df[df["src"].isin(mset)]
            ic = all_feats.groupby("dst").size().reset_index(name="count")
            goal = int(deg * support)
            c = ic[ic["count"] >= goal]
            if len(c) > min_features and len(machines) >= min_machines:
                for s_ in machines["src"]:
                    B.append((answer, int(s_), 0))
                for g_ in c["dst"]:
                    B.append((answer, int(g_), 1))
                nbad = int((machines["flag"] == 1).sum())
                total = len(machines) + len(c)
                S.append((answer, total, len(machines), len(c), nbad / total))
                answer += 1
        old = mset
        if k > -1 and answer == k:
            break
    return B, S


def _dataset():
    """Bipartite machine→feature edges with: overlapping feature machine
    sets, two features with IDENTICAL machine sets adjacent in scan order
    (consecutive-dedup case), flags on some machines."""
    rng = np.random.default_rng(5)
    rows = set()
    # features 100..109, machines 0..24
    for f in range(100, 110):
        n = 4 + int(rng.integers(0, 10))
        for m in rng.choice(25, size=n, replace=False):
            rows.add((int(m), f))
    # two features with identical machine sets (same degree → adjacent)
    same = [0, 1, 2, 3, 4, 5, 6]
    for f in (110, 111):
        for m in same:
            rows.add((m, f))
    out = [(m, f, 1 if m % 5 == 0 else 0) for m, f in sorted(rows)]
    return out


def _compare(spark, rows, **kw):
    df = spark.createDataFrame(rows, "src LONG, dst LONG, flag LONG")
    B, S = find_bicliques(df, **kw)
    got_b = {(r["id"], r["vert"], r["type"]) for r in B.collect()}
    got_s = sorted(
        (r["id"], r["total"], r["machines"], r["features"], r["bad_ratio"])
        for r in S.collect()
    )
    exp_b_list, exp_s = _oracle(rows, **kw)
    assert got_b == set(exp_b_list)
    assert len(got_s) == len(exp_s)
    for g, e in zip(got_s, sorted(exp_s)):
        assert g[:4] == e[:4]
        assert g[4] == pytest.approx(e[4], abs=1e-12)
    return got_s


def test_bicliques_full_run(spark):
    rows = _dataset()
    # support < 1 so co-features beyond the seed feature qualify — at
    # support=1.0 n_feat is almost always 1 and min_features=1 emits nothing
    stats = _compare(spark, rows, k=-1, support=0.5, min_machines=4,
                     min_features=1)
    assert len(stats) > 1  # the dataset actually emits several bicliques


def test_bicliques_consecutive_dedup(spark):
    # features 110/111 share one machine set; only ONE may be emitted
    rows = _dataset()
    df_rows = [(m, f, fl) for m, f, fl in rows if f >= 110]
    stats = _compare(spark, df_rows, k=-1, min_machines=3, min_features=0)
    assert len(stats) == 1


def test_bicliques_k_and_max_iter_bounds(spark):
    rows = _dataset()
    s_all = _compare(spark, rows, k=-1, min_machines=4)
    s_k = _compare(spark, rows, k=2, min_machines=4)
    assert len(s_k) == min(2, len(s_all))
    _compare(spark, rows, k=-1, max_iter=3, min_machines=4)


def test_bicliques_support_and_offset(spark):
    rows = _dataset()
    _compare(spark, rows, k=-1, support=0.6, min_machines=4, min_features=2)
    _compare(spark, rows, k=-1, offset=100, min_machines=4)


def test_bicliques_input_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    with pytest.raises(NameError, match="flag"):
        find_bicliques(df, k=1)
    df2 = spark.createDataFrame([(0, 1, 0)], "src LONG, dst LONG, flag LONG")
    with pytest.raises(NameError, match="support"):
        find_bicliques(df2, k=1, support=0.01)
