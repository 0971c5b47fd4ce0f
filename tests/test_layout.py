"""Force Atlas 2 layout — quality, determinism, and mode coverage pins.

Reference parity: ``layout/force_atlas2.py:18-168`` and the reference's
own quality gate (``tests/test_force_atlas2.py`` scores the layout by
how well it separates known communities).  A force layout has no exact
oracle — positions are seed- and float-order-dependent — so these tests
pin the PROPERTIES the reference asserts: connected structure ends up
closer than unconnected structure, disconnected components separate,
every documented mode runs, and the hash-seeded init makes runs
reproducible.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import karate_edges
from cugraph_spark import LinkGraph
from cugraph_spark.operators import attraction_at_hash_init, force_atlas2


@pytest.fixture(scope="module")
def karate(spark):
    rows = [(int(s), int(d)) for s, d in karate_edges()]
    e = spark.createDataFrame(rows, "src long, dst long")
    return LinkGraph.from_edges(e, directed=False)


def _dist_stats(pos: dict, edges: list[tuple[int, int]]):
    """(mean edge length, mean non-edge pair distance)."""
    eset = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    ids = sorted(pos)
    ed, ned = [], []
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            d = float(np.hypot(pos[u][0] - pos[v][0], pos[u][1] - pos[v][1]))
            (ed if (u, v) in eset else ned).append(d)
    return float(np.mean(ed)), float(np.mean(ned))


def test_layout_pulls_edges_together(spark, karate):
    pos_df = force_atlas2(karate, max_iter=50).toPandas()
    assert len(pos_df) == 34
    assert np.isfinite(pos_df[["x", "y"]].to_numpy()).all()
    pos = {int(r.vertex): (r.x, r.y) for r in pos_df.itertuples()}
    mean_edge, mean_non = _dist_stats(pos, karate_edges())
    # FA2's defining property: adjacent vertices sit closer than the
    # average unconnected pair
    assert mean_edge < mean_non, (mean_edge, mean_non)


def test_disconnected_cliques_separate(spark):
    # two 8-cliques, no bridge: repulsion + intra-clique attraction must
    # place the cliques apart with each clique tighter than the gap
    rows = []
    for base in (0, 100):
        for i in range(8):
            for j in range(8):
                if i != j:
                    rows.append((base + i, base + j))
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src long, dst long"), directed=False
    )
    pos = force_atlas2(g, max_iter=60).toPandas()
    a = pos[pos.vertex < 100][["x", "y"]].to_numpy()
    b = pos[pos.vertex >= 100][["x", "y"]].to_numpy()
    gap = float(np.hypot(*(a.mean(axis=0) - b.mean(axis=0))))
    spread = max(
        float(np.linalg.norm(a - a.mean(axis=0), axis=1).mean()),
        float(np.linalg.norm(b - b.mean(axis=0), axis=1).mean()),
    )
    assert gap > 2.0 * spread, (gap, spread)


def test_deterministic_across_runs(spark, karate):
    p1 = force_atlas2(karate, max_iter=10).toPandas().sort_values("vertex")
    p2 = force_atlas2(karate, max_iter=10).toPandas().sort_values("vertex")
    assert np.allclose(p1[["x", "y"]].to_numpy(), p2[["x", "y"]].to_numpy(), rtol=1e-9)


def test_modes_run_and_differ(spark, karate):
    base = force_atlas2(karate, max_iter=5).toPandas().sort_values("vertex")
    for kw in (
        {"lin_log_mode": True},
        {"strong_gravity_mode": True},
        {"outbound_attraction_distribution": False},
        {"barnes_hut_optimize": False},
        {"edge_weight_influence": 0.0},
    ):
        p = force_atlas2(karate, max_iter=5, **kw).toPandas().sort_values("vertex")
        assert len(p) == 34 and np.isfinite(p[["x", "y"]].to_numpy()).all(), kw
        if "barnes_hut_optimize" not in kw and "edge_weight_influence" not in kw:
            # each mode changes the physics, so positions must move
            assert not np.allclose(
                base[["x", "y"]].to_numpy(), p[["x", "y"]].to_numpy()
            ), kw


def test_exact_and_grid_agree_early(spark, karate):
    # after a few iterations the grid far-field (theta=0.5) should stay
    # close to the exact O(V^2) force path on a 34-vertex graph
    pg = force_atlas2(karate, max_iter=3).toPandas().sort_values("vertex")
    pe = (
        force_atlas2(karate, max_iter=3, barnes_hut_optimize=False)
        .toPandas()
        .sort_values("vertex")
    )
    ga = pg[["x", "y"]].to_numpy()
    ea = pe[["x", "y"]].to_numpy()
    denom = float(np.abs(ea).mean())
    assert float(np.abs(ga - ea).mean()) / denom < 0.15


def test_pos_list_warm_start(spark, karate):
    seed = force_atlas2(karate, max_iter=5).select("vertex", "x", "y")
    out = force_atlas2(karate, max_iter=5, pos_list=seed).toPandas()
    assert len(out) == 34 and np.isfinite(out[["x", "y"]].to_numpy()).all()


def test_prevent_overlapping_raises(spark, karate):
    with pytest.raises(NotImplementedError):
        force_atlas2(karate, prevent_overlapping=True)


def test_callback_hooks(spark, karate):
    calls = []

    class CB:
        def on_preprocess_end(self, pos):
            calls.append(("pre", len(pos)))

        def on_epoch_end(self, pos):
            calls.append(("epoch", len(pos)))

        def on_train_end(self, pos):
            calls.append(("end", len(pos)))

    force_atlas2(karate, max_iter=2, callback=CB())
    assert calls == [("pre", 34), ("epoch", 34), ("epoch", 34), ("end", 34)]


def test_attraction_snapshot_matches_numpy(spark, karate):
    got = attraction_at_hash_init(karate).toPandas().set_index("vertex")
    HA, HB, P = 48611, 102953, 1_000_003
    x0 = lambda v: (HA * (v + 7919) + HB) % P
    y0 = lambda v: (HB * (v + 7919) + HA) % P
    und = {(min(u, v), max(u, v)) for u, v in karate_edges() if u != v}
    nbrs = {}
    for u, v in und:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    for u in sorted(nbrs):
        ax = sum(x0(v) - x0(u) for v in nbrs[u])
        ay = sum(y0(v) - y0(u) for v in nbrs[u])
        r = got.loc[u]
        assert (int(r.ax), int(r.ay), int(r.x0), int(r.y0)) == (
            ax,
            ay,
            x0(u),
            y0(u),
        ), u
