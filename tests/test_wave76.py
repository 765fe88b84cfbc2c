"""Wave-76 property tests: FD anchor + violation accounting, MASE
identity, information-gain bounds."""

from __future__ import annotations

from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import stats as ST


def test_x360_fd_accounting(spark, sf_dir):
    rows = {r.candidate: r for r in C.x360_fd_audit(spark, sf_dir).collect()}
    assert set(rows) == {c[0] for c in C.FD_CANDIDATES}
    # the key-determinant anchor must hold exactly
    anchor = rows["orders.o_orderkey->o_orderstatus"]
    assert anchor.holds == 1 and anchor.n_violating == 0
    assert anchor.max_fanout == 1
    for r in rows.values():
        assert 0 <= r.n_violating <= r.n_keys
        assert r.max_fanout >= 1
        assert (r.holds == 1) == (r.n_violating == 0)
        assert abs(r.violation_rate - r.n_violating / r.n_keys) < 1e-5
        # >1 max fanout implies at least one violating key and
        # vice versa
        assert (r.max_fanout > 1) == (r.n_violating > 0)
    # multi-line orders ship on different days: must NOT hold
    assert rows["lineitem.l_orderkey->l_shipdate"].holds == 0


def test_x361_mase_identity(spark, sf_dir):
    r = ST.x361_seasonal_backtest(spark, sf_dir).collect()[0]
    assert r.n_eval > 30
    assert r.mae_naive1 > 0 and r.mae_seasonal7 > 0
    assert abs(r.mase - r.mae_seasonal7 / r.mae_naive1) < 1e-4
    assert abs(r.improvement_pct - (1.0 - r.mase) * 100.0) < 1e-3


def test_x362_infogain_bounds(spark, sf_dir):
    rows = sorted(
        ST.x362_infogain_ranking(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert [r.feature for r in rows] != [] and len(rows) == 3
    assert {r.feature for r in rows} == {"dow", "month", "segment"}
    h_label = rows[0].h_label
    assert len({r.h_label for r in rows}) == 1 and h_label > 0
    gains = [r.info_gain for r in rows]
    # ranked descending by gain
    assert gains == sorted(gains, reverse=True)
    for r in rows:
        # 0 <= IG <= H(label); conditional entropy can't exceed prior
        assert -1e-6 <= r.info_gain <= h_label + 1e-6
        assert 0.0 <= r.h_cond <= h_label + 1e-6
        assert r.n_values > 1
        # gain ratio shares IG's sign and is bounded by |IG|/ln(2)-ish
        # only sanity: finite and small for a near-independent grid
        assert abs(r.gain_ratio) < 1.0
