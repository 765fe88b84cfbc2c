"""Wave-78 WAP branch tests: staging isolation, abort, publish,
rebase-over-concurrent-append, batch idempotence."""

from __future__ import annotations

import os
import tempfile

import pytest

from go_mapreduce_spark import lakehouse as LH


@pytest.fixture()
def wap_table(spark):
    root = tempfile.mkdtemp(prefix="gms_wap_test_")
    base = spark.createDataFrame(
        [(i, "O", 100.0 + i) for i in range(20)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )
    LH.create_table(spark, base, root, key_col="o_orderkey")
    yield root
    import shutil

    shutil.rmtree(root, ignore_errors=True)


def _staged_df(spark, lo, hi, status="O"):
    return spark.createDataFrame(
        [(i, status, 1000.0 + i) for i in range(lo, hi)],
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
    )


def test_staging_is_invisible_to_main(spark, wap_table):
    LH.stage_append(spark, _staged_df(spark, 100, 110), wap_table, "b")
    assert LH.current_version(wap_table) == 1
    assert LH.read_table(spark, wap_table).count() == 20
    assert LH.read_branch(spark, wap_table, "b").count() == 30
    assert LH.staged_rows(spark, wap_table, "b").count() == 10


def test_audit_counts_violations_pessimistically(spark, wap_table):
    df = _staged_df(spark, 100, 110).unionByName(
        spark.createDataFrame(
            [(200, None, -5.0)],
            "o_orderkey bigint, o_orderstatus string, o_totalprice double",
        )
    )
    LH.stage_append(spark, df, wap_table, "b")
    rep = LH.audit_branch(
        spark,
        wap_table,
        "b",
        {"pos": "o_totalprice > 0", "status": "o_orderstatus = 'O'"},
    )
    assert rep["n_staged"] == 11
    assert rep["violations"]["pos"] == 1
    # NULL status row counts as a violation (pessimistic audit)
    assert rep["violations"]["status"] == 1


def test_abort_leaves_no_trace(spark, wap_table):
    LH.stage_append(spark, _staged_df(spark, 100, 110), wap_table, "b")
    LH.abort_branch(wap_table, "b")
    assert not os.path.exists(LH._branch_manifest_path(wap_table, "b"))
    assert not os.path.isdir(LH._branch_dir(wap_table, "b"))
    assert LH.read_table(spark, wap_table).count() == 20
    # double-abort is a no-op
    LH.abort_branch(wap_table, "b")


def test_publish_folds_and_cleans(spark, wap_table):
    LH.stage_append(
        spark, _staged_df(spark, 100, 110), wap_table, "b", batch_id="w1"
    )
    v = LH.publish_branch(spark, wap_table, "b")
    assert v == 2 and LH.current_version(wap_table) == 2
    t = LH.read_table(spark, wap_table)
    assert t.count() == 30
    assert t.filter("o_orderkey >= 100").count() == 10
    assert not os.path.exists(LH._branch_manifest_path(wap_table, "b"))
    # time travel still sees the pre-publish snapshot
    assert LH.read_table(spark, wap_table, version=1).count() == 20


def test_publish_rebases_over_concurrent_append(spark, wap_table):
    LH.stage_append(
        spark, _staged_df(spark, 100, 110), wap_table, "b", batch_id="w1"
    )
    # a main-branch append lands AFTER staging
    LH.append_table(spark, _staged_df(spark, 50, 55), wap_table, "main1")
    assert LH.current_version(wap_table) == 2
    v = LH.publish_branch(spark, wap_table, "b")
    assert v == 3
    t = LH.read_table(spark, wap_table)
    assert t.count() == 35  # 20 base + 5 concurrent + 10 staged
    assert t.filter("o_orderkey >= 100").count() == 10


def test_publish_is_batch_idempotent(spark, wap_table):
    LH.stage_append(
        spark, _staged_df(spark, 100, 110), wap_table, "b", batch_id="w1"
    )
    assert LH.publish_branch(spark, wap_table, "b") == 2
    # a crashed publisher re-stages and re-publishes the same batch
    LH.stage_append(
        spark, _staged_df(spark, 100, 110), wap_table, "b", batch_id="w1"
    )
    assert LH.publish_branch(spark, wap_table, "b") == 2  # no-op
    assert LH.read_table(spark, wap_table).count() == 30  # no duplicates
    assert not os.path.exists(LH._branch_manifest_path(wap_table, "b"))


def test_restage_replaces_previous_staging(spark, wap_table):
    LH.stage_append(spark, _staged_df(spark, 100, 110), wap_table, "b")
    LH.stage_append(spark, _staged_df(spark, 200, 203), wap_table, "b")
    assert LH.staged_rows(spark, wap_table, "b").count() == 3
    v = LH.publish_branch(spark, wap_table, "b")
    assert v == 2
    t = LH.read_table(spark, wap_table)
    assert t.count() == 23
    assert t.filter("o_orderkey >= 200").count() == 3
    assert t.filter("o_orderkey between 100 and 199").count() == 0


def test_stage_rejects_schema_mismatch(spark, wap_table):
    bad = spark.createDataFrame([(1, "x")], "o_orderkey bigint, other string")
    with pytest.raises(ValueError, match="schema"):
        LH.stage_append(spark, bad, wap_table, "b")
