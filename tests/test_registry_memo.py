"""Session-keyed load_table memo (round-13: the round-12 advice fix).

The DataFrame-handle memo and the configured-confs flag must be tied
to the live SparkSession OBJECT, not a module dict keyed on id():
id() of a collected session can be reused by a new one, which would
hand the new session a dead plan handle or silently skip the
mandatory nanosAsLong/UTC conf setup.
"""

from __future__ import annotations

import os
import shutil

from go_mapreduce_spark.sources import registry
from go_mapreduce_spark.sources.registry import load_table


def test_memo_hit_same_session(spark, sf_dir):
    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")
    assert a is b
    # the memo lives on the session object itself, so it dies with it
    memo = getattr(spark, registry._DF_MEMO_ATTR)
    assert any(os.path.join(sf_dir, "nation.parquet") in k[0] for k in memo)


def test_new_session_reapplies_confs_and_misses_memo(spark, sf_dir):
    a = load_table(spark, sf_dir, "nation")
    s2 = spark.newSession()
    try:
        # a fresh session starts unconfigured and with no memo
        s2.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert not getattr(s2, registry._CONF_SENTINEL, False)
        b = load_table(s2, sf_dir, "nation")
        # confs were (re-)applied on the NEW session, not skipped
        assert s2.conf.get("spark.sql.session.timeZone") == "UTC"
        # and the handle is s2's own, never the other session's
        assert b is not a
        assert b.sparkSession is s2
        assert load_table(s2, sf_dir, "nation") is b
        assert b.count() == a.count()
    finally:
        # newSession shares the SparkContext; nothing to stop, but
        # leave the shared session's tz untouched for later tests
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_directory_layout_not_memoized(spark, sf_dir, tmp_path):
    # a directory-style <name>.parquet can be rewritten in place
    # without bumping the dir mtime — it must fall through to fresh
    # inference on every call instead of serving a stale handle
    alt = tmp_path / "sfalt"
    alt.mkdir()
    dir_table = alt / "nation.parquet"
    dir_table.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "nation.parquet"), dir_table / "part-0.parquet"
    )
    a = load_table(spark, str(alt), "nation")
    b = load_table(spark, str(alt), "nation")
    assert a is not b
    assert a.count() == b.count()
