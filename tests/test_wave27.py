"""Wave 27: calendar dim (x207), array set ops (x208), bitmap flags
(x209)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_calendar_dim_python_replay(spark, sf_dir):
    import calendar

    from go_mapreduce_spark.operators.relational_ext import x207_calendar_dim

    for r in x207_calendar_dim(spark, sf_dir).limit(300).collect():
        d = r.d
        assert (r.yr, r.qtr, r.mon, r.dom) == (
            d.year,
            (d.month - 1) // 3 + 1,
            d.month,
            d.day,
        )
        assert r.iso_dow == d.isoweekday()
        last = datetime.date(
            d.year, d.month, calendar.monthrange(d.year, d.month)[1]
        )
        assert r.month_end == last
        assert r.days_to_month_end == (last - d).days
        # add_months clamps into the target month
        ty, tm = (d.year, d.month + 3) if d.month <= 9 else (d.year + 1, d.month - 9)
        td = min(d.day, calendar.monthrange(ty, tm)[1])
        assert r.next_qtr_day == datetime.date(ty, tm, td)


def test_array_set_ops_cover_catalogue(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x208_array_set_ops

    for r in x208_array_set_ops(spark, sf_dir).collect():
        missing = r.missing_types.split(",") if r.missing_types else []
        assert r.n_types + len(missing) == 5
        assert 0 <= r.n_funnel_types <= 3
        assert missing == sorted(missing)


def test_bitmap_flags_match_type_sets(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import (
        _TYPE_BITS,
        x209_bitmap_flags,
    )
    from go_mapreduce_spark.sources.registry import load_table

    types = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    ):
        types.setdefault(r.user_id, set()).add(r.event_type)
    for r in x209_bitmap_flags(spark, sf_dir).collect():
        mask = sum(1 << _TYPE_BITS[t] for t in types[r.user_id])
        assert r.presence_mask == mask
        assert r.n_types == len(types[r.user_id])
