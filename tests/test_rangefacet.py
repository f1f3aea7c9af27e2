"""DateMathParser + facet.range (Solr range faceting with gaps)."""

from datetime import datetime

import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.functions.datemath import (
    add_months,
    parse_date_math,
    parse_gap,
)
from lucene_solr_8_7_0_spark.operators.rangefacet import (
    range_facet,
    range_facet_date,
)


def test_date_math_parser():
    base = "2024-01-03T12:34:56.789Z"
    cases = {
        base: datetime(2024, 1, 3, 12, 34, 56, 789000),
        "2024-01-03": datetime(2024, 1, 3),
        base + "/DAY": datetime(2024, 1, 3),
        base + "/HOUR": datetime(2024, 1, 3, 12),
        base + "/MONTH": datetime(2024, 1, 1),
        base + "/YEAR": datetime(2024, 1, 1),
        base + "/DAY+2DAYS": datetime(2024, 1, 5),
        base + "/DAY-1DAY": datetime(2024, 1, 2),
        base + "/MINUTE+30MINUTES": datetime(2024, 1, 3, 13, 4),
        "2024-01-31T00:00:00Z+1MONTH": datetime(2024, 2, 29),  # clamp, leap
        "2023-01-31T00:00:00Z+1MONTH": datetime(2023, 2, 28),
        "2024-03-31T00:00:00Z-1MONTH": datetime(2024, 2, 29),
        "2024-01-01T00:00:00Z+1YEAR/YEAR": datetime(2025, 1, 1),
        base + "/SECOND": datetime(2024, 1, 3, 12, 34, 56),
        base + "+500MILLIS": datetime(2024, 1, 3, 12, 34, 57, 289000),
    }
    for expr, want in cases.items():
        assert parse_date_math(expr) == want, expr
    now = datetime(2024, 6, 15, 10, 30)
    assert parse_date_math("NOW/DAY", now) == datetime(2024, 6, 15)
    assert parse_date_math("NOW/DAY+6MONTHS+3DAYS", now) == datetime(
        2024, 12, 18
    )
    for bad in ["NOW", "2024-13-01", "x", "NOW/5DAYS", "NOW+DAYS",
                "NOW+3FOO"]:
        with pytest.raises(ValueError):
            parse_date_math(bad, None if bad == "NOW" else now)
    assert parse_gap("+3DAYS") == (0, 3 * 86400.0)
    assert parse_gap("+90MINUTES") == (0, 5400.0)
    assert parse_gap("+2MONTHS") == (2, 0.0)
    assert parse_gap("+1YEAR") == (12, 0.0)
    assert add_months(datetime(2024, 1, 31), 1) == datetime(2024, 2, 29)


def test_numeric_range_facet(spark):
    vals = [-5.0, 0.0, 2.5, 4.9, 5.0, 7.0, 12.0, 14.9, 15.0, 23.0, 100.0]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = {
        r["bucket"]: r["count"]
        for r in range_facet(df, "v", 0, 15, 5).collect()
    }
    # buckets [0,5) [5,10) [10,15); soft end == 15 here (gap divides)
    assert got == {"0": 3, "5": 2, "10": 2, "before": 1, "after": 3,
                   "between": 7}
    # gap NOT dividing the span: last bucket overshoots unless hardend
    soft = {
        r["bucket"]: r["count"]
        for r in range_facet(df, "v", 0, 14, 5).collect()
    }
    assert soft["10"] == 2 and soft["after"] == 3  # [10,15) soft end
    hard = {
        r["bucket"]: r["count"]
        for r in range_facet(df, "v", 0, 14, 5, hardend=True).collect()
    }
    assert hard["10"] == 1 and hard["after"] == 4  # [10,14) clipped


def test_date_range_facet(spark):
    rows = [
        ("2024-01-01 06:00:00",),  # day 0
        ("2024-01-02 00:00:00",),  # day 1
        ("2024-01-02 23:59:59",),  # day 1
        ("2024-01-04 12:00:00",),  # day 3
        ("2023-12-31 23:59:59",),  # before
        ("2024-01-09 00:00:00",),  # after (soft end = start + 4*2d = Jan 9)
        ("2024-01-08 12:00:00",),  # day 3 window? [Jan7,Jan9) -> idx 3
    ]
    df = spark.createDataFrame(pd.DataFrame({"ts": [r[0] for r in rows]}))
    df = df.select(df.ts.cast("timestamp").alias("ts"))
    got = {
        r["bucket"]: r["count"]
        for r in range_facet_date(
            df, "ts", "2024-01-03T09:10:11Z/DAY-2DAYS",
            "2024-01-08T00:00:00Z", "+2DAYS",
        ).collect()
    }
    # start resolves to Jan 1; buckets [1,3) [3,5) [5,7) [7,9)
    assert got == {
        "2024-01-01T00:00:00Z": 3,
        "2024-01-03T00:00:00Z": 1,
        "2024-01-07T00:00:00Z": 1,
        "before": 1,
        "after": 1,
        "between": 5,
    }
    # month gap with aligned start
    got_m = {
        r["bucket"]: r["count"]
        for r in range_facet_date(
            df, "ts", "2024-01-15T00:00:00Z/MONTH", "2024-02-01T00:00:00Z",
            "+1MONTH",
        ).collect()
    }
    assert got_m["2024-01-01T00:00:00Z"] == 6 and got_m["before"] == 1
    with pytest.raises(ValueError, match="month-aligned"):
        range_facet_date(df, "ts", "2024-01-15T00:00:00Z",
                         "2024-03-01T00:00:00Z", "+1MONTH")


def test_interval_facet(spark):
    from lucene_solr_8_7_0_spark.operators.rangefacet import (
        interval_facet,
        parse_interval,
    )

    assert parse_interval("[0,10)") == (0.0, 10.0, False, True)
    assert parse_interval("(20,*]") == (20.0, None, True, False)
    assert parse_interval(" [ *, 5 ] ") == (None, 5.0, False, False)
    for bad in ["[5,1]", "(3,3)", "0,10", "[a,b)"]:
        with pytest.raises(ValueError):
            parse_interval(bad)

    vals = [-5.0, 0.0, 5.0, 10.0, 15.0, 20.0, 25.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = interval_facet(
        df, "v",
        ["[0,10)", "[0,10]", "(0,10)", "(15,*]", "[*,0)", "[30,40]"],
    ).collect()
    # overlapping intervals each count independently; order preserved;
    # empty interval reports 0
    assert [(r["bucket"], r["count"]) for r in got] == [
        ("[0,10)", 2), ("[0,10]", 3), ("(0,10)", 1),
        ("(15,*]", 2), ("[*,0)", 1), ("[30,40]", 0),
    ]
