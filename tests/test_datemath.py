"""Solr DateMathParser grammar (sparklucene.datemath) — pinned cases."""

from __future__ import annotations

from datetime import datetime

import pytest

from sparklucene.datemath import parse_date_math


def _d(s):
    return datetime.fromisoformat(s)


def test_round_and_subtract():
    assert parse_date_math("2024-01-15T13:45:30Z/DAY-7DAYS") == \
        _d("2024-01-08T00:00:00")


def test_month_add_clamps_day():
    assert parse_date_math("2024-01-31T10:20:30Z+1MONTH") == \
        _d("2024-02-29T10:20:30")          # leap year clamp
    assert parse_date_math("2023-01-31T00:00:00Z+1MONTH") == \
        _d("2023-02-28T00:00:00")


def test_year_add_clamps_leap_day():
    assert parse_date_math("2024-02-29T00:00:00Z+1YEAR") == \
        _d("2025-02-28T00:00:00")


def test_now_anchor_and_chained_ops():
    now = _d("2024-06-15T17:42:11")
    assert parse_date_math("NOW/HOUR+30MINUTES", now=now) == \
        _d("2024-06-15T17:30:00")
    assert parse_date_math("NOW/MONTH", now=now) == _d("2024-06-01T00:00:00")
    assert parse_date_math("NOW/YEAR+6MONTHS+3DAYS/DAY", now=now) == \
        _d("2024-07-04T00:00:00")


def test_millis_and_fractional_anchor():
    assert parse_date_math("2024-01-01T00:00:00.123Z/SECOND") == \
        _d("2024-01-01T00:00:00")
    assert parse_date_math("2024-01-01T00:00:00Z+250MILLIS") == \
        _d("2024-01-01T00:00:00.250000")


def test_errors():
    with pytest.raises(ValueError):
        parse_date_math("NOW/DAY")                   # no now= supplied
    with pytest.raises(ValueError):
        parse_date_math("2024-01-01T00:00:00Z+1FORTNIGHT")
    with pytest.raises(ValueError):
        parse_date_math("2024-01-01T00:00:00Z garbage")
    with pytest.raises(ValueError):
        parse_date_math("yesterday")
