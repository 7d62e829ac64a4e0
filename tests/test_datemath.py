"""DateMathParser + interval syntax unit tests (DateMathParserTest pattern)."""

from datetime import datetime

import pytest

from lucene_solr_ray.functions.datemath import (
    DateMathParseError,
    parse_datemath,
    parse_interval,
)

NOW = datetime(2024, 3, 15, 13, 45, 30, 123000)


class TestDateMath:
    def test_rounding(self):
        assert parse_datemath("NOW/YEAR", NOW) == datetime(2024, 1, 1)
        assert parse_datemath("NOW/MONTH", NOW) == datetime(2024, 3, 1)
        assert parse_datemath("NOW/DAY", NOW) == datetime(2024, 3, 15)
        assert parse_datemath("NOW/HOUR", NOW) == datetime(2024, 3, 15, 13)
        assert parse_datemath("NOW/SECOND", NOW) == datetime(2024, 3, 15, 13, 45, 30)

    def test_arithmetic(self):
        assert parse_datemath("NOW+2DAYS", NOW) == datetime(2024, 3, 17, 13, 45, 30, 123000)
        assert parse_datemath("NOW-1HOUR", NOW) == datetime(2024, 3, 15, 12, 45, 30, 123000)
        assert parse_datemath("NOW+6MONTHS", NOW) == datetime(2024, 9, 15, 13, 45, 30, 123000)
        # calendar clamp: Jan 31 + 1MONTH -> Feb 29 (leap year)
        assert parse_datemath("2024-01-31T00:00:00Z+1MONTH") == datetime(2024, 2, 29)
        assert parse_datemath("2023-01-31T00:00:00Z+1MONTH") == datetime(2023, 2, 28)

    def test_chains(self):
        assert parse_datemath("NOW/DAY+6MONTHS+3DAYS", NOW) == datetime(2024, 9, 18)
        assert parse_datemath("NOW/MONTH+1DAY-2HOURS", NOW) == datetime(2024, 3, 1, 22)
        assert parse_datemath("2023-12-15T10:30:00Z/MONTH+2DAYS") == datetime(2023, 12, 3)

    def test_tz_aware_now_normalized_to_utc(self):
        from datetime import timedelta, timezone

        tz = timezone(timedelta(hours=5))
        aware = datetime(2024, 1, 15, 3, 0, tzinfo=tz)  # = 2024-01-14T22:00Z
        got = parse_datemath("NOW/DAY", aware)
        assert got == datetime(2024, 1, 14) and got.tzinfo is None

    def test_leap_day_year_arithmetic_clamps(self):
        assert parse_datemath("2024-02-29T00:00:00Z+1YEAR") == datetime(2025, 2, 28)
        assert parse_datemath("2024-02-29T00:00:00Z-1YEAR") == datetime(2023, 2, 28)

    def test_literal_anchor(self):
        assert parse_datemath("2024-06-01") == datetime(2024, 6, 1)
        assert parse_datemath("2024-06-01T12:30:45Z") == datetime(2024, 6, 1, 12, 30, 45)

    def test_errors(self):
        with pytest.raises(DateMathParseError):
            parse_datemath("NOW/FORTNIGHT", NOW)
        with pytest.raises(DateMathParseError):
            parse_datemath("NOW")  # no explicit now
        with pytest.raises(DateMathParseError):
            parse_datemath("garbage")


class TestIntervals:
    def test_parse(self):
        assert parse_interval("[1,10)") == (1, 10, True, False)
        assert parse_interval("(45,*]") == (45, None, False, True)
        assert parse_interval("[*,5]") == (None, 5, True, True)
        assert parse_interval("[2.5, 7.5)") == (2.5, 7.5, True, False)
        with pytest.raises(ValueError):
            parse_interval("1,10")
