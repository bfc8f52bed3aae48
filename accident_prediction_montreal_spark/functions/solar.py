"""Solar-geometry feature expressions.

Re-expresses the reference's solar feature pipeline (reference
src/solar_features.py:6-44) as standard solar-position geometry over
Columns: declination angle, equation of time, time correction, hour
angle → solar elevation in degrees. Instead of the reference's
hardcoded 2012-2018 DST boundary ``when`` chain
(src/solar_features.py:47-79), the UTC offset is an explicit argument
(callers resolve timezone policy; a Column works for per-row offsets).
All built-in trig — codegen'd, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def second_sunday_of_march(year: Column) -> Column:
    """Date of the second Sunday of March for a year Column."""
    march8 = F.make_date(year, F.lit(3), F.lit(8))
    # dayofweek: Sunday=1…Saturday=7; first Sunday on/after March 8 IS the
    # second Sunday of March.
    return F.date_add(march8, (F.lit(8) - F.dayofweek(march8)) % 7)


def first_sunday_of_november(year: Column) -> Column:
    """Date of the first Sunday of November for a year Column."""
    nov1 = F.make_date(year, F.lit(11), F.lit(1))
    return F.date_add(nov1, (F.lit(8) - F.dayofweek(nov1)) % 7)


def eastern_utc_offset_hours(ts: Column | str) -> Column:
    """UTC offset (hours) for America/Montreal at a naive local timestamp.

    Computes the post-2007 North-American DST rule — DST between the
    second Sunday of March 02:00 and the first Sunday of November 02:00,
    offset −4 inside, −5 outside — for ANY year, replacing the
    reference's hardcoded per-year boundary chain
    (reference src/solar_features.py:47-79, ``timezone_from_date``).
    Boundary comparisons are strict (> start, < end), matching the
    reference. Pure date arithmetic, no UDF.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    year = F.year(ts)
    two_hours = F.expr("INTERVAL 2 HOURS")
    dst_start = second_sunday_of_march(year).cast("timestamp") + two_hours
    dst_end = first_sunday_of_november(year).cast("timestamp") + two_hours
    return F.when((ts > dst_start) & (ts < dst_end), F.lit(-4.0)).otherwise(F.lit(-5.0))


def solar_elevation(
    date: Column | str,
    hour: Column | str,
    lat: Column | str,
    lon: Column | str,
    utc_offset_hours: Column | float = 0.0,
) -> Column:
    """Solar elevation angle (degrees) at the midpoint of the given hour.

    elevation = asin( sin δ · sin φ + cos δ · cos φ · cos H )
      δ (declination) = −23.45° · cos(2π/365 · (day_of_year + 10))
      EoT minutes     = −7.655·sin(d) + 9.873·sin(2d + 3.588), d = 2π·doy/365
      H (hour angle)  = 0.2618 · (local_solar_hour − 12)
    matching reference src/solar_features.py:8-44.
    """
    date = F.col(date) if isinstance(date, str) else date
    hour = F.col(hour) if isinstance(hour, str) else hour
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    if not isinstance(utc_offset_hours, Column):
        utc_offset_hours = F.lit(float(utc_offset_hours))

    doy = F.dayofyear(date)
    declination = F.radians(F.lit(-23.45) * F.cos(F.lit(2 * math.pi / 365) * (doy + 10)))
    d = F.lit(2 * math.pi / 365) * doy
    equation_of_time = F.lit(-7.655) * F.sin(d) + F.lit(9.873) * F.sin(d * 2 + F.lit(3.588))
    time_correction = F.lit(4.0) * (lon - F.lit(15.0) * utc_offset_hours) + equation_of_time
    local_solar_hour = hour + F.lit(0.5) + time_correction / F.lit(60.0)
    hour_angle = F.lit(0.2618) * (local_solar_hour - F.lit(12.0))
    return F.degrees(
        F.asin(
            F.sin(declination) * F.sin(F.radians(lat))
            + F.cos(declination) * F.cos(F.radians(lat)) * F.cos(hour_angle)
        )
    )
