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
