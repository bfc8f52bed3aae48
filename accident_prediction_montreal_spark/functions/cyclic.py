"""Cyclic feature encoding.

Re-expresses reference ``add_cyclic_feature`` (preprocess.py:401-419):
a periodic integer column (hour-of-day, day-of-month, day-of-year) becomes
(cos, sin) of ``value · 2π / period`` so midnight sits next to 23:00 in
feature space. Pure column math, codegen'd.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def cyclic_encode(value: Column | str, period: float) -> tuple[Column, Column]:
    """Return (cos_component, sin_component) for a cyclic value."""
    value = F.col(value) if isinstance(value, str) else value
    angle = value * F.lit(2.0 * math.pi / period)
    return F.cos(angle), F.sin(angle)
