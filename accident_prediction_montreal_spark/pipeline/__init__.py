"""End-to-end reproduction of the reference application's dataflow
(SURVEY.md §3): accidents × road network × weather → labeled
(road-segment, hour) examples → classifier-ready features.

Source boundaries (CSV download / KMZ parse / HTTP scrape) are replaced
by fixture generators behind the same schemas (SURVEY.md §7.3) — the
operators between them are the capability being reproduced.
"""

from accident_prediction_montreal_spark.pipeline.fixtures import (
    generate_accidents,
    generate_road_points,
    generate_weather,
    generate_station_coords,
)
from accident_prediction_montreal_spark.pipeline.road_features import (
    road_features,
    street_type_expr,
)
from accident_prediction_montreal_spark.pipeline.matching import match_accidents_with_roads
from accident_prediction_montreal_spark.pipeline.weather import (
    smooth_risky_weather,
    weather_for_samples,
)
from accident_prediction_montreal_spark.pipeline.dataset import (
    date_hour_grid,
    positive_samples,
    negative_samples,
    build_dataset,
)

__all__ = [
    "generate_accidents",
    "generate_road_points",
    "generate_weather",
    "generate_station_coords",
    "road_features",
    "street_type_expr",
    "match_accidents_with_roads",
    "smooth_risky_weather",
    "weather_for_samples",
    "date_hour_grid",
    "positive_samples",
    "negative_samples",
    "build_dataset",
]
