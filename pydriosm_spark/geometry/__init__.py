from pydriosm_spark.geometry.wkt import parse_wkt, to_wkt  # noqa: F401
from pydriosm_spark.geometry.ops import (  # noqa: F401
    points_in_polygon,
    polygon_contains_box,
    box_intersects_polygon,
    polygon_bbox,
)
