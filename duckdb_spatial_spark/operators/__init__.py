from .cluster import (  # noqa: F401
    st_cluster,
    st_cluster_bbox,
    st_filter_points,
    with_bbox_columns,
)
from .join import st_join, st_join_broadcast  # noqa: F401
