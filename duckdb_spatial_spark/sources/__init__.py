from .generate import st_generatepoints  # noqa: F401
from .tables import load_all, load_table, register_views  # noqa: F401
from .shapefile import st_read_shp, st_write_shp  # noqa: F401
from .gpkg import gpkg_layers, st_read_gpkg, st_write_gpkg  # noqa: F401
from .kml import st_read_kml, st_write_kml  # noqa: F401
from .fgb import st_read_fgb, st_write_fgb  # noqa: F401
from .xlsx import st_read_xlsx  # noqa: F401
from .gml import st_read_gml  # noqa: F401
from .gpx import st_read_gpx, st_write_gpx  # noqa: F401
from .arrow import st_read_arrow, st_write_arrow  # noqa: F401
from .webdataset import (  # noqa: F401
    group_samples,
    st_read_webdataset,
    st_write_webdataset,
)
from .warc import st_read_warc, st_write_warc  # noqa: F401
from .spatialite import st_read_spatialite, st_write_spatialite  # noqa: F401
from .geoparquet import geoparquet_meta, st_write_geoparquet  # noqa: F401
from .dxf import st_read_dxf, st_write_dxf  # noqa: F401
from .mvt import st_read_mvt, st_write_mvt  # noqa: F401
from .topojson import st_read_topojson, topojson_layers  # noqa: F401
from .read import (  # noqa: F401
    OSM_SCHEMA,
    read,
    read_geojson,
    st_drivers,
    st_read,
    st_read_meta,
    st_read_osm,
    st_write,
)
