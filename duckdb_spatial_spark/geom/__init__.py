"""Engine-internal geometry layer: object model, WKT/WKB codecs, NumPy kernels."""

from .core import (  # noqa: F401
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    collect,
)
from .wkb import from_wkb, to_wkb, wkb_flags, wkb_type_id  # noqa: F401
from .wkt import from_wkt, to_wkt  # noqa: F401
