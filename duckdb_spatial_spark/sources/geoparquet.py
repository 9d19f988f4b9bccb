"""GeoParquet 'geo' footer metadata: reader + distributed writer.

The reference round-trips GeoParquet through GDAL/DuckDB (its parquet
geometry interchange is WKB + the GeoParquet file-level 'geo' key-value
metadata; public spec at geoparquet.org, v1.0.0). Spark's built-in parquet
writer cannot attach footer KV metadata, so the sink here is a
mapInPandas-per-partition pyarrow writer — fully distributed, one
part-*.parquet per partition, each file carrying its own spec-compliant
'geo' metadata with that file's bbox and geometry_types (per-file metadata
is how distributed GeoParquet writers work; readers union file bboxes).

The reader surfaces the metadata (primary column, encoding, bbox) and
lets st_read resolve the primary geometry column by name.
"""
from __future__ import annotations

import glob
import json
import os
import uuid
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame

_GEOM_TYPE_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
    5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection",
}


def _bbox_arrow_type():
    import pyarrow as pa

    return pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                      ("xmax", pa.float64()), ("ymax", pa.float64())])


def geoparquet_meta(path: str) -> Optional[dict]:
    """Parsed 'geo' footer metadata of a GeoParquet file (first file when
    given a directory); None when absent — then it's plain parquet."""
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        cand = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not cand:
            return None
        f = cand[0]
    try:
        kv = pq.read_schema(f).metadata or {}
    except Exception:
        return None
    raw = kv.get(b"geo")
    if raw is None:
        return None
    try:
        return json.loads(raw.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return None


def st_write_geoparquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    crs: Optional[str] = None,
    covering: bool = False,
    row_group_size: Optional[int] = None,
) -> None:
    """Distributed GeoParquet sink: per-partition pyarrow writer emits
    part-*.parquet files whose footers carry GeoParquet 'geo' metadata
    (encoding WKB, per-file bbox + geometry_types). No driver collect;
    the geometry column must be WKB binary.

    ``covering=True`` writes the GeoParquet 1.1 bbox covering: a per-row
    ``bbox`` struct<xmin,ymin,xmax,ymax> column declared under
    geo.columns.<geom>.covering.bbox. This is THE scale feature of the
    format — parquet row-group min/max statistics on the four doubles
    let any engine prune row groups for a spatial window without
    decoding a single geometry (our reader turns the bbox option into
    PushedFilters on these fields)."""
    if geom_col not in df.columns:
        raise ValueError(f"no geometry column {geom_col!r} in {df.columns}")
    os.makedirs(path, exist_ok=True)
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema)
    crs_val = crs

    # a partition larger than this flushes intermediate part files — the
    # 'geo' footer is PER FILE by spec (readers union file bboxes), so
    # bounded-memory chunking is free; pyarrow 16 has no post-hoc footer
    # API, which rules out a single streaming ParquetWriter per partition
    flush_bytes = 256 * 1024 * 1024

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..geom.wkb import from_wkb

        tables: List[pa.Table] = []
        state = {"xmin": np.inf, "ymin": np.inf,
                 "xmax": -np.inf, "ymax": -np.inf,
                 "gtypes": set(), "n": 0, "bytes": 0}

        def flush():
            if not state["n"]:
                return None
            col_meta = {"encoding": "WKB",
                        "geometry_types": sorted(state["gtypes"])}
            if np.isfinite(state["xmin"]):
                col_meta["bbox"] = [float(state["xmin"]), float(state["ymin"]),
                                    float(state["xmax"]), float(state["ymax"])]
            if crs_val is not None:
                col_meta["crs"] = crs_val
            if covering:
                col_meta["covering"] = {"bbox": {
                    "xmin": ["bbox", "xmin"], "ymin": ["bbox", "ymin"],
                    "xmax": ["bbox", "xmax"], "ymax": ["bbox", "ymax"]}}
            geo = {"version": "1.1.0" if covering else "1.0.0",
                   "primary_column": geom_col,
                   "columns": {geom_col: col_meta}}
            tb = pa.concat_tables(tables)
            meta = dict(tb.schema.metadata or {})
            meta[b"geo"] = json.dumps(geo).encode("utf-8")
            tb = tb.replace_schema_metadata(meta)
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
            # smaller row groups = finer min/max pruning granularity for
            # the covering; pair with a hilbert/space-filling sort so each
            # group's bbox stats are tight (sources/../operators/cluster)
            if row_group_size is not None:
                pq.write_table(tb, fname, row_group_size=row_group_size)
            else:
                pq.write_table(tb, fname)
            out = (fname, state["n"])
            tables.clear()
            state.update(xmin=np.inf, ymin=np.inf, xmax=-np.inf,
                         ymax=-np.inf, gtypes=set(), n=0, bytes=0)
            return out

        for pdf in batches:
            row_bounds = []
            for b in pdf[geom_col]:
                if b is None:
                    row_bounds.append(None)
                    continue
                g = from_wkb(bytes(b))
                bd = g.bounds()
                row_bounds.append(bd)
                if bd:
                    state["xmin"] = min(state["xmin"], bd[0])
                    state["ymin"] = min(state["ymin"], bd[1])
                    state["xmax"] = max(state["xmax"], bd[2])
                    state["ymax"] = max(state["ymax"], bd[3])
                name = _GEOM_TYPE_NAMES.get(g.type_id)
                if name:
                    state["gtypes"].add(name)
            tb1 = pa.Table.from_pandas(pdf, schema=arrow_schema,
                                       preserve_index=False)
            if covering:
                bbox_arr = pa.array(
                    [None if bd is None else
                     {"xmin": bd[0], "ymin": bd[1],
                      "xmax": bd[2], "ymax": bd[3]}
                     for bd in row_bounds],
                    type=_bbox_arrow_type())
                tb1 = tb1.append_column("bbox", bbox_arr)
            tables.append(tb1)
            state["n"] += len(pdf)
            state["bytes"] += tb1.nbytes
            if state["bytes"] >= flush_bytes:
                out = flush()
                if out:
                    yield pd.DataFrame({"file": [out[0]], "rows": [out[1]]})
        out = flush()
        if out:
            yield pd.DataFrame({"file": [out[0]], "rows": [out[1]]})

    df.mapInPandas(write, schema="file string, rows long").collect()
