"""GeoPackage + ESRI Shapefile sinks (reference `gdf.to_file` parity,
coastlines/vector.py:1613-1673, continental.py:336-358) with the
`vector_schema` dtype/precision pinning analog (vector.py:1304-1366).

Both are EXCHANGE formats for final vector products, not data-plane
sinks (the data plane is the snapshot table): geometry blobs and
attribute rows are prepared DISTRIBUTED (one Arrow kernel pass), then
the bounded result is collected and written by the driver — same
contract and row cap as write_geojson. GPKG is written with stdlib
sqlite3 against the OGC GeoPackage 1.2 spec; SHP/SHX/DBF/PRJ are
written from the ESRI white paper / dBASE III layouts with struct.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..geometry import wkb as _wkb

# reference vector.py:1330-1360 custom dtypes, verbatim semantics
_SCHEMA_OVERRIDES = {
    "uid": "str:11",
    "sig_time": "float:8.3",
    "outl_time": "str:80",
    "angle_mean": "int:3",
    "angle_std": "int:3",
    "valid_obs": "int:4",
    "valid_span": "int:4",
    "max_year": "int:4",
    "min_year": "int:4",
    "certainty": "str:25",
    "id_primary": "str:10",
    "year": "int:4",
    "tide_datum": "str:20",
    "n": "int:6",
    "radius_m": "int:6",
    "wms_conf": "float:8.1",
    "wms_grew": "int:1",
    "wms_retr": "int:1",
    "wms_sig": "int:1",
}


def vector_schema(df: DataFrame, default: str = "float:8.2",
                  geometry_col: str = "geometry") -> dict[str, str]:
    """Column -> "type:width[.precision]" export schema (the
    reference's vector_schema over a Spark schema instead of a gdf).
    Columns with a known DEA name get the reference's pinned dtype;
    string/int Spark types fall back to sensible widths; everything
    else gets `default`."""
    out: dict[str, str] = {}
    for f in df.schema.fields:
        if f.name == geometry_col:
            continue
        if f.name in _SCHEMA_OVERRIDES:
            out[f.name] = _SCHEMA_OVERRIDES[f.name]
        elif isinstance(f.dataType, T.StringType):
            out[f.name] = "str:80"
        elif isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
            out[f.name] = "int:10"
        else:
            out[f.name] = default
    return out


def _parse_spec(spec: str) -> tuple[str, int, int]:
    kind, _, width = spec.partition(":")
    w, _, p = width.partition(".")
    return kind, int(w), int(p) if p else 0


def _collect_rows(df: DataFrame, geometry_col: str, max_rows: int):
    """Distributed prep -> bounded driver collect: (attr_names, rows)
    where each row is (wkb_bytes, [attr values])."""
    attr_cols = [c for c in df.columns if c != geometry_col]
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"vector export capped at {max_rows} rows (got {n}); "
            "use SnapshotTable for data-plane output"
        )
    rows = df.select(geometry_col, *attr_cols).collect()
    return attr_cols, [(bytes(r[0]), list(r[1:])) for r in rows]


# ------------------------------------------------------------- GeoPackage

_WKT = {
    4326: (
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
        '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
    ),
    3577: (
        'PROJCS["GDA94 / Australian Albers",GEOGCS["GDA94",DATUM["'
        'Geocentric_Datum_of_Australia_1994",SPHEROID["GRS 1980",6378137,'
        '298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",'
        '0.0174532925199433]],PROJECTION["Albers_Conic_Equal_Area"],'
        'PARAMETER["standard_parallel_1",-18],PARAMETER["standard_parallel_2",'
        '-36],PARAMETER["latitude_of_center",0],PARAMETER["longitude_of_center"'
        ',132],PARAMETER["false_easting",0],PARAMETER["false_northing",0],'
        'UNIT["metre",1]]'
    ),
}

_GPKG_TYPE = {
    _wkb.POINT: "POINT",
    _wkb.LINESTRING: "LINESTRING",
    _wkb.POLYGON: "POLYGON",
    _wkb.MULTIPOINT: "MULTIPOINT",
    _wkb.MULTILINESTRING: "MULTILINESTRING",
    _wkb.MULTIPOLYGON: "MULTIPOLYGON",
}


def _gpkg_blob(wkb_bytes: bytes, srs_id: int) -> bytes:
    x0, y0, x1, y1 = _wkb.bbox(wkb_bytes)
    # magic GP, version 0, flags 0b11 = little-endian + envelope [minx,
    # maxx, miny, maxy]
    return (
        b"GP\x00\x03"
        + struct.pack("<i", srs_id)
        + struct.pack("<4d", x0, x1, y0, y1)
        + wkb_bytes
    )


def _create_gpkg_metadata(cur, srs_id: int) -> None:
    """Fresh-file GeoPackage boilerplate: pragmas, srs table,
    gpkg_contents, gpkg_geometry_columns (OGC GeoPackage 1.2)."""
    cur.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
    cur.execute("PRAGMA user_version = 10200")  # GeoPackage 1.2
    cur.execute(
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
        "srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, "
        "organization_coordsys_id INTEGER NOT NULL, definition TEXT "
        "NOT NULL, description TEXT)"
    )
    cur.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
        [
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined"),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined"),
            (
                f"EPSG:{srs_id}", srs_id, "EPSG", srs_id,
                _WKT.get(srs_id, "undefined"),
            ),
        ],
    )
    cur.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY "
        "KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, "
        "description TEXT DEFAULT '', last_change DATETIME NOT NULL "
        "DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, "
        "min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
    )
    cur.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
        "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
        "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT "
        "NULL, CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, "
        "column_name))"
    )


def write_gpkg(
    df: DataFrame,
    path: str,
    layer: str = "layer",
    geometry_col: str = "geometry",
    srs_id: int = 3577,
    schema: dict[str, str] | None = None,
    max_rows: int = 100_000,
    append: bool = False,
) -> int:
    """Write a WKB-geometry DataFrame as a GeoPackage feature layer.
    Returns the feature count. `schema` pins export dtypes/precision
    (vector_schema(df) by default): float:w.p rounds to p decimals,
    str:w truncates, int:* casts. `append=True` adds the layer to an
    existing GeoPackage (multi-layer artifact, reference OUTPUT_GPKG
    shape) instead of recreating the file."""
    schema = schema or vector_schema(df, geometry_col=geometry_col)
    if "fid" in df.columns:
        raise ValueError(
            "'fid' is the GeoPackage feature-id primary key; rename the "
            "column before export"
        )
    attr_cols, rows = _collect_rows(df, geometry_col, max_rows)
    gtypes = {_wkb.geom_type(g) for g, _ in rows}
    gname = _GPKG_TYPE[gtypes.pop()] if len(gtypes) == 1 else "GEOMETRY"

    appending = append and os.path.exists(path)
    if os.path.exists(path) and not appending:
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        if appending:
            ex = cur.execute(
                "SELECT 1 FROM gpkg_contents WHERE table_name = ?", (layer,)
            ).fetchone()
            if ex:
                raise ValueError(f"layer {layer!r} already exists in {path}")
            cur.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys "
                "VALUES (?,?,?,?,?,NULL)",
                (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id,
                 _WKT.get(srs_id, "undefined")),
            )
        else:
            _create_gpkg_metadata(cur, srs_id)
        col_defs = []
        for c in attr_cols:
            kind, _, _ = _parse_spec(schema.get(c, "float:8.2"))
            sql_t = {"str": "TEXT", "int": "INTEGER", "float": "REAL"}[kind]
            col_defs.append(f'"{c}" {sql_t}')
        cur.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f'"{geometry_col}" BLOB'
            + ("".join(", " + d for d in col_defs))
            + ")"
        )
        bboxes = np.array([_wkb.bbox(g) for g, _ in rows]) if rows else None
        feats = []
        for g, attrs in rows:
            vals = []
            for c, v in zip(attr_cols, attrs):
                kind, w, p = _parse_spec(schema.get(c, "float:8.2"))
                if v is None:
                    vals.append(None)
                elif kind == "str":
                    vals.append(str(v)[:w])
                elif kind == "int":
                    vals.append(int(v))
                else:
                    vals.append(round(float(v), p))
            feats.append([_gpkg_blob(g, srs_id)] + vals)
        ph = ",".join("?" * (1 + len(attr_cols)))
        cur.executemany(
            f'INSERT INTO "{layer}" ("{geometry_col}"'
            + "".join(f', "{c}"' for c in attr_cols)
            + f") VALUES ({ph})",
            feats,
        )
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (
                layer, "features", layer,
                float(bboxes[:, 0].min()) if rows else None,
                float(bboxes[:, 1].min()) if rows else None,
                float(bboxes[:, 2].max()) if rows else None,
                float(bboxes[:, 3].max()) if rows else None,
                srs_id,
            ),
        )
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (layer, geometry_col, gname, srs_id),
        )
        con.commit()
    finally:
        con.close()
    return len(rows)


def write_layer_styles(
    path: str,
    styles: list[dict],
) -> int:
    """Append a QGIS `layer_styles` table to an existing GeoPackage —
    parity with the reference's styled continental artifact
    (continental.py:413-415 writes STYLES_FILE rows as layer
    "layer_styles"; schema is the de-facto QGIS one, readable by
    gpd.read_file / QGIS "load style from database").

    Each style dict: {"layer": feature table name, "style_name": ...,
    "qml": QML XML string, "sld": SLD XML string (optional),
    "use_as_default": bool (default True), "description": optional,
    "geometry_col": optional (default "geometry")}. Returns the number
    of style rows written. Idempotent per (layer, style_name): existing
    rows for the same key are replaced."""
    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute(
            "CREATE TABLE IF NOT EXISTS layer_styles ("
            "id INTEGER PRIMARY KEY AUTOINCREMENT, "
            "f_table_catalog TEXT(256), f_table_schema TEXT(256), "
            "f_table_name TEXT(256), f_geometry_column TEXT(256), "
            "styleName TEXT(30), styleQML TEXT, styleSLD TEXT, "
            "useAsDefault BOOLEAN, description TEXT, owner TEXT(30), "
            "ui TEXT(30), update_time DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')))"
        )
        # register as an attributes (non-spatial) table once
        cur.execute(
            "SELECT 1 FROM gpkg_contents WHERE table_name='layer_styles'"
        )
        if cur.fetchone() is None:
            cur.execute(
                "INSERT INTO gpkg_contents (table_name, data_type, "
                "identifier, srs_id) VALUES ('layer_styles', 'attributes', "
                "'layer_styles', 0)"
            )
        n = 0
        for st in styles:
            layer = st["layer"]
            name = st.get("style_name", layer)
            cur.execute(
                "DELETE FROM layer_styles WHERE f_table_name=? AND styleName=?",
                (layer, name),
            )
            cur.execute(
                "INSERT INTO layer_styles (f_table_catalog, f_table_schema, "
                "f_table_name, f_geometry_column, styleName, styleQML, "
                "styleSLD, useAsDefault, description, owner, ui) "
                "VALUES ('', '', ?, ?, ?, ?, ?, ?, ?, '', NULL)",
                (
                    layer,
                    st.get("geometry_col", "geometry"),
                    name,
                    st.get("qml", ""),
                    st.get("sld", ""),
                    bool(st.get("use_as_default", True)),
                    st.get("description"),
                ),
            )
            n += 1
        con.commit()
    finally:
        con.close()
    return n


# -------------------------------------------------------------- Shapefile

_SHP_TYPE = {
    _wkb.POINT: 1,
    _wkb.LINESTRING: 3,
    _wkb.MULTILINESTRING: 3,
    _wkb.POLYGON: 5,
    _wkb.MULTIPOLYGON: 5,
}


def _ring_ccw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) > 0.0


def _shp_parts(g: bytes) -> tuple[int, list[np.ndarray]]:
    """WKB -> (shp_type, parts) with ESRI ring orientation (outer CW,
    holes CCW)."""
    t, payload = _wkb.parse(g)
    st = _SHP_TYPE[t]
    if t == _wkb.POINT:
        return st, [payload.reshape(1, 2)]
    if t == _wkb.LINESTRING:
        return st, [payload]
    if t == _wkb.MULTILINESTRING:
        return st, list(payload)
    if t == _wkb.POLYGON:
        rings = payload
    else:  # MULTIPOLYGON
        rings = [r for poly in payload for r in poly]
        rings_meta = [
            (i == 0) for poly in payload for i, _ in enumerate(poly)
        ]
    if t == _wkb.POLYGON:
        rings_meta = [i == 0 for i in range(len(rings))]
    fixed = []
    for ring, is_outer in zip(rings, rings_meta):
        ccw = _ring_ccw(ring)
        if (is_outer and ccw) or (not is_outer and not ccw):
            ring = ring[::-1]
        fixed.append(ring)
    return st, fixed


def write_shp(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    srs_id: int = 3577,
    schema: dict[str, str] | None = None,
    max_rows: int = 100_000,
) -> int:
    """Write a WKB-geometry DataFrame as an ESRI Shapefile set
    (.shp/.shx/.dbf/.prj; `path` is the basename without extension).
    All geometries must share one shapefile type class. Returns the
    record count."""
    schema = schema or vector_schema(df, geometry_col=geometry_col)
    attr_cols, rows = _collect_rows(df, geometry_col, max_rows)
    if not rows:
        raise ValueError("refusing to write an empty shapefile")
    shp_types = set()
    shapes = []
    for g, _ in rows:
        st, parts = _shp_parts(g)
        shp_types.add(st)
        shapes.append((st, parts))
    if len(shp_types) != 1:
        raise ValueError(f"mixed shapefile types {shp_types}")
    stype = shp_types.pop()

    # record payloads
    recs = []
    for st, parts in shapes:
        allp = np.vstack(parts)
        if st == 1:
            content = struct.pack("<i2d", 1, float(allp[0, 0]), float(allp[0, 1]))
        else:
            x0, y0 = allp.min(axis=0)
            x1, y1 = allp.max(axis=0)
            offsets = np.cumsum([0] + [len(p) for p in parts[:-1]])
            content = struct.pack("<i4d", st, x0, y0, x1, y1)
            content += struct.pack("<2i", len(parts), len(allp))
            content += struct.pack(f"<{len(parts)}i", *offsets)
            content += allp.astype("<f8").tobytes()
        recs.append(content)

    allc = np.vstack([np.vstack(parts) for _, parts in shapes])
    gx0, gy0 = allc.min(axis=0)
    gx1, gy1 = allc.max(axis=0)

    def header(total_words: int) -> bytes:
        return (
            struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
            + struct.pack(">i", total_words)
            + struct.pack("<2i", 1000, stype)
            + struct.pack("<8d", gx0, gy0, gx1, gy1, 0, 0, 0, 0)
        )

    shp_len = 50 + sum(4 + len(r) // 2 for r in recs)  # 16-bit words
    with open(path + ".shp", "wb") as f:
        f.write(header(shp_len))
        for i, r in enumerate(recs):
            f.write(struct.pack(">2i", i + 1, len(r) // 2))
            f.write(r)
    with open(path + ".shx", "wb") as f:
        f.write(header(50 + 4 * len(recs)))
        off = 50
        for r in recs:
            f.write(struct.pack(">2i", off, len(r) // 2))
            off += 4 + len(r) // 2
    _write_dbf(path + ".dbf", attr_cols, [a for _, a in rows], schema)
    wkt = _WKT.get(srs_id)
    if wkt:
        with open(path + ".prj", "w") as f:
            f.write(wkt)
    return len(rows)


def _write_dbf(path: str, cols: list[str], rows: list[list], schema: dict):
    specs = []
    for c in cols:
        kind, w, p = _parse_spec(schema.get(c, "float:8.2"))
        if kind == "str":
            specs.append((c, b"C", min(w, 254), 0))
        elif kind == "int":
            specs.append((c, b"N", min(max(w, 1), 18), 0))
        else:
            specs.append((c, b"N", min(max(w, p + 2), 20), p))
    rec_size = 1 + sum(s[2] for s in specs)
    hdr_size = 32 + 32 * len(specs) + 1
    with open(path, "wb") as f:
        # fixed date (2026-01-01) keeps output deterministic run to run
        f.write(
            struct.pack(
                "<4BIHH20x", 0x03, 126, 1, 1, len(rows), hdr_size, rec_size
            )
        )
        for name, typ, w, p in specs:
            f.write(
                struct.pack(
                    "<11s1c4xBB14x", name.encode("ascii")[:10], typ, w, p
                )
            )
        f.write(b"\x0d")
        for attrs in rows:
            f.write(b" ")
            for (name, typ, w, p), v in zip(specs, attrs):
                if typ == b"C":
                    s = ("" if v is None else str(v))[:w]
                    f.write(s.ljust(w).encode("ascii", "replace"))
                else:
                    if v is None:
                        s = ""
                    elif p:
                        s = f"{float(v):.{p}f}"[:w]
                    else:
                        s = str(int(v))[:w]
                    f.write(s.rjust(w).encode("ascii"))
        f.write(b"\x1a")
