"""GPKG/SHP sink round trips, verified by INDEPENDENT readers written
in the test (sqlite3 + struct parsing of the spec layouts), never by
the writer's own code paths.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pytest

from dea_coastlines_spark.geometry import wkb
from dea_coastlines_spark.sources import geo_sinks


@pytest.fixture()
def vec_df(spark):
    sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 8.0], [0.0, 8.0], [0.0, 0.0]])
    rows = [
        (1, "good", 2000, 1.2345, wkb.linestring(sq[:3])),
        (2, "unstable data", 2001, -3.875, wkb.linestring(sq[1:4])),
    ]
    return spark.createDataFrame(
        rows, "fid_src long, certainty string, year long, rate_time double, geometry binary"
    )


def test_vector_schema_pinning(vec_df):
    s = geo_sinks.vector_schema(vec_df)
    assert s["certainty"] == "str:25"  # reference override
    assert s["year"] == "int:4"
    assert s["rate_time"] == "float:8.2"  # default
    assert s["fid_src"] == "int:10"  # spark long fallback
    assert "geometry" not in s


def test_gpkg_roundtrip(vec_df, tmp_path):
    path = str(tmp_path / "out.gpkg")
    n = geo_sinks.write_gpkg(vec_df, path, layer="shorelines", srs_id=3577)
    assert n == 2
    con = sqlite3.connect(path)
    try:
        # required GeoPackage metadata
        (app_id,) = con.execute("PRAGMA application_id").fetchone()
        assert app_id == 1196444487  # 'GPKG'
        ct = con.execute(
            "SELECT table_name, data_type, srs_id FROM gpkg_contents"
        ).fetchall()
        assert ct == [("shorelines", "features", 3577)]
        gc = con.execute(
            "SELECT table_name, column_name, geometry_type_name, srs_id "
            "FROM gpkg_geometry_columns"
        ).fetchall()
        assert gc == [("shorelines", "geometry", "LINESTRING", 3577)]
        srs = dict(
            con.execute(
                "SELECT srs_id, organization FROM gpkg_spatial_ref_sys"
            ).fetchall()
        )
        assert srs[3577] == "EPSG" and -1 in srs and 0 in srs
        rows = con.execute(
            "SELECT fid, geometry, certainty, year, rate_time "
            "FROM shorelines ORDER BY fid"
        ).fetchall()
    finally:
        con.close()
    assert len(rows) == 2
    blob = rows[0][1]
    # GP header: magic, version 0, flags LE+envelope1, srs 3577
    assert blob[:2] == b"GP" and blob[2] == 0 and blob[3] == 0x03
    assert struct.unpack("<i", blob[4:8])[0] == 3577
    x0, x1, y0, y1 = struct.unpack("<4d", blob[8:40])
    geom = blob[40:]
    coords = wkb.coords_of(geom)
    assert x0 == coords[:, 0].min() and x1 == coords[:, 0].max()
    assert y0 == coords[:, 1].min() and y1 == coords[:, 1].max()
    np.testing.assert_allclose(
        coords, [[0.0, 0.0], [10.0, 0.0], [10.0, 8.0]]
    )
    # dtype pinning applied: float:8.2 rounded to 2 decimals
    assert rows[0][4] == 1.23 and rows[1][4] == -3.88
    assert rows[1][2] == "unstable data"


def test_gpkg_row_cap(vec_df, tmp_path):
    with pytest.raises(ValueError, match="capped"):
        geo_sinks.write_gpkg(vec_df, str(tmp_path / "x.gpkg"), max_rows=1)


def _read_shp(path):
    """Independent minimal .shp parser (ESRI white paper layout)."""
    with open(path, "rb") as f:
        buf = f.read()
    code, = struct.unpack(">i", buf[:4])
    flen, = struct.unpack(">i", buf[24:28])
    version, stype = struct.unpack("<2i", buf[28:36])
    bbox = struct.unpack("<4d", buf[36:68])
    assert code == 9994 and version == 1000 and flen * 2 == len(buf)
    pos = 100
    out = []
    while pos < len(buf):
        recno, clen = struct.unpack(">2i", buf[pos : pos + 8])
        pos += 8
        content = buf[pos : pos + clen * 2]
        pos += clen * 2
        st, = struct.unpack("<i", content[:4])
        if st == 1:
            out.append(np.array([struct.unpack("<2d", content[4:20])]))
            continue
        nparts, npts = struct.unpack("<2i", content[36:44])
        parts = struct.unpack(f"<{nparts}i", content[44 : 44 + 4 * nparts])
        pts = np.frombuffer(
            content[44 + 4 * nparts :], dtype="<f8", count=npts * 2
        ).reshape(npts, 2)
        out.append((parts, pts))
    return stype, bbox, out


def _read_dbf(path):
    with open(path, "rb") as f:
        buf = f.read()
    nrec, hdr, rsz = struct.unpack("<IHH", buf[4:12])
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode()
        typ = chr(buf[pos + 11])
        w, p = buf[pos + 16], buf[pos + 17]
        fields.append((name, typ, w, p))
        pos += 32
    recs = []
    pos = hdr
    for _ in range(nrec):
        assert buf[pos : pos + 1] == b" "
        pos += 1
        row = {}
        for name, typ, w, p in fields:
            raw = buf[pos : pos + w].decode().strip()
            pos += w
            row[name] = raw
        recs.append(row)
    return fields, recs


def test_shp_roundtrip_lines(vec_df, tmp_path):
    base = str(tmp_path / "lines")
    n = geo_sinks.write_shp(vec_df, base, srs_id=3577)
    assert n == 2
    stype, bbox, shapes = _read_shp(base + ".shp")
    assert stype == 3 and len(shapes) == 2
    parts, pts = shapes[0]
    assert parts == (0,)
    np.testing.assert_allclose(pts, [[0.0, 0.0], [10.0, 0.0], [10.0, 8.0]])
    assert bbox == (0.0, 0.0, 10.0, 8.0)
    fields, recs = _read_dbf(base + ".dbf")
    fd = {f[0]: f for f in fields}
    assert fd["certainty"][1] == "C" and fd["certainty"][2] == 25
    assert fd["year"][1] == "N" and fd["year"][3] == 0
    assert fd["rate_time"][2] == 8 and fd["rate_time"][3] == 2
    assert recs[0]["certainty"] == "good"
    assert recs[1]["rate_time"] == "-3.88"  # pinned float:8.2
    # shx record index is consistent
    with open(base + ".shx", "rb") as f:
        shx = f.read()
    assert (len(shx) - 100) // 8 == 2
    # prj written for the known srs
    with open(base + ".prj") as f:
        assert "Albers" in f.read()


def test_shp_polygon_ring_orientation(spark, tmp_path):
    shell = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)  # CCW
    hole = np.array([[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]], float)  # CW
    df = spark.createDataFrame(
        [(1, wkb.polygon(shell, [hole]))], "id long, geometry binary"
    )
    base = str(tmp_path / "poly")
    geo_sinks.write_shp(df, base)
    stype, _, shapes = _read_shp(base + ".shp")
    assert stype == 5
    parts, pts = shapes[0]
    assert parts == (0, 5)
    outer, inner = pts[:5], pts[5:]

    def shoelace(r):
        return 0.5 * float(
            np.sum(r[:, 0] * np.roll(r[:, 1], -1) - np.roll(r[:, 0], -1) * r[:, 1])
        )

    assert shoelace(outer) < 0  # ESRI outer ring: clockwise
    assert shoelace(inner) > 0  # holes: counter-clockwise


def test_shp_multipolygon_parts(spark, tmp_path):
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    b = a + 5.0
    df = spark.createDataFrame(
        [(1, wkb.multipolygon([wkb.polygon(a), wkb.polygon(b)]))],
        "id long, geometry binary",
    )
    base = str(tmp_path / "mp")
    geo_sinks.write_shp(df, base)
    stype, _, shapes = _read_shp(base + ".shp")
    parts, pts = shapes[0]
    assert stype == 5 and parts == (0, 5) and len(pts) == 10


def test_shp_mixed_types_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, wkb.point(0.0, 0.0)),
            (2, wkb.linestring(np.array([[0.0, 0.0], [1.0, 1.0]]))),
        ],
        "id long, geometry binary",
    )
    with pytest.raises(ValueError, match="mixed"):
        geo_sinks.write_shp(df, str(tmp_path / "bad"))


def test_gpkg_layer_styles(vec_df, tmp_path):
    """layer_styles parity with the reference's styled GeoPackage
    (continental.py:413-415): the QGIS-schema table exists, is listed in
    gpkg_contents as attributes, rows read back, and re-writing the same
    (layer, styleName) replaces instead of duplicating."""
    import sqlite3

    path = str(tmp_path / "styled.gpkg")
    geo_sinks.write_gpkg(vec_df, path, layer="shorelines_annual", srs_id=3577)
    qml = '<!DOCTYPE qgis><qgis version="3.28"><renderer-v2 type="singleSymbol"/></qgis>'
    n = geo_sinks.write_layer_styles(
        path,
        [{"layer": "shorelines_annual", "style_name": "shorelines_annual",
          "qml": qml, "description": "annual shoreline style"}],
    )
    assert n == 1
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT f_table_name, f_geometry_column, styleName, styleQML, "
            "useAsDefault FROM layer_styles"
        ).fetchall()
        assert rows == [("shorelines_annual", "geometry",
                         "shorelines_annual", qml, 1)]
        (dt,) = con.execute(
            "SELECT data_type FROM gpkg_contents WHERE table_name='layer_styles'"
        ).fetchone()
        assert dt == "attributes"
    finally:
        con.close()
    # idempotent per (layer, styleName)
    geo_sinks.write_layer_styles(
        path, [{"layer": "shorelines_annual", "qml": qml}]
    )
    con = sqlite3.connect(path)
    try:
        (cnt,) = con.execute("SELECT count(*) FROM layer_styles").fetchone()
        assert cnt == 1
    finally:
        con.close()


def test_gpkg_multilayer_append(vec_df, tmp_path):
    """append=True adds layers to one GeoPackage (reference OUTPUT_GPKG
    is multi-layer); duplicate layer names are refused; both layers
    read back with intact metadata rows."""
    import sqlite3

    import pytest

    path = str(tmp_path / "multi.gpkg")
    n1 = geo_sinks.write_gpkg(vec_df, path, layer="layer_a")
    n2 = geo_sinks.write_gpkg(vec_df.limit(1), path, layer="layer_b", append=True)
    assert n1 > n2 == 1
    con = sqlite3.connect(path)
    try:
        names = {r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents").fetchall()}
        assert names == {"layer_a", "layer_b"}
        (c1,) = con.execute('SELECT count(*) FROM "layer_a"').fetchone()
        (c2,) = con.execute('SELECT count(*) FROM "layer_b"').fetchone()
        assert (c1, c2) == (n1, n2)
        geoms = {r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_geometry_columns").fetchall()}
        assert geoms == {"layer_a", "layer_b"}
    finally:
        con.close()
    with pytest.raises(ValueError, match="already exists"):
        geo_sinks.write_gpkg(vec_df, path, layer="layer_a", append=True)
