"""Minimal WKT codec (no external geometry libs in this environment).

Supports the five geometry families the reference's PBF layers emit
(/root/reference/pydriosm/reader/parser.py:1387-1393): Point, LineString,
MultiLineString, Polygon, MultiPolygon, plus GeometryCollection
(other_relations layer).  Coordinates are 2D WGS84.

Parsed form (the engine's internal geometry IR):
    ("Point",            (x, y))
    ("LineString",       ndarray (N,2))
    ("MultiLineString",  [ndarray (N,2), ...])
    ("Polygon",          [ring0, ring1, ...])       # ring = ndarray (N,2)
    ("MultiPolygon",     [[ring, ...], ...])
    ("GeometryCollection", [parsed, ...])

Formatting mirrors shapely's WKT style used by the reference for DB
storage (/root/reference/pydriosm/ios/_ios.py:482-488): ``POINT (1 2)``,
uppercase tag, single space after tag, no trailing zeros beyond repr.
"""

from __future__ import annotations

import re

import numpy as np

_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_PAIR_RE = re.compile(rf"({_NUM})\s+({_NUM})")


def _parse_coords(body: str) -> np.ndarray:
    pts = _PAIR_RE.findall(body)
    return np.array([[float(a), float(b)] for a, b in pts], dtype=np.float64)


def _split_top(body: str) -> list[str]:
    """Split a parenthesized list at depth 0 commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _strip_parens(s: str) -> str:
    s = s.strip()
    if s.startswith("(") and s.endswith(")"):
        return s[1:-1]
    return s


def parse_wkt(wkt: str):
    s = wkt.strip()
    m = re.match(r"^([A-Za-z]+)\s*(\(.*\)|EMPTY)$", s, re.S)
    if not m:
        raise ValueError(f"bad WKT: {wkt[:80]!r}")
    tag, body = m.group(1).upper(), m.group(2)
    if body == "EMPTY":
        return (tag.title(), [])
    inner = _strip_parens(body)
    if tag == "POINT":
        c = _parse_coords(inner)
        return ("Point", (float(c[0, 0]), float(c[0, 1])))
    if tag == "LINESTRING":
        return ("LineString", _parse_coords(inner))
    if tag == "MULTILINESTRING":
        return ("MultiLineString", [_parse_coords(_strip_parens(p)) for p in _split_top(inner)])
    if tag == "POLYGON":
        return ("Polygon", [_parse_coords(_strip_parens(p)) for p in _split_top(inner)])
    if tag == "MULTIPOLYGON":
        polys = []
        for poly in _split_top(inner):
            rings = [_parse_coords(_strip_parens(r)) for r in _split_top(_strip_parens(poly))]
            polys.append(rings)
        return ("MultiPolygon", polys)
    if tag == "GEOMETRYCOLLECTION":
        return ("GeometryCollection", [parse_wkt(p.strip()) for p in _split_top(inner)])
    raise ValueError(f"unsupported WKT tag {tag}")


def _fmt(v: float) -> str:
    # shapely-style: integral floats render without decimal part
    f = float(v)
    return str(int(f)) if f.is_integer() else repr(f)


def _fmt_coords(arr) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in np.asarray(arr, dtype=np.float64))


def to_wkt(geom) -> str:
    tag, data = geom
    t = tag.upper()
    if isinstance(data, (list, tuple)) and len(data) == 0:
        return f"{t} EMPTY"
    if t == "POINT":
        x, y = data
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if t == "LINESTRING":
        return f"LINESTRING ({_fmt_coords(data)})"
    if t == "MULTILINESTRING":
        return "MULTILINESTRING (" + ", ".join(f"({_fmt_coords(a)})" for a in data) + ")"
    if t == "POLYGON":
        return "POLYGON (" + ", ".join(f"({_fmt_coords(r)})" for r in data) + ")"
    if t == "MULTIPOLYGON":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(f"({_fmt_coords(r)})" for r in rings) + ")" for rings in data)
            + ")"
        )
    if t == "GEOMETRYCOLLECTION":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(g) for g in data) + ")"
    raise ValueError(f"unsupported geom {tag}")
