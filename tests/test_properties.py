"""Property-based tests (hypothesis) over the pure geometry/index core —
no Spark session, runs in milliseconds per example."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pydriosm_spark.cells import quadcell as qc
from pydriosm_spark.functions.transforms import parse_hstore
from pydriosm_spark.geometry import ops
from pydriosm_spark.geometry.wkt import parse_wkt, to_wkt

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
resolutions = st.integers(min_value=0, max_value=29)


@given(lons, lats, resolutions)
def test_cell_contains_its_point(lon, lat, res):
    # tolerance 1e-7: a point within ~1 ulp of a cell edge may be
    # absorbed into the neighbor by the float formula — acceptable (and
    # identical across engines since both evaluate the same expression)
    c = qc.cell_id(lon, lat, res)
    minx, miny, maxx, maxy = qc.cell_bounds(c)
    assert minx - 1e-7 <= lon <= maxx + 1e-7
    assert miny - 1e-7 <= lat <= maxy + 1e-7


@given(lons, lats, st.integers(min_value=1, max_value=29), st.integers(min_value=0, max_value=28))
def test_parent_is_ancestor(lon, lat, res, parent_res):
    if parent_res >= res:
        return
    c = qc.cell_id(lon, lat, res)
    p = qc.parent(c, parent_res)
    assert int(qc.cell_res(p)) == parent_res
    # the parent's bounds contain the child's bounds
    cb, pb = qc.cell_bounds(c), qc.cell_bounds(p)
    assert pb[0] <= cb[0] and pb[1] <= cb[1] and pb[2] >= cb[2] and pb[3] >= cb[3]


@given(lons, lats, st.integers(min_value=1, max_value=28))
def test_children_partition_parent(lon, lat, res):
    c = int(qc.cell_id(lon, lat, res))
    kids = qc.children(c)
    assert len(kids) == 4
    assert sorted(set(int(qc.parent(k, res)) for k in kids)) == [c]
    assert qc.compact(kids) == [c]


coords = st.tuples(
    st.floats(min_value=-10, max_value=10, allow_nan=False).map(lambda x: round(x, 5)),
    st.floats(min_value=40, max_value=60, allow_nan=False).map(lambda x: round(x, 5)),
)


@given(st.lists(coords, min_size=3, max_size=12, unique=True))
@settings(max_examples=50)
def test_wkt_roundtrip_polygon(ring):
    ring = ring + [ring[0]]
    w = to_wkt(("Polygon", [np.array(ring)]))
    tag, rings = parse_wkt(w)
    assert tag == "Polygon"
    assert np.allclose(rings[0], np.array(ring))
    assert to_wkt((tag, rings)) == w


@given(st.lists(coords, min_size=3, max_size=8, unique=True), st.lists(coords, min_size=1, max_size=64))
@settings(max_examples=20, deadline=None)
def test_cover_membership_equals_pip(ring, pts):
    """Cover-join membership (any ancestor cell in cover, full flags
    honored) must agree with direct ray-casting for every sample point —
    the filter-refine invariant."""
    ring = ring + [ring[0]]
    rings = [np.array(ring, dtype=np.float64)]
    try:
        cover = qc.cover_polygon(rings, res=14)
    except ValueError:
        return  # cover too large at this res for a huge bbox — fine
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    truth = ops.points_in_polygon(px, py, rings)
    covset = {c for c, _ in cover}
    fullset = {c for c, f in cover if f}
    rs = sorted({int(qc.cell_res(c)) for c, _ in cover})
    in_cov = np.zeros(len(px), bool)
    in_full = np.zeros(len(px), bool)
    for r in rs:
        cid = qc.cell_id(px, py, r)
        in_cov |= np.isin(cid, list(covset))
        in_full |= np.isin(cid, list(fullset))
    # no inside point escapes the cover; no outside point sits in a full cell
    assert not np.any(truth & ~in_cov)
    assert not np.any(in_full & ~truth)


hstore_keys = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters=":_-"),
    min_size=1,
    max_size=12,
)
hstore_vals = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters=" :_-.!?"),
    min_size=0,
    max_size=20,
)


@given(st.dictionaries(hstore_keys, hstore_vals, min_size=1, max_size=6))
@settings(max_examples=100)
def test_hstore_roundtrip(d):
    # NOTE: values are drawn without ',' — the REFERENCE's own parser
    # mangles values containing '","' (its quote-boundary split fires
    # inside the value, transformer.py:366); we reproduce that behavior
    # byte-for-byte, so round-trip only holds on the unambiguous domain.
    s = ",".join(f'"{k}"=>"{v}"' for k, v in d.items())
    parsed = parse_hstore(s)
    want = {k: v.replace("<br>", " ") for k, v in d.items()}
    assert parsed == want


def test_hstore_reference_mangling_quirk():
    # pinned: the reference regex splits inside a value equal to ','
    assert parse_hstore('"0"=>","') == {"0": ""}

@given(
    st.lists(st.integers(0, (1 << 60) - 1), min_size=2, max_size=24, unique=True),
    st.sampled_from([(1, 4), (2, 4), (3, 4), (2, 5), (4, 5), (3, 6), (5, 6)]),
)
@settings(max_examples=120, deadline=None)
def test_simhash_composite_keys_pigeonhole_complete(sigs, rb):
    """PURE property of the rotate-block key scheme (no Spark): two
    signatures within Hamming distance radius MUST share at least one
    (blocks - radius)-subset composite key; and key agreement never
    invents pairs the exact verify would keep (keys are projections)."""
    from pydriosm_spark.operators.dedup import SIMHASH_BITS, simhash_key_subsets

    radius, blocks = rb
    bits = SIMHASH_BITS // blocks
    mask = (1 << bits) - 1
    subsets = simhash_key_subsets(radius, blocks)

    def keys(s):
        out = set()
        for i, sub in enumerate(subsets):
            val = 0
            for j, blk in enumerate(sub):
                val |= ((s >> (blk * bits)) & mask) << (j * bits)
            out.add((i, val))
        return out

    ks = {s: keys(s) for s in sigs}
    for i, a in enumerate(sigs):
        for b in sigs[i + 1:]:
            ham = bin(a ^ b).count("1")
            if ham <= radius:
                assert ks[a] & ks[b], (a, b, ham, radius, blocks)


@given(
    st.integers(2, 24).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(st.integers(0, 10**6), min_size=n - 1, max_size=n - 1),
        )
    )
)
@settings(max_examples=8, deadline=None)
def test_tier_depths_match_sequential_oracle(spark, seed):
    """Random forest: every node i>0 gets parent drawn from nodes < i
    (acyclic by construction).  Pointer-doubling depths must equal the
    trivial sequential walk."""
    from pydriosm_spark.functions.regions import tier_from_edges

    n, draws = seed
    parent = {0: None}
    for i in range(1, n):
        parent[i] = draws[i - 1] % i
    edges = [(f"r{i}", None if parent[i] is None else f"r{parent[i]}") for i in range(n)]
    df = spark.createDataFrame(edges, "region string, parent string")
    got = {r["region"]: r["depth"] for r in tier_from_edges(df).collect()}

    def depth(i):
        d = 0
        while parent[i] is not None:
            i = parent[i]
            d += 1
        return d

    assert got == {f"r{i}": depth(i) for i in range(n)}
