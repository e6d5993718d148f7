"""``spark.read.format("osmshp")`` — shapefiles as a registered Python
DataSource, with genuine RECORD-LEVEL splits.

Unlike PBF (whose blob framing must be walked from byte 0), a shapefile
ships its own random-access map: the ``.shx`` sidecar holds one
(offset, length) pair per record, and the ``.dbf`` attribute file is
fixed-width (record ``i`` at ``hdr_size + i*rec_size``).  So a single
big .shp splits EXACTLY into ``n_tasks`` stripes with no scanning at
all — each read task fetches the tiny .shx, seeks straight to its own
records in .shp and .dbf, and never touches the rest of the file.  The
driver only LISTS files.

    spark.dataSource.register(OsmShpDataSource)
    df = spark.read.format("osmshp").option("n_tasks", "8").load(dir_or_glob)

Output schema matches :func:`pydriosm_spark.sources.readers.read_shp_zip`
row-for-row: (layer, record_idx, shape_type, coordinates, parts,
fields json, src_file) — the reference's pyshp row surface
(/root/reference/pydriosm/reader/parser.py:472-607) with the layer name
derived from the filename.  Files without a ``.shx`` sidecar fall back
to one whole-file partition.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator, Tuple

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SHP_SCHEMA = (
    "layer string, record_idx long, shape_type int, "
    "coordinates array<array<double>>, parts array<int>, fields string, src_file string"
)
#: option("geometry", "wkt") appends the reconstructed WKT — the
#: reference's ``emulate_gpd=True`` shapely-geometry column
#: (parser.py:600-603) re-expressed as text geometry
SHP_SCHEMA_WKT = SHP_SCHEMA + ", geometry_wkt string"


def list_shp_files(path: str) -> list:
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        out = []
        for root, _dirs, files in os.walk(path):
            out += [os.path.join(root, f) for f in files if f.endswith(".shp")]
        return sorted(out)
    return sorted(p for p in glob.glob(path) if os.path.isfile(p))


class _RecStripe(InputPartition):
    def __init__(self, file: str, stripe: int, n_stripes: int):
        self.file, self.stripe, self.n_stripes = file, stripe, n_stripes


class _WholeShp(InputPartition):
    def __init__(self, file: str):
        self.file = file


class OsmShpReader(DataSourceReader):
    def __init__(self, options):
        self.n_tasks = int(options.get("n_tasks", "8"))
        self.with_wkt = options.get("geometry", "").lower() == "wkt"
        path = options.get("path")
        if not path:
            raise ValueError("osmshp: .load(path) or .option('path', ...) is required")
        self.files = list_shp_files(path)
        if not self.files:
            raise FileNotFoundError(f"osmshp: no .shp files under {path!r}")

    def partitions(self):
        parts = []
        for f in self.files:
            if os.path.exists(f[:-4] + ".shx"):
                parts += [_RecStripe(f, s, self.n_tasks) for s in range(self.n_tasks)]
            else:
                parts.append(_WholeShp(f))
        return parts

    def read(self, partition) -> Iterator[Tuple]:
        from pydriosm_spark.sources import shp as S
        from pydriosm_spark.sources.readers import layer_name_of_member

        f = partition.file
        base = os.path.basename(f)
        layer = layer_name_of_member(base) or base[:-4]
        dbf_path = f[:-4] + ".dbf"

        def row(i, st, pts, parts, rec):
            base_row = (
                layer, i, st,
                [[float(x), float(y)] for x, y in pts],
                list(parts),
                json.dumps(rec, default=str),
                f,
            )
            if not self.with_wkt:
                return base_row
            from pydriosm_spark.functions.transforms import shape_to_wkt

            return base_row + (shape_to_wkt(st, pts, parts or None),)

        if isinstance(partition, _WholeShp):
            with open(f, "rb") as fh:
                shapes = S.parse_shp(fh.read())
            recs = []
            if os.path.exists(dbf_path):
                with open(dbf_path, "rb") as fh:
                    recs = S.parse_dbf(fh.read())
            for i, (st, pts, parts) in enumerate(shapes):
                yield row(i, st, pts, parts, recs[i] if i < len(recs) else {})
            return

        with open(f[:-4] + ".shx", "rb") as fh:
            index = S.parse_shx(fh.read())
        dbf = None
        if os.path.exists(dbf_path):
            import struct

            with open(dbf_path, "rb") as fh:
                head = fh.read(32)
                hdr_size = struct.unpack("<H", head[8:10])[0]
                header = head + fh.read(max(0, hdr_size - 32))
            fields, _n, hdr_size, rec_size = S.parse_dbf_header(header)
            dbf = (fields, hdr_size, rec_size)

        s, k = partition.stripe, partition.n_stripes
        with open(f, "rb") as fh, (
            open(dbf_path, "rb") if dbf else open(os.devnull, "rb")
        ) as dh:
            for i in range(s, len(index), k):
                off, ln = index[i]
                fh.seek(off)
                st, pts, parts = S.parse_shp_record(fh.read(ln))
                rec = {}
                if dbf is not None:
                    fields, hdr_size, rec_size = dbf
                    dh.seek(hdr_size + i * rec_size)
                    raw = dh.read(rec_size)
                    if len(raw) == rec_size:
                        rec = S.parse_dbf_record(raw, fields) or {}
                yield row(i, st, pts, parts, rec)


@dataclass
class _ShpCommit(WriterCommitMessage):
    files: tuple
    rows: int


class OsmShpWriter(DataSourceWriter):
    """``df.write.format("osmshp").save(dir)`` — the shapefile SINK as a
    DataSource (reference K1's one-call write, parser.py:631-639 dtype
    surface via `shp_writer`): each task writes
    ``part-<pid>-<layer>.shp/.shx/.dbf/.prj/.cpg`` per layer it sees, the
    driver commits a ``_manifest.json`` (files + row counts, the lineage
    sidecar) and ``_SUCCESS`` only after every task reported — a
    half-written directory has no marker and readers can tell."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("osmshp write: .save(path) is required")
        self.layer_col = options.get("layer_col", "layer")
        if overwrite and os.path.isdir(self.path):
            import shutil

            for f in os.listdir(self.path):
                shutil.rmtree(os.path.join(self.path, f), ignore_errors=True) \
                    if os.path.isdir(os.path.join(self.path, f)) \
                    else os.remove(os.path.join(self.path, f))
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _ShpCommit:
        from pyspark import TaskContext

        from pydriosm_spark.sources.shp_writer import write_shapefile

        pid = TaskContext.get().partitionId()
        by_layer: dict = {}
        for row in iterator:
            d = row.asDict()
            layer = d.get(self.layer_col) or "layer"
            shapes, recs = by_layer.setdefault(layer, ([], []))
            shapes.append(
                (
                    int(d["shape_type"]),
                    [(float(x), float(y)) for x, y in d["coordinates"]],
                    [int(p) for p in (d["parts"] or [])],
                )
            )
            rec = d.get("fields")
            recs.append(json.loads(rec) if isinstance(rec, str) else (rec or {}))
        files = []
        total = 0
        for layer, (shapes, recs) in by_layer.items():
            base = os.path.join(self.path, f"part-{pid:05d}-{layer}")
            write_shapefile(base, shapes, recs)
            files.append(os.path.basename(base) + ".shp")
            total += len(shapes)
        return _ShpCommit(files=tuple(files), rows=total)

    def commit(self, messages) -> None:
        manifest = {
            "files": [f for m in messages if m for f in m.files],
            "rows": sum(m.rows for m in messages if m),
        }
        with open(os.path.join(self.path, "_manifest.json"), "w") as f:
            json.dump(manifest, f)
        open(os.path.join(self.path, "_SUCCESS"), "w").close()

    def abort(self, messages) -> None:
        for m in messages:
            if not m:
                continue
            for fn in m.files:
                base = os.path.join(self.path, fn[:-4])
                for ext in (".shp", ".shx", ".dbf", ".prj", ".cpg"):
                    try:
                        os.remove(base + ext)
                    except OSError:
                        pass


class OsmShpDataSource(DataSource):
    """Register once per session: ``spark.dataSource.register(OsmShpDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "osmshp"

    def schema(self):
        if self.options.get("geometry", "").lower() == "wkt":
            return SHP_SCHEMA_WKT
        return SHP_SCHEMA

    def reader(self, schema) -> OsmShpReader:
        return OsmShpReader(self.options)

    def writer(self, schema, overwrite: bool) -> OsmShpWriter:
        return OsmShpWriter(self.options, overwrite)
