"""Pure-Python Avro binary codec (SURVEY §2.1 S3 — runtime fallback).

The reference ships CDC records as Confluent-framed Schema-Registry
Avro (users-debezium-connector.json:19-25: AvroConverter + registry
URL; data-ingestion design.md:314-321,345-360 for the BACKWARD
compatibility rule). The preferred Spark path is the spark-avro jar's
``to_avro``/``from_avro`` (see ``avro_codec``); this sandbox has no
connector jar and no network, so the wire format is implemented here
directly from the public Avro 1.12 binary-encoding spec:

- zigzag varint longs/ints, IEEE little-endian float/double,
  length-prefixed bytes/strings, union-index-prefixed ``[null, T]``
  unions, fields concatenated in schema order;
- Confluent wire framing: magic byte 0x00 + big-endian 4-byte schema
  id + Avro body.

Runs as Arrow-batched ``mapInPandas`` — the per-record byte packing is
Python (this is the jarless fallback, not the 100 TB hot path; with
the jar present ``avro_codec.encode/decode`` are drop-in JVM
replacements over the same frames). BACKWARD evolution is expressed
reader-side: decode with the writer schema, then fill fields the
reader schema added (must be nullable/defaulted — the registry
compatibility rule) — see ``decode_records(..., reader_schema=)``.
"""

from __future__ import annotations

import json
import struct as _struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = 0


# --- primitive byte-level codec (Avro spec §binary encoding) ---------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


_PRIM_WRITERS = {
    "boolean": lambda out, v: out.append(1 if v else 0),
    "int": _write_long,
    "long": _write_long,
    "float": lambda out, v: out.extend(_struct.pack("<f", v)),
    "double": lambda out, v: out.extend(_struct.pack("<d", v)),
    "string": lambda out, v: (_write_long(out, len(b := v.encode("utf-8"))), out.extend(b)),
    "bytes": lambda out, v: (_write_long(out, len(v)), out.extend(v)),
}


_BRANCH_PY_TYPES = {
    "boolean": (bool,),
    "int": (int,),
    "long": (int,),
    "float": (float, int),
    "double": (float, int),
    "string": (str,),
    "bytes": (bytes, bytearray),
}


def _branch_accepts(typ, v) -> bool:
    if isinstance(typ, dict):
        if typ.get("type") == "record":
            return isinstance(v, dict)
        typ = typ["type"]  # annotated primitive (logicalType wrapper)
    ok = _BRANCH_PY_TYPES.get(typ)
    # bool is an int subclass: keep it out of the numeric branches
    if ok and isinstance(v, bool):
        return typ == "boolean"
    return bool(ok) and isinstance(v, ok)


def _write_value(out: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # union — index varint, then the value
        if v is None:
            _write_long(out, typ.index("null"))
            return
        # pick the union branch by the value's RUNTIME type — a blind
        # first-non-null choice mis-encodes any union beyond [null, T]
        branch = next(
            (i for i, t in enumerate(typ) if t != "null" and _branch_accepts(t, v)),
            None,
        )
        if branch is None:
            raise ValueError(f"no union branch in {typ!r} accepts {type(v).__name__}")
        _write_long(out, branch)
        _write_value(out, typ[branch], v)
    elif isinstance(typ, dict) and typ.get("type") == "record":
        for f in typ["fields"]:
            _write_value(out, f["type"], v[f["name"]])
    elif isinstance(typ, dict):
        # annotated primitive ({"type": "int", "logicalType": "date"}):
        # logical types share their base type's byte encoding
        _PRIM_WRITERS[typ["type"]](out, v)
    else:
        _PRIM_WRITERS[typ](out, v)


def _read_value(buf: bytes, pos: int, typ):
    if isinstance(typ, list):
        idx, pos = _read_long(buf, pos)
        if typ[idx] == "null":
            return None, pos
        return _read_value(buf, pos, typ[idx])
    if isinstance(typ, dict) and typ.get("type") == "record":
        rec = {}
        for f in typ["fields"]:
            rec[f["name"]], pos = _read_value(buf, pos, f["type"])
        return rec, pos
    if isinstance(typ, dict):  # annotated primitive: base-type bytes
        return _read_value(buf, pos, typ["type"])
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _read_long(buf, pos)
    if typ == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type {typ!r}")  # pragma: no cover


def encode_record(rec: dict, schema: dict, schema_id: int) -> bytes:
    """One Confluent-framed Avro message: 0x00 + id(4, BE) + body."""
    out = bytearray()
    out.append(MAGIC)
    out.extend(_struct.pack(">I", schema_id))
    _write_value(out, schema, rec)
    return bytes(out)


def decode_record(msg: bytes, schema: dict) -> tuple[int, dict]:
    """Returns (schema_id, record) from a Confluent-framed message."""
    if msg[0] != MAGIC:
        raise ValueError("bad magic byte")
    (schema_id,) = _struct.unpack_from(">I", msg, 1)
    rec, _pos = _read_value(msg, 5, schema)
    return schema_id, rec


# --- DataFrame-level plumbing ----------------------------------------------

_AVRO_FOR_SPARK = {
    "long": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "string": "string",
    "bytes": "binary",
}


_LOGICAL_FOR_SPARK = {"date": "date", "timestamp-micros": "timestamp"}


def _spark_type(typ) -> str:
    if isinstance(typ, list):
        return _spark_type(next(t for t in typ if t != "null"))
    if isinstance(typ, dict):
        lt = typ.get("logicalType")
        if lt in _LOGICAL_FOR_SPARK:
            return _LOGICAL_FOR_SPARK[lt]
        return _AVRO_FOR_SPARK[typ["type"]]
    return _AVRO_FOR_SPARK[typ]


def _logical_type(typ) -> str | None:
    if isinstance(typ, list):
        typ = next(t for t in typ if t != "null")
    return typ.get("logicalType") if isinstance(typ, dict) else None


def _spark_schema(schema: dict) -> str:
    return ", ".join(f"`{f['name']}` {_spark_type(f['type'])}" for f in schema["fields"])


def schema_for(df: DataFrame, name: str = "Record", nullable_all: bool = True) -> dict:
    """Derive a flat Avro record schema from a DataFrame's columns
    (primitives only — the CDC payload shape). ``nullable_all`` wraps
    every field in ``[null, T]``, the registry-friendly default.
    Date/timestamp columns carry their Avro logicalType annotations
    (``date`` / ``timestamp-micros``) so readers — including
    ``decode_records`` — can restore the logical value; the spec-
    invalid ``default: null`` is emitted only on nullable fields."""
    from pyspark.sql import types as T

    back = {
        T.LongType(): "long",
        T.IntegerType(): "int",
        T.DoubleType(): "double",
        T.FloatType(): "float",
        T.BooleanType(): "boolean",
        T.StringType(): "string",
        T.BinaryType(): "bytes",
        T.DateType(): {"type": "int", "logicalType": "date"},
        T.TimestampType(): {"type": "long", "logicalType": "timestamp-micros"},
    }
    fields = []
    for f in df.schema.fields:
        t = back.get(f.dataType)
        if t is None:
            raise ValueError(f"no flat Avro mapping for column {f.name}: {f.dataType}")
        fld = {"name": f.name, "type": ["null", t] if nullable_all else t}
        if nullable_all:
            fld["default"] = None
        fields.append(fld)
    return {"type": "record", "name": name, "fields": fields}


def _date_cols(schema: dict, df_schema) -> dict:
    from pyspark.sql import types as T

    kinds = {}
    for f in df_schema.fields:
        if isinstance(f.dataType, T.DateType):
            kinds[f.name] = "date"
        elif isinstance(f.dataType, T.TimestampType):
            kinds[f.name] = "ts"
    return kinds


def encode_records(df: DataFrame, schema: dict, schema_id: int = 1) -> DataFrame:
    """(cols...) → (value binary): Confluent-framed Avro per row.

    Date/timestamp columns follow the Avro logical types (days since
    epoch / micros since epoch); numpy scalars are unboxed; NaN/NaT
    become the null union branch."""
    import datetime

    import numpy as np
    import pandas as pd

    kinds = _date_cols(schema, df.schema)
    sch = json.dumps(schema)
    epoch = datetime.date(1970, 1, 1)

    def _plain(c, v):
        if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
            return None
        if kinds.get(c) == "date":
            d = v.date() if isinstance(v, datetime.datetime) else v
            return (d - epoch).days
        if kinds.get(c) == "ts":
            return int(pd.Timestamp(v).value // 1000)  # ns → micros
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.bool_):
            return bool(v)
        return v

    def enc(batches):
        schema_l = json.loads(sch)
        for pdf in batches:
            cols = list(pdf.columns)
            vals = [
                encode_record(
                    {c: _plain(c, v) for c, v in zip(cols, tup)}, schema_l, schema_id
                )
                for tup in pdf.itertuples(index=False, name=None)
            ]
            yield pd.DataFrame({"value": vals})

    return df.mapInPandas(enc, "value binary")


def decode_records(
    df: DataFrame, writer_schema: dict, reader_schema: dict | None = None
) -> DataFrame:
    """(value binary) → reader-shaped columns.

    BACKWARD evolution: bytes are decoded with the *writer* schema;
    fields only the reader knows are filled with their defaults
    (must be nullable/defaulted — the Schema Registry BACKWARD rule
    the reference enforces). Output column order follows the reader.
    """
    import pandas as pd

    reader = reader_schema or writer_schema
    out_schema = _spark_schema(reader)
    wsch, rsch = json.dumps(writer_schema), json.dumps(reader)

    def dec(batches):
        import datetime

        w, r = json.loads(wsch), json.loads(rsch)
        rnames = [f["name"] for f in r["fields"]]
        defaults = {f["name"]: f.get("default") for f in r["fields"]}
        logical = {f["name"]: _logical_type(f["type"]) for f in r["fields"]}
        epoch = datetime.date(1970, 1, 1)

        def restore(name, v):
            if v is None:
                return None
            lt = logical.get(name)
            if lt == "date":
                return epoch + datetime.timedelta(days=v)
            if lt == "timestamp-micros":
                return pd.Timestamp(v, unit="us")
            return v

        for pdf in batches:
            rows = []
            for msg in pdf["value"]:
                _sid, rec = decode_record(bytes(msg), w)
                rows.append(
                    [restore(n, rec.get(n, defaults.get(n))) for n in rnames]
                )
            yield pd.DataFrame(rows, columns=rnames)

    return df.mapInPandas(dec, out_schema)


def avro_roundtrip(spark, sf_dir: str) -> DataFrame:
    """Driver-checkable S3 exercise: push a deterministic orders slice
    through Confluent-framed Avro encode → decode and return the
    decoded rows. The DuckDB oracle is the identity projection of the
    same slice — a byte-level codec bug (varint, zigzag, framing,
    union index, field order) surfaces as a value mismatch."""
    from datapipe_spark.sources.tables import load_table

    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
        )
        .filter(F.col("o_orderkey") % 7 == 0)
    )
    schema = schema_for(o, name="Order")
    return decode_records(encode_records(o, schema, schema_id=42), schema)


AVRO_ROUNDTRIP_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate
FROM orders WHERE o_orderkey % 7 = 0
"""
