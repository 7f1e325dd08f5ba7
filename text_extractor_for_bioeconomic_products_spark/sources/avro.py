"""Pure-stdlib Avro Object Container File (OCF) source + sink.

Avro is the Kafka-ecosystem interchange format a transcript pipeline
meets constantly, and Spark's own reader lives in the external
``spark-avro`` artifact — absent from this container.  As with the
OOXML writer (`xlsx.py`) and the image/video codecs
(`operators/multimodal.py`), the format itself is public structure the
stdlib can express: the OCF layout (magic, metadata map, sync-marked
blocks) and the Avro binary encoding (zigzag-varint longs,
length-prefixed strings/bytes, union branch indexes, raw-deflate
blocks) come straight from the Avro 1.11 specification.

Scope: records of the primitive types (null, boolean, int, long,
float, double, string, bytes), nullable fields as ``["null", T]``
unions, ``timestamp-micros`` logical longs, and — recursively —
nested records and arrays, so both the transcript INPUT shape and the
extraction OUTPUT shape (``spans array<struct<..., array<string>>>``)
roundtrip.  Maps, other unions, and the snappy codec raise
``NotImplementedError``.

Scale model (the 100 TB story): files are written one-per-Arrow-batch
from executors (`write_avro_distributed`), so the sink parallelizes
with the upstream partitioning and never funnels rows through the
driver; the reader lists files cheaply, reads ONE header on the driver
for the schema, and decodes whole files in executors via
``binaryFile`` + ``mapInPandas`` — one task per file, the
`read_text_corpus` parallelism model.  (Production Spark clusters
would mount the spark-avro jar and split on sync markers inside files;
this module is the dependency-free parity path, honest about that
boundary.)

Reference analog: the format-dispatch scan `src/core/text_extractor.py:
28-48` — this adds a format the reference never had, in the same
dispatch discipline (explicit schema, unsupported ⇒ error).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import shutil
import struct
import tempfile
import zlib
from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_RECORDS_PER_BLOCK = 4096

# ---------------------------------------------------------------------------
# Binary primitives (Avro spec §Binary Encoding)
# ---------------------------------------------------------------------------


def _enc_long(n: int) -> bytes:
    """Zigzag + unsigned LEB128 varint."""
    z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: memoryview, pos: int) -> Tuple[int, int]:
    z, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated Avro varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 70:
            raise ValueError("malformed Avro varint (>70 bits)")
    return (z >> 1) ^ -(z & 1), pos


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


def _dec_bytes(buf: memoryview, pos: int) -> Tuple[bytes, int]:
    n, pos = _dec_long(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("truncated Avro bytes")
    return bytes(buf[pos:pos + n]), pos + n


# ---------------------------------------------------------------------------
# Schema mapping: Spark StructType <-> Avro record schema (recursive —
# nested structs → named records, arrays → avro arrays, so the
# EXTRACTION OUTPUT (spans array<struct<..., arrays>>) persists too)
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    T.StringType(): "string",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.BooleanType(): "boolean",
    T.BinaryType(): "bytes",
}


def avro_schema_of(schema: T.StructType, name: str = "row") -> dict:
    """Spark StructType → Avro record schema (nullable → union;
    timestamps → long/timestamp-micros; StructType → nested record;
    ArrayType → avro array).  Unsupported Spark types raise, matching
    the dispatch discipline (error, never guess)."""
    seq = [0]  # avro named-type uniqueness across the whole schema

    def conv(dt: T.DataType, nullable: bool, hint: str) -> object:
        if isinstance(dt, T.TimestampType):
            at: object = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.StructType):
            seq[0] += 1
            at = {
                "type": "record", "name": f"{hint}_r{seq[0]}",
                "fields": [
                    {"name": f.name,
                     "type": conv(f.dataType, f.nullable, f.name)}
                    for f in dt.fields
                ],
            }
        elif isinstance(dt, T.ArrayType):
            at = {"type": "array",
                  "items": conv(dt.elementType, dt.containsNull, hint)}
        elif dt in _SPARK_TO_AVRO:
            at = _SPARK_TO_AVRO[dt]
        else:
            raise NotImplementedError(
                f"no Avro mapping for Spark type {dt} (field {hint!r})"
            )
        return ["null", at] if nullable else at

    return {
        "type": "record", "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable, f.name)}
            for f in schema.fields
        ],
    }


def spark_schema_of(avro_schema: dict) -> T.StructType:
    """Avro record schema → Spark StructType (inverse of the above)."""
    if avro_schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    rev = {
        "string": T.StringType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
    }

    def resolve(at: object) -> Tuple[T.DataType, bool]:
        if isinstance(at, list):  # union — only ["null", T] supported
            branches = [b for b in at if b != "null"]
            if len(branches) != 1 or len(at) != 2:
                raise NotImplementedError(
                    f"only [\"null\", T] unions supported, got {at}"
                )
            dt, _ = resolve(branches[0])
            return dt, True
        if isinstance(at, dict):
            if at.get("logicalType") == "timestamp-micros":
                return T.TimestampType(), False
            if at.get("type") == "record":
                sfields = []
                for f in at["fields"]:
                    fdt, fnull = resolve(f["type"])
                    sfields.append(T.StructField(f["name"], fdt, fnull))
                return T.StructType(sfields), False
            if at.get("type") == "array":
                idt, inull = resolve(at["items"])
                return T.ArrayType(idt, inull), False
            at = at.get("type")
        if at in rev:
            return rev[at], False  # type: ignore[index]
        raise NotImplementedError(f"unsupported Avro type {at!r}")

    out = []
    for f in avro_schema["fields"]:
        dt, nullable = resolve(f["type"])
        out.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(out)


# ---------------------------------------------------------------------------
# Recursive value codec against a parsed Avro schema.  Each avro type
# compiles once to an (enc, dec) closure pair; rows then stream through
# plain function calls with no per-value schema dispatch.
# ---------------------------------------------------------------------------


def _is_null(v: object) -> bool:
    if v is None or v is pd.NaT:
        return True
    # scalar pandas/numpy missing markers; containers are never "na"
    if isinstance(v, (list, tuple, dict, bytes, str)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _codec_for(at: object):
    """avro type (str | dict | ["null", T]) → (enc(v)->bytes,
    dec(buf, pos)->(value, pos))."""
    if isinstance(at, list):  # union — only ["null", T]
        branches = [b for b in at if b != "null"]
        if len(branches) != 1 or len(at) != 2:
            raise NotImplementedError(
                f"only [\"null\", T] unions supported, got {at}"
            )
        ienc, idec = _codec_for(branches[0])

        def enc_u(v: object) -> bytes:
            if _is_null(v):
                return b"\x00"  # zigzag(0): null branch
            return b"\x02" + ienc(v)  # zigzag(1): value branch

        def dec_u(buf: memoryview, pos: int) -> Tuple[object, int]:
            branch, pos = _dec_long(buf, pos)
            if branch == 0:
                return None, pos
            if branch != 1:
                raise ValueError(f"union branch {branch} out of range")
            return idec(buf, pos)

        return enc_u, dec_u

    if isinstance(at, dict):
        if at.get("logicalType") == "timestamp-micros":

            def enc_ts(v: object) -> bytes:
                return _enc_long(pd.Timestamp(v).value // 1000)

            def dec_ts(buf: memoryview, pos: int) -> Tuple[object, int]:
                n, pos = _dec_long(buf, pos)
                return pd.Timestamp(n * 1000), pos  # ns resolution

            return enc_ts, dec_ts

        if at.get("type") == "record":
            names = [f["name"] for f in at["fields"]]
            codecs = [_codec_for(f["type"]) for f in at["fields"]]

            def enc_rec(v: object) -> bytes:
                if isinstance(v, dict):
                    vals = [v.get(n) for n in names]
                else:  # Row / tuple / list — positional
                    vals = list(v)  # type: ignore[arg-type]
                    if len(vals) != len(names):
                        raise ValueError(
                            f"record expects {len(names)} fields, "
                            f"got {len(vals)}"
                        )
                return b"".join(e(x) for (e, _d), x in zip(codecs, vals))

            def dec_rec(buf: memoryview, pos: int) -> Tuple[object, int]:
                out = {}
                for n, (_e, d) in zip(names, codecs):
                    out[n], pos = d(buf, pos)
                return out, pos

            return enc_rec, dec_rec

        if at.get("type") == "array":
            ienc, idec = _codec_for(at["items"])

            def enc_arr(v: object) -> bytes:
                items = list(v)  # type: ignore[arg-type]
                if not items:
                    return b"\x00"
                return (_enc_long(len(items))
                        + b"".join(ienc(x) for x in items) + b"\x00")

            def dec_arr(buf: memoryview, pos: int) -> Tuple[object, int]:
                out: list = []
                while True:
                    n, pos = _dec_long(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:  # negative count prefixes a byte size (spec)
                        n = -n
                        _, pos = _dec_long(buf, pos)
                    for _ in range(n):
                        x, pos = idec(buf, pos)
                        out.append(x)

            return enc_arr, dec_arr

        at = at.get("type")  # {"type": "string"} longhand

    if at in ("long", "int"):
        def enc_i(v: object) -> bytes:
            return _enc_long(int(v))  # type: ignore[arg-type]
        return enc_i, _dec_long
    if at == "string":
        def enc_s(v: object) -> bytes:
            return _enc_str(str(v))

        def dec_s(buf: memoryview, pos: int) -> Tuple[object, int]:
            b, pos = _dec_bytes(buf, pos)
            return b.decode("utf-8"), pos
        return enc_s, dec_s
    if at == "bytes":
        def enc_b(v: object) -> bytes:
            return _enc_bytes(bytes(v))  # type: ignore[arg-type]
        return enc_b, _dec_bytes
    if at == "double":
        def enc_d(v: object) -> bytes:
            return struct.pack("<d", float(v))  # type: ignore[arg-type]

        def dec_d(buf: memoryview, pos: int) -> Tuple[object, int]:
            return struct.unpack("<d", buf[pos:pos + 8])[0], pos + 8
        return enc_d, dec_d
    if at == "float":
        def enc_f(v: object) -> bytes:
            return struct.pack("<f", float(v))  # type: ignore[arg-type]

        def dec_f(buf: memoryview, pos: int) -> Tuple[object, int]:
            return struct.unpack("<f", buf[pos:pos + 4])[0], pos + 4
        return enc_f, dec_f
    if at == "boolean":
        def enc_o(v: object) -> bytes:
            return b"\x01" if v else b"\x00"

        def dec_o(buf: memoryview, pos: int) -> Tuple[object, int]:
            return buf[pos] == 1, pos + 1
        return enc_o, dec_o
    raise NotImplementedError(f"unsupported Avro type {at!r}")


# ---------------------------------------------------------------------------
# OCF writer / reader (bytes-level; no Spark)
# ---------------------------------------------------------------------------


def write_avro_bytes(
    records: List[tuple], avro_schema: dict, codec: str = "deflate",
    extra_meta: dict | None = None,
) -> bytes:
    """Serialize records (tuples in schema field order) to one OCF
    payload.  The 16-byte sync marker is derived from the schema+codec
    +extra-metadata hash, so identical inputs produce byte-identical
    files — determinism is load-bearing for this repo's equality
    checks.  ``extra_meta`` adds application key-value pairs to the
    OCF header map (e.g. the Iceberg spec's required manifest header
    keys); values may be str or bytes."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} (null/deflate only)")
    schema_json = json.dumps(avro_schema, sort_keys=True)
    extra = {
        k: (v.encode() if isinstance(v, str) else bytes(v))
        for k, v in (extra_meta or {}).items()
    }
    sync = hashlib.md5(
        (schema_json + ":" + codec + ":"
         + ",".join(f"{k}={extra[k].hex()}" for k in sorted(extra))).encode()
    ).digest()
    enc_row, _dec = _codec_for(avro_schema)

    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    meta.update(extra)
    out.write(_enc_long(len(meta)))
    for k, v in sorted(meta.items()):
        out.write(_enc_str(k))
        out.write(_enc_bytes(v))
    out.write(_enc_long(0))  # end of metadata map
    out.write(sync)

    for start in range(0, len(records), _RECORDS_PER_BLOCK):
        chunk = records[start:start + _RECORDS_PER_BLOCK]
        body = io.BytesIO()
        for rec in chunk:
            body.write(enc_row(rec))
        data = body.getvalue()
        if codec == "deflate":
            data = zlib.compress(data, 6)[2:-4]  # raw deflate per spec
        out.write(_enc_long(len(chunk)))
        out.write(_enc_long(len(data)))
        out.write(data)
        out.write(sync)
    return out.getvalue()


def read_avro_header(payload: bytes) -> Tuple[dict, str, bytes, int]:
    """→ (avro_schema, codec, sync, first_block_pos).  Real parse of
    the metadata map; wrong magic or truncation raises."""
    buf = memoryview(payload)
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not an Avro OCF payload (bad magic)")
    pos, meta = 4, {}
    while True:
        n, pos = _dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative count prefixes a byte size (spec); skip it
            n = -n
            _, pos = _dec_long(buf, pos)
        for _ in range(n):
            k, pos = _dec_bytes(buf, pos)
            v, pos = _dec_bytes(buf, pos)
            meta[k.decode()] = v
    if pos + 16 > len(buf):
        raise ValueError("truncated Avro header (no sync marker)")
    sync = bytes(buf[pos:pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} (null/deflate only)")
    return schema, codec, sync, pos


def read_avro_bytes(payload: bytes) -> Tuple[dict, List[tuple]]:
    """→ (avro_schema, records).  Walks every block, verifies each
    trailing sync marker, inflates raw-deflate block data, and decodes
    exactly the declared record count — count lies and truncation
    raise rather than under-read."""
    schema, codec, sync, pos = read_avro_header(payload)
    _enc, dec_row = _codec_for(schema)
    names = [f["name"] for f in schema["fields"]]
    buf = memoryview(payload)
    records: List[tuple] = []
    while pos < len(buf):
        n_rec, pos = _dec_long(buf, pos)
        size, pos = _dec_long(buf, pos)
        if n_rec < 0 or size < 0 or pos + size + 16 > len(buf):
            raise ValueError("truncated/malformed Avro block")
        data = bytes(buf[pos:pos + size])
        pos += size
        if bytes(buf[pos:pos + 16]) != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += 16
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        dbuf, dpos = memoryview(data), 0
        for _ in range(n_rec):
            d, dpos = dec_row(dbuf, dpos)
            records.append(tuple(d[n] for n in names))
        if dpos != len(dbuf):
            raise ValueError(
                f"Avro block declares {n_rec} records but carries "
                f"{len(dbuf) - dpos} undecoded trailing bytes"
            )
    return schema, records


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def write_avro_distributed(
    df: DataFrame, path: str, codec: str = "deflate",
) -> DataFrame:
    """Distributed OCF sink: one .avro file per Arrow batch, written
    from the executors (the upstream partitioning IS the file
    parallelism — no driver funnel), named by content hash so reruns
    are idempotent at the file level.  The write executes EAGERLY
    (lazy sinks that only fire when someone happens to collect a
    manifest are a silent-no-op trap); what crosses back to the driver
    is one (file, n_rows) row per batch — bounded by partition count,
    never by data — returned as the manifest DataFrame, the caller's
    lineage hook."""
    os.makedirs(path, exist_ok=True)
    schema = avro_schema_of(df.schema)
    cols = [f.name for f in df.schema.fields]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # null normalization happens inside the union codec
            # (_is_null: None/NaT/scalar-NA; containers never "na")
            recs = list(pdf[cols].itertuples(index=False, name=None))
            payload = write_avro_bytes(recs, schema, codec=codec)
            name = hashlib.sha256(payload).hexdigest()[:24] + ".avro"
            fpath = os.path.join(path, name)
            tmp = fpath + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(payload)
            os.replace(tmp, fpath)  # atomic publish, rerun-idempotent
            yield pd.DataFrame({"file": [name], "n_rows": [len(recs)]})

    manifest_rows = df.mapInPandas(
        op, schema="file string, n_rows long"
    ).collect()  # bounded: one row per Arrow batch
    return df.sparkSession.createDataFrame(
        manifest_rows or [],
        schema="file string, n_rows long",
    )


def read_avro(
    spark: SparkSession, path: str, bad_files: str = "error",
) -> DataFrame:
    """Distributed OCF scan: driver reads ONE header for the schema
    (bounded metadata read, no data scanned), then ``binaryFile`` +
    ``mapInPandas`` decodes whole files in executors — one task per
    file, the `read_text_corpus` parallelism model.  Mixed-schema
    directories error per file rather than silently coercing.

    ``bad_files``: "error" (default) fails the job on the first
    corrupt/truncated/foreign-schema file — the right default for a
    correctness-gated pipeline; "skip" drops such files and keeps the
    scan alive — the per-file quarantine discipline (S5) for a
    100 TB ingest where one torn file must not kill the fleet.  Use
    ``audit_avro`` to enumerate exactly which files were dropped and
    why (skipping without an audit trail would be silent data loss)."""
    if bad_files not in ("error", "skip"):
        raise ValueError(f"bad_files must be 'error' or 'skip', got {bad_files!r}")
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".avro")
    )
    if not files:
        raise ValueError(f"no .avro files under {path!r}")
    with open(os.path.join(path, files[0]), "rb") as fh:
        head = fh.read(1 << 20)
    avro_schema, _codec, _sync, _pos = read_avro_header(head)
    out_schema = spark_schema_of(avro_schema)
    expect = json.dumps(avro_schema, sort_keys=True)
    cols = [f.name for f in out_schema.fields]
    ts_cols = [f.name for f in out_schema.fields
               if isinstance(f.dataType, T.TimestampType)]

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for payload in pdf["content"]:
                try:
                    schema, records = read_avro_bytes(bytes(payload))
                    if json.dumps(schema, sort_keys=True) != expect:
                        raise ValueError(
                            "Avro file schema differs from the directory's "
                            "first file — refusing to coerce"
                        )
                except Exception:
                    if bad_files == "skip":
                        continue
                    raise
                out = pd.DataFrame(records, columns=cols)
                for c in ts_cols:  # object Timestamps → datetime64 for Arrow
                    out[c] = pd.to_datetime(out[c])
                yield out

    return binary.mapInPandas(op, schema=out_schema)


def audit_avro(spark: SparkSession, path: str) -> DataFrame:
    """Per-file scan health: (file, ok, n_rows, error) for every .avro
    under ``path`` — the audit trail that makes ``bad_files='skip'``
    honest.  Decodes in executors (same parallelism as the scan); the
    error column carries the exception class and message for the
    quarantined files."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("path", "content")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, payload in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(fpath)
                try:
                    _schema, records = read_avro_bytes(bytes(payload))
                    rows.append((name, True, len(records), None))
                except Exception as exc:  # quarantine row, job survives
                    rows.append(
                        (name, False, 0, f"{type(exc).__name__}: {exc}")
                    )
            yield pd.DataFrame(
                rows, columns=["file", "ok", "n_rows", "error"]
            )

    return binary.mapInPandas(
        op, schema="file string, ok boolean, n_rows long, error string"
    ).orderBy("file")


# ---------------------------------------------------------------------------
# Driver query: roundtrip census (oracle-checked lossless-ness)
# ---------------------------------------------------------------------------


def q_avro_roundtrip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → distributed Avro write → distributed Avro read →
    per-lang census with md5 content fingerprints.  The oracle computes
    the SAME census on the parquet documents view directly, so a green
    row proves the OCF encode→decode chain byte-preserved every text —
    the per-turn-equality discipline applied to a source format."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tmp = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_avro_census_"
        + hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10],
    )
    shutil.rmtree(tmp, ignore_errors=True)
    write_avro_distributed(docs, tmp)
    back = read_avro(spark, tmp)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct(F.md5("text")).alias("n_distinct_text"),
            F.min(F.md5("text")).alias("min_text_md5"),
            F.max(F.md5("text")).alias("max_text_md5"),
        )
        .orderBy("lang")
    )


QUERIES = {
    "avro_roundtrip_census": q_avro_roundtrip_census,
}

ORACLE_SQL = {
    # DuckDB sum(BIGINT) is HUGEINT — CAST wraps the sum (repo-wide rule)
    "avro_roundtrip_census": """
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               count(DISTINCT md5(text)) AS n_distinct_text,
               min(md5(text)) AS min_text_md5,
               max(md5(text)) AS max_text_md5
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
}
