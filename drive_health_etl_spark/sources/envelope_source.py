"""Custom Python DataSource making the envelope push stream a first-class
Spark source (S1; Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests via an HTTP push endpoint (``src/app.js:31-68``:
one Pub/Sub push body per request). The Spark-native equivalent of that
endpoint is a *spool*: the HTTP front door appends push bodies to
JSON-lines files in a directory (atomic write-then-rename, lexicographic
name = arrival order), and this DataSource exposes the spool as

    spark.read.format("envelope").option("path", dir).load()          # batch
    spark.readStream.format("envelope").option("path", dir).load()    # stream

yielding RAW_MESSAGE_SCHEMA rows (data/attributes/message_id/ordering_key)
that feed the exact same ingest chain as the parquet-shaped input — the
decode/validate/route operators don't know or care which source ran.

Scale/semantics notes:
- Batch reads distribute one InputPartition per spool file (parse runs on
  executors, not the driver).
- The stream reader is a SimpleDataSourceStreamReader: offsets are
  "number of spool files fully consumed", so micro-batch replay after a
  crash re-reads exactly the files of the failed batch (at-least-once from
  the source; the sink's idempotency-key dedup upgrades it to
  exactly-once end-to-end, same as ST3/ST4).
- Push bodies may be Pub/Sub-shaped (``{"message": {"data": ...,
  "attributes": ..., "messageId": ..., "orderingKey": ...}}``,
  ``src/handler.js:43``) or already-flat; both are accepted.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA_DDL = "data string, attributes map<string,string>, message_id string, ordering_key string"


def _parse_line(line: str) -> tuple:
    """One spool line -> (data, attributes, message_id, ordering_key).
    Unparseable lines become rows with data=raw line so the ingest chain's
    FORMAT_ERROR routing (not the source) decides their fate."""
    line = line.strip()
    if not line:
        return None
    try:
        body = json.loads(line)
    except ValueError:
        return (line, {}, None, None)
    msg = body.get("message", body) if isinstance(body, dict) else {}
    if not isinstance(msg, dict):
        return (line, {}, None, None)
    attrs = msg.get("attributes") or {}
    if not isinstance(attrs, dict):
        attrs = {}
    return (
        msg.get("data"),
        {str(k): str(v) for k, v in attrs.items()},
        msg.get("messageId", msg.get("message_id")),
        msg.get("orderingKey", msg.get("ordering_key")),
    )


def _spool_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith((".", "_"))  # in-flight temp files are dotted
    )


def _read_file(fpath: str) -> Iterator[tuple]:
    with open(fpath, encoding="utf-8") as fh:
        for line in fh:
            row = _parse_line(line)
            if row is not None:
                yield row


class _FilePartition(InputPartition):
    def __init__(self, fpath: str):
        self.fpath = fpath


class EnvelopeBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("envelope source requires option 'path'")

    def partitions(self):
        return [_FilePartition(f) for f in _spool_files(self.path)] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if partition.fpath:
            yield from _read_file(partition.fpath)


class EnvelopeStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"n_files": count of spool files consumed}. Files are
    append-only and lexicographically ordered, so the consumed prefix is a
    valid, replayable offset range."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("envelope source requires option 'path'")

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def read(self, start: dict):
        files = _spool_files(self.path)
        n0 = int(start.get("n_files", 0))
        rows = [r for f in files[n0:] for r in _read_file(f)]
        return iter(rows), {"n_files": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _spool_files(self.path)
        n0, n1 = int(start.get("n_files", 0)), int(end.get("n_files", 0))
        return iter([r for f in files[n0:n1] for r in _read_file(f)])


class EnvelopeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "envelope"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> EnvelopeBatchReader:
        return EnvelopeBatchReader(self.options)

    def simpleStreamReader(self, schema) -> EnvelopeStreamReader:
        return EnvelopeStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return EnvelopeBatchWriter(self.options, overwrite)


def register_envelope_source(spark) -> None:
    """Idempotent registration: spark.dataSource.register survives re-calls."""
    spark.dataSource.register(EnvelopeDataSource)


def write_spool_file(path: str, msgs: list[dict], name: str) -> str:
    """Test/front-door helper: atomically append one spool file of push
    bodies (write dot-temp, rename)."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{name}.tmp")
    final = os.path.join(path, name)
    with open(tmp, "w", encoding="utf-8") as fh:
        for m in msgs:
            body = {
                "message": {
                    "data": m.get("data"),
                    "attributes": m.get("attributes") or {},
                    "messageId": m.get("message_id"),
                    "orderingKey": m.get("ordering_key"),
                }
            }
            fh.write(json.dumps(body) + "\n")
    os.replace(tmp, final)
    return final


# --- Writer: spool as a SINK (Spark 4 Python DataSourceWriter) ---------------


class _SpoolCommit(WriterCommitMessage):
    def __init__(self, fname: str | None):
        self.fname = fname


class EnvelopeBatchWriter(DataSourceWriter):
    """Per-partition spool writer: each task serializes its rows as
    Pub/Sub-shaped JSON-lines into a dot-temp file and renames it into the
    spool atomically (the reader ignores dotted in-flight files, so a
    crashed task leaves no partial visibility — rename-as-commit, the same
    contract as the ingest front door). ``commit`` stamps ``_SUCCESS``;
    ``abort`` removes any renamed files.

    The direction matters for the DLQ/export path: rows flow back OUT of
    the warehouse into the push-body format external replayers consume —
    the sink twin of the S1 source, completing the custom-DataSource
    surface (reader + streaming reader + writer)."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("envelope sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator) -> "_SpoolCommit":
        import uuid

        from pyspark import TaskContext

        rows = list(iterator)
        if not rows:
            return _SpoolCommit(None)
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        name = f"spool-{pid:05d}-{uuid.uuid4().hex[:8]}.jsonl"
        msgs = [
            {
                "data": r["data"],
                "attributes": dict(r["attributes"]) if r["attributes"] is not None else {},
                "message_id": r["message_id"],
                "ordering_key": r["ordering_key"],
            }
            for r in rows
        ]
        return _SpoolCommit(os.path.basename(write_spool_file(self.path, msgs, name)))

    def commit(self, messages) -> None:
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as fh:
            fh.write("\n".join(m.fname for m in messages if m and m.fname))

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.fname:
                try:
                    os.unlink(os.path.join(self.path, m.fname))
                except OSError:
                    pass
