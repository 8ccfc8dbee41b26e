"""Structured Streaming source over the file-action commit log.

``sources/filelog.py`` gives versioned tables their change feed as a
batch read (``read_changes``) and a cursor-style consumer
(``sync_changes_from``). THIS module is the native streaming form —
the Delta-as-a-stream-source parity piece: register the DataSource and

    spark.readStream.format("filelog_changes")
         .option("path", root)
         .load()

tails the log with EXACTLY-ONCE version offsets checkpointed by the
engine. Each micro-batch covers the commit window (start, end]; the
planner moves only {"version": n} offsets (commit-grain json), and the
DATA moves executor-side: every input partition is one file-grain unit
of one commit — an added file (insert rows), a removed file (delete
rows, minus rows already deletion-vectored before the commit), or a
deletion-vector file (delete pre-images, loaded positionally from the
files the vector names). Reads are vectorized pyarrow RecordBatches —
no per-row Python loop — with task retry per file and replay planned
deterministically from the committed offset range after any crash.

The reference's streaming contract is an external 30-minute scheduler
re-running batch SQL (/root/reference/infra/airflow/dags/
metar_pipeline_dag.py:18); this source replaces that polling shape for
DERIVED consumers: downstream processes each commit's delta, never
re-scans the table — the property that makes a 100-TB changelog
tailable.

Partitioned tables stream too: writers record the full Spark schema
json in every commit, so the source types hive path values from the
WRITER's schema — no inference, no footer dependency. Loud refusals
remain for: legacy partitioned logs with no recorded schema, escaped
hive values (%XX), timestamp-typed partition columns, and nested
column types. Schema evolution is handled (old files null-fill added
columns with declared types, exactly like ``read_changes``).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_COMMITS = "_commits"
_PAD = 20


def _read_json(path: str) -> dict:
    with open(path, "rb") as f:
        return json.loads(f.read().decode("utf-8"))


def _strip_scheme(root: str) -> str:
    """The Python DataSource runs outside the JVM Hadoop stack; local
    paths (with or without a file: scheme) are what the test/CI
    surface uses. Remote object stores would swap in pyarrow.fs here."""
    if root.startswith("file://"):
        return root[len("file://"):]
    if root.startswith("file:"):
        return root[len("file:"):]
    return root


def _commit_versions(cdir: str) -> "list[int]":
    if not os.path.isdir(cdir):
        return []
    out = []
    for name in os.listdir(cdir):
        if name.endswith(".json") and not name.startswith((".", "_")):
            stem = name[: -len(".json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def _get_commit(cdir: str, n: int) -> dict:
    p = os.path.join(cdir, f"{n:0{_PAD}d}.json")
    if not os.path.exists(p):
        raise ValueError(
            f"commit {n} expired from {cdir} (no commit file) — the "
            f"stream cannot replay below the retention floor; restart "
            f"from a fresh full read"
        )
    return _read_json(p)


def _latest_version(cdir: str) -> int:
    vs = _commit_versions(cdir)
    if vs:
        return vs[-1]
    # checkpoint-only logs: the floor is still a valid latest
    best = -1
    if os.path.isdir(cdir):
        for name in os.listdir(cdir):
            if name.startswith("_checkpoint.") and name.endswith(".json"):
                stem = name[len("_checkpoint."): -len(".json")]
                if stem.isdigit():
                    best = max(best, int(stem))
    return best


def _checkpoints(cdir: str) -> "list[int]":
    out = []
    if os.path.isdir(cdir):
        for name in os.listdir(cdir):
            if name.startswith("_checkpoint.") and name.endswith(
                ".json"
            ):
                stem = name[len("_checkpoint."): -len(".json")]
                if stem.isdigit():
                    out.append(int(stem))
    return sorted(out)


def _checkpoint_meta(cdir: str, cp: int) -> dict:
    return _read_json(os.path.join(cdir, f"_checkpoint.{cp}.json"))


def _columns_at(cdir: str, v: int) -> "list[str] | None":
    have = set(_commit_versions(cdir))
    cps = [c for c in _checkpoints(cdir) if c <= v]
    floor = cps[-1] if cps else -1
    for n in range(v, floor, -1):
        if n not in have:
            break
        c = _get_commit(cdir, n)
        if c.get("cols") is not None:
            return list(c["cols"])
    if cps:
        meta = _checkpoint_meta(cdir, cps[-1])
        if meta.get("cols") is not None:
            return list(meta["cols"])
    return None


def _active_dvs_at(cdir: str, v: int) -> "list[str]":
    """Cumulative dv files in force at v: newest covering checkpoint's
    carry-forward plus the later commits' replay — history below the
    retention floor is reachable through the checkpoint, so a stream
    window above the floor plans even after early commits expired."""
    dvs: "set[str]" = set()
    start = 0
    cps = [c for c in _checkpoints(cdir) if c <= v]
    if cps:
        dvs.update(_checkpoint_meta(cdir, cps[-1]).get("dvs", []))
        start = cps[-1] + 1
    for n in range(start, v + 1):
        c = _get_commit(cdir, n)
        if c.get("op") in ("compact", "restore"):
            dvs.clear()
        dvs.update(c.get("dv_add", []))
    return sorted(dvs)


def _schema_json_at(cdir: str, v: int) -> "str | None":
    have = set(_commit_versions(cdir))
    cps = [c for c in _checkpoints(cdir) if c <= v]
    floor = cps[-1] if cps else -1
    for n in range(v, floor, -1):
        if n not in have:
            break
        c = _get_commit(cdir, n)
        if c.get("schema_json") is not None:
            return c["schema_json"]
    if cps:
        meta = _checkpoint_meta(cdir, cps[-1])
        if meta.get("schema_json") is not None:
            return meta["schema_json"]
    return None


_SPARK_TO_DDL = {
    "long": "bigint", "integer": "int", "short": "smallint",
    "byte": "tinyint", "double": "double", "float": "float",
    "string": "string", "boolean": "boolean", "date": "date",
    "binary": "binary", "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _spark_json_to_columns(schema_json: str) -> "list[tuple[str, str]]":
    """(name, ddl) pairs from a Spark StructType json recorded in the
    log — no inference, no footer read; the writer's types are the
    table's types."""
    fields = json.loads(schema_json)["fields"]
    out = []
    for f in fields:
        t = f["type"]
        if isinstance(t, str) and t in _SPARK_TO_DDL:
            out.append((f["name"], _SPARK_TO_DDL[t]))
        elif isinstance(t, str) and t.startswith("decimal("):
            out.append((f["name"], t))
        else:
            raise ValueError(
                f"filelog_changes: unsupported column type {t!r} for "
                f"{f['name']!r} (nested types do not stream)"
            )
    return out


def _partition_values(rel_path: str) -> "dict[str, str]":
    """k=v hive segments between the token dir and the file name.
    Escaped specials (%XX) are refused loudly — this source does not
    reimplement hive escaping."""
    parts = rel_path.split("/")[2:-1]  # strip _data/<token>/ and file
    out = {}
    for seg in parts:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        if "%" in v:
            raise ValueError(
                f"filelog_changes: escaped hive partition value in "
                f"{rel_path!r} — unsupported"
            )
        out[k] = v
    return out


def _cast_partition_value(v: str, ddl: str, pa):
    if v == "__HIVE_DEFAULT_PARTITION__":
        return None
    if ddl in ("bigint", "int", "smallint", "tinyint"):
        return int(v)
    if ddl in ("double", "float"):
        return float(v)
    if ddl == "string":
        return v
    if ddl == "boolean":
        return v.lower() == "true"
    if ddl == "date":
        import datetime

        return datetime.date.fromisoformat(v)
    raise ValueError(
        f"filelog_changes: unsupported partition-column type {ddl!r}"
    )


def _arrow_to_ddl(field) -> str:
    import pyarrow as pa

    t = field.type
    mapping = [
        (pa.types.is_int64, "bigint"), (pa.types.is_int32, "int"),
        (pa.types.is_int16, "smallint"), (pa.types.is_int8, "tinyint"),
        (pa.types.is_float64, "double"), (pa.types.is_float32, "float"),
        (pa.types.is_string, "string"), (pa.types.is_large_string, "string"),
        (pa.types.is_boolean, "boolean"), (pa.types.is_date32, "date"),
        (pa.types.is_binary, "binary"), (pa.types.is_large_binary, "binary"),
    ]
    for pred, ddl in mapping:
        if pred(t):
            return ddl
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    raise ValueError(
        f"filelog_changes: unsupported parquet type {t} for column "
        f"{field.name!r}"
    )


class _ChangePartition(InputPartition):
    """One file-grain unit of one commit's change feed."""

    def __init__(
        self,
        kind: str,  # 'add' | 'remove' | 'dv' | 'empty'
        version: int,
        path: str,
        prior_dvs: "list[str]",
        root: str,
        columns: "list[tuple[str, str]]",  # (name, ddl) table order
    ):
        self.kind = kind
        self.version = version
        self.path = path
        self.prior_dvs = prior_dvs
        self.root = root
        self.columns = columns


class FileLogChangeDataSource(DataSource):
    """format("filelog_changes") — stream a FileCommitLog's CDF.

    Options:
      path              table root (required; local paths)
      starting_version  first commit to feed (default 0); must be at
                        or above the retention floor
    """

    @classmethod
    def name(cls) -> str:
        return "filelog_changes"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("filelog_changes requires .option('path', …)")
        return _strip_scheme(root).rstrip("/")

    def _cdir(self) -> str:
        """Commit-chain dir: main's _commits, or a BRANCH's chain via
        .option("branch", name) — the branch streams exactly like main
        (same shared data namespace, its own version offsets)."""
        branch = self.options.get("branch")
        if branch:
            return os.path.join(
                self._root(), "_branches", branch, _COMMITS
            )
        return os.path.join(self._root(), _COMMITS)

    def _table_columns(self) -> "list[tuple[str, str]]":
        """(name, ddl) for the CURRENT table schema. Preferred source:
        the schema json the writers record in every commit (exact
        writer types, partition columns included — no inference, no
        footer read). Legacy logs without recorded schema fall back to
        the newest added file's parquet footer, where hive-partitioned
        tables must be refused (the footer cannot type path values)."""
        import pyarrow.parquet as pq

        root, cdir = self._root(), self._cdir()
        v = _latest_version(cdir)
        if v < 0:
            raise ValueError(f"empty file-commit log at {cdir}")
        sj = _schema_json_at(cdir, v)
        if sj is not None:
            return _spark_json_to_columns(sj)
        cols = _columns_at(cdir, v)
        newest = None
        for n in sorted(_commit_versions(cdir), reverse=True):
            adds = _get_commit(cdir, n).get("add", [])
            if adds:
                newest = adds[-1]
                break
        if newest is None:  # expired history: the checkpoint's live set
            cps = _checkpoints(cdir)
            if cps:
                live = _checkpoint_meta(cdir, cps[-1]).get("live", [])
                if live:
                    newest = live[-1]
        if newest is None:
            raise ValueError(
                f"no data files discoverable from the retained log at "
                f"{root}"
            )
        if "=" in newest:
            raise ValueError(
                "filelog_changes cannot stream a hive-partitioned "
                "LEGACY table (no schema recorded in the log, and a "
                "parquet footer cannot type path values) — rewrite "
                "once with a current writer, or consume via "
                "FileCommitLog.sync_changes_from / read_changes"
            )
        schema = pq.read_schema(os.path.join(root, newest))
        by_name = {f.name: _arrow_to_ddl(f) for f in schema}
        order = cols if cols is not None else [f.name for f in schema]
        missing = [c for c in order if c not in by_name]
        if missing:
            raise ValueError(
                f"columns {missing} in the log's canonical schema are "
                f"absent from the newest data file {newest!r}"
            )
        return [(c, by_name[c]) for c in order]

    def schema(self) -> str:
        cols = self._table_columns()
        body = ", ".join(f"{n} {t}" for n, t in cols)
        return f"{body}, _change_type string, _commit_version int"

    def streamReader(self, schema) -> "FileLogChangeStreamReader":
        return FileLogChangeStreamReader(
            self._root(),
            self._table_columns(),
            int(self.options.get("starting_version", "0")),
            self._cdir(),
        )


class FileLogChangeStreamReader(DataSourceStreamReader):
    """Offsets are commit versions ({"version": last-processed});
    partitions(start, end) plans the (start, end] window file-grain.
    The engine checkpoints offsets — a restart resumes exactly after
    the last committed version (exactly-once with an idempotent or
    transactional sink, the standard Structured Streaming contract)."""

    def __init__(
        self,
        root: str,
        columns: "list[tuple[str, str]]",
        starting_version: int,
        cdir: "str | None" = None,
    ):
        self.root = root
        self.columns = columns
        self.start_v = int(starting_version)
        self.cdir = cdir or os.path.join(root, _COMMITS)

    def initialOffset(self) -> dict:
        return {"version": self.start_v - 1}

    def latestOffset(self) -> dict:
        return {"version": max(_latest_version(self.cdir),
                               self.start_v - 1)}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts: "list[_ChangePartition]" = []
        for n in range(lo + 1, hi + 1):
            c = _get_commit(self.cdir, n)
            if c.get("op") == "compact":
                continue
            removes = c.get("remove", [])
            prior = _active_dvs_at(self.cdir, n - 1) if removes else []
            for f in c.get("add", []):
                parts.append(_ChangePartition(
                    "add", n, f, [], self.root, self.columns))
            for f in removes:
                parts.append(_ChangePartition(
                    "remove", n, f, prior, self.root, self.columns))
            for f in c.get("dv_add", []):
                parts.append(_ChangePartition(
                    "dv", n, f, [], self.root, self.columns))
        return parts or [
            _ChangePartition("empty", lo, "", [], self.root,
                             self.columns)
        ]

    # -- executor side ----------------------------------------------------
    def read(self, partition: _ChangePartition) -> Iterator:
        if partition.kind == "empty":
            return
        import pyarrow as pa

        if partition.kind == "dv":
            yield from self._read_dv(partition, pa)
            return
        table = self._load_projected(
            os.path.join(partition.root, partition.path), partition, pa
        )
        if partition.kind == "remove" and partition.prior_dvs:
            drop = self._dv_positions_for(
                partition, partition.path, pa
            )
            if drop:
                keep = [
                    i for i in range(table.num_rows) if i not in drop
                ]
                table = table.take(pa.array(keep, type=pa.int64()))
        ctype = "insert" if partition.kind == "add" else "delete"
        yield from self._tagged_batches(table, ctype, partition, pa)

    @staticmethod
    def _ddl_to_arrow(ddl: str, pa):
        simple = {
            "bigint": pa.int64(), "int": pa.int32(),
            "smallint": pa.int16(), "tinyint": pa.int8(),
            "double": pa.float64(), "float": pa.float32(),
            "string": pa.string(), "boolean": pa.bool_(),
            "date": pa.date32(), "binary": pa.binary(),
            "timestamp": pa.timestamp("us"),
        }
        if ddl in simple:
            return simple[ddl]
        if ddl.startswith("decimal("):
            p, s = ddl[len("decimal("):-1].split(",")
            return pa.decimal128(int(p), int(s))
        raise ValueError(f"unsupported ddl {ddl!r}")

    def _load_projected(self, abspath: str, partition, pa):
        """Read one data file and project/null-fill to the table
        columns. A column absent from the parquet comes from, in
        order: the file's hive path segments (typed by the RECORDED
        writer schema, not inference), else a declared-type null fill
        (schema evolution — arrow's bare null type would be rejected
        by the engine)."""
        import pyarrow.parquet as pq

        rel = abspath[len(partition.root) + 1:]
        pvals = _partition_values(rel)
        raw = pq.read_table(abspath)
        arrays, names = [], []
        for name, ddl in partition.columns:
            names.append(name)
            if name in raw.column_names:
                arrays.append(raw.column(name))
            elif name in pvals:
                val = _cast_partition_value(pvals[name], ddl, pa)
                typ = self._ddl_to_arrow(ddl, pa)
                if val is None:
                    arrays.append(pa.nulls(raw.num_rows, type=typ))
                else:
                    arrays.append(
                        pa.array([val] * raw.num_rows, type=typ)
                    )
            else:
                arrays.append(
                    pa.nulls(raw.num_rows,
                             type=self._ddl_to_arrow(ddl, pa))
                )
        return pa.table(arrays, names=names)

    def _dv_positions_for(
        self, partition, data_file: str, pa
    ) -> "set[int]":
        """Row positions named for ``data_file`` by the partition's
        prior deletion vectors (each dv parquet is (file, row_index))."""
        import pyarrow.parquet as pq

        drop: "set[int]" = set()
        for dv in partition.prior_dvs:
            t = pq.read_table(
                os.path.join(partition.root, dv),
                columns=["file", "row_index"],
            )
            files = t.column("file").to_pylist()
            idx = t.column("row_index").to_pylist()
            drop.update(
                i for f, i in zip(files, idx) if f == data_file
            )
        return drop

    def _read_dv(self, partition, pa) -> Iterator:
        """Pre-image deletes: load the vector, then positionally take
        the named rows from each file it references."""
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(partition.root, partition.path),
            columns=["file", "row_index"],
        )
        by_file: "dict[str, list[int]]" = {}
        for f, i in zip(
            t.column("file").to_pylist(),
            t.column("row_index").to_pylist(),
        ):
            by_file.setdefault(f, []).append(i)
        for f, rows in sorted(by_file.items()):
            table = self._load_projected(
                os.path.join(partition.root, f), partition, pa
            )
            picked = table.take(
                pa.array(sorted(rows), type=pa.int64())
            )
            yield from self._tagged_batches(
                picked, "delete", partition, pa
            )

    def _tagged_batches(self, table, ctype: str, partition, pa):
        n = table.num_rows
        tagged = table.append_column(
            "_change_type", pa.array([ctype] * n, type=pa.string())
        ).append_column(
            "_commit_version",
            pa.array([partition.version] * n, type=pa.int32()),
        )
        yield from tagged.to_batches()

    def commit(self, end: dict) -> None:
        pass
