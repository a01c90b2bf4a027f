"""GUC (grand unified configuration) registry — the reference's 22
declared runtime parameters (/root/reference src/guc/gucdef.yaml:32-149)
with their types, boot values, and set-contexts, surfaced through the
engine's SET/SHOW front door.

Semantics follow the reference's guc.rs contexts:
- UserSet  : settable any time in a session (SET works).
- SigHup   : server-reload scope; a single-process session engine has no
  SIGHUP cycle, so these accept SET too (the closest runtime analog).
- KuiBaDB  : postmaster-start scope → SET raises CantChangeRuntimeParam
  (PG 55P02), value is fixed at boot.
- Internal : never settable → same error; SHOW still reports it.

Where a parameter has a natural Spark analog, SET also forwards to the
live Spark conf so the knob actually steers execution:
- batch_size (the reference's vectorized batch row count, guc.rs
  type_guc! consumers in src/executor) →
  spark.sql.execution.arrow.maxRecordsPerBatch (Arrow batch row count —
  the same knob in Spark's vectorized exchange with Python).
- max_files_per_process → spark.sql.files.maxPartitionNum is NOT the same
  thing (it caps split count, not fds) — deliberately not forwarded.

Unknown names are not errors at this layer: the engine falls through to
`spark.sql("SET k=v")` so every native Spark conf stays reachable — the
GUC table restricts only the reference's declared names.
"""

from __future__ import annotations

from kuibadb_spark.errors import CantChangeRuntimeParam, UndefinedParameter

# name -> (vartype, context, boot_val)  [gucdef.yaml order]
GUCS: dict[str, tuple[str, str, object]] = {
    "max_connections": ("INT", "SigHup", 16),
    "port": ("INT", "KuiBaDB", 1218),
    "log_min_messages": ("STR", "SigHup", "DEBUG2"),
    "server_version": ("STR", "Internal", "0.0.1"),
    "server_encoding": ("STR", "Internal", "UTF8"),
    "client_encoding": ("STR", "Internal", "UTF8"),
    "is_superuser": ("BOOL", "Internal", True),
    "seq_page_cost": ("REAL", "UserSet", 1.0),
    "search_path": ("STR", "UserSet", "public,kb_catalog"),
    "clog_l1cache_size": ("INT", "SigHup", 1024),
    "clog_l2cache_size": ("INT", "KuiBaDB", 128),
    "wal_buff_max_size": ("INT", "KuiBaDB", 33554432),
    "wal_file_max_size": ("INT", "KuiBaDB", 1073741824),
    "xid_stop_limit": ("INT", "KuiBaDB", 2000000000),
    "mvcc_blk_rows": ("INT", "SigHup", 65536),
    "data_blk_rows": ("INT", "SigHup", 65536),
    "mvcc_buf_cap": ("INT", "KuiBaDB", 16),
    "max_files_per_process": ("INT", "SigHup", 1000),
    "enable_cs_wal": ("BOOL", "KuiBaDB", False),
    "table_sv_cap": ("INT", "KuiBaDB", 1024),
    "table_mvcc_cap": ("INT", "KuiBaDB", 1024),
    "batch_size": ("INT", "UserSet", 1024),
}

_SPARK_FORWARD = {
    "batch_size": "spark.sql.execution.arrow.maxRecordsPerBatch",
}

_TRUE = {"true", "on", "yes", "1", "t"}
_FALSE = {"false", "off", "no", "0", "f"}


def parse_value(name: str, raw: str):
    """Validate+coerce a SET value per the GUC's vartype (the reference's
    str_to_bool / parse errors in guc.rs). Raw arrives as SQL text — a
    possibly-quoted token."""
    vartype = GUCS[name][0]
    v = raw.strip().strip("'\"")
    if vartype == "INT":
        try:
            return int(v)
        except ValueError:
            raise ValueError(f"parameter {name!r} requires an integer: {raw!r}")
    if vartype == "REAL":
        try:
            return float(v)
        except ValueError:
            raise ValueError(f"parameter {name!r} requires a number: {raw!r}")
    if vartype == "BOOL":
        low = v.lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ValueError(f"parameter {name!r} requires a boolean: {raw!r}")
    return v


class GucSession:
    """Per-engine GUC state: boot values + session overrides."""

    def __init__(self, spark=None):
        self._spark = spark
        self._values = {n: spec[2] for n, spec in GUCS.items()}

    def is_declared(self, name: str) -> bool:
        return name.lower() in GUCS

    def set(self, name: str, raw: str) -> None:
        name = name.lower()
        _, context, _ = GUCS[name]
        if context in ("Internal", "KuiBaDB"):
            raise CantChangeRuntimeParam(
                f"parameter {name!r} cannot be changed ({context} context)"
            )
        val = parse_value(name, raw)
        self._values[name] = val
        fwd = _SPARK_FORWARD.get(name)
        if fwd and self._spark is not None:
            self._spark.conf.set(fwd, str(val))

    def show(self, name: str):
        name = name.lower()
        if name not in GUCS:
            raise UndefinedParameter(f"unrecognized configuration parameter {name!r}")
        return self._values[name]

    def show_all(self) -> list[tuple[str, str]]:
        return [(n, _fmt(self._values[n])) for n in sorted(GUCS)]


def _fmt(v) -> str:
    if isinstance(v, bool):
        return "on" if v else "off"
    return str(v)
