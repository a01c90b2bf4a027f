"""PG-style error model: SQLSTATE-carrying exceptions, mirroring the
reference's ErrCode/kbensure sites (/root/reference src/utils/err.rs:25-47,
src/protocol/errcodes.rs). Only the codes the engine actually raises are
declared.
"""

from __future__ import annotations


class KbError(Exception):
    sqlstate = "XX000"  # internal_error

    def __init__(self, message: str):
        super().__init__(f"[{self.sqlstate}] {message}")
        self.message = message


class BadCopyFileFormat(KbError):
    # reference: ERRCODE_BAD_COPY_FILE_FORMAT (copy.rs:155-172)
    sqlstate = "22P04"


class NotNullViolation(KbError):
    # reference: ERRCODE_NOT_NULL_VIOLATION (cs.rs:58-76)
    sqlstate = "23502"


class InvalidTextRepresentation(KbError):
    # reference: typinput parse failure (adt.rs:148-176)
    sqlstate = "22P02"


class UndefinedTable(KbError):
    sqlstate = "42P01"


class DuplicateTable(KbError):
    sqlstate = "42P07"


class SerializationFailure(KbError):
    # optimistic manifest-commit conflict
    sqlstate = "40001"


class StagedFileVanished(KbError):
    # a file the commit is about to reference no longer exists on disk
    # (e.g. an aggressive gc(staged_retention_s=0) in another session
    # reaped the open transaction's staged segment): fail the COMMIT
    # loudly — publishing would be silent corruption
    sqlstate = "58030"  # io_error


class SqlSyntaxError(KbError):
    # e.g. a COPY statement whose option tail the grammar doesn't accept —
    # raised eagerly with the offending token instead of letting the text
    # fall through to Spark's parser and die with an opaque error
    sqlstate = "42601"


class CantChangeRuntimeParam(KbError):
    # SET on an Internal/KuiBaDB-context GUC (reference gucdef.yaml
    # contexts; PG: 55P02 cant_change_runtime_param)
    sqlstate = "55P02"


class CheckViolation(KbError):
    # write-path CHECK constraint (PG: 23514 check_violation)
    sqlstate = "23514"


class UndefinedParameter(KbError):
    # SHOW of an unknown GUC (PG: 42704 undefined_object)
    sqlstate = "42704"
