"""Error handling.

The reference propagates integer error codes through every call
(acg/error.h:49-104) and uses a collective all-reduce of error codes so that
no MPI rank hangs when another fails (``acgerrmpi``, error.h:122-155).

In a single-controller JAX program exceptions propagate naturally and every
process runs the same trace, so the collective-agreement machinery is not
needed; we keep a small exception hierarchy with stable numeric codes so the
CLI can report reference-compatible error strings and exit codes.
"""

from __future__ import annotations

import enum


class ErrCode(enum.IntEnum):
    SUCCESS = 0
    INVALID_VALUE = 1
    NOT_SUPPORTED = 2
    EOF = 3
    INVALID_FORMAT = 4
    INDEX_OUT_OF_BOUNDS = 5
    NOT_CONVERGED = 6
    IO = 7
    PARTITION = 8


_MESSAGES = {
    ErrCode.SUCCESS: "success",
    ErrCode.INVALID_VALUE: "invalid value",
    ErrCode.NOT_SUPPORTED: "not supported",
    ErrCode.EOF: "unexpected end-of-file",
    ErrCode.INVALID_FORMAT: "invalid format",
    ErrCode.INDEX_OUT_OF_BOUNDS: "index out of bounds",
    ErrCode.NOT_CONVERGED: "solver did not converge",
    ErrCode.IO: "input/output error",
    ErrCode.PARTITION: "partitioning error",
}


def errcodestr(code: ErrCode) -> str:
    """Human-readable message for an error code (acgerrcodestr analogue)."""
    return _MESSAGES.get(ErrCode(code), f"unknown error {int(code)}")


class AcgError(Exception):
    code: ErrCode = ErrCode.INVALID_VALUE

    def __init__(self, msg: str | None = None):
        super().__init__(msg or errcodestr(self.code))


class InvalidFormatError(AcgError):
    code = ErrCode.INVALID_FORMAT


class UnexpectedEofError(AcgError):
    code = ErrCode.EOF


class NotSupportedError(AcgError):
    code = ErrCode.NOT_SUPPORTED


class NotConvergedError(AcgError):
    code = ErrCode.NOT_CONVERGED


class PartitionError(AcgError):
    code = ErrCode.PARTITION
