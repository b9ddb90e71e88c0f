"""API result codes and exceptions.

Mirrors the reference's SLAApiResult enum (SLA.h:26-43) so callers porting
from the C API find the same failure vocabulary; Python APIs raise
`SLAError` carrying one of these codes.
"""

from __future__ import annotations

import enum


class ApiResult(enum.IntEnum):
    OK = 0
    NG = 1
    INVALID_ARGUMENT = 2
    EXCEED_HANDLE_CAPACITY = 3
    INSUFFICIENT_BUFFER_SIZE = 4
    INVALID_CHPROCESSMETHOD = 5
    FAILED_TO_CALCULATE_COEF = 6
    FAILED_TO_PREDICT = 7
    FAILED_TO_SYNTHESIZE = 8
    INSUFFICIENT_DATA_SIZE = 9
    INVALID_HEADER_FORMAT = 10
    DETECT_DATA_CORRUPTION = 11
    FAILED_TO_FIND_SYNC_CODE = 12
    INVALID_WINDOWFUNCTION_TYPE = 13
    NO_DATA_FRAGMENTS = 14
    PARAMETER_NOT_SET = 15


class SLAError(Exception):
    """Codec failure carrying an `ApiResult` code."""

    def __init__(self, result: ApiResult, message: str = ""):
        self.result = ApiResult(result)
        super().__init__(f"{self.result.name}: {message}" if message else self.result.name)
