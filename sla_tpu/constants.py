"""Format and algorithm constants of the SLA codec.

These mirror the normative constants of the reference implementation
(/root/reference/src/include/public/SLA.h:7-23 and
/root/reference/src/include/private/SLAInternal.h:6-38) — they define the
on-disk container format and the integer algorithm parameters that both
encoder and decoder must agree on for bit-exact interoperability.
"""

from __future__ import annotations

import enum

# --- Version / container format (SLA.h:7-23) -------------------------------
SLA_VERSION_STRING = "1.0.0"
SLA_FORMAT_VERSION = 1
SLA_HEADER_SIZE = 43
SLA_BLOCK_HEADER_SIZE = 10
SLA_NUM_SAMPLES_INVALID = 0xFFFFFFFF
SLA_NUM_BLOCKS_INVALID = 0xFFFFFFFF
SLA_MAX_BLOCK_SIZE_INVALID = 0xFFFFFFFF


def sufficient_block_size(num_channels: int, num_samples: int, bit_per_sample: int) -> int:
    """Upper bound on an encoded block's size in bytes (SLA.h:22-23)."""
    return 2 * num_channels * num_samples * (bit_per_sample // 8)


# --- Internal encode parameters (SLAInternal.h:6-35) ------------------------
SLA_MAX_CHANNELS = 8
SLA_BLOCK_SYNC_CODE = 0xFFFF
LONGTERM_MAX_PERIOD = 256
LONGTERM_PERIOD_NUM_BITS = 10
LONGTERM_NUM_PITCH_CANDIDATES = LONGTERM_MAX_PERIOD
PARCOR_COEF_LOW_ORDER_THRESHOLD = 4
LONGTERM_MIN_PITCH_THRESHOLD = 3
SLA_MIN_BLOCK_NUM_SAMPLES = 2048
SLA_SEARCH_BLOCK_NUM_SAMPLES_DELTA = 1024
PRE_EMPHASIS_SHIFT = 5
LMS_DELTA_WEIGHT_SHIFT = 4
CODER_NUM_RECURSIVE_RICE_PARAMETER = 2
CODER_LOW_THRESHOLD_PARAMETER = 8
CODER_QUOTPART_THRESHOLD = 16
STREAMING_DECODE_NUM_SAMPLES_MARGIN = 1.05
STREAMING_DECODE_MAX_NUM_PACKETS = 8
OPTIMAL_ESTIMATOR_LONGPATH_PENALTY = 300
SLA_ESTIMATE_CODELENGTH_THRESHOLD = 0.95

# CRC coverage offsets (SLAInternal.h:32-35)
SLA_HEADER_CRC16_CALC_START_OFFSET = 4 + 4 + 2
SLA_BLOCK_CRC16_CALC_START_OFFSET = 2 + 4 + 2
SLA_MINIMUM_BLOCK_HEADER_SIZE = 2 + 4 + 2 + 2 + 1


def parcor_quantize_bit_width(order: int) -> int:
    """Quantization width of the PARCOR coefficient at 1-based `order`.

    Orders below the low-order threshold get 16 bits, the rest 8
    (SLAInternal.h:38).
    """
    return 16 if order < PARCOR_COEF_LOW_ORDER_THRESHOLD else 8


class BlockDataType(enum.IntEnum):
    """Per-block payload kind (SLAInternal.h:67-72)."""

    COMPRESSDATA = 0
    SILENT = 1
    RAWDATA = 2
    INVALID = 3


class ChannelProcessMethod(enum.IntEnum):
    """Multichannel decorrelation method (SLA.h:46-49)."""

    NONE = 0
    STEREO_MS = 1


class WindowFunctionType(enum.IntEnum):
    """Analysis window selector (SLA.h:52-58)."""

    RECTANGULAR = 0
    SIN = 1
    HANN = 2
    BLACKMAN = 3
    VORBIS = 4
