"""SLA container format: 43-byte file header serialization.

Byte layout is normative and matches the reference encoder/decoder
(src/SLAEncoder.c:227-292 write side, src/SLADecoder.c:157-254 read side):
big-endian fields, CRC16-IBM over bytes [10, 43) stored at offset 8.
"""

from __future__ import annotations

import dataclasses
import struct

from .constants import (
    SLA_FORMAT_VERSION,
    SLA_HEADER_CRC16_CALC_START_OFFSET,
    SLA_HEADER_SIZE,
    ChannelProcessMethod,
    WindowFunctionType,
)
from .crc16 import crc16
from .errors import ApiResult, SLAError

_SIGNATURE = b"SL*\x01"


@dataclasses.dataclass
class WaveFormat:
    """Input waveform description (SLA.h:61-66)."""

    num_channels: int
    bit_per_sample: int
    sampling_rate: int
    offset_lshift: int = 0


@dataclasses.dataclass
class EncodeParameter:
    """Stream-level encode parameters (SLA.h:69-76)."""

    parcor_order: int
    longterm_order: int
    lms_order_per_filter: int
    ch_process_method: ChannelProcessMethod = ChannelProcessMethod.NONE
    window_function_type: WindowFunctionType = WindowFunctionType.SIN
    max_num_block_samples: int = 12288


@dataclasses.dataclass
class HeaderInfo:
    """Decoded/encodable file header (SLA.h:79-86)."""

    wave_format: WaveFormat
    encode_param: EncodeParameter
    num_samples: int
    num_blocks: int = 0
    max_block_size: int = 0
    max_bit_per_second: int = 0


def encode_header(header: HeaderInfo) -> bytes:
    """Serialize the 43-byte header with back-patched CRC16."""
    wf, ep = header.wave_format, header.encode_param
    body = struct.pack(
        ">4sIHIBIIBBBBBBIHII",
        _SIGNATURE,
        SLA_HEADER_SIZE - 8,  # offset to first block, counted past this field
        0,  # CRC16 placeholder
        SLA_FORMAT_VERSION,
        wf.num_channels & 0xFF,
        header.num_samples & 0xFFFFFFFF,
        wf.sampling_rate & 0xFFFFFFFF,
        wf.bit_per_sample & 0xFF,
        wf.offset_lshift & 0xFF,
        ep.parcor_order & 0xFF,
        ep.longterm_order & 0xFF,
        ep.lms_order_per_filter & 0xFF,
        int(ep.ch_process_method) & 0xFF,
        header.num_blocks & 0xFFFFFFFF,
        ep.max_num_block_samples & 0xFFFF,
        header.max_block_size & 0xFFFFFFFF,
        header.max_bit_per_second & 0xFFFFFFFF,
    )
    assert len(body) == SLA_HEADER_SIZE
    crc = crc16(body[SLA_HEADER_CRC16_CALC_START_OFFSET:])
    return body[:8] + struct.pack(">H", crc) + body[10:]


def decode_header(data: bytes) -> tuple[HeaderInfo, ApiResult]:
    """Parse and validate a 43-byte header.

    Returns (header, status): status is DETECT_DATA_CORRUPTION when only the
    CRC mismatches (fields are still returned, mirroring the reference's
    tolerant behaviour, SLADecoder.c:202-206, 251-253)."""
    if len(data) < SLA_HEADER_SIZE:
        raise SLAError(ApiResult.INSUFFICIENT_DATA_SIZE, "header truncated")
    if data[:4] != _SIGNATURE:
        raise SLAError(ApiResult.INVALID_HEADER_FORMAT, "bad signature")
    (
        _sig,
        _first_block_offset,
        stored_crc,
        version,
        num_channels,
        num_samples,
        sampling_rate,
        bit_per_sample,
        offset_lshift,
        parcor_order,
        longterm_order,
        lms_order,
        ch_method,
        num_blocks,
        max_block_samples,
        max_block_size,
        max_bps,
    ) = struct.unpack(">4sIHIBIIBBBBBBIHII", data[:SLA_HEADER_SIZE])
    status = ApiResult.OK
    if stored_crc != crc16(data[SLA_HEADER_CRC16_CALC_START_OFFSET:SLA_HEADER_SIZE]):
        status = ApiResult.DETECT_DATA_CORRUPTION
    if version != SLA_FORMAT_VERSION:
        raise SLAError(ApiResult.INVALID_HEADER_FORMAT, f"format version {version}")
    try:
        ch_method = ChannelProcessMethod(ch_method)
    except ValueError:
        # corrupt enum field: structured verdict, not a ValueError leak —
        # and when the CRC already flagged the header, report CORRUPTION
        # (the right diagnosis) rather than "malformed format"
        if status == ApiResult.DETECT_DATA_CORRUPTION:
            raise SLAError(ApiResult.DETECT_DATA_CORRUPTION,
                           "header CRC mismatch") from None
        raise SLAError(ApiResult.INVALID_HEADER_FORMAT,
                       f"ch_process_method {ch_method}") from None
    header = HeaderInfo(
        wave_format=WaveFormat(
            num_channels=num_channels,
            bit_per_sample=bit_per_sample,
            sampling_rate=sampling_rate,
            offset_lshift=offset_lshift,
        ),
        encode_param=EncodeParameter(
            parcor_order=parcor_order,
            longterm_order=longterm_order,
            lms_order_per_filter=lms_order,
            ch_process_method=ch_method,
            window_function_type=WindowFunctionType.SIN,  # not stored in the container
            max_num_block_samples=max_block_samples,
        ),
        num_samples=num_samples,
        num_blocks=num_blocks,
        max_block_size=max_block_size,
        max_bit_per_second=max_bps,
    )
    return header, status
