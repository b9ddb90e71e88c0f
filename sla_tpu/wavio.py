"""RIFF/WAVE reading and writing with the codec's canonical sample layout.

Canonical in-memory representation (matching the reference, wav.c:391-436):
left-justified int32 per sample —

* 8-bit PCM is offset-binary: value - 128, then << 24
* 16-bit: << 16; 24-bit: << 8; 32-bit: unchanged

Reads/writes are fully vectorized with NumPy (the reference converts sample
by sample; we parse the data chunk as one buffer).
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from .errors import ApiResult, SLAError


@dataclasses.dataclass
class WavFile:
    num_channels: int
    sampling_rate: int
    bits_per_sample: int
    data: np.ndarray  # shape (num_channels, num_samples), canonical int32

    @property
    def num_samples(self) -> int:
        return self.data.shape[1]


def _find_chunks(buf: bytes) -> tuple[dict, int, int]:
    """Parse RIFF structure; return (fmt fields, data offset, data size)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise SLAError(ApiResult.INVALID_HEADER_FORMAT, "not a RIFF/WAVE file")
    pos = 12
    fmt = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (csize,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if cid == b"fmt ":
            if body + 16 > len(buf) or csize < 16:
                # truncated fmt body: structured error, not struct.error
                raise SLAError(ApiResult.INVALID_HEADER_FORMAT,
                               "truncated fmt chunk")
            audio_format, num_channels, sampling_rate = struct.unpack("<HHI", buf[body : body + 8])
            bits_per_sample = struct.unpack("<H", buf[body + 14 : body + 16])[0]
            if audio_format != 1:
                raise SLAError(ApiResult.INVALID_HEADER_FORMAT, "only PCM (format 1) is supported")
            fmt = dict(
                num_channels=num_channels,
                sampling_rate=sampling_rate,
                bits_per_sample=bits_per_sample,
            )
        elif cid == b"data":
            if fmt is None:
                raise SLAError(ApiResult.INVALID_HEADER_FORMAT, "data chunk before fmt chunk")
            return fmt, body, csize
        pos = body + csize + (csize & 1)
    raise SLAError(ApiResult.INVALID_HEADER_FORMAT, "no data chunk")


def read_wav(path: str) -> WavFile:
    with open(path, "rb") as f:
        buf = f.read()
    return parse_wav(buf)


def parse_wav(buf: bytes) -> WavFile:
    fmt, off, size = _find_chunks(buf)
    ch = fmt["num_channels"]
    bps = fmt["bits_per_sample"]
    # validate BEFORE any arithmetic: a crafted fmt chunk with ch=0 or
    # bps<8 must be a structured error, not a ZeroDivisionError
    if ch <= 0:
        raise SLAError(ApiResult.INVALID_HEADER_FORMAT,
                       f"bad channel count {ch}")
    if bps not in (8, 16, 24, 32):
        raise SLAError(ApiResult.INVALID_HEADER_FORMAT,
                       f"unsupported bit depth {bps}")
    bytes_per = bps // 8
    frame = bytes_per * ch
    # clamp to the bytes actually present: truncated files (or the common
    # 0xFFFFFFFF streaming data-size placeholder) read the available whole
    # frames instead of leaking a numpy buffer-size ValueError
    size = min(size, len(buf) - off)
    nsamples = size // frame
    raw = np.frombuffer(buf, dtype=np.uint8, count=nsamples * frame, offset=off)
    if bps == 8:
        pcm = (raw.astype(np.int32) - 128) << 24
    elif bps == 16:
        pcm = raw.view("<i2").astype(np.int32) << 16
    elif bps == 24:
        b = raw.reshape(-1, 3).astype(np.uint32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        pcm = (u << 8).astype(np.int32)  # left-justify; sign via the top byte
    else:  # bps == 32
        pcm = raw.view("<i4").astype(np.int32)
    data = pcm.reshape(nsamples, ch).T.copy()
    return WavFile(ch, fmt["sampling_rate"], bps, data)


def serialize_wav(wav: WavFile) -> bytes:
    ch, n = wav.data.shape
    bps = wav.bits_per_sample
    bytes_per = bps // 8
    pcm_size = n * bytes_per * ch
    # RIFF requires word-aligned chunks: an odd data chunk carries one pad
    # byte NOT counted in the chunk size but counted in the RIFF size
    pad = pcm_size & 1
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        pcm_size + pad + 36,
        b"WAVE",
        b"fmt ",
        16,
        1,
        ch,
        wav.sampling_rate,
        wav.sampling_rate * bytes_per * ch,
        bytes_per * ch,
        bps,
        b"data",
        pcm_size,
    )
    inter = wav.data.T.reshape(-1)  # interleave channels
    if bps == 8:
        body = (((inter >> 24) + 128) & 0xFF).astype(np.uint8).tobytes()
    elif bps == 16:
        body = (inter >> 16).astype("<i2").tobytes()
    elif bps == 24:
        v = (inter >> 8).astype(np.int32).view(np.uint32)
        out = np.empty((inter.size, 3), dtype=np.uint8)
        out[:, 0] = v & 0xFF
        out[:, 1] = (v >> 8) & 0xFF
        out[:, 2] = (v >> 16) & 0xFF
        body = out.tobytes()
    elif bps == 32:
        body = inter.astype("<i4").tobytes()
    else:
        raise SLAError(ApiResult.INVALID_HEADER_FORMAT, f"unsupported bit depth {bps}")
    return header + body + (b"\x00" if pad else b"")


def write_wav(path: str, wav: WavFile) -> None:
    with open(path, "wb") as f:
        f.write(serialize_wav(wav))
