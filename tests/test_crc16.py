import numpy as np

from sla_tpu.crc16 import _TABLE, crc16


def crc_bytewise(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = (crc >> 8) ^ int(_TABLE[(crc ^ b) & 0xFF])
    return crc


def test_known_values():
    # independent oracle: CRC-16/ARC of "123456789" is 0xBB3D
    assert crc16(b"123456789") == 0xBB3D
    assert crc16(b"") == 0x0000


def test_slice_by_8_matches_bytewise():
    rng = np.random.default_rng(7)
    for n in [0, 1, 7, 8, 9, 15, 16, 63, 64, 255, 1000]:
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert crc16(d) == crc_bytewise(d)


def test_a_wav_golden(a_wav):
    # golden value from the reference test suite (test_SLAUtility.c:71)
    assert crc16(a_wav.read_bytes()) == 0xA611
