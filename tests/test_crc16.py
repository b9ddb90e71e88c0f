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


def test_crc16_ndarray_backend_identity():
    """Both crc16 backends must reinterpret an ndarray's raw BYTES (astype
    would keep only each int32's low byte and silently diverge)."""
    import numpy as np

    from sla_tpu import native
    from sla_tpu.crc16 import crc16

    arr = np.arange(7, dtype=np.int32)
    expect = crc16(arr.tobytes())
    assert crc16(arr) == expect
    if native.available():
        assert native.crc16(arr) == expect
    # pure-Python path agrees too
    import sla_tpu.crc16 as m
    import sla_tpu.native as nat
    orig = nat.available
    try:
        nat.available = lambda: False
        assert m.crc16(arr) == expect
        assert m.crc16(memoryview(arr.tobytes())) == expect
    finally:
        nat.available = orig
