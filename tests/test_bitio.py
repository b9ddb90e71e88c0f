import numpy as np
import pytest

from sla_tpu.bitio import (
    BitReader,
    BitWriter,
    sint32_to_uint32,
    uint32_to_sint32,
    zigzag_decode_array,
    zigzag_encode_array,
)


def test_put_get_roundtrip():
    rng = np.random.default_rng(3)
    widths = rng.integers(1, 33, 200)
    values = [int(rng.integers(0, 1 << int(w))) for w in widths]
    w = BitWriter()
    for v, nb in zip(values, widths):
        w.put(v, int(nb))
    w.flush()
    r = BitReader(w.getvalue())
    for v, nb in zip(values, widths):
        assert r.get(int(nb)) == v


def test_64bit_values():
    w = BitWriter()
    w.put(0xDEADBEEFCAFEBABE, 64)
    w.put(1, 1)
    w.flush()
    r = BitReader(w.getvalue())
    assert r.get(64) == 0xDEADBEEFCAFEBABE
    assert r.get(1) == 1


def test_zero_run():
    w = BitWriter()
    for run in [0, 1, 7, 8, 9, 31, 64, 200]:
        w.put_unary(run)
    w.flush()
    r = BitReader(w.getvalue())
    for run in [0, 1, 7, 8, 9, 31, 64, 200]:
        assert r.get_zero_run() == run


def test_flush_and_tell():
    w = BitWriter()
    w.put(0b101, 3)
    w.flush()
    assert w.tell() == 1
    r = BitReader(w.getvalue())
    assert r.get(3) == 0b101
    r.flush()
    assert r.tell() == 1


@pytest.mark.parametrize("v", [0, 1, -1, 2, -2, 12345, -12345, 2**30, -(2**31)])
def test_zigzag_scalar(v):
    u = sint32_to_uint32(v)
    assert uint32_to_sint32(u) == v


def test_zigzag_array():
    rng = np.random.default_rng(5)
    v = rng.integers(-(2**31), 2**31, 1000).astype(np.int32)
    assert np.array_equal(zigzag_decode_array(zigzag_encode_array(v)), v)
    # matches scalar definition
    for x in [0, 1, -1, 5, -5]:
        assert zigzag_encode_array(np.array([x], np.int32))[0] == sint32_to_uint32(x)


def test_zero_run_overread_marker():
    """A zero run falling off the buffered end must mark the over-read
    (pos = total + 1) like the native reader and the hostref twin — a
    truncated unary tail must not decode as a silently-complete run."""
    r = BitReader(bytes([0x80, 0x00]))  # 1 then fifteen 0s, no terminator
    assert r.get_zero_run() == 0  # consumes the leading 1
    run = r.get_zero_run()  # rest of the buffer is all zeros
    assert run == 15
    assert r.tell() > 2  # ceil((16+1)/8) = 3: overshoot visible
    with pytest.raises(IndexError):
        r.get(1)


def test_write_bytes_at_rejects_out_of_range():
    """bytearray slice assignment silently APPENDS for an out-of-range pos;
    a stale back-patch offset must be loud instead."""
    import pytest

    from sla_tpu.bitio import BitWriter

    w = BitWriter()
    w.put_bytes(b"\x00" * 4)
    with pytest.raises(ValueError):
        w.write_bytes_at(100, b"AB")
    with pytest.raises(ValueError):
        w.write_bytes_at(3, b"AB")  # tail crosses the end
    w.write_bytes_at(2, b"AB")  # in-range patch still works
    assert w.getvalue() == b"\x00\x00AB"
