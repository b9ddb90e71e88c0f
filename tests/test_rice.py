import numpy as np
import pytest

from sla_tpu import rice
from sla_tpu.bitio import BitReader, BitWriter


@pytest.mark.parametrize("init_param", [1, 2, 4, 8, 16, 100, 1000])
def test_recursive_rice_roundtrip(init_param):
    rng = np.random.default_rng(init_param)
    vals = rng.integers(0, max(4 * init_param, 8), 500).astype(np.uint32)
    w = BitWriter()
    st = rice.RiceState(init_param)
    for v in vals:
        rice.put_recursive_rice(w, st, int(v))
    w.flush()
    r = BitReader(w.getvalue())
    st2 = rice.RiceState(init_param)
    out = [rice.get_recursive_rice(r, st2) for _ in vals]
    assert out == list(map(int, vals))
    assert st.params == st2.params


def test_recursive_rice_large_values_gamma_escape():
    w = BitWriter()
    st = rice.RiceState(1)
    vals = [0, 100000, 0, 5, 1 << 20, 3]
    for v in vals:
        rice.put_recursive_rice(w, st, v)
    w.flush()
    r = BitReader(w.getvalue())
    st2 = rice.RiceState(1)
    assert [rice.get_recursive_rice(r, st2) for _ in vals] == vals


@pytest.mark.parametrize("m", [1, 2, 3, 4, 5, 7, 8, 16, 21])
def test_golomb_roundtrip(m):
    vals = list(range(40)) + [100, 1000]
    w = BitWriter()
    for v in vals:
        rice.put_golomb(w, m, v)
    w.flush()
    r = BitReader(w.getvalue())
    assert [rice.get_golomb(r, m) for _ in vals] == vals


def test_gamma_roundtrip():
    vals = [0, 1, 2, 3, 4, 7, 8, 100, 2**16, 2**24]
    w = BitWriter()
    for v in vals:
        rice.put_gamma(w, v)
    w.flush()
    r = BitReader(w.getvalue())
    assert [rice.get_gamma(r) for _ in vals] == vals


def test_data_array_interleave_roundtrip():
    rng = np.random.default_rng(9)
    data = [rng.integers(-500, 500, 300).astype(np.int32) for _ in range(3)]
    init = rice.calculate_initial_params(data)
    w = BitWriter()
    rice.put_data_array(w, init, data, 300)
    w.flush()
    r = BitReader(w.getvalue())
    out = rice.get_data_array(r, init, 3, 300)
    for a, b in zip(data, out):
        assert np.array_equal(a, b)


def test_data_array_low_param_golomb_path():
    # tiny values force the static Golomb branch (mean param <= 8)
    rng = np.random.default_rng(11)
    data = [rng.integers(-2, 3, 200).astype(np.int32) for _ in range(2)]
    init = rice.calculate_initial_params(data)
    assert sum(init) // 2 <= 8
    w = BitWriter()
    rice.put_data_array(w, init, data, 200)
    w.flush()
    r = BitReader(w.getvalue())
    out = rice.get_data_array(r, init, 2, 200)
    for a, b in zip(data, out):
        assert np.array_equal(a, b)


def test_gamma_overlong_digits_poisons_reader():
    """A gamma code claiming >32 digits cannot come from any uint32
    put_gamma: both twins must flag corruption via the reader's over-read
    state instead of shifting by >=32 (UB in the native build)."""
    from sla_tpu.bitio import BitReader, BitWriter
    from sla_tpu.rice import get_gamma

    w = BitWriter()
    w.put(0, 40)          # 40-zero run
    w.put(1, 1)           # terminator -> ndigit = 41
    w.put(0xFFFF, 16)     # bits the bogus rest-read would consume
    w.put(0, 7)
    w.flush()
    blob = w.getvalue()
    r = BitReader(blob)
    assert get_gamma(r) == 0
    assert r.tell() > len(blob)  # poisoned: end-position checks fire
    # native twin: a crafted COMPRESSDATA payload whose escape hits the
    # same pattern must decode to a structured over-read, not UB
    from sla_tpu import native

    if native.available():
        # escape marker (16-bit quotient cap) followed by an over-long
        # gamma: quot unary 16 zeros+1, then the bogus 40-zero gamma
        w2 = BitWriter()
        w2.put(0, 16); w2.put(1, 1)   # escape: quot >= threshold
        w2.put(0, 40); w2.put(1, 1)   # gamma with 41 digits
        w2.put(0, 64); w2.put(0, 63)  # padding (zeros)
        w2.flush()
        payload = w2.getvalue()
        import numpy as np

        from sla_tpu.errors import SLAError

        cur = native.PayloadCursor([40] * 1, 1, 0)  # adaptive branch
        cur.read(np.frombuffer(payload, dtype=np.uint8), 8)
        # over-read marker must be visible to the caller's position check
        assert int(cur.bit_pos.value) > 8 * len(payload)


def test_corrupt_payload_decode_wraps_uint32():
    """Corrupt payloads can drive quot*k past 2^32: the decode must wrap in
    uint32 like the C reference (the native backend does), never raise a
    bare OverflowError from the int32 store."""
    from sla_tpu.bitio import BitReader
    from sla_tpu.rice import RiceState, get_golomb, get_recursive_rice

    # a long in-buffer zero run against a huge adaptive parameter
    st = RiceState(1 << 30)
    r = BitReader(b"\x00" * 400 + b"\xff" * 16)
    v = get_recursive_rice(r, st)
    assert 0 <= v < (1 << 32)
    # static Golomb with a huge m and a long run
    r = BitReader(b"\x00" * 400 + b"\xff" * 16)
    v = get_golomb(r, 1 << 22)
    assert 0 <= v < (1 << 32)


def test_pathological_golomb_put_rejected():
    """A symbol whose static-Golomb unary run would be multi-gigabit must
    raise a structured error on BOTH entropy backends (the reference would
    emit it; see the u32 parameter-wrap defect class)."""
    import numpy as np
    import pytest

    from sla_tpu import native, rice
    from sla_tpu.bitio import BitWriter
    from sla_tpu.errors import SLAError

    w = BitWriter()
    with pytest.raises(SLAError):
        rice.put_golomb(w, 1, 1 << 31)
    with pytest.raises(SLAError):
        rice.put_data_array(
            BitWriter(), [1], [np.array([-(1 << 31)], dtype=np.int32)], 1
        )
    if native.available():
        with pytest.raises(SLAError):
            native.put_data_array(
                np.array([[-(1 << 31)]], dtype=np.int32), [1]
            )
