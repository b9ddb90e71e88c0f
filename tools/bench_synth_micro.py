#!/usr/bin/env python
"""Microbenchmark the interleaved native synthesis cascade in isolation.

Decomposes the batch-decoder synthesis wall (pass A sign-sign LMS, pass B
long-term, pass C PARCOR lattice + de-emphasis) by differencing runs of
`sla_synth_rows16` with stages disabled (M=0 empties the LMS tap loops,
pitch<=0 skips long-term; the lattice cannot be disabled, so its cost is
the M=0/no-pitch run minus the tile I/O estimate). Prints ns/row-sample
per configuration. Usage: python tools/bench_synth_micro.py [repeats]
"""

import ctypes
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from sla_tpu import native  # noqa: E402

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 9
R, N = 16, 12288
I32 = ctypes.POINTER(ctypes.c_int32)


def run(lib, p, M, pitch, taps, repeats=REPEATS):
    rng = np.random.default_rng(7)
    res = rng.integers(-2000, 2000, size=(R, N), dtype=np.int32)
    out = np.empty_like(res)
    coef = rng.integers(-2000, 2000, size=(R, max(p, 1)), dtype=np.int32)
    pitch8 = np.full(R, pitch, dtype=np.int32)
    ltm = rng.integers(-(1 << 20), 1 << 20, size=(R, max(taps, 1)),
                       dtype=np.int32)
    args = (res.ctypes.data_as(I32), out.ctypes.data_as(I32),
            ctypes.c_int32(N), coef.ctypes.data_as(I32), ctypes.c_int32(p),
            pitch8.ctypes.data_as(I32), ltm.ctypes.data_as(I32),
            ctypes.c_int32(taps), ctypes.c_int32(M))
    lib.sla_synth_rows16(*args)  # warm
    best = min(_timed(lib, args) for _ in range(repeats))
    return best / (R * N) * 1e9


def _timed(lib, args):
    t0 = time.perf_counter()
    lib.sla_synth_rows16(*args)
    return time.perf_counter() - t0


def main():
    lib = native._load()
    lib.sla_synth_rows16.restype = ctypes.c_int32
    full2 = run(lib, 16, 8, 256, 1)     # preset-2 shape
    full4 = run(lib, 32, 8, 256, 3)     # preset-4 shape (LMS order 8 too)
    lat16 = run(lib, 16, 0, 0, 1)       # lattice16 + tile I/O only
    lat32 = run(lib, 32, 0, 0, 1)
    lms8 = run(lib, 16, 8, 0, 1) - lat16
    lms8rt = run(lib, 16, 16, 0, 1) - lat16  # runtime-M ring path (M=16)
    lt1 = run(lib, 16, 0, 256, 1) - lat16
    lt3 = run(lib, 16, 0, 256, 3) - lat16
    print(f"preset2(p16,M8,lt1)  total {full2:6.2f} ns/rs")
    print(f"preset4(p32,M8,lt3)  total {full4:6.2f} ns/rs")
    print(f"  lattice16+IO {lat16:6.2f}   lattice32+IO {lat32:6.2f}")
    print(f"  lms8(regwin) {lms8:6.2f}   lms16(ring,runtime-M) {lms8rt:6.2f}")
    print(f"  longterm t1 {lt1:6.2f}   t3 {lt3:6.2f}")


if __name__ == "__main__":
    main()
