#!/usr/bin/env python
"""Reproducible BASELINE.md measurements: INTERLEAVED PAIRED A/B of the
reference C binary vs sla_tpu on the BASELINE.json configs.

Method (round 5): each cell runs `pairs` back-to-back (reference, ours)
pairs within one session and reports the MEDIAN of the per-pair ratios
ref_t/our_t plus the ratio spread. On this 1-core box ambient load swings
absolute timings ±50% on minute scales; pairing puts both implementations
inside the same load window so the ratio is stable even when the absolute
Msps are not (the method that settled BASELINE.md footnote 3's 5-min row).
Every cell is appended to a machine-readable profile, written to
$SLA_TPU_PROFILE_OUT (default PROFILE_r05.json at the repo root).

Run from the repo root:

    python tools/measure_baseline.py [pairs]
"""

import json
import os
import pathlib
import statistics
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import sla_tpu as sla  # noqa: E402
from sla_tpu import wavio  # noqa: E402

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
REF = pathlib.Path(__file__).parent / "sla_ref"
OUT = pathlib.Path(
    os.environ.get(
        "SLA_TPU_PROFILE_OUT",
        pathlib.Path(__file__).resolve().parent.parent / "PROFILE_r05.json",
    )
)

PROFILE = {
    "method": (
        "interleaved paired A/B: per cell, `pairs` back-to-back "
        "(reference, ours) runs in one session; ratio = median of "
        "per-pair ref_s/our_s; spread = [min, max] of per-pair ratios. "
        "reference = tools/sla_ref (gcc -std=c89 -O3 -DNDEBUG) timed as a "
        "subprocess incl. its WAV file I/O (its only interface); ours = "
        "in-process API (Encoder.encode_whole / Decoder.decode_whole) on "
        "in-memory PCM. Samples = frames x channels."
    ),
    "pairs": PAIRS,
    "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    "cells": [],
}


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def paired_cell(name, op, samples, ref_fn, our_fn, pairs=PAIRS, extra=None):
    """Run `pairs` interleaved (ref, ours) pairs; record + print the cell."""
    ref_fn()
    our_fn()  # warm both (page cache, JIT caches, malloc pools)
    recs = [(timed(ref_fn), timed(our_fn)) for _ in range(pairs)]
    ratios = sorted(rt / ot for rt, ot in recs)
    med = statistics.median(ratios)
    ref_med = statistics.median(rt for rt, _ in recs)
    our_med = statistics.median(ot for _, ot in recs)
    cell = {
        "name": name,
        "op": op,
        "samples": samples,
        "pairs": [[round(rt, 6), round(ot, 6)] for rt, ot in recs],
        "ratio_median": round(med, 3),
        "ratio_spread": [round(ratios[0], 3), round(ratios[-1], 3)],
        "ref_msps_median": round(samples / ref_med / 1e6, 2),
        "our_msps_median": round(samples / our_med / 1e6, 2),
    }
    if extra:
        cell.update(extra)
    PROFILE["cells"].append(cell)
    print(
        f"{name} {op}: ref {cell['ref_msps_median']:.2f} ours "
        f"{cell['our_msps_median']:.2f} Msps | paired ratio "
        f"{med:.2f}x [{ratios[0]:.2f}, {ratios[-1]:.2f}]"
        + (f" | {' '.join(f'{k}={v}' for k, v in extra.items())}" if extra else "")
    )
    return cell


def measure(name, pcm, width, rate, mode):
    ch, n = pcm.shape
    wav_path = "/tmp/mb.wav"
    wavio.write_wav(wav_path, wavio.WavFile(ch, rate, width, pcm))
    ep = sla.PRESETS[mode]
    if ch != 2:
        ep = sla.EncodeParameter(
            ep.parcor_order, ep.longterm_order, ep.lms_order_per_filter,
            sla.ChannelProcessMethod.NONE, ep.window_function_type,
            ep.max_num_block_samples,
        )
    enc = sla.Encoder()
    enc.set_wave_format(sla.WaveFormat(ch, width, rate))
    enc.set_encode_parameter(ep)
    enc.encode_whole(np.ascontiguousarray(pcm[:, : min(n, 4 * 12288)]))  # warm
    blob = enc.encode_whole(pcm)
    s = ch * n

    def ref_enc():
        subprocess.run(
            [str(REF), "-e", "-q", "-m", str(mode), wav_path, "/tmp/mb.sla"],
            check=True,
        )

    def ref_dec():
        subprocess.run(
            [str(REF), "-d", "-q", "/tmp/mb.sla", "/tmp/mbd.wav"], check=True
        )

    ref_enc()  # produce /tmp/mb.sla before identity check / ref_dec
    ident = blob == open("/tmp/mb.sla", "rb").read()
    ratio = len(blob) / (s * width // 8)
    paired_cell(
        name, "encode", s, ref_enc, lambda: enc.encode_whole(pcm),
        extra={"compression_ratio": round(ratio, 4), "byte_identical": ident},
    )
    dec = sla.Decoder()
    _, out = dec.decode_whole(blob)
    assert np.array_equal(out, pcm), "round-trip failure"
    cell = paired_cell(name, "decode", s, ref_dec, lambda: dec.decode_whole(blob))
    # floor decomposition (VERDICT r4 #1): the quiet-best wall and its
    # stage split in the SAME session, so a <10x paired cell carries a
    # machine-readable account of where the nanoseconds go (the synthesis
    # cascade is port-0 multiply-throughput-bound on this host — see
    # BASELINE.md round-5 floor note)
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        dec.decode_whole(blob)
        t = time.perf_counter() - t0
        if best is None or t < best[0]:
            best = (t, dict(dec.stage_times))
    cell["our_quiet_best_msps"] = round(s / best[0] / 1e6, 2)
    cell["our_quiet_stage_ms"] = {
        k: round(v * 1e3, 2) for k, v in best[1].items()
    }
    cell["our_quiet_ns_per_row_sample"] = {
        k: round(v / s * 1e9, 2) for k, v in best[1].items()
    }


def main():
    rng = np.random.default_rng(7)
    n = 44100 * 60
    sig = 0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 44100.0)
    noise = np.stack(
        [np.convolve(rng.normal(0, 0.02, n), np.ones(8) / 8, "same") for _ in range(2)]
    )
    cd = (np.clip((sig[None] + noise) * 32767, -32768, 32767).astype(np.int32) << 16)
    measure("CD 44.1k/16 stereo 60s preset2", cd, 16, 44100, 2)

    n2 = 96000 * 20
    sig2 = 0.4 * np.sin(2 * np.pi * 1000 * np.arange(n2) / 96000.0) + 0.1 * np.sin(
        2 * np.pi * 7000 * np.arange(n2) / 96000.0
    )
    noise2 = np.stack(
        [np.convolve(rng.normal(0, 0.01, n2), np.ones(16) / 16, "same") for _ in range(2)]
    )
    hr = (
        np.clip((sig2[None] * np.array([[1], [0.8]]) + noise2) * (2**23 - 1),
                -(2**23), 2**23 - 1).astype(np.int32) << 8
    )
    measure("Hi-res 96k/24 stereo 20s preset4", hr, 24, 96000, 4)

    n3 = 48000 * 15
    chs = [
        np.clip(
            (0.3 * np.sin(2 * np.pi * (200 + 150 * c) * np.arange(n3) / 48000.0)
             + np.convolve(rng.normal(0, 0.01, n3), np.ones(8) / 8, "same"))
            * (2**23 - 1), -(2**23), 2**23 - 1,
        )
        for c in range(6)
    ]
    fx = np.stack(chs).astype(np.int32) << 8
    measure("5.1 48k/24 15s preset2", fx, 24, 48000, 2)

    # 5-minute stereo file: exercises the memory-bounded long-stream paths
    # (bounded filter chunking, decoder synthesis groups)
    n5 = 44100 * 300
    sig5 = 0.3 * np.sin(2 * np.pi * 330 * np.arange(n5) / 44100.0)
    noise5 = np.stack(
        [np.convolve(rng.normal(0, 0.02, n5), np.ones(8) / 8, "same") for _ in range(2)]
    )
    long_pcm = (
        np.clip((sig5[None] + noise5) * 32767, -32768, 32767).astype(np.int32) << 16
    )
    measure("5-minute CD stereo preset2", long_pcm, 16, 44100, 2)

    measure_corpus(rng)

    OUT.write_text(json.dumps(PROFILE, indent=1) + "\n")
    print(f"profile written to {OUT}")


def measure_corpus(rng, num_files: int = 100, seconds: int = 5):
    """Bulk-corpus config (BASELINE.json config 5): many small files. Ours
    runs the fused filter_batch mode (the multi-chip batch axis); the
    reference encodes file by file (its only mode). Corpus cells pair at
    min(PAIRS, 3) — one reference pass over 100 files costs ~25 s."""
    import shutil
    import tempfile

    from sla_tpu.corpus import decode_corpus, encode_corpus

    pairs = min(PAIRS, 3)
    base = pathlib.Path(tempfile.mkdtemp())
    files = []
    n = 44100 * seconds
    for i in range(num_files):
        tone = 0.3 * np.sin(2 * np.pi * (220 + 13 * i) * np.arange(n) / 44100.0)
        noise = np.convolve(rng.normal(0, 0.02, n), np.ones(8) / 8, "same")
        pcm = np.clip((tone + noise) * 32767, -32768, 32767).astype(np.int32) << 16
        pcm = np.stack([pcm, (pcm * 0.9).astype(np.int32)])
        p = base / f"f{i:03d}.wav"
        wavio.write_wav(str(p), wavio.WavFile(2, 44100, 16, pcm))
        files.append(p)
    s = 2 * n * num_files
    out_dir = base / "out"

    def ref_enc():
        for p in files:
            subprocess.run(
                [str(REF), "-e", "-q", "-m", "2", str(p),
                 str(base / f"ref_{p.stem}.sla")],
                check=True,
            )

    def our_enc():
        return encode_corpus(files, out_dir, preset=2, resume=False,
                             filter_batch=16)

    res = our_enc()  # also produces out_dir for the decode cells
    assert res.encoded == num_files and res.failed == 0
    ref_enc()
    ident = all(
        (out_dir / f"{p.stem}.sla").read_bytes()
        == (base / f"ref_{p.stem}.sla").read_bytes()
        for p in files
    )
    paired_cell(
        f"Bulk corpus {num_files}x{seconds}s CD (filter_batch=16)", "encode",
        s, ref_enc, our_enc, pairs=pairs,
        extra={"compression_ratio": round(res.ratio, 4), "byte_identical": ident},
    )

    sla_files = sorted(out_dir.glob("*.sla"))
    dec_dir = base / "dec"

    def ref_dec():
        for p in files:
            subprocess.run(
                [str(REF), "-d", "-q", str(out_dir / f"{p.stem}.sla"),
                 str(base / f"refdec_{p.stem}.wav")],
                check=True,
            )

    def our_dec():
        return decode_corpus(sla_files, dec_dir, resume=False)

    dres = our_dec()
    assert dres.encoded == num_files and dres.failed == 0
    dident = all(
        wavio.read_wav(str(dec_dir / f"{p.stem}.wav")).data.tobytes()
        == wavio.read_wav(str(p)).data.tobytes()
        for p in files
    )
    cell = paired_cell(
        f"Bulk corpus decode {num_files}x{seconds}s", "decode", s,
        ref_dec, our_dec, pairs=pairs, extra={"lossless": dident},
    )
    # machine-checkable I/O split (VERDICT r4 #5): the last pair's manifest
    # totals — compute = read+decode, write = WAV serialize+publish
    # (overlapped on the writer thread, so compute+write > wall is fine)
    dres = our_dec()
    cell["compute_seconds"] = dres.compute_seconds
    cell["write_seconds"] = dres.write_seconds
    cell["wall_seconds"] = round(dres.seconds, 3)

    # verify-only corpus decode: the pure-compute cell (no WAV/marker I/O
    # on our side; the reference has no verify-only mode, so its wall
    # keeps its file writes — the cell quantifies how much of the bulk
    # multiple is our write cost vs decode compute)
    def our_verify():
        return decode_corpus(sla_files, dec_dir, resume=False, verify_only=True)

    vres = our_verify()
    assert vres.encoded == num_files and vres.failed == 0
    vcell = paired_cell(
        f"Bulk corpus verify-only decode {num_files}x{seconds}s", "decode",
        s, ref_dec, our_verify, pairs=pairs,
    )
    vcell["compute_seconds"] = vres.compute_seconds
    shutil.rmtree(base)


if __name__ == "__main__":
    main()
