"""Bulk corpus encode: many WAV files -> .sla with resume markers.

The reference is a single-file batch codec; the corpus runner is the
TPU-framework equivalent of its missing "large-scale" mode (SURVEY §5:
corpus-level resume; BASELINE config 5: 1000-file library sharded over a
mesh). Design:

* **Work sharding** — the file list is sharded round-robin by
  (process_index, num_processes) for multi-host runs (DCN-level data
  parallelism at whole-file granularity); within a process, files stream
  through the encoder whose filter stage batches (blocks x channels) rows —
  the device mesh axis — per file.
* **Checkpoint/resume** — each completed file writes `<out>.done` via
  atomic rename; a restarted run skips completed files. A manifest JSON
  aggregates sizes/ratios at the end.
* **Failure isolation** — a file that fails to parse/encode is recorded in
  the manifest with its error and does not abort the run (the reference's
  graceful-degradation stance, SLAEncoder.c:561-565, applied corpus-wide).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import pathlib
import time

import numpy as np

from . import PRESETS, wavio
from .constants import ChannelProcessMethod
from .encoder import Encoder, EncoderConfig
from .errors import SLAError
from .format import EncodeParameter, WaveFormat


@dataclasses.dataclass
class CorpusResult:
    total_files: int
    encoded: int
    skipped: int
    failed: int
    in_bytes: int
    out_bytes: int
    seconds: float

    @property
    def ratio(self) -> float:
        return self.out_bytes / self.in_bytes if self.in_bytes else 0.0


def shard_files(files: list, index: int, count: int) -> list:
    """Round-robin file sharding across processes (DCN axis)."""
    return [f for i, f in enumerate(files) if i % count == index]


def output_names(paths: list[pathlib.Path]) -> dict[pathlib.Path, str]:
    """Collision-free output basename per input path.

    Same-stem inputs from different directories get a short stable hash of
    the absolute path appended, so outputs and resume markers never alias
    (hashing only on collision keeps the common case human-readable, and
    the hash is deterministic across resumed runs)."""
    by_stem: dict[str, list[pathlib.Path]] = {}
    for p in paths:
        by_stem.setdefault(p.stem, []).append(p)
    names: dict[pathlib.Path, str] = {}
    for stem, group in by_stem.items():
        if len(group) == 1:
            names[group[0]] = stem
        else:
            for p in group:
                digest = hashlib.blake2b(
                    str(p.resolve()).encode(), digest_size=4
                ).hexdigest()
                names[p] = f"{stem}-{digest}"
    return names


def encode_corpus(
    files: list[str | pathlib.Path],
    out_dir: str | pathlib.Path,
    preset: int = 2,
    resume: bool = True,
    process_index: int | None = None,
    process_count: int | None = None,
    encoder_config: EncoderConfig | None = None,
    verbose: bool = False,
) -> CorpusResult:
    """Encode a WAV corpus into out_dir, one .sla per input.

    Resume: files whose `.done` marker exists are skipped. Multi-host: pass
    process_index/process_count (default: jax.process_index/count when
    initialized, else 0/1)."""
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if process_index is None or process_count is None:
        try:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        except Exception:
            process_index, process_count = 0, 1

    mine = shard_files([pathlib.Path(f) for f in files], process_index, process_count)
    t0 = time.time()
    encoded = skipped = failed = 0
    in_bytes = out_bytes = 0
    manifest: dict = {}

    enc = Encoder(encoder_config or EncoderConfig())
    names = output_names(mine)
    for path in mine:
        out_path = out_dir / (names[path] + ".sla")
        done_marker = out_dir / (names[path] + ".done")
        if resume and done_marker.exists():
            skipped += 1
            continue
        try:
            wav = wavio.read_wav(str(path))
            enc_preset = PRESETS[preset]
            ch_method = enc_preset.ch_process_method
            if wav.num_channels != 2:
                ch_method = ChannelProcessMethod.NONE
            enc.set_wave_format(
                WaveFormat(wav.num_channels, wav.bits_per_sample, wav.sampling_rate)
            )
            enc.set_encode_parameter(
                EncodeParameter(
                    enc_preset.parcor_order,
                    enc_preset.longterm_order,
                    enc_preset.lms_order_per_filter,
                    ch_method,
                    enc_preset.window_function_type,
                    enc_preset.max_num_block_samples,
                )
            )
            blob = enc.encode_whole(wav.data)
            tmp = out_path.with_suffix(".sla.tmp")
            tmp.write_bytes(blob)
            os.replace(tmp, out_path)  # atomic publish
            done_marker.touch()
            encoded += 1
            in_bytes += path.stat().st_size
            out_bytes += len(blob)
            manifest[str(path)] = {"out": out_path.name, "bytes": len(blob)}
            if verbose:
                print(f"{path.name}: {path.stat().st_size} -> {len(blob)}")
        except (SLAError, ValueError, OSError) as e:
            failed += 1
            manifest[str(path)] = {"error": str(e)}
            if verbose:
                print(f"{path.name}: FAILED ({e})")

    result = CorpusResult(
        total_files=len(mine),
        encoded=encoded,
        skipped=skipped,
        failed=failed,
        in_bytes=in_bytes,
        out_bytes=out_bytes,
        seconds=time.time() - t0,
    )
    manifest_path = out_dir / f"manifest_{process_index}.json"
    manifest_path.write_text(
        json.dumps({"result": dataclasses.asdict(result), "files": manifest}, indent=1)
    )
    return result
