"""Corpus-scale encode: many WAV files per device dispatch.

BASELINE.json configs[3]: heterogeneous WAVs are bucketed by stream
parameters; every FULL block from every file in a bucket feeds one global
``[B, channels, block_size]`` dispatch stream (frames are self-contained,
so files mix freely within a batch — per-frame index arrays carry each
frame's own coded number).  Host assembly scatters the encoded frames back
to their files; short final blocks go through the oracle.  One bad file
isolates to that file (SURVEY.md §5 failure-isolation row).

Checkpoint/resume (SURVEY.md §5): corpus jobs are resumable at file
granularity.  Every completed file appends an entry to a manifest
sidecar in the output directory (written atomically: tmp + rename), and
``resume=True`` skips inputs whose manifest entry matches the input's
current (size, mtime) signature AND whose output still exists at the
recorded size — a killed job re-encodes at most the files that were in
flight.  Multi-process jobs (``encode_corpus_distributed``) write one
manifest shard per process; resume reads the union of all shards.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

import numpy as np

from flacx.encoder import BatchEncoder, EncoderConfig
from flacx.pipeline import _oracle_frame
from flacx.stream import StreamWriter
from flacx.wavio import read_wav


@dataclass
class CorpusResult:
    encoded: list[Path] = field(default_factory=list)
    skipped: list[Path] = field(default_factory=list)
    failed: dict[str, str] = field(default_factory=dict)
    samples: int = 0
    bytes_in: int = 0
    bytes_out: int = 0


_MANIFEST_STEM = ".flacx_manifest"


def _input_signature(path: Path) -> list[int]:
    st = path.stat()
    return [st.st_size, st.st_mtime_ns]


class _Manifest:
    """File-granular checkpoint log for corpus encodes.

    One JSON object per input path: output name, input signature and
    output size, plus the stats needed to aggregate across restarts.
    ``record`` rewrites this process's shard atomically after every
    completed file, so a crash loses at most the in-flight file.
    """

    def __init__(self, out_dir: Path, suffix: str = ""):
        self.path = out_dir / f"{_MANIFEST_STEM}{suffix}.json"
        self.entries: dict[str, dict] = {}

    @staticmethod
    def load_all(out_dir: Path) -> dict[str, dict]:
        """Union of every manifest shard in ``out_dir`` (multi-process)."""
        merged: dict[str, dict] = {}
        for p in sorted(out_dir.glob(f"{_MANIFEST_STEM}*.json")):
            try:
                merged.update(json.loads(p.read_text()))
            except (OSError, json.JSONDecodeError):
                continue  # a corrupt shard only costs re-encoding
        return merged

    def record(self, in_path: Path, out_path: Path, samples: int,
               bytes_in: int, bytes_out: int) -> None:
        self.entries[str(in_path)] = {
            "out": out_path.name,
            "sig": _input_signature(in_path),
            "out_bytes": bytes_out,
            "samples": samples,
            "bytes_in": bytes_in,
        }
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self.entries, indent=0))
        os.replace(tmp, self.path)

    @staticmethod
    def is_done(entry: dict | None, in_path: Path, out_path: Path) -> bool:
        """A file is skippable iff its input is unchanged since the
        recorded encode AND the recorded output is still intact."""
        if not entry or entry.get("out") != out_path.name:
            return False
        try:
            if entry.get("sig") != _input_signature(in_path):
                return False
            return out_path.stat().st_size == entry.get("out_bytes")
        except OSError:
            return False


def encode_corpus(paths: Sequence[Path | str], out_dir: Path | str, *,
                  block_size: int = 4608, max_lpc_order: int = 12,
                  qlp_precision: int = 5,
                  partition_orders: tuple[int, ...] = (0, 1, 2, 3, 4, 5),
                  batch_frames: int = 128, stereo: str = "auto",
                  windows: tuple[str, ...] = ("tukey(0.5)",),
                  sharding=None, resume: bool = False,
                  manifest_suffix: str = "") -> CorpusResult:
    """Encode many WAV files with globally batched device dispatches.

    ``resume=True`` skips inputs already completed by a previous run
    (per the manifest sidecar in ``out_dir``, see module docstring);
    ``manifest_suffix`` namespaces the manifest shard for multi-process
    jobs (``encode_corpus_distributed`` passes ``.p{process_index}``).
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    result = CorpusResult()
    manifest = _Manifest(out_dir, manifest_suffix)
    prior = _Manifest.load_all(out_dir) if resume else {}

    # ---- assign output names upfront; same-stem inputs from different
    # directories (a/x.wav, b/x.wav) get disambiguated instead of silently
    # overwriting each other
    out_paths: dict[Path, Path] = {}
    used_names: set[str] = set()
    for path in map(Path, paths):
        name = path.stem + ".flac"
        k = 1
        while name in used_names:
            name = f"{path.stem}-{k}.flac"
            k += 1
        used_names.add(name)
        out_paths[path] = out_dir / name

    # ---- load and bucket by stream parameters -----------------------------
    buckets: dict[tuple, list[tuple[Path, np.ndarray]]] = {}
    for path in map(Path, paths):
        if resume and _Manifest.is_done(prior.get(str(path)), path,
                                        out_paths[path]):
            result.skipped.append(out_paths[path])
            continue
        try:
            sr, bps, ch, pcm = read_wav(path)
        except Exception as exc:  # noqa: BLE001 — per-file isolation
            result.failed[str(path)] = f"read: {exc}"
            continue
        buckets.setdefault((sr, bps, ch), []).append((path, pcm))

    for (sr, bps, ch), files in buckets.items():
        eff_order = (min(max_lpc_order, 12) if sr <= 48_000
                     else max_lpc_order)
        from flacx.encoder import device_min_block_size
        if block_size < device_min_block_size(eff_order):
            # tiny blocks route through the oracle path (see flacx.pipeline)
            from flacx.pipeline import encode_to_file
            for path, pcm in files:
                with out_paths[path].open("wb") as f:
                    encode_to_file(
                        f, pcm, sample_rate=sr, bps=bps, channels=ch,
                        block_size=block_size, max_lpc_order=eff_order,
                        qlp_precision=qlp_precision,
                        partition_orders=partition_orders, device=False)
                    nbytes = f.tell()
                result.bytes_out += nbytes
                result.encoded.append(out_paths[path])
                result.samples += pcm.shape[0]
                bin_ = pcm.shape[0] * ch * ((bps + 7) // 8)
                result.bytes_in += bin_
                manifest.record(path, out_paths[path], pcm.shape[0],
                                bin_, nbytes)
            continue
        cfg = EncoderConfig(
            sample_rate=sr, bps=bps, channels=ch, block_size=block_size,
            max_lpc_order=eff_order,
            qlp_precision=qlp_precision, partition_orders=partition_orders,
            stereo=stereo, windows=windows)
        enc = BatchEncoder(cfg, batch_frames=batch_frames, sharding=sharding)

        # global (file, frame) work list over FULL blocks
        work: list[tuple[int, int]] = []   # (file_no, frame_no)
        planars = []
        for file_no, (path, pcm) in enumerate(files):
            n_full = pcm.shape[0] // block_size
            planar = (pcm[: n_full * block_size]
                      .reshape(n_full, block_size, ch)
                      .transpose(0, 2, 1).astype(np.int32))
            planars.append(planar)
            work.extend((file_no, i) for i in range(n_full))

        frames_by_file: dict[int, dict[int, bytes]] = {
            i: {} for i in range(len(files))}

        b = batch_frames
        for lo in range(0, len(work), b):
            chunk = work[lo: lo + b]
            pcm_batch = np.stack(
                [planars[f][i] for f, i in chunk], axis=0)
            idx_batch = np.array([i for _, i in chunk], np.int64)
            valid = len(chunk)
            if valid < b:
                pcm_batch = np.concatenate(
                    [pcm_batch, np.zeros((b - valid, *pcm_batch.shape[1:]),
                                         np.int32)])
                idx_batch = np.concatenate(
                    [idx_batch, np.zeros(b - valid, np.int64)])
            out = enc.encode_batch_indexed(pcm_batch, idx_batch)
            data = np.asarray(out["bytes"])
            lens = np.asarray(out["length"])
            for r, (f, i) in enumerate(chunk):
                frames_by_file[f][i] = data[r, : lens[r]].tobytes()

        # ---- per-file assembly ------------------------------------------
        for file_no, (path, pcm) in enumerate(files):
            out_path = out_paths[path]
            total = pcm.shape[0]
            n_full = total // block_size
            tail = total - n_full * block_size
            with out_path.open("wb") as f:
                writer = StreamWriter(f, sr, bps, ch, total, block_size)
                writer.add_pcm(pcm)
                for i in range(n_full):
                    writer.write_frame(frames_by_file[file_no][i])
                if tail:
                    writer.write_frame(_oracle_frame(
                        pcm[n_full * block_size:], n_full, bps, block_size,
                        cfg.max_lpc_order, qlp_precision, partition_orders))
                writer.finalize()
                nbytes = f.tell()
            result.bytes_out += nbytes
            result.encoded.append(out_path)
            result.samples += total
            bin_ = total * ch * ((bps + 7) // 8)
            result.bytes_in += bin_
            manifest.record(path, out_path, total, bin_, nbytes)
    return result
