"""Corpus ingestion tool: decode + resample audio into 16 kHz mono WAV.

Native counterpart of the reference's ``datasets/prepare_kaldi.py`` (sox /
sph2pipe subprocess pipelines): walks a corpus directory, decodes each
audio file and writes a resampled 16 kHz PCM16 WAV tree. Uses the C++
library (``mlvae_tpu/native``) when available, the python WAV path
otherwise.

    python -m mlvae_tpu.cli.ingest SRC_DIR DST_DIR [--rate 16000]
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

logger = logging.getLogger(__name__)


def ingest(src_dir, dst_dir, rate: int = 16000) -> int:
    from mlvae_tpu.data.wav import read_wav, resample, write_wav
    try:
        from mlvae_tpu import native
        lib = native.load()
    except Exception:
        lib = None

    src_dir, dst_dir = Path(src_dir), Path(dst_dir)
    n = 0
    # one suffix-insensitive pass: two rglob patterns would double-process
    # every file on case-insensitive filesystems.  ".wav" covers both RIFF
    # and LDC TIMIT's SPHERE-with-.WAV-suffix files; ".sph" covers corpora
    # that use the explicit SPHERE suffix.
    paths = sorted(p for p in src_dir.rglob("*")
                   if p.is_file() and p.suffix.lower() in (".wav", ".sph"))
    seen_out = set()
    for path in paths:
        rel = path.relative_to(src_dir)
        out_path = (dst_dir / rel).with_suffix(".wav")
        if out_path in seen_out:
            logger.warning(
                "skipping %s: output %s already written by a sibling that "
                "differs only in suffix case", path, out_path)
            continue
        seen_out.add(out_path)
        if lib is not None:
            try:
                wave, sr = native.read_wav(path)
            except IOError:
                # formats only the python reader covers (e.g. SPHERE with
                # embedded-shorten payloads) fall back per-file
                wave, sr = read_wav(path)
            if sr != rate:
                wave = native.resample(wave, sr, rate)
        else:
            wave, sr = read_wav(path)
            if sr != rate:
                wave = resample(wave, sr, rate)
        write_wav(out_path, wave, rate)
        n += 1
    logger.info("ingested %d files -> %s", n, dst_dir)
    return n


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src_dir")
    p.add_argument("dst_dir")
    p.add_argument("--rate", type=int, default=16000)
    args = p.parse_args(argv)
    ingest(args.src_dir, args.dst_dir, args.rate)


if __name__ == "__main__":
    main()
