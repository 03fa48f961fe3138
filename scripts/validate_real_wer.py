#!/usr/bin/env python
"""Real-checkpoint / real-data WER gate (blocked offline; ready to run).

The parity story today rests on the torch re-derivation oracle
(tests/nemo_oracle.py + tests/test_nemo_real_format.py). The missing last
mile — environmentally blocked by zero egress — is importing NVIDIA's actual
`stt_en_conformer_ctc_small.nemo` (the reference teacher,
/root/reference/asr_train.py:1718-1722) and reproducing NGC's published
LibriSpeech WER. This script IS that gate: point it at the real artifacts
and it asserts the published targets (SURVEY.md §6):

    test-clean  3.4 %WER   test-other  8.1 %WER   (tolerance ±0.1 abs)

Usage (once the artifacts exist on disk):

    python scripts/validate_real_wer.py \
        --nemo /path/to/stt_en_conformer_ctc_small.nemo \
        --librispeech_dir /path/to/LibriSpeech \
        [--splits test-clean,test-other] [--batch_size 16]

LibriSpeech layout: the openslr.org extraction —
<librispeech_dir>/<split>/<spk>/<chap>/<spk>-<chap>-<utt>.flac with
per-chapter <spk>-<chap>.trans.txt transcripts (the same layout the HF
builder consumes, librispeech_asr.py:264-300). Exits 2 with a clear message
when either artifact is absent, 1 on a WER gate failure, 0 on pass.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NGC-published WER for stt_en_conformer_ctc_small on LibriSpeech (the
# north-star gate: WER parity ±0.1 abs, BASELINE.md)
PUBLISHED_WER = {"test-clean": 3.4, "test-other": 8.1}
TOLERANCE = 0.1


def collect_split(root: str, split: str):
    """(audio_path, reference_text) pairs from an openslr LibriSpeech split."""
    split_dir = os.path.join(root, split)
    if not os.path.isdir(split_dir):
        return None
    pairs = []
    for dirpath, _dirnames, filenames in sorted(os.walk(split_dir)):
        for fn in sorted(filenames):
            if not fn.endswith(".trans.txt"):
                continue
            with open(os.path.join(dirpath, fn)) as f:
                for line in f:
                    utt_id, _, text = line.strip().partition(" ")
                    flac = os.path.join(dirpath, utt_id + ".flac")
                    if os.path.isfile(flac):
                        pairs.append((flac, text.lower()))
    return pairs


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nemo", required=True,
                    help="path to the real stt_en_conformer_ctc_small.nemo")
    ap.add_argument("--librispeech_dir", required=True,
                    help="extracted LibriSpeech root (openslr layout)")
    ap.add_argument("--splits", default="test-clean,test-other")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--limit", type=int, default=0,
                    help="debug: cap utterances per split (disables the gate)")
    args = ap.parse_args()

    if not os.path.isfile(args.nemo):
        print(f"BLOCKED: {args.nemo} not found — the real NGC checkpoint "
              f"needs network egress. The offline substitute is "
              f"tests/test_nemo_real_format.py (NGC-byte-layout fixture + "
              f"torch-oracle logit parity).", file=sys.stderr)
        return 2
    if not os.path.isdir(args.librispeech_dir):
        print(f"BLOCKED: {args.librispeech_dir} not found — LibriSpeech "
              f"needs network egress.", file=sys.stderr)
        return 2

    from tpu_asr.convert.nemo_import import load_nemo_checkpoint
    from tpu_asr.data.audio import load_audio
    from tpu_asr.data.tokenizer import SentencePieceBPETokenizer
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.models.transcribe import Transcriber
    from tpu_asr.utils.wer import word_error_rate

    cfg, params, batch_stats, tok_path = load_nemo_checkpoint(args.nemo)
    if tok_path is None:
        print("FAIL: .nemo carries no tokenizer artifact", file=sys.stderr)
        return 1
    tokenizer = SentencePieceBPETokenizer.from_file(tok_path)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    model = CTCModel(cfg)
    tr = Transcriber(model, variables, tokenizer,
                     batch_size=args.batch_size)

    failures = []
    for split in args.splits.split(","):
        split = split.strip()
        pairs = collect_split(args.librispeech_dir, split)
        if pairs is None:
            print(f"BLOCKED: split {split!r} not present under "
                  f"{args.librispeech_dir}", file=sys.stderr)
            return 2
        if args.limit:
            pairs = pairs[:args.limit]
        paths = [p for p, _ in pairs]
        refs = [t for _, t in pairs]
        t0 = time.perf_counter()
        hyps = tr.transcribe(paths)
        dt = time.perf_counter() - t0
        wer = word_error_rate(hyps, refs) * 100.0
        target = PUBLISHED_WER.get(split)
        # decoded sample counts, not file bytes: FLAC compresses ~2x, so a
        # byte-based estimate would understate RTFx by that factor
        audio_s = sum(
            len(load_audio(p, 16000)) for p in paths) / 16000.0
        print(f"{split}: WER {wer:.2f}% over {len(pairs)} utts "
              f"(~RTFx {audio_s / dt:.0f}); NGC target "
              f"{target if target is not None else 'n/a'}")
        if args.limit:
            continue
        if target is not None and abs(wer - target) > TOLERANCE:
            failures.append((split, wer, target))

    if failures:
        for split, wer, target in failures:
            print(f"GATE FAIL {split}: WER {wer:.2f}% vs published "
                  f"{target:.1f}% (tolerance ±{TOLERANCE})", file=sys.stderr)
        return 1
    print("WER gate PASSED (±0.1 abs of NGC-published numbers)"
          if not args.limit else "debug run (no gate)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
