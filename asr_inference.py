#!/usr/bin/env python
"""LibriSpeech inference/eval CLI — mirrors the reference asr_inference.py
(rebuild model from teacher cfg + flags, load ckpt, per-split WER;
reference asr_inference.py:205-471)."""

from tpu_asr.cli.common import build_inference_parser, run_inference


def main():
    args = build_inference_parser(
        "Evaluate a trained student on LibriSpeech splits").parse_args()
    run_inference(args)


if __name__ == "__main__":
    main()
