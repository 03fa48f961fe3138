#!/usr/bin/env python
"""diffm inference CLI — mirrors the reference asr_inference_diffm.py
(--model_ver 1..8, eval_data in {librispeech, tedlium2, commonvoice,
gigaspeech}; reference asr_inference_diffm.py:506-525)."""

from tpu_asr.cli.common import build_inference_parser, run_inference


def main():
    args = build_inference_parser(
        "Evaluate a diffm-trained student", diffm=True).parse_args()
    run_inference(args, diffm_version=args.model_ver)


if __name__ == "__main__":
    main()
