#!/usr/bin/env python
"""CommonVoice OOD inference CLI — mirrors the reference asr_inference_CV.py
(CV 7.0 manifest/normalizer; reference asr_inference_CV.py:264-514)."""

from tpu_asr.cli.common import build_inference_parser, run_inference


def main():
    parser = build_inference_parser(
        "Evaluate a trained student on CommonVoice (OOD)")
    parser.set_defaults(eval_data="commonvoice",
                        data_script_path="./commonvoice_asr.py")
    run_inference(parser.parse_args())


if __name__ == "__main__":
    main()
