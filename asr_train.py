#!/usr/bin/env python
"""LibriSpeech KD trainer CLI — mirrors the reference asr_train.py flag surface
(reference asr_train.py:1379-1893) on the TPU-native framework."""

from tpu_asr.cli.common import build_train_parser, run_training


def main():
    args = build_train_parser(
        "Train halved-dimension Conformer CTC student on LibriSpeech").parse_args()
    run_training(args, corpus="librispeech")


if __name__ == "__main__":
    main()
