#!/usr/bin/env python
"""GigaSpeech / TED-LIUM KD trainer CLI — mirrors the reference asr_train_GS.py
(GigaSpeech manifest builder + tag filters + --train_student_model;
reference asr_train_GS.py:1453-1972)."""

from tpu_asr.cli.common import build_train_parser, run_training


def main():
    args = build_train_parser(
        "Train Conformer CTC student on GigaSpeech/TED-LIUM",
        gigaspeech=True).parse_args()
    corpus = "tedlium" if "tedlium" in args.data_script_path else "gigaspeech"
    run_training(args, corpus=corpus)


if __name__ == "__main__":
    main()
