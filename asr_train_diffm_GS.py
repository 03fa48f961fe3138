#!/usr/bin/env python
"""diffm KD trainer on GigaSpeech/TED — mirrors asr_train_diffm_GS.py
(reference asr_train_diffm_GS.py:35,589,1518: the R3 x R2 merge)."""

from tpu_asr.cli.common import build_train_parser, run_training


def main():
    args = build_train_parser(
        "Train Conformer CTC student with diffm KD on GigaSpeech/TED",
        gigaspeech=True, diffm=True).parse_args()
    corpus = "tedlium" if "tedlium" in args.data_script_path else "gigaspeech"
    run_training(args, corpus=corpus, diffm_version=args.model_version)


if __name__ == "__main__":
    main()
