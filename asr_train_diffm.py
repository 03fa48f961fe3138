#!/usr/bin/env python
"""Latent AE+FM/diffusion ("diffm") KD trainer CLI — mirrors the reference
asr_train_diffm.py (--model_version ver1..ver8 dispatch at
asr_train_diffm.py:1848-1933, --latent_dim)."""

from tpu_asr.cli.common import build_train_parser, run_training


def main():
    args = build_train_parser(
        "Train Conformer CTC student with latent diffm KD (ver1-8)",
        diffm=True).parse_args()
    run_training(args, corpus="librispeech", diffm_version=args.model_version)


if __name__ == "__main__":
    main()
