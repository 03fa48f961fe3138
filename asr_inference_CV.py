#!/usr/bin/env python
"""CommonVoice OOD inference CLI — mirrors the reference asr_inference_CV.py
(CV 7.0 manifest/normalizer; reference asr_inference_CV.py:264-514), including
its CV-specific flags (--cv_dataset_name/--cv_lang/--cv_splits/--hf_token,
reference :289-294)."""

from tpu_asr.cli.common import build_inference_parser, run_inference


def main():
    parser = build_inference_parser(
        "Evaluate a trained student on CommonVoice (OOD)")
    parser.add_argument(
        "--cv_dataset_name", type=str, default="./commonvoice_asr.py",
        help="HF dataset name or local builder script (reference default "
             "mozilla-foundation/common_voice_7_0; ours is the offline "
             "builder)")
    parser.add_argument("--cv_lang", type=str, default="en",
                        help="language code (e.g., en, de, fr, ...)")
    parser.add_argument("--cv_splits", type=str, default="validation,test",
                        help="comma-separated HF splits to evaluate")
    parser.add_argument("--hf_token", type=str, default=None,
                        help="HF token (Common Voice requires auth)")
    parser.set_defaults(eval_data="commonvoice")
    args = parser.parse_args()

    # translate CV-specific flags onto the generic data surface
    args.data_script_path = args.cv_dataset_name
    args.data_config_name = args.cv_lang
    cv_splits = [s for s in args.cv_splits.split(",") if s]
    args.data_train_split = None                 # inference: no train split
    args.data_val_split = cv_splits[0] if len(cv_splits) > 1 else None
    args.data_test_split = cv_splits[-1]
    run_inference(args)


if __name__ == "__main__":
    main()
