from tpu_asr.ops.features import FilterbankFeatures, mel_filterbank, stft_seq_len
from tpu_asr.ops.specaug import spec_augment
from tpu_asr.ops.ctc import ctc_loss, ctc_greedy_decode

__all__ = [
    "FilterbankFeatures",
    "mel_filterbank",
    "stft_seq_len",
    "spec_augment",
    "ctc_loss",
    "ctc_greedy_decode",
]
