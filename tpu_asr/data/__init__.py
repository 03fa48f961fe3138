from tpu_asr.data.manifest import (ManifestEntry, read_manifest, write_manifest,
                                   build_manifest_from_hf)
from tpu_asr.data.normalizers import (clean_tedlium_text, clean_text_commonvoice,
                                      normalize_text_cv, normalize_text_gigaspeech)
from tpu_asr.data.tokenizer import SentencePieceBPETokenizer
from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
