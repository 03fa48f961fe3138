from tpu_asr.models.conformer import ConformerEncoder, ConvSubsampling, subsampled_length
from tpu_asr.models.decoder import ConvASRDecoder
from tpu_asr.models.ctc_model import CTCModel

__all__ = ["ConformerEncoder", "ConvSubsampling", "subsampled_length", "ConvASRDecoder", "CTCModel"]
from tpu_asr.models.distil_model import DistilCTCModel, DistilOutput
from tpu_asr.models.transcribe import ChunkedTranscriber, Transcriber
from tpu_asr.models.vocab import change_decoding_strategy, change_vocabulary
