from tpu_asr.convert.nemo_import import (convert_state_dict, extract_nemo,
                                         load_nemo_checkpoint,
                                         nemo_config_to_model_config)
