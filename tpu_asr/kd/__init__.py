from tpu_asr.kd.schedules import get_noise_schedule
from tpu_asr.kd.flow_matching import FlowMatchingModule
from tpu_asr.kd.router import DynamicStepRouter
from tpu_asr.kd.diffkd import DiffKDModule
from tpu_asr.kd.diffm import LatentKDPipeline
from tpu_asr.kd.losses import logit_kl_loss, layerwise_mse_loss
