from tpu_asr.train.optim import build_optimizer, noam_annealing_schedule
from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step
