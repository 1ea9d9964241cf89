from arsvt_tpu.train.config import TrainConfig
from arsvt_tpu.train.optim import make_optimizer
from arsvt_tpu.train.train_step import make_classifier_step_fns, TrainState
from arsvt_tpu.train.trainer import Trainer
