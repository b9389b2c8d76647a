from stroke_prediction_tpu.train.optim import (  # noqa: F401
    make_optimizer, multistep_lr, beta1_ramp)
from stroke_prediction_tpu.train.learner import Learner, TrainState  # noqa: F401
