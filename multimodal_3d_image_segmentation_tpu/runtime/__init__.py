from .optim import build_optimizer, build_schedule  # noqa: F401
from .steps import (TrainState, create_train_state, make_eval_step,  # noqa: F401
                    make_predict_step, make_train_step)
