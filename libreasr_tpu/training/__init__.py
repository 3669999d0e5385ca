from .learner import TrainState, make_train_step, Learner  # noqa: F401
from .optimizers import build_optimizer  # noqa: F401
