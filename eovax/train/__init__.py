from eovax.train.schedule import cosine_warmup_schedule  # noqa: F401
from eovax.train.stage2 import Stage2Trainer, TrainState, make_train_step  # noqa: F401
