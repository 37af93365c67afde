from mapdit_tpu.training.state import (
    EMA_STDS,
    TrainState,
    create_optimizer,
    create_train_state,
    ema_key,
    make_train_step,
)
from mapdit_tpu.training.lr import default_schedule_steps, warmup_flat_invsqrt
