from mapdit_tpu.utils.class_names import class_name
from mapdit_tpu.utils.experiment import (
    config_from_args,
    load_config,
    save_config,
    setup_experiment,
)
from mapdit_tpu.utils.logging import create_logger
