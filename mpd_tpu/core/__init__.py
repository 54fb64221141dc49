from mpd_tpu.core.runtime import setup_runtime
from mpd_tpu.core.experiment import (
    single_experiment_yaml,
    run_experiment,
    Launcher,
    is_local,
)
