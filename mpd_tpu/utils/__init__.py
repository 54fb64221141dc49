from mpd_tpu.utils.timer import TimerDevice, profile_trace
from mpd_tpu.utils.seed import fix_random_seed
from mpd_tpu.utils.metrics import save_metrics
