from mpd_tpu.train.trainer import TrainConfig, TrainState, Trainer, train
from mpd_tpu.train.checkpoints import save_checkpoint, load_checkpoint, latest_step
from mpd_tpu.train.summary import RolloutSummary, rollout_summary
from mpd_tpu.train.logging import ExperimentLogger
