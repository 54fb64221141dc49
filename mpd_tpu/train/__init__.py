from mpd_tpu.train.trainer import TrainConfig, TrainState, Trainer, train
from mpd_tpu.train.checkpoints import save_checkpoint, load_checkpoint, latest_step
