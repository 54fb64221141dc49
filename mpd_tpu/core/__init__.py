from mpd_tpu.core.runtime import setup_runtime
