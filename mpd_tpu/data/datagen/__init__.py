from mpd_tpu.data.datagen.rrt_connect import RRTConnect, resample_path
from mpd_tpu.data.datagen.gpmp2 import GPMP2, gpmp2_optimize
from mpd_tpu.data.datagen.generate import generate_context
