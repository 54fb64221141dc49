from mpd_tpu.kernels.fused_unet import (
    fused_residual_temporal_block,
    pallas_unet_apply,
    pallas_available,
)
from mpd_tpu.kernels.panda_guide import make_panda_collision_grad
from mpd_tpu.kernels.pointmass_guide import make_pointmass_collision_grad
