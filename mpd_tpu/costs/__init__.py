from mpd_tpu.costs.cost_functions import (
    CostCollision,
    CostGPTrajectory,
    CostComposite,
    gp_const_vel_trajectory,
)
from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity, GuideTrajectoriesPositionOnly
