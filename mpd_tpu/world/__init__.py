from mpd_tpu.world.primitives import ObjectSet, sdf_spheres, sdf_boxes
from mpd_tpu.world.envs import (
    ENVS,
    get_env,
    EnvSimple2D,
    EnvDense2D,
    EnvNarrowPassageDense2D,
    EnvSpheres3D,
)
from mpd_tpu.world.robots import ROBOTS, get_robot, RobotPointMass, RobotPanda
from mpd_tpu.world.task import PlanningTask
