from mpd_tpu.planner.inference import MotionPlanner, PlannerConfig, PlanningResult
