from mpd_tpu.viz.planning_visualizer import (
    PlanningVisualizer,
    confidence_ellipse,
    export_legend,
    mean_confidence_interval,
)
