from genpose2_tpu.ops.fps import furthest_point_sample, fps_ref, fps_pallas
from genpose2_tpu.ops.ball_query import ball_query
from genpose2_tpu.ops.grouping import gather_points, group_points
from genpose2_tpu.ops.interpolate import three_nn, three_interpolate

__all__ = [
    "furthest_point_sample",
    "fps_ref",
    "fps_pallas",
    "ball_query",
    "gather_points",
    "group_points",
    "three_nn",
    "three_interpolate",
]
