from pointcloudregistration_tpu.ops import (
    knn,
    fps,
    ball_query,
    subsample,
    nnd_pallas,
)

__all__ = ["knn", "fps", "ball_query", "subsample", "nnd_pallas"]
