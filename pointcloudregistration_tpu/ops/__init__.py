from pointcloudregistration_tpu.ops import (
    knn,
    fps,
    ball_query,
    subsample,
    nnd_pallas,
    icp,
    ransac,
    fpfh,
    cpd,
)

__all__ = ["knn", "fps", "ball_query", "subsample", "nnd_pallas",
           "icp", "ransac", "fpfh", "cpd"]
