from pointcloudregistration_tpu.core import se3, geometry, procrustes, eig3

__all__ = ["se3", "geometry", "procrustes", "eig3"]
