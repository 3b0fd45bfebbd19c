from pointcloudregistration_tpu.metrics.registration import (
    isotropic_R_error,
    isotropic_t_error,
    anisotropic_R_error,
    anisotropic_t_error,
    inlier_ratio,
    feature_match_recall,
    registration_recall,
    overlap_precision_recall,
)

__all__ = [
    "isotropic_R_error", "isotropic_t_error",
    "anisotropic_R_error", "anisotropic_t_error",
    "inlier_ratio", "feature_match_recall", "registration_recall",
    "overlap_precision_recall",
]
