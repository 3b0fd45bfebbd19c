from pointcloudregistration_tpu.losses.contrastive import hardest_contrastive
from pointcloudregistration_tpu.losses.circle import circle_loss, weighted_bce

__all__ = ["hardest_contrastive", "circle_loss", "weighted_bce"]
