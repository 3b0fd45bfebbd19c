from pointcloudregistration_tpu.data import synthetic, augment

__all__ = ["synthetic", "augment"]
