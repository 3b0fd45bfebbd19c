from pointcloudregistration_tpu.train import checkpoint

__all__ = ["checkpoint"]
