from pointcloudregistration_tpu.models import ndp

__all__ = ["ndp"]
