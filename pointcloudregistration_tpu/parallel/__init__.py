from pointcloudregistration_tpu.parallel import mesh, ring

__all__ = ["mesh", "ring"]
