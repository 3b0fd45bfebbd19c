from pointcloudregistration_tpu.utils import config, logging, timers

__all__ = ["config", "logging", "timers"]
