from pointcloudregistration_tpu.pipelines import c2p

__all__ = ["c2p"]
