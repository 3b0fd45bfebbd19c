from pointcloudregistration_tpu.data import (augment, benchmarks, loaders,
                                             mri, synthetic)

__all__ = ["augment", "benchmarks", "loaders", "mri", "synthetic"]
