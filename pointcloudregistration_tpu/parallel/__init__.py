from pointcloudregistration_tpu.parallel import (distributed, mesh, pipeline,
                                                 ring)

__all__ = ["distributed", "mesh", "pipeline", "ring"]
