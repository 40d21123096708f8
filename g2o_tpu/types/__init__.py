"""Type libraries.  Importing a module registers its tags into the global
registry (the analogue of loading a ``libg2o_types_*`` plugin)."""

from g2o_tpu.types import (
    slam2d, slam3d, sba, sim3, bal, icp, sclam2d, slam2d_addons,
    slam3d_addons,
)

__all__ = [
    "slam2d", "slam3d", "sba", "sim3", "bal", "icp", "sclam2d",
    "slam2d_addons", "slam3d_addons",
]
