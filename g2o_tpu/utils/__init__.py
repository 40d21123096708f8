from g2o_tpu.utils.properties import Property, PropertyMap
from g2o_tpu.utils import tictoc

__all__ = ["Property", "PropertyMap", "tictoc"]
