from g2o_tpu.io import g2o_format

__all__ = ["g2o_format"]
