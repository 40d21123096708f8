from g2o_tpu.ops import lie, robust

__all__ = ["lie", "robust"]
