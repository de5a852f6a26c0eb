from ssds_tpu.utils.timer import Timer

__all__ = ["Timer"]
