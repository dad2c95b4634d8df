from eva_tpu.std.numeric import horizontal_sum

__all__ = ["horizontal_sum"]
