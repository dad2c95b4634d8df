from eva_tpu.metric import valuation_mse

__all__ = ["valuation_mse"]
