from .fused import eu_residual_obj, kl_ratio, kl_ratio_and_obj

__all__ = ["eu_residual_obj", "kl_ratio", "kl_ratio_and_obj"]
