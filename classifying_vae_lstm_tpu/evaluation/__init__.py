from .nll import iw_nll_cl_vae, iw_nll_cl_vrnn

__all__ = ["iw_nll_cl_vae", "iw_nll_cl_vrnn"]
