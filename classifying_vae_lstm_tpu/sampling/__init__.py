from .generate import generate_cl_vae, generate_cl_vrnn, infer_w_cl_vrnn

__all__ = ["generate_cl_vae", "generate_cl_vrnn", "infer_w_cl_vrnn"]
