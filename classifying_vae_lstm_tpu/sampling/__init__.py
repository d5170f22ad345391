from .generate import generate_cl_vae, generate_cl_vrnn, infer_w_cl_vrnn
from .samplers import sample_w, sample_w_discrete, sample_x, sample_z

__all__ = [
    "generate_cl_vae",
    "generate_cl_vrnn",
    "infer_w_cl_vrnn",
    "sample_w",
    "sample_w_discrete",
    "sample_x",
    "sample_z",
]
