from .generate import (
    draw_generation_noise,
    generate_cl_vae,
    generate_cl_vae_batch,
    generate_cl_vae_batch_noise,
    generate_cl_vrnn,
    generate_cl_vrnn_batch,
    generate_cl_vrnn_batch_dp,
    generate_cl_vrnn_batch_noise,
    infer_w_cl_vrnn,
    infer_w_cl_vrnn_noise,
)
from .samplers import sample_w, sample_w_discrete, sample_x, sample_z

__all__ = [
    "draw_generation_noise",
    "generate_cl_vae",
    "generate_cl_vae_batch",
    "generate_cl_vae_batch_noise",
    "generate_cl_vrnn",
    "generate_cl_vrnn_batch",
    "generate_cl_vrnn_batch_dp",
    "generate_cl_vrnn_batch_noise",
    "infer_w_cl_vrnn",
    "infer_w_cl_vrnn_noise",
    "sample_w",
    "sample_w_discrete",
    "sample_x",
    "sample_z",
]
