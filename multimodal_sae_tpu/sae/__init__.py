from .model import (
    EncoderOutput,
    ForwardOutput,
    Sae,
    decode,
    encode,
    forward,
    init_params,
    pre_acts,
    remove_gradient_parallel_to_decoder_directions,
    select_topk,
    set_decoder_norm_to_unit_norm,
)

__all__ = [
    "Sae",
    "EncoderOutput",
    "ForwardOutput",
    "init_params",
    "pre_acts",
    "encode",
    "select_topk",
    "decode",
    "forward",
    "set_decoder_norm_to_unit_norm",
    "remove_gradient_parallel_to_decoder_directions",
]
