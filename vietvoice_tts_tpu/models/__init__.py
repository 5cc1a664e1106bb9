"""Model definitions: flow-matching DiT denoiser, Vocos-style vocoder,
ODE sampler, and reference-asset conversion.

These replace the reference's three opaque ONNX graphs
(``/root/reference/vietvoicetts/core/model.py:73-106``):

- ``preprocess.onnx`` → mel front-end (``ops/stft.py``) + text embedding +
  noise init (``dit.py`` / ``sampler.py``)
- ``transformer.onnx`` (one NFE step, looped in Python) → ``dit.py`` scanned
  inside one XLA program by ``sampler.flow_matching_sample``
- ``decode.onnx`` → ``vocoder.py`` (ConvNeXt + iSTFT head)
"""

from .dit import DiTConfig, dit_forward, init_dit_params  # noqa: F401
from .sampler import SamplerConfig, flow_matching_sample  # noqa: F401
from .vocoder import (  # noqa: F401
    VocoderConfig,
    init_vocoder_params,
    istft_overlap_add,
    vocoder_forward,
)
