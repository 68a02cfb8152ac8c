"""sdvar_tpu: a TPU-native framework for VAR next-scale image generation with
speculative decoding, built on JAX/XLA/Pallas/pjit.

Capability parity target: lijrjyan/SDVAR (see SURVEY.md). Public surface:

  - config:  VQVAEConfig, VARConfig, SamplingConfig, SpeculativeConfig
  - models:  build_vae_var / build_vae_var_speculative_decoding factories
  - engine:  decode (baseline CFG KV-cached sampling), speculative (SDVAR)
  - train:   trainer, schedules, data pipeline
  - parallel: mesh + sharding rules
"""

from sdvar_tpu.config import (  # noqa: F401
    MeshConfig,
    SamplingConfig,
    SpeculativeConfig,
    TrainConfig,
    VARConfig,
    VQVAEConfig,
    var_config_pair,
)

__version__ = "0.1.0"
