"""tpu_asr — a TPU-native (JAX / XLA / Pallas / pjit) ASR + knowledge-distillation framework.

A ground-up rebuild of the capabilities of qwer55252/KD-via-FM-in-ASR (Conformer-CTC ASR with
flow-matching / diffusion / logit / layerwise knowledge distillation), designed for TPU:

- single jitted XLA program containing frozen teacher + student + all KD losses,
- static shapes via duration bucketing, `lax.scan` over conformer layers and ODE steps,
- data/tensor parallelism via `jax.sharding.Mesh` + NamedSharding over the ICI mesh,
- Pallas kernels for the fused mel frontend and relative-position attention.

See SURVEY.md for the structural map of the reference this rebuilds.
"""

__version__ = "0.1.0"
