"""aps_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the APS speech toolkit.

Capability parity target: funcwj/aps (reference mounted at /root/reference).
Waveform in, unit/waveform out — feature extraction is differentiable and
lives inside the model; training/decoding compile to single XLA programs
sharded over a jax device mesh.
"""

__version__ = "0.1.0"
