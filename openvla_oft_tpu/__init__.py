"""openvla_oft_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-language-action
framework with the capabilities of OpenVLA-OFT.

See SURVEY.md at the repo root for the reference structural analysis this
build targets, and README.md for the architecture overview.
"""

__version__ = "0.1.0"
