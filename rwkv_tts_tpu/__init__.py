"""rwkv_tts_tpu — TPU-native RWKV-7 text-to-speech serving framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of the
liuzl/rwkv-tts-rs reference server: RWKV-7 autoregressive semantic/global
token generation, BiCodec audio detokenization, zero-shot voice cloning,
property-controlled synthesis, a persisted voice library, continuous request
batching and a REST + Web UI front end — designed TPU-first (device-resident
decode loop, on-device sampling, batched recurrent state, mesh sharding).
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
