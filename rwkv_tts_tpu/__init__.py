"""rwkv_tts_tpu — TPU-native RWKV-7 text-to-speech serving framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of the
liuzl/rwkv-tts-rs reference server: RWKV-7 autoregressive semantic/global
token generation, BiCodec audio detokenization, zero-shot voice cloning,
property-controlled synthesis, a persisted voice library, continuous request
batching and a REST + Web UI front end — designed TPU-first (device-resident
decode loop, on-device sampling, batched recurrent state, mesh sharding).
"""

__version__ = "0.1.0"

import os as _os

# Platform override BEFORE anything touches the JAX backend (several
# modules keep device constants, so the backend initializes at package
# import). The plain JAX_PLATFORMS env var is not enough on hosts whose
# sitecustomize re-pins it (this repo's TPU-tunnel environment does);
# jax.config wins over the env var, so RWKV_TTS_PLATFORM=cpu reliably
# gets a CPU run for ANY entry point (server, CLI, scripts).
if _os.environ.get("RWKV_TTS_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RWKV_TTS_PLATFORM"])

from . import constants  # noqa: F401
