"""Test bootstrap: force an 8-device CPU JAX before any backend init.

The image's sitecustomize registers the axon TPU plugin at interpreter
start and points JAX at it; initializing that backend costs up to minutes
of tunnel handshake per process.  Tests run on a virtual 8-device CPU mesh
instead (SURVEY.md test strategy: sharding correctness is validated on
host devices; the real chip is only used by bench.py).  Set
TIFLASH_TPU_TESTS_ON_TPU=1 to run against the real chip.
"""

import os

import jax
from jax._src import xla_bridge as _xb

if os.environ.get("TIFLASH_TPU_TESTS_ON_TPU") != "1":
    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", True)
