import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Force-override: the environment may pin
# JAX_PLATFORMS to a TPU platform (e.g. an axon tunnel) which would route
# every tiny test computation through real hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# A site customization may have pinned jax_platforms to a TPU platform via
# jax.config.update (which overrides the env var) — pin it back to CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def small_graph():
    """A small deterministic graph shared across tests (via networkx oracle)."""
    import networkx as nx

    g = nx.barabasi_albert_graph(60, 3, seed=7)
    return g
