import os

# Tests run on a virtual 8-device CPU mesh (the JAX equivalent of a
# fake NCCL cluster) so sharding paths are exercised without TPUs.
# The surrounding environment pins JAX_PLATFORMS=axon (a tunnelled TPU)
# and pytest plugins may import jax before this conftest runs, so set
# both the env var AND the live jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.default_backend() == "cpu", jax.default_backend()


def pytest_configure(config):
    # Test tiering: the sub-minute kernel/geometry/pipeline gate runs
    # with `-m "not slow"`; full-graph compiles (minutes each on CPU)
    # are opt-in via `-m slow` or a plain unfiltered run.
    config.addinivalue_line(
        "markers", "slow: multi-minute full-graph compile tests")
