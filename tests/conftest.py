import os

# Tests run on a virtual 8-device CPU mesh so sharding/collective paths are
# exercised without TPU hardware (SURVEY.md §4). The env var alone is not
# enough here (a preinstalled TPU plugin overrides it), so also force the
# platform through jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: XLA CPU compiles of the full train/eval programs
# dominate suite time; repeat runs on the same machine reuse them. The dir
# is machine-keyed — the CPU AOT cache rejects entries from a different
# machine type with an ERROR wall per program (hupr_tpu/utils/cache.py)
from hupr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax, "/tmp/jax_test_cache")
