"""Machine-keyed persistent compile-cache directories.

XLA's CPU AOT cache embeds the compile machine's CPU features and REJECTS
entries on mismatch — loudly: one multi-KB ERROR wall per program load
(cpu_aot_loader.cc), which this image's site hooks make unsuppressable
(TF_CPP_MIN_LOG_LEVEL is captured by jaxlib before user code runs). Sharing
one cache dir across heterogeneous VMs (the build VM vs the driver VM)
therefore yields zero reuse AND drowns logs. Keying the directory by the
host's CPU-flag set gives every machine type its own always-compatible
cache: warm runs actually hit, and the mismatch wall never triggers.
"""

from __future__ import annotations

import hashlib


def machine_cache_dir(base: str) -> str:
    """`base` suffixed with a stable hash of this host's CPU feature flags
    (falls back to `base` when /proc/cpuinfo is unavailable)."""
    try:
        with open("/proc/cpuinfo") as fp:
            for line in fp:
                if line.startswith("flags"):
                    key = hashlib.md5(line.encode()).hexdigest()[:10]
                    return f"{base}_{key}"
    except OSError:
        pass
    return base


def enable_persistent_cache(jax, base: str) -> str:
    """Point jax's persistent compilation cache at the machine-keyed dir."""
    path = machine_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
