"""Machine-keyed persistent compile-cache directories.

XLA's CPU AOT cache embeds the compile machine's CPU features and logs a
multi-KB ERROR wall per program load on mismatch (cpu_aot_loader.cc),
which this image's site hooks make unsuppressable in-process
(TF_CPP_MIN_LOG_LEVEL is captured by jaxlib before user code runs).

Round-5 diagnosis (experiment: same host, fresh dir, two runs): part of
the wall is INTRINSIC and harmless — XLA's compile-feature list includes
LLVM TUNING flags (+prefer-no-scatter/-gather: codegen preferences, not
CPUID features) that load-time host detection never reports, so a host
warns about its own entries written seconds earlier, yet still LOADS and
runs them (a prefer-NO-x tuning cannot SIGILL; the warm speedup is real).
That spurious wall is handled by stderr line-filtering in the dryrun
(__graft_entry__._dryrun_in_child), not here.

This module handles the GENUINE hazard: entries from a machine whose real
ISA differs (a migrated VM with different CPUID feature bits) also load —
"could lead to SIGILL" is literal. Keying the directory by the host's
CPU-flag set + cpuid-derived march gives every true machine type its own
always-compatible cache.
"""

from __future__ import annotations

import hashlib


def machine_cache_dir(base: str, cpuinfo: str = "/proc/cpuinfo") -> str:
    """`base` suffixed with a stable hash of this host's CPU model + feature
    flags (falls back to `base` when /proc/cpuinfo is unavailable).

    XLA's AOT entries embed tuning features beyond the ISA flag set
    (+prefer-no-scatter/-gather are chosen per detected MICROARCH via
    cpuid), so two VMs with an identical templated cpuinfo can still
    reject each other's entries — observed on this image's migrating
    firecracker hosts. LLVM's host detector keys those choices on the raw
    cpuid (family, model), which firecracker passes through even though it
    templates the model-name string — and which gcc's -march=native
    resolution is too coarse to distinguish (observed: Emerald Rapids
    family 6 model 207 and an earlier host both resolve to 'cooperlake'
    while LLVM gives them different prefer-no-scatter/gather tunings). So
    the key folds in vendor/family/model/stepping alongside the flag set
    and the march name (each source degrades gracefully when missing)."""
    wanted = ("vendor_id", "cpu family", "model", "model name", "stepping",
              "flags")
    seen = {}
    try:
        with open(cpuinfo) as fp:
            for line in fp:
                key = line.split(":", 1)[0].strip()
                if key in wanted and key not in seen:
                    seen[key] = line
                    if len(seen) == len(wanted):
                        break
    except OSError:
        pass
    parts = list(seen.values())
    parts.append(_native_march())
    blob = "".join(sorted(parts))
    if blob:
        return f"{base}_{hashlib.md5(blob.encode()).hexdigest()[:10]}"
    return base


def _native_march() -> str:
    """The microarch gcc/clang resolve -march=native to (cpuid-derived),
    '' when no compiler is available."""
    import shutil
    import subprocess
    for cc in ("g++", "gcc", "clang"):
        if shutil.which(cc) is None:
            continue
        try:
            out = subprocess.run(
                [cc, "-march=native", "-Q", "--help=target"],
                capture_output=True, text=True, timeout=10).stdout
            for line in out.splitlines():
                if "-march=" in line:
                    return line.split("=", 1)[1].strip()
        except (OSError, subprocess.SubprocessError):
            continue
    return ""


def enable_persistent_cache(jax, base: str) -> str:
    """Point jax's persistent compilation cache at the machine-keyed dir."""
    path = machine_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
