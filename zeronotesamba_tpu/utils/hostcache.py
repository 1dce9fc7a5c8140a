"""Host-keyed persistent-compile-cache paths.

XLA:CPU persistent cache entries embed AOT-compiled code targeted at the
writing host's CPU features. Loading them on a host with different features
is REJECTED at AOT-reuse time ("Target machine feature +... is not supported
on the host machine"), which silently falls back to a full 1-core recompile
of every GSPMD program — the round-3 multichip dryrun regressed 200 s -> 546 s
exactly this way (VERDICT r3 weak #6/next #7). Keying the CPU cache directory
by a hash of the host's CPU feature flags makes each host read only caches it
wrote, so a feature mismatch can never poison a run. TPU caches are immune
(compiled for the chip, not the host) and keep the unkeyed path.

No jax import here: tests/conftest.py must call this before jax loads.
"""

from __future__ import annotations

import hashlib
import platform


def host_cpu_fingerprint() -> str:
    """Short stable hash of the CPU feature set XLA:CPU targets."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):  # x86 / arm layouts
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:10]


def cpu_cache_dir(base: str = "/tmp/zns_jax_cache") -> str:
    """Cache directory for CPU-platform runs, keyed by host CPU features."""
    return f"{base}_cpu_{host_cpu_fingerprint()}"


# Above AVX2, XLA:CPU compiles with synthetic LLVM tuning features
# (+prefer-no-scatter/+prefer-no-gather) that host feature DETECTION never
# reports, so cpu_aot_loader rejects even SAME-host cache entries ("Target
# machine feature +prefer-no-scatter is not supported on the host machine")
# and every program recompiles. Measured on this host: 2nd process sees 6
# rejections at default/AVX512, zero at AVX2. CPU-mesh runs are
# compile-bound, not execute-bound, so capping test/dryrun codegen at AVX2
# in exchange for a working persistent cache is a clear win. TPU codegen is
# unaffected (flag is CPU-only).
AOT_SAFE_CPU_FLAG = "--xla_cpu_max_isa=AVX2"


def with_aot_safe_flag(xla_flags: str) -> str:
    """Append AOT_SAFE_CPU_FLAG to an XLA_FLAGS string (idempotent)."""
    if "xla_cpu_max_isa" in xla_flags:
        return xla_flags
    return (xla_flags + " " + AOT_SAFE_CPU_FLAG).strip()
