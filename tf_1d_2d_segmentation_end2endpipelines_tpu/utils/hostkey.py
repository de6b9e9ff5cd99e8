"""Host-CPU fingerprint for persistent-compile-cache keying.

XLA:CPU AOT executables replayed on a machine with different ISA features
can SIGILL; cache directories are therefore keyed by model name AND the
full flags line (generic cloud VMs share model strings, so flags are the
discriminating part).  Shared by __graft_entry__ and tests/conftest.py.
No heavy imports — safe to import before jax backend selection.
"""
import hashlib
import platform


def machine_key() -> str:
    feat = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    feat.append(line.strip())
                if len(feat) == 2:
                    break
    except OSError:
        pass
    return hashlib.md5((platform.machine() + "|".join(feat)).encode()
                       ).hexdigest()[:8]
