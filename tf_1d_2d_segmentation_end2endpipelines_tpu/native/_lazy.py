"""Shared lazy g++ build-and-load for the native host libraries.

One implementation for patcher/imgio (they previously duplicated it):
compiles to a process-unique temp file and ``os.replace``s it into place,
so concurrent processes racing to build the same .so each link a private
file and the winner lands atomically — a loader can never ``CDLL`` a
half-linked library.  Every caller keeps a pure-Python fallback, so any
failure here just means "no native fast path".
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import typing as tp


def versioned_so(src: str, stem: str) -> str:
    """Source-hashed .so path next to ``src``: a changed .cpp gets a new
    filename, so a stale library from an older checkout can never be
    dlopened with missing/renamed symbols (the .so files are gitignored
    and survive pulls).  A missing/unreadable source (e.g. a wheel that
    excluded the .cpp) yields a never-built placeholder path — the
    caller's build fails and the pure-Python fallback takes over, per
    the module contract."""
    try:
        with open(src, "rb") as f:
            h = hashlib.sha256(f.read()).hexdigest()[:12]
    except OSError:
        h = "nosrc"
    return os.path.join(os.path.dirname(src), f"{stem}-{h}.so")


def build(src: str, so: str, extra_flags: tp.Sequence[str] = ()) -> bool:
    """Compile ``src`` -> ``so`` (atomic via temp + rename); stale
    hash-siblings of the same stem are garbage-collected on success."""
    tmp = f"{so}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
           "-o", tmp, *extra_flags]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
    except Exception:
        try:
            if os.path.exists(tmp):
                os.remove(tmp)
        except OSError:
            pass
        return False
    # drop older-hash builds of this stem (edits would strand them)
    import glob
    stem = os.path.basename(so).rsplit("-", 1)[0]
    for old in glob.glob(os.path.join(os.path.dirname(so),
                                      f"{stem}-*.so")):
        if old != so:
            try:
                os.remove(old)
            except OSError:
                pass
    return True


def load(src: str, so: str, extra_flags: tp.Sequence[str] = ()
         ) -> tp.Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen; None on any failure."""
    if not os.path.exists(so) and not build(src, so, extra_flags):
        return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None
