"""Native (C++) runtime components.

The reference is C++ end to end; lara-tpu keeps the device compute path in
JAX/XLA and implements the serial host-side hot spots natively:

* ``blossom`` -- exact maximum-weight matching (the ``-m 0`` escape hatch,
  LEMON-equivalent; ``/root/reference/src/matching.hpp:201-238``).

Shared libraries are compiled on first use with the system toolchain and
cached next to the sources; consumers fall back to pure-Python paths when no
compiler is available (mirroring the reference's optional-LEMON gating,
``matching.hpp:48-54``).
"""

from __future__ import annotations

import os
import subprocess
import threading

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "lib")
_BUILD_LOCK = threading.Lock()


class NativeBuildError(RuntimeError):
    pass


def shared_library(name: str, extra_sources: tuple = ()) -> str:
    """Path to the compiled shared library for ``src/<name>.cpp`` (plus any
    ``extra_sources`` linked into the same object), building it if any source
    is newer or no build exists yet."""
    sources = [os.path.join(_SRC_DIR, f"{name}.cpp")] + [
        os.path.join(_SRC_DIR, f"{extra}.cpp") for extra in extra_sources
    ]
    target = os.path.join(_LIB_DIR, f"lib{name}.so")
    with _BUILD_LOCK:
        if os.path.exists(target) and all(
            os.path.getmtime(target) >= os.path.getmtime(src)
            for src in sources
        ):
            return target
        os.makedirs(_LIB_DIR, exist_ok=True)
        cmd = [
            "g++", "-std=c++17", "-O2", "-fPIC", "-shared",
            "-o", target, *sources,
        ]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        except (OSError, subprocess.TimeoutExpired) as exc:
            raise NativeBuildError(f"cannot build {name}: {exc}") from exc
        if proc.returncode != 0:
            raise NativeBuildError(
                f"g++ failed for {name}:\n{proc.stderr[-4000:]}"
            )
        return target
