"""Deterministic cross-process JIT executable cache.

JAX's built-in persistent compilation cache keys these large limb-kernel
modules nondeterministically across processes (observed: identical
lowered HLO text, different cache keys), so every fresh process pays
minutes of XLA CPU compile.  This cache keys on the SHA-256 of the
lowered StableHLO text + backend platform/version + jax version — all
process-stable — and stores executables serialized with
``jax.experimental.serialize_executable``.

Usage::

    step = cached_jit(fn)          # like jax.jit(fn)
    out  = step(*arrays)           # first call: lower -> load-or-compile

Only positional array arguments are supported (the protocol kernels are
shaped that way).  Set SPARTAN2_TPU_NO_CACHE=1 to disable.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

import jax

_CACHE_DIR = os.environ.get(
    "SPARTAN2_TPU_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "spartan2_tpu", "jax_cache"),
)
_DISABLED = bool(os.environ.get("SPARTAN2_TPU_NO_CACHE"))
_LOCK = threading.Lock()


def _backend_fingerprint() -> str:
    from jax._src import xla_bridge

    backend = xla_bridge.get_backend()
    return f"{backend.platform}-{backend.platform_version}-jax{jax.__version__}"


class _CachedFn:
    def __init__(self, fn, static_argnums=(), devices=None):
        self._jitted = jax.jit(fn, static_argnums=static_argnums)
        self._static = set(static_argnums)
        self._devices = devices  # execution devices for deserialization
        self._exes: dict = {}

    def _argkey(self, args):
        parts = []
        for i, a in enumerate(args):
            if i in self._static:
                parts.append(("s", a))
            elif hasattr(a, "shape"):
                parts.append((tuple(a.shape), str(getattr(a, "dtype", ""))))
            else:
                parts.append(("pyval", type(a).__name__))
        return tuple(parts)

    def __call__(self, *args):
        key = self._argkey(args)
        exe = self._exes.get(key)
        if exe is None:
            with _LOCK:
                exe = self._exes.get(key)
                if exe is None:
                    exe = self._load_or_compile(*args)
                    self._exes[key] = exe
        return exe(*args)

    def _load_or_compile(self, *args):
        lowered = self._jitted.lower(*args)
        if _DISABLED:
            return lowered.compile()
        key = hashlib.sha256(
            (lowered.as_text() + _backend_fingerprint()).encode()
        ).hexdigest()
        path = os.path.join(_CACHE_DIR, f"sp2-{key}.bin")
        if os.path.exists(path):
            try:
                from jax.experimental.serialize_executable import deserialize_and_load

                with open(path, "rb") as f:
                    serialized, in_tree, out_tree = pickle.load(f)
                # single-device programs pin to device 0 even when the
                # platform exposes a virtual mesh; sharded programs pass
                # their mesh devices via cached_jit(devices=...)
                devs = self._devices if self._devices is not None else jax.devices()[:1]
                return deserialize_and_load(
                    serialized, in_tree, out_tree, execution_devices=list(devs),
                )
            except Exception:
                pass  # stale/incompatible entry: fall through to recompile
        compiled = lowered.compile()
        try:
            from jax.experimental.serialize_executable import serialize

            os.makedirs(_CACHE_DIR, exist_ok=True)
            payload = pickle.dumps(serialize(compiled))
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
        except Exception:
            pass  # caching is best-effort
        return compiled


def cached_jit(fn, static_argnums=(), devices=None):
    """jax.jit with a deterministic on-disk executable cache.

    ``devices``: execution devices for deserialized sharded programs
    (default: single device 0).
    """
    return _CachedFn(fn, static_argnums, devices)
