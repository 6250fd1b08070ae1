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
import sys
import threading
import time

import jax

# Default cache location is INSIDE the repo tree (gitignored): the repo
# persists across host resets while ~/.cache has been observed wiped,
# which forces an hours-long cold recompile of every kernel shape.  The
# legacy home-dir location is still read as a fallback.
_CACHE_DIR = os.environ.get(
    "SPARTAN2_TPU_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jitcache"),
)
_LEGACY_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "spartan2_tpu", "jax_cache")
_DISABLED = bool(os.environ.get("SPARTAN2_TPU_NO_CACHE"))
_LOCK = threading.Lock()
_LOG = bool(os.environ.get("SPARTAN2_TPU_TRACE") or os.environ.get("SPARTAN2_JIT_LOG"))
# Executables on this backend are ~200x the lowered-HLO text size
# (measured: 1.1 MB HLO -> 155 MB executable); past ~8 MB of HLO the
# serialize alone runs minutes-to-hours, so don't persist those.
_MAX_CACHE_HLO = int(os.environ.get("SPARTAN2_TPU_CACHE_MAX_HLO_MB", "8")) * 1_000_000
# Total on-disk cap: kernel-shape churn across rounds left 7+ GB of
# stale executables by round 2.  LRU by mtime — loads touch their entry,
# so the active working set survives and dead shapes age out.  The live
# set (bench + tests + mesh) is ~15 GB of executables on a 250 GB disk;
# 40 GB keeps churn from evicting live entries between runs.
_MAX_CACHE_GB = float(os.environ.get("SPARTAN2_TPU_CACHE_MAX_GB", "40"))


def _evict_lru() -> None:
    try:
        entries = []
        with os.scandir(_CACHE_DIR) as it:
            for e in it:
                if e.name.startswith("sp2-") and e.name.endswith(".bin"):
                    st = e.stat()
                    entries.append((st.st_mtime, st.st_size, e.path))
        total = sum(sz for _, sz, _ in entries)
        cap = _MAX_CACHE_GB * 1e9
        if total <= cap:
            return
        for mtime, sz, path in sorted(entries):
            try:
                os.remove(path)
                total -= sz
                _log(f"evicted {os.path.basename(path)} ({sz / 1e6:.0f} MB)")
            except OSError:
                pass
            if total <= cap:
                break
    except OSError:
        pass


def _log(msg: str) -> None:
    if _LOG:
        print(f"[jitcache] {msg}", file=sys.stderr, flush=True)


def _host_cpu_features() -> str:
    """Stable digest of the host CPU feature flags (from /proc/cpuinfo).

    XLA:CPU AOT executables embed target-machine features; loading one
    compiled on a different host risks SIGILL (observed after host
    resets: 'Machine type used for XLA:CPU compilation doesn't match').
    Keying CPU-backend cache entries on the feature set makes post-reset
    hosts recompile instead of loading mismatched binaries.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = sorted(line.split(":", 1)[1].split())
                    return hashlib.sha256(" ".join(flags).encode()).hexdigest()[:16]
    except OSError:
        pass
    return "nofeat"


_PKG_HASH = None


def _pkg_hash() -> str:
    """Content hash of the whole spartan2_tpu source tree.  The fast-path
    index below must be invalidated by ANY library change (a kernel's
    lowered HLO can depend on code anywhere in the package), so the key
    is deliberately coarse: one byte changed anywhere -> full re-lower."""
    global _PKG_HASH
    if _PKG_HASH is None:
        h = hashlib.sha256()
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith((".py", ".c")):
                    p = os.path.join(dirpath, fn)
                    h.update(os.path.relpath(p, root).encode())
                    try:
                        with open(p, "rb") as f:
                            h.update(f.read())
                    except OSError:
                        pass
        _PKG_HASH = h.hexdigest()[:16]
    return _PKG_HASH


def _index_path() -> str:
    return os.path.join(_CACHE_DIR, "fastindex.json")


def _index_get(fk: str):
    try:
        import json

        with open(_index_path()) as f:
            return json.load(f).get(fk)
    except (OSError, ValueError):
        return None


def _index_put(fk: str, fname: str) -> None:
    try:
        import json

        os.makedirs(_CACHE_DIR, exist_ok=True)
        try:
            with open(_index_path()) as f:
                idx = json.load(f)
        except (OSError, ValueError):
            idx = {}
        idx[fk] = fname
        tmp = _index_path() + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(idx, f)
        os.replace(tmp, _index_path())
    except OSError:
        pass


def _backend_fingerprint() -> str:
    from jax._src import xla_bridge

    backend = xla_bridge.get_backend()
    fp = f"{backend.platform}-{backend.platform_version}-jax{jax.__version__}"
    if backend.platform == "cpu":
        # TPU executables run on the remote axon service — host CPU
        # features are irrelevant there and must not invalidate that
        # cache; only CPU AOT binaries are host-feature-sensitive.
        fp += f"-cpufeat{_host_cpu_features()}"
    return fp


class _CachedFn:
    def __init__(self, fn, static_argnums=(), devices=None, fastkey=None):
        self._jitted = jax.jit(fn, static_argnums=static_argnums)
        self._static = set(static_argnums)
        self._devices = devices  # execution devices for deserialization
        self._exes: dict = {}
        # fast-path identity: the caller-supplied stable key must capture
        # EVERYTHING the closure bakes into the kernel beyond the arg
        # shapes (static slices, field choice, round specs, ...); with it,
        # a warm process skips the ~5-15s re-LOWERING (the HLO-text cache
        # key requires tracing first) and deserializes directly.
        self._fastkey = None
        if fastkey is not None:
            self._fastkey = (f"{fn.__module__}.{getattr(fn, '__qualname__', 'fn')}",
                             fastkey)

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

    def _deserialize(self, path: str, name: str):
        from jax.experimental.serialize_executable import deserialize_and_load

        t0 = time.time()
        with open(path, "rb") as f:
            serialized, in_tree, out_tree = pickle.load(f)
        # single-device programs pin to device 0 even when the platform
        # exposes a virtual mesh; sharded programs pass their mesh
        # devices via cached_jit(devices=...)
        devs = self._devices if self._devices is not None else jax.devices()[:1]
        exe = deserialize_and_load(
            serialized, in_tree, out_tree, execution_devices=list(devs))
        _log(f"{name}: loaded {os.path.getsize(path) / 1e6:.0f} MB "
             f"cached exe in {time.time() - t0:.1f}s")
        try:
            os.utime(path)  # LRU touch: keep the working set warm
        except OSError:
            pass
        return exe

    def _load_or_compile(self, *args):
        name = getattr(self._jitted, "__wrapped__", None)
        name = getattr(name, "__name__", "fn")
        fk = None
        if self._fastkey is not None and not _DISABLED:
            fk = hashlib.sha256(repr(
                (self._fastkey, self._argkey(args), _backend_fingerprint(),
                 _pkg_hash())).encode()).hexdigest()
            fname = _index_get(fk)
            if fname:
                fpath = os.path.join(_CACHE_DIR, fname)
                if os.path.exists(fpath):
                    try:
                        return self._deserialize(fpath, name + " (fast)")
                    except Exception:
                        pass  # stale: fall through to the lowering path
        t0 = time.time()
        lowered = self._jitted.lower(*args)
        hlo = lowered.as_text()
        _log(f"{name}: lowered {len(hlo) / 1e6:.1f} MB HLO in {time.time() - t0:.1f}s")
        if _DISABLED:
            return lowered.compile()
        key = hashlib.sha256((hlo + _backend_fingerprint()).encode()).hexdigest()
        path = os.path.join(_CACHE_DIR, f"sp2-{key}.bin")
        if not os.path.exists(path):
            legacy = os.path.join(_LEGACY_CACHE_DIR, f"sp2-{key}.bin")
            if os.path.exists(legacy):
                path = legacy
        if os.path.exists(path):
            try:
                exe = self._deserialize(path, name)
                if fk is not None:
                    _index_put(fk, os.path.basename(path))
                return exe
            except Exception:
                pass  # stale/incompatible entry: fall through to recompile
        t0 = time.time()
        compiled = lowered.compile()
        t1 = time.time()
        _log(f"{name}: compiled in {t1 - t0:.1f}s")
        if len(hlo) > _MAX_CACHE_HLO:
            # executable.serialize() on the tunneled backend has been
            # observed taking 30+ min on multi-GB executables; very
            # large HLO is the only pre-serialize size signal we have
            _log(f"{name}: skipping cache write ({len(hlo) / 1e6:.0f} MB "
                 f"HLO > {_MAX_CACHE_HLO / 1e6:.0f} MB cap)")
            return compiled
        try:
            from jax.experimental.serialize_executable import serialize

            os.makedirs(_CACHE_DIR, exist_ok=True)

            # executable.serialize() pulls the full executable (often
            # hundreds of MB) back over the tunneled backend at ~1 MB/s;
            # doing it inline serializes cold-start compiles.  Write the
            # cache entry on a background (non-daemon) thread instead so
            # the pull overlaps the NEXT kernel's remote compile; the
            # atomic tmp+rename keeps readers safe, and non-daemon means
            # the interpreter waits for in-flight writes at exit.
            def _write(compiled=compiled, path=path, name=name, t1=t1, fk=fk):
                try:
                    payload = pickle.dumps(serialize(compiled))
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(payload)
                    os.replace(tmp, path)
                    _log(f"{name}: serialized {len(payload) / 1e6:.0f} MB "
                         f"in {time.time() - t1:.1f}s (background)")
                    if fk is not None:
                        _index_put(fk, os.path.basename(path))
                    _evict_lru()
                except Exception:
                    pass  # caching is best-effort

            threading.Thread(target=_write, name=f"jitcache-{name}",
                             daemon=False).start()
        except Exception:
            pass  # caching is best-effort
        return compiled


def cached_jit(fn, static_argnums=(), devices=None, fastkey=None):
    """jax.jit with a deterministic on-disk executable cache.

    ``devices``: execution devices for deserialized sharded programs
    (default: single device 0).

    ``fastkey``: optional stable, hashable value capturing every closure
    constant the kernel bakes in beyond its argument shapes (static
    slices, field/curve choice, per-round specs...).  With it, warm
    processes skip the ~5-15 s re-lowering (the HLO cache key otherwise
    requires tracing) and deserialize the executable directly; the index
    is invalidated by any change to the package source (_pkg_hash).
    WITHOUT it the kernel is still cached, just behind a lowering.
    """
    return _CachedFn(fn, static_argnums, devices, fastkey)
