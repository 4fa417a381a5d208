"""Serialized-executable store: near-zero restart warmup.

Restart warmup is dominated by the AOT pass re-TRACING and re-LOWERING
every program in the grid just to hit the persistent XLA compilation
cache (measured on-chip phases, BENCH r3: ``aot_parallel`` 24.8 s of a
30.7 s bf16 restart; 174 s for a cold int8-decoder grid) — the
persistent cache only skips the XLA *compile* step, not the jaxpr trace
or StableHLO lowering, and for a ~1.7 B-param model those dominate. The
reference server boots in model-load time (backend/asr.py:120-146), so
warmup is a cost the TPU build has to kill, not a parity feature.

This store pickles each compiled executable
(``jax.experimental.serialize_executable``) under a *context
fingerprint* directory, one file per program key. A restart
deserializes the executable binary straight onto the device: no trace,
no lower, no compile-cache lookup. The engine then dispatches through
the loaded ``jax.stages.Compiled`` objects (the in-process jit cache is
never populated by AOT paths, so routing dispatch through the loaded
executables is what makes the saving real rather than deferred to the
first live request).

Safety model — a stale executable must never produce wrong numerics:

* the fingerprint hashes the compute-path SOURCE FILES, the jax
  version, platform + device kind + device count, the model config
  repr, the params tree signature (paths/shapes/dtypes — distinguishes
  quant modes), and every engine shape knob the caller passes;
* any load failure (missing file, version skew, topology change,
  unpickle error) silently falls back to the lower+compile path;
* a loaded executable that still fails at call time (e.g. an aval
  mismatch the fingerprint missed) is dropped and recompiled — the
  warmup replay pass exercises every grid program once, so this is
  caught before serving traffic.

Disable with ``SONIC_EXEC_CACHE=0``; point at a shared directory with
``SONIC_EXEC_CACHE=/path`` (default ``~/.cache/sonicscribe_exec``).
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile

import jax
import numpy as np

logger = logging.getLogger(__name__)

# sources whose edits can change compiled-program semantics; hashed into
# the fingerprint so a code change can never resurrect a stale binary
_SOURCE_FILES = (
    "models/glm_asr.py",
    "engine/batcher.py",
    "engine/ring.py",
    "engine/transcriber.py",
    "vad/model.py",
    "audio/mel.py",
    "ops",  # whole directory (quant, mel_pallas, decode_attention, ...)
)


def _source_digest() -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in _SOURCE_FILES:
        path = os.path.join(root, rel)
        files = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".py")
            )
            if os.path.isdir(path)
            else [path]
        )
        for f in files:
            try:
                with open(f, "rb") as fh:
                    h.update(fh.read())
            except OSError:
                h.update(b"?")
    return h.hexdigest()


def params_signature(params) -> tuple:
    """(path, shape, dtype) tuple for a params pytree — distinguishes
    model size, dtype, and quant layout without hashing weight values."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return tuple(
        (jax.tree_util.keystr(path), tuple(x.shape), str(x.dtype))
        for path, x in leaves
    )


class ExecRouter:
    """Dispatch programs through an ExecStore (shared by BatchedEngine and
    Transcriber).

    `lower_args` are the full jit arguments (statics included, plus
    `kwargs` statics); `dyn_args` are the array arguments only — a
    `jax.stages.Compiled` is called WITHOUT its baked-in statics. With a
    store, every dispatch goes through the Compiled object: AOT paths
    never populate the in-process jit cache, so calling the jit wrapper
    after an AOT warmup would re-trace the program — exactly the cost
    the store exists to kill. Measured on chip: the Compiled call path
    costs the same as the jit fast path (0.07 vs 0.09 ms per decode
    dispatch).

    `donate_idx` indexes dyn_args entries the program DONATES (mirrors
    the jit decorator). The FIRST call of a loaded executable passes
    copies for those: a stored binary can fail mid-execution (seen with
    XLA:CPU's AOT machine-feature check — "Function ... not found"),
    which consumes the donated buffers, and a retry against deleted
    engine arrays is unrecoverable. With copies, failure costs nothing:
    the program recompiles and re-runs with the untouched originals.
    After one success the key is validated and donation runs on the
    real arrays again.
    """

    def __init__(self, store):
        self.store = store  # None -> plain jit dispatch
        self.execs: dict = {}
        self.unvalidated: set = set()

    def run(
        self, key, jit_fn, lower_args, dyn_args, kwargs=None,
        lower_only=False, donate_idx=(),
    ):
        kwargs = kwargs or {}
        if self.store is None:
            if lower_only:
                jit_fn.lower(*lower_args, **kwargs).compile()
                return None
            return jit_fn(*lower_args, **kwargs)
        c = self.execs.get(key)
        if c is None:
            c = self.store.load(key)
            if c is not None:
                self.unvalidated.add(key)
            else:
                c = jit_fn.lower(*lower_args, **kwargs).compile()
                self.store.save(key, c)
            self.execs[key] = c
        if lower_only:
            return None
        if key not in self.unvalidated:
            return c(*dyn_args)
        try:
            safe = list(dyn_args)
            for i in donate_idx:
                safe[i] = jax.numpy.copy(dyn_args[i])
            out = c(*safe)
            # surface ASYNC dispatch failures now, inside this try: XLA:CPU
            # defers "Function ... not found" binary-reload errors into the
            # output buffers, where they would escape the validation guard
            # and crash an unrelated downstream consumer (seen: a stale
            # scatter binary crashing a later engine's first tick). One
            # block per key per process; validated keys skip it.
            jax.block_until_ready(out)
            # block_until_ready alone is NOT enough on the remote-tunnel
            # TPU backend: ops/compiles queue server-side and only real
            # transfers synchronize (same property the warmup replays work
            # around, batcher.py warmup docs) — so also pull ONE element
            # of the first output leaf device->host. On XLA:CPU this is
            # redundant and free; on the tunnel it drains the queue so a
            # stale binary's deferred failure lands in this try, not in an
            # unrelated downstream consumer.
            leaves = jax.tree_util.tree_leaves(out)
            if leaves:
                np.asarray(jax.numpy.reshape(leaves[0], (-1,))[:1])
            self.unvalidated.discard(key)
            return out
        except Exception as e:
            logger.warning(
                "stored executable %r rejected (%s: %.300s); recompiling",
                key, type(e).__name__, e,
            )
            self.unvalidated.discard(key)
            self.execs.pop(key, None)
            c = jit_fn.lower(*lower_args, **kwargs).compile()
            self.execs[key] = c
            self.store.save(key, c)
            return c(*dyn_args)


class ExecStore:
    """One directory of serialized executables per context fingerprint."""

    def __init__(self, base_dir: str, context: object):
        backend = jax.devices()[0]
        # CPU AOT binaries embed the compile host's machine features
        # ("device_kind" is just "cpu" there) — a store shared between
        # heterogeneous hosts would load binaries the executor warns may
        # SIGILL. Mix the ISA flag set into the fingerprint on cpu so each
        # microarchitecture gets its own directory; TPU kinds ("TPU v5e"...)
        # already distinguish hardware.
        host_isa = ""
        if backend.platform == "cpu":
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            host_isa = " ".join(sorted(line.split()[2:]))
                            break
            except OSError:
                import platform as _platform

                host_isa = _platform.machine() + _platform.processor()
        fingerprint = hashlib.sha256(
            repr(
                (
                    jax.__version__,
                    backend.platform,
                    getattr(backend, "device_kind", "?"),
                    host_isa,
                    jax.device_count(),
                    _source_digest(),
                    context,
                )
            ).encode()
        ).hexdigest()[:20]
        self.dir = os.path.join(base_dir, fingerprint)
        os.makedirs(self.dir, exist_ok=True)
        self.loads = 0
        self.saves = 0
        self._save_failed = False
        self._prune(base_dir)

    def _prune(self, base_dir: str, keep: int = 8, min_age_s: float = 86400):
        """Drop stale fingerprint dirs (a source edit or config change
        orphans ~450 MB of binaries each). Only dirs untouched for
        min_age_s are candidates, so concurrent engines (other quant
        modes boot seconds apart) are never pruned from under each other."""
        import time

        try:
            dirs = [
                os.path.join(base_dir, d)
                for d in os.listdir(base_dir)
                if os.path.isdir(os.path.join(base_dir, d))
                and os.path.join(base_dir, d) != self.dir
            ]
            dirs.sort(key=os.path.getmtime, reverse=True)
            now = time.time()
            for d in dirs[keep - 1:]:
                if now - os.path.getmtime(d) < min_age_s:
                    continue
                import shutil

                shutil.rmtree(d, ignore_errors=True)
        except OSError:  # pragma: no cover - best effort
            pass

    def _path(self, key: object) -> str:
        return os.path.join(
            self.dir, hashlib.sha256(repr(key).encode()).hexdigest()[:32]
        )

    def load(self, key: object):
        """Deserialize a stored executable onto the device, or None."""
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            # single-device store (the engine disables it under a mesh):
            # pin the load to the default device, otherwise a multi-device
            # host (e.g. the 8-virtual-CPU test mesh) loads the executable
            # as 8-way sharded and rejects the single-shard arguments
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[jax.devices()[0]],
            )
            self.loads += 1
            return compiled
        except Exception as e:
            logger.warning("exec-store load failed for %r: %s", key, e)
            try:
                os.unlink(path)  # corrupt/skewed entry: drop it
            except OSError:
                pass
            return None

    def save(self, key: object, compiled) -> None:
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            fd, tmp = tempfile.mkstemp(dir=self.dir)
            with os.fdopen(fd, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree), fh)
            os.replace(tmp, self._path(key))  # atomic: no torn reads
            self.saves += 1
        except Exception as e:  # non-fatal: next boot just recompiles
            if not self._save_failed:  # log once, not once per program
                self._save_failed = True
                logger.warning(
                    "exec-store save failed (backend may not support "
                    "executable serialization): %s", e,
                )
