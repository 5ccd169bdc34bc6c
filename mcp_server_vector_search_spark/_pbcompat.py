"""Protobuf availability shim for ``transformWithStateInPandas``.

PySpark 4's transformWithState talks to the JVM state server over a
protobuf protocol (``pyspark/sql/streaming/proto/StateMessage_pb2``),
so both the driver AND every Python worker need ``google.protobuf`` at
import time.  This container has no pip-installed protobuf and no
network, but it does ship two public pure-Python protobuf runtimes
inside the Google Cloud SDK.  ``_pbshim/`` bridges to them:

- ``_pbshim/google/__init__.py`` — a ``__path__`` bridge that prefers
  any real install and falls back to the on-disk public runtimes.
- ``_pbshim/sitecustomize.py`` — worker-startup patch that relaxes the
  gencode-vs-runtime version gate within the same MAJOR (pyspark's
  gencode is 6.33.0; the bundled runtime is 6.32.0-dev — wire format
  and the generated-code builder API are stable within a major).

Driver-side activation happens here (``ensure_protobuf``); worker-side
activation rides ``PYTHONPATH`` via ``propagate_to_workers`` — Spark
keys its Python-worker daemons by (exec, envVars), so mutating
``sc.environment`` BEFORE the stateful UDF is wrapped spawns a daemon
whose interpreter imports ``sitecustomize`` from the shim directory.

On a real cluster none of this fires: ``pip install protobuf`` on the
image satisfies the first check, the shim stays off ``sys.path``, and
— ADVICE r10 — the version gate is relaxed ONLY when the resolved
``google.protobuf`` actually comes from the vendored fallback runtime;
a real install's ``ValidateProtobufRuntimeVersion`` is never touched,
so genuine gencode/runtime incompatibilities still fail with the
upstream version error instead of obscure AttributeErrors.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys

SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")

#: where the vendored pure-Python runtimes live (must agree with
#: ``_pbshim/google/__init__._FALLBACKS``): the patch applies only to
#: resolutions under this prefix.
VENDORED_PREFIX = "/usr/lib/google-cloud-sdk" + os.sep
_VENDORED_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google",
]

_activated: bool | None = None


def _pb2_imports() -> bool:
    try:
        importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        return True
    except Exception:
        return False


def _protobuf_origin() -> str | None:
    """Filesystem location the CURRENT ``google.protobuf`` resolves to
    (``__init__`` path for a regular package), or None when absent."""
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        return None
    if spec is None:
        return None
    if spec.origin:
        return spec.origin
    locs = list(spec.submodule_search_locations or [])
    return locs[0] if locs else None


def _is_vendored(origin: str | None) -> bool:
    return bool(origin) and os.path.abspath(origin).startswith(VENDORED_PREFIX)


def probe_protobuf() -> bool:
    """Side-effect-free availability probe: True when a real
    ``google.protobuf`` already resolves OR a vendored fallback runtime
    exists on disk for the bridge to use.  Import-time gates (e.g.
    registration guards) should call THIS, not ``ensure_protobuf`` —
    the latter mutates ``sys.path``/``sys.modules`` and is deferred to
    first actual use (ADVICE r10)."""
    try:
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except ModuleNotFoundError:
        pass
    return any(os.path.isdir(os.path.join(d, "protobuf")) for d in _VENDORED_DIRS)


def _patch_version_gate() -> None:
    """Same-major leniency as _pbshim/sitecustomize.py, for THIS
    process.  Callers must only invoke this when the resolved runtime
    is the vendored fallback (see ``_is_vendored``) — a real install's
    validation stays untouched."""
    from google.protobuf import runtime_version as rv

    upstream = rv.ValidateProtobufRuntimeVersion

    def lenient(domain, major, minor, patch, suffix, location):
        try:
            upstream(domain, major, minor, patch, suffix, location)
        except Exception:
            if major != rv.MAJOR:
                raise

    rv.ValidateProtobufRuntimeVersion = lenient


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in this process if possible.

    Returns True when pyspark's StateMessage_pb2 actually imports —
    the precise prerequisite for transformWithStateInPandas.
    Idempotent; caches the outcome.
    """
    global _activated
    if _activated is not None:
        return _activated

    try:
        have_real = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent `google` package absent entirely
        have_real = False
    if have_real:
        # Already importable.  Relax the version gate ONLY when the
        # resolution is the vendored SDK runtime (the bridge is already
        # active, e.g. via worker PYTHONPATH); a real install keeps
        # upstream validation (ADVICE r10).
        if _is_vendored(_protobuf_origin()):
            try:
                _patch_version_gate()
            except Exception:
                pass
        _activated = _pb2_imports()
        return _activated

    # No runtime importable: bring the bridge package in.  Unrelated
    # google.* modules (namespace-package siblings like google.auth)
    # are snapshotted and restored afterwards so already-held
    # references never diverge from a re-imported copy (ADVICE r10).
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
    snapshot = {
        m: sys.modules[m]
        for m in list(sys.modules)
        if m == "google" or m.startswith("google.")
    }
    for mod in snapshot:
        del sys.modules[mod]
    importlib.invalidate_caches()
    try:
        importlib.import_module("google.protobuf")
        _patch_version_gate()  # vendored by construction on this path
        _activated = _pb2_imports()
    except Exception:
        _activated = False
    parent = sys.modules.get("google")
    for name, mod in snapshot.items():
        if name == "google" or name.startswith("google.protobuf"):
            continue
        if name not in sys.modules:
            sys.modules[name] = mod
            if parent is not None and name.count(".") == 1:
                setattr(parent, name.split(".", 1)[1], mod)
    return _activated


def propagate_to_workers(spark) -> None:
    """Expose the shim to Python workers spawned AFTER this call.

    ``sc.environment`` is the env-var dict Spark attaches to every
    Python function it wraps (pyspark.core.rdd._prepare_for_python_RDD);
    PythonWorkerFactory merges its PYTHONPATH into the daemon's, and a
    changed envVars map gets a fresh daemon — so the shim's
    sitecustomize runs at that daemon's interpreter startup.  No-op when
    a real protobuf install exists (workers inherit site-packages).
    """
    # Driver activation first (idempotent): with ensure_protobuf now
    # deferred to first use, the bridge may not be on sys.path yet, and
    # the real-install check below would misread a bare namespace
    # `google` as "nothing to propagate".
    ensure_protobuf()
    if importlib.util.find_spec("google") is not None:
        spec = importlib.util.find_spec("google")
        locs = list(spec.submodule_search_locations or [])
        if locs and not any(os.path.abspath(p).startswith(SHIM_DIR) for p in locs):
            return  # real install: nothing to propagate
    sc = spark.sparkContext
    current = sc.environment.get("PYTHONPATH") or os.environ.get("PYTHONPATH", "")
    parts = [p for p in current.split(os.pathsep) if p]
    if SHIM_DIR not in parts:
        sc.environment["PYTHONPATH"] = os.pathsep.join([SHIM_DIR] + parts)
