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
image satisfies the first check and the shim stays inert.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys

SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")

_activated: bool | None = None


def _pb2_imports() -> bool:
    try:
        importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        return True
    except Exception:
        return False


def _patch_version_gate() -> None:
    """Same-major leniency as _pbshim/sitecustomize.py, for THIS process."""
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
        # Real (or already-bridged) runtime present: just relax the gate.
        try:
            _patch_version_gate()
        except Exception:
            pass
        _activated = _pb2_imports()
        return _activated

    # No runtime importable: bring the bridge package in.
    if SHIM_DIR not in sys.path:
        sys.path.insert(0, SHIM_DIR)
    for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[mod]
    importlib.invalidate_caches()
    try:
        importlib.import_module("google.protobuf")
        _patch_version_gate()
        _activated = _pb2_imports()
    except Exception:
        _activated = False
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
