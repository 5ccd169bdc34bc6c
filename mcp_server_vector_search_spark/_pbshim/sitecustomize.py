"""Worker-side protobuf compatibility patch (runs at interpreter start).

PySpark executors launch Python workers whose ``worker.py`` imports
``pyspark.sql.streaming.proto.StateMessage_pb2`` at MODULE scope —
before any user code runs — so the only place to reconcile the gencode
version (6.33.0 in pyspark 4.1.2) with the on-disk pure-Python runtime
(6.32.0-dev inside the public Google Cloud SDK) is interpreter startup.
This directory is appended to the worker ``PYTHONPATH`` solely when no
real protobuf install exists (``_pbcompat.propagate_to_workers``), and
``site`` imports this file automatically.

The patch is deliberately narrow: ``ValidateProtobufRuntimeVersion`` is
wrapped so that a SAME-MAJOR gencode/runtime mismatch is tolerated
(minor/patch drift — wire format and the generated-code builder API are
stable within a major); any cross-major mismatch still raises exactly
as upstream would.  Must stay self-contained: the engine package may
not be importable in the worker.
"""

try:
    from google.protobuf import runtime_version as _rv

    _upstream_validate = _rv.ValidateProtobufRuntimeVersion

    def _lenient_validate(domain, major, minor, patch, suffix, location):
        try:
            _upstream_validate(domain, major, minor, patch, suffix, location)
        except Exception:
            if major != _rv.MAJOR:
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient_validate
except Exception:  # no runtime found at all: leave imports to fail loudly
    pass

# Python imports exactly ONE sitecustomize, so prepending this
# directory to PYTHONPATH shadows any sitecustomize the worker
# environment already relied on.  Chain-load the next one on sys.path
# (standard shadowing-shim pattern, ADVICE r10) in its own namespace —
# a fresh dict so the downstream hook cannot clobber the wrapper's
# module globals (``_upstream_validate`` is a global lookup, not a
# closure).
try:
    import os as _os
    import sys as _sys

    # re-entry sentinel: a symlinked spelling of this directory on
    # sys.path must not make the shim exec itself recursively
    # (ADVICE r11) — realpath comparison below handles the common
    # case, the sentinel guards any aliasing realpath cannot see
    # (e.g. bind mounts)
    if not getattr(_sys, "_pbshim_chained", False):
        _sys._pbshim_chained = True
        _shim_dir = _os.path.realpath(_os.path.dirname(_os.path.abspath(__file__)))
        for _entry in _sys.path:
            _cand = _os.path.join(
                _os.path.abspath(_entry or "."), "sitecustomize.py"
            )
            if (
                _os.path.realpath(_os.path.dirname(_cand)) == _shim_dir
                or not _os.path.isfile(_cand)
            ):
                continue
            with open(_cand) as _f:
                _src = _f.read()
            _ns = {"__file__": _cand, "__name__": "sitecustomize"}
            exec(compile(_src, _cand, "exec"), _ns)
            break
except Exception:  # a broken downstream hook must not kill the worker
    pass
