"""Bridge package: resolve ``google.*`` against any real install first,
then against public pure-Python protobuf runtimes already on disk.

This file lives in a directory that is placed on ``sys.path`` /
``PYTHONPATH`` ONLY when ``google.protobuf`` is not installed (see
``_pbcompat.py``).  It never shadows a real install: every other
``google/`` directory reachable from ``sys.path`` is searched BEFORE
the vendored fallbacks, so ``pip install protobuf`` transparently wins.

The fallbacks are public, Apache/BSD-licensed pure-Python protobuf
runtimes shipped inside the (publicly distributed) Google Cloud SDK —
the only protobuf runtime present in this container.  PySpark 4's
``transformWithStateInPandas`` needs the runtime at worker startup
(``pyspark/worker.py`` imports ``StateMessage_pb2`` at module scope),
which is why this must be an import-path-level bridge rather than a
call-site patch.
"""

import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))

# Real installs first: any other `google/` directory on sys.path.
__path__ = []
for _entry in list(_sys.path):
    _cand = _os.path.join(_entry or ".", "google")
    if _os.path.isdir(_cand) and _os.path.abspath(_cand) != _here:
        __path__.append(_cand)

# Public pure-Python runtimes known to exist on this image (checked for
# an actual `protobuf/` subpackage before use).
_FALLBACKS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google",
]
for _cand in _FALLBACKS:
    if _os.path.isdir(_os.path.join(_cand, "protobuf")) and _cand not in __path__:
        __path__.append(_cand)
