"""Dev-sandbox protobuf shim (auto-imported via PYTHONPATH).

The Spark-4 ``transformWithStateInPandas`` Python protocol is
protobuf-framed, but this sandbox has no installable ``protobuf``
distribution. The Google Cloud SDK present on the machine vendors the
public pure-Python protobuf runtime under a ``cloudsdk.google.protobuf``
namespace; this module aliases it back to ``google.protobuf`` so both
the driver AND Spark's Python workers (separate processes — hence the
``sitecustomize`` delivery on PYTHONPATH, which every CPython imports
at startup) can load pyspark's generated ``StateMessage_pb2``.

Entirely guarded: if a real ``google.protobuf`` is importable, or the
vendored copy is absent, this is a no-op. Production environments
install protobuf normally and never see this file — it exists so the
tws correlator path is *executed* by the test suite instead of
perpetually skipped (tests/test_streaming.py).

Two version gaps are bridged:

- pyspark's gencode (protoc 6.x) calls
  ``google.protobuf.runtime_version.ValidateProtobufRuntimeVersion``,
  a module the 4.23 runtime predates. The shim provides it as a no-op:
  the proto2/proto3 *wire format* is frozen, and the builder API the
  gencode actually uses (``descriptor_pool.AddSerializedFile`` +
  ``internal.builder``) exists and is stable in 4.23 — verified by a
  serialize/parse round-trip in tests/test_streaming.py.
- the vendored copy's internal imports use the ``cloudsdk.`` prefix, so
  every ``google.protobuf[.X]`` import is aliased to the SAME module
  object as ``cloudsdk.google.protobuf[.X]`` via a meta-path finder
  (two parallel module instances would break descriptor-pool
  registration and isinstance checks).
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import os
import sys
import types

_CLOUDSDK_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


def _have_real_protobuf() -> bool:
    # NOT just `import google.protobuf`: an empty NAMESPACE package
    # (a bare google/protobuf dir on some path entry — Spark worker
    # PYTHONPATHs have one) imports fine but carries nothing. Probe a
    # real module.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, real: str):
        self.real = real

    def create_module(self, spec):
        # return the cloudsdk module object itself: one instance, two
        # sys.modules names
        return importlib.import_module(self.real)

    def exec_module(self, module):
        pass


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "google" or name == "google.protobuf" or name.startswith(
            "google.protobuf."
        ):
            if name == "google.protobuf.runtime_version":
                return None  # provided as a stub module below
            try:
                return importlib.util.spec_from_loader(
                    name, _AliasLoader("cloudsdk." + name)
                )
            except Exception:
                return None
        return None


def install() -> bool:
    """Install the alias; True when google.protobuf becomes importable."""
    if _have_real_protobuf():
        return True
    if not os.path.isdir(os.path.join(_CLOUDSDK_THIRD_PARTY, "cloudsdk")):
        return False
    if _CLOUDSDK_THIRD_PARTY not in sys.path:
        sys.path.append(_CLOUDSDK_THIRD_PARTY)
    # evict any already-imported empty NAMESPACE google.* modules so the
    # alias finder (consulted before path finders) serves future imports
    for m in list(sys.modules):
        if (m == "google" or m.startswith("google.")) and getattr(
            sys.modules[m], "__file__", None
        ) is None:
            del sys.modules[m]
    if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _AliasFinder())

    rv = types.ModuleType("google.protobuf.runtime_version")

    class Domain:
        GOOGLE_INTERNAL = 1
        PUBLIC = 2

    rv.Domain = Domain
    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    sys.modules["google.protobuf.runtime_version"] = rv
    try:
        import google.protobuf as pb

        pb.runtime_version = rv  # `from google.protobuf import runtime_version`
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


try:
    install()
except Exception:
    pass
