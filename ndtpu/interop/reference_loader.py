"""Import the torch reference's model files without its native library.

The reference models (`/root/reference/ndnet/models/*.py`) import
`ndnet.preprocessing.ndt_legacy` at module scope, which `ctypes`-loads
`/usr/local/lib/libndnet.so` (ndt_legacy.py:28) — absent outside the
reference's Docker image. This loader stubs that import so the *model*
code (pure torch) is usable for weight migration and controlled
parity experiments.
"""
from __future__ import annotations

import importlib.util
import sys
import types

DEFAULT_REF = "/root/reference/ndnet/models"


def load_reference_module(name: str, models_dir: str = DEFAULT_REF):
    """Import reference model module `name` (e.g. "ndtnet") with the
    ndt_legacy ctypes import stubbed. Returns the module object."""
    root = models_dir.rsplit("/ndnet/", 1)[0]
    if "ndnet" not in sys.modules:
        pkg = types.ModuleType("ndnet")
        pkg.__path__ = [f"{root}/ndnet"]
        sys.modules["ndnet"] = pkg
        pre = types.ModuleType("ndnet.preprocessing")
        pre.__path__ = [f"{root}/ndnet/preprocessing"]
        sys.modules["ndnet.preprocessing"] = pre
        legacy = types.ModuleType("ndnet.preprocessing.ndt_legacy")
        legacy.NDT_Sampler = object
        sys.modules["ndnet.preprocessing.ndt_legacy"] = legacy
        models = types.ModuleType("ndnet.models")
        models.__path__ = [models_dir]
        sys.modules["ndnet.models"] = models
    full = f"ndnet.models.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(full, f"{models_dir}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod
