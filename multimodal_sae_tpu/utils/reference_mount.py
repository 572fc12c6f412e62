"""Import the reference implementation from the read-only mount
(`/root/reference`) under private module names, shimming its
offline-hostile imports.

Used by the real-checkpoint validation tool
(`tools/validate_real_checkpoint.py`); the parity tests
(tests/test_reference_sae_parity.py, tests/test_reference_cache_parity.py)
use the same shims. The shims cover:

* `simple_parsing` (absent here) — provide `Serializable.to_dict` and
  `list_field`, the two names the reference config uses;
* `natsort` — route to our own natsorted;
* `torchtyping` — a subscriptable `TensorType` stand-in;
* `FeatureImageCache.__init__` has a `LlavaNextProcessor.from_pretrained`
  *default argument* evaluated at import time (reference
  features/cache.py:312-429) — patch the classmethod for the duration of
  the import; real runs pass a processor explicitly.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference/sae_auto_interp")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


def shim_simple_parsing() -> None:
    if "simple_parsing" not in sys.modules:
        import dataclasses

        shim = types.ModuleType("simple_parsing")

        class Serializable:
            def to_dict(self):
                return dataclasses.asdict(self)

        shim.Serializable = Serializable
        shim.list_field = lambda *a: dataclasses.field(
            default_factory=lambda: list(a)
        )
        sys.modules["simple_parsing"] = shim

    if "natsort" not in sys.modules:
        from . import natsorted

        nat = types.ModuleType("natsort")
        nat.natsorted = natsorted
        sys.modules["natsort"] = nat


def load_reference_sae_module():
    """Import the reference `sae` package (config/utils/sae) from the mount
    under the private name `_refsae`; returns the `sae` module (its Triton
    import falls back to eager decode on CPU-only torch)."""
    if "_refsae.sae" in sys.modules:
        return sys.modules["_refsae.sae"]
    shim_simple_parsing()
    sae_dir = REFERENCE_ROOT / "sae"
    pkg = types.ModuleType("_refsae")
    pkg.__path__ = [str(sae_dir)]
    sys.modules["_refsae"] = pkg
    for name in ("config", "utils", "sae"):
        spec = importlib.util.spec_from_file_location(
            f"_refsae.{name}", sae_dir / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_refsae.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["_refsae.sae"]


def load_reference_cache_module():
    """Import the reference `features/cache.py` (FeatureCache /
    FeatureImageCache / Cache) from the mount as `_refsai.features.cache`."""
    if "_refsai.features.cache" in sys.modules:
        return sys.modules["_refsai.features.cache"]
    import transformers

    shim_simple_parsing()
    if "torchtyping" not in sys.modules:
        tt = types.ModuleType("torchtyping")

        class TensorType:
            def __class_getitem__(cls, item):
                return cls

        tt.TensorType = TensorType
        sys.modules["torchtyping"] = tt

    ref_sae_mod = load_reference_sae_module()
    root = types.ModuleType("_refsai")
    root.__path__ = [str(REFERENCE_ROOT)]
    sys.modules["_refsai"] = root
    sae_pkg = types.ModuleType("_refsai.sae")
    sae_pkg.Sae = ref_sae_mod.Sae
    sae_pkg.SaeConfig = sys.modules["_refsae.config"].SaeConfig
    sys.modules["_refsai.sae"] = sae_pkg
    feats = types.ModuleType("_refsai.features")
    feats.__path__ = [str(REFERENCE_ROOT / "features")]
    sys.modules["_refsai.features"] = feats

    real_cls = transformers.LlavaNextProcessor
    own_fp = real_cls.__dict__.get("from_pretrained")  # may be inherited
    real_cls.from_pretrained = classmethod(lambda cls, *a, **k: None)
    try:
        spec = importlib.util.spec_from_file_location(
            "_refsai.features.cache", REFERENCE_ROOT / "features" / "cache.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["_refsai.features.cache"] = mod
    finally:
        if own_fp is None:
            del real_cls.from_pretrained
        else:
            real_cls.from_pretrained = own_fp
    return mod
