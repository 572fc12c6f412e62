"""SAE checkpoint (de)serialization.

On-disk format is byte-compatible with the reference
(reference sae_auto_interp/sae/sae.py:126-162): a directory per hookpoint with

    {path}/sae.safetensors   tensors: encoder.weight (L, d_in), encoder.bias (L,),
                                      W_dec (L, d_in), b_dec (d_in,)
    {path}/cfg.json          SaeConfig fields + {"d_in": ...}

so checkpoints produced by either framework (including the released
lmms-lab/llama3-llava-next-8b-hf-sae-131k) load in both.  Internally we store
the encoder weight transposed ((d_in, L)) for the TPU matmul layout; the
transpose happens here at the IO boundary.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..config import SaeConfig

Params = Dict[str, jnp.ndarray]


def _to_numpy(x) -> np.ndarray:
    arr = np.asarray(x)
    return arr


def save_sae_to_disk(
    params: Params, cfg: SaeConfig, d_in: int, path: Union[Path, str]
) -> None:
    """Write sae.safetensors + cfg.json (reference sae.py:150-162)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)

    tensors = {
        "encoder.weight": np.ascontiguousarray(_to_numpy(params["W_enc"]).T),
        "encoder.bias": _to_numpy(params["b_enc"]),
        "b_dec": _to_numpy(params["b_dec"]),
    }
    if "W_dec" in params:
        tensors["W_dec"] = np.ascontiguousarray(_to_numpy(params["W_dec"]))
    save_file(tensors, str(path / "sae.safetensors"))

    with open(path / "cfg.json", "w") as f:
        json.dump({**cfg.to_dict(), "d_in": d_in}, f)


def _load_safetensors_numpy(filename: str) -> Dict[str, np.ndarray]:
    """Load a safetensors file to numpy, handling bf16/f16 payloads that
    `safetensors.numpy` may not map natively (reference checkpoints are often
    written from torch in half precision)."""
    try:
        from safetensors.numpy import load_file

        return load_file(filename)
    except FileNotFoundError:
        raise  # not a dtype problem — don't mask it with the torch fallback
    except Exception as numpy_err:
        # Fall back through torch (cpu), converting to numpy via ml_dtypes.
        try:
            import ml_dtypes
            import torch  # type: ignore
            from safetensors.torch import load_file as torch_load_file
        except ImportError:
            # Torch-free host: surface the original (informative) error —
            # a bare 'No module named torch' would hide a corrupt file.
            raise numpy_err

        out = {}
        for k, v in torch_load_file(filename).items():
            if v.dtype == torch.bfloat16:
                # int16 view: bit-identical to uint16 (which torch < 2.3
                # lacks — using it would crash the fallback itself).
                out[k] = v.view(torch.int16).numpy().view(ml_dtypes.bfloat16)
            else:
                out[k] = v.numpy()
        return out


def load_sae_from_disk(
    path: Union[Path, str], dtype=None, *, decoder: bool = True
) -> Tuple[Params, SaeConfig, int]:
    """Read the reference directory layout (reference sae.py:126-148).

    `decoder=False` mirrors the reference's `strict=decoder` partial load:
    W_dec is skipped entirely.
    """
    path = Path(path)
    with open(path / "cfg.json", "r") as f:
        cfg_dict = json.load(f)
        d_in = cfg_dict.pop("d_in")
        cfg = SaeConfig.from_dict(cfg_dict)

    tensors = _load_safetensors_numpy(str(path / "sae.safetensors"))

    def _as_jnp(a: np.ndarray):
        x = jnp.asarray(a)
        return x.astype(dtype) if dtype is not None else x

    params: Params = {
        "W_enc": _as_jnp(np.ascontiguousarray(tensors["encoder.weight"].T)),
        "b_enc": _as_jnp(tensors["encoder.bias"]),
        "b_dec": _as_jnp(tensors["b_dec"]),
    }
    if decoder:
        if "W_dec" not in tensors:
            raise KeyError(
                f"W_dec missing from {path}/sae.safetensors but decoder=True "
                "(reference load_model(strict=decoder), sae.py:141-147)"
            )
        params["W_dec"] = _as_jnp(tensors["W_dec"])
    return params, cfg, d_in


def resolve_hub_path(
    name: str,
    hookpoint: Optional[str],
    allow_patterns: Optional[str] = None,
    *,
    require_cfg: bool = True,
) -> Path:
    """Resolve a HuggingFace-hub repo (or local path) to a local directory
    (reference sae.py:102-124). Local paths pass through; hub downloads are
    gated on `huggingface_hub` being importable and having network access.

    `require_cfg` applies only when `hookpoint is None`: `load_from_hub`
    expects a single-SAE repo (cfg.json at the root, reference
    sae.py:120-122), but `load_many` targets multi-hookpoint repos whose
    cfg.json files live one directory down — it must pass False or every
    hub load_many would fail on a perfectly valid repo."""
    p = Path(name)
    if p.exists():
        return p / hookpoint if hookpoint else p
    try:
        from huggingface_hub import snapshot_download  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise FileNotFoundError(
            f"{name} is not a local path and huggingface_hub is unavailable"
        ) from e
    pattern = allow_patterns or (f"{hookpoint}/*" if hookpoint is not None else None)
    repo_path = Path(snapshot_download(name, allow_patterns=pattern))
    if hookpoint is not None:
        repo_path = repo_path / hookpoint
    elif require_cfg and not (repo_path / "cfg.json").exists():
        raise FileNotFoundError("No config file found; try specifying a layer.")
    return repo_path
