"""SAE core semantics + torch-interop serialization tests.

Parity oracle: an independent torch eager implementation of the documented
reference math (reference sae_auto_interp/sae/sae.py:172-247) written inline
here, so the JAX core is validated against the exact semantics the reference's
checkpoints assume — without importing reference code."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sae_tpu.config import SaeConfig
from multimodal_sae_tpu.sae import (
    Sae,
    forward,
    init_params,
    pre_acts,
    remove_gradient_parallel_to_decoder_directions,
    set_decoder_norm_to_unit_norm,
)

D_IN, K, EXPANSION = 32, 4, 8
L = D_IN * EXPANSION


@pytest.fixture()
def sae():
    cfg = SaeConfig(expansion_factor=EXPANSION, k=K, multi_topk=True)
    return Sae(D_IN, cfg, key=jax.random.PRNGKey(7))


def _torch_reference_forward(params, x_np, k, dead_mask=None, multi_topk=False):
    """Independent torch implementation of the reference forward math."""
    import torch

    W_enc = torch.tensor(np.asarray(params["W_enc"]), dtype=torch.float64)
    b_enc = torch.tensor(np.asarray(params["b_enc"]), dtype=torch.float64)
    W_dec = torch.tensor(np.asarray(params["W_dec"]), dtype=torch.float64)
    b_dec = torch.tensor(np.asarray(params["b_dec"]), dtype=torch.float64)
    x = torch.tensor(x_np, dtype=torch.float64)

    pre = torch.relu((x - b_dec) @ W_enc + b_enc)
    vals, idx = pre.topk(k)
    buf = torch.zeros_like(pre)
    buf.scatter_(-1, idx, vals)
    sae_out = buf @ W_dec + b_dec
    e = sae_out - x
    total_var = ((x - x.mean(0)) ** 2).sum()
    fvu = (e**2).sum() / total_var

    auxk = torch.tensor(0.0, dtype=torch.float64)
    if dead_mask is not None and int(dead_mask.sum()) > 0:
        k_aux = x.shape[-1] // 2
        num_dead = int(dead_mask.sum())
        scale = min(num_dead / k_aux, 1.0)
        k_aux_eff = min(k_aux, num_dead)
        masked = torch.where(
            torch.tensor(np.asarray(dead_mask))[None], pre, torch.tensor(-torch.inf)
        )
        avals, aidx = masked.topk(k_aux_eff)
        abuf = torch.zeros_like(pre)
        abuf.scatter_(-1, aidx, avals)
        e_hat = abuf @ W_dec + b_dec
        auxk = scale * ((e_hat - e) ** 2).sum() / total_var

    mt_fvu = torch.tensor(0.0, dtype=torch.float64)
    if multi_topk:
        v4, i4 = pre.topk(4 * k)
        b4 = torch.zeros_like(pre)
        b4.scatter_(-1, i4, v4)
        out4 = b4 @ W_dec + b_dec
        mt_fvu = ((out4 - x) ** 2).sum() / total_var
        # Reference reassigns sae_out to the 4k decode (reference sae.py:232-238).
        sae_out = out4

    return sae_out.numpy(), float(fvu), float(auxk), float(mt_fvu)


def test_init_matches_reference_invariants(sae):
    p = sae.params
    assert p["W_enc"].shape == (D_IN, L)
    assert p["W_dec"].shape == (L, D_IN)
    # Unit-norm decoder rows (reference sae.py:63-64,249-255).
    norms = jnp.linalg.norm(p["W_dec"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert bool(jnp.all(p["b_enc"] == 0)) and bool(jnp.all(p["b_dec"] == 0))


@pytest.mark.parametrize("fast", [True, False])
def test_forward_matches_torch_reference(sae, fast):
    x = np.random.default_rng(0).normal(size=(16, D_IN)).astype(np.float32)
    out = forward(sae.params, jnp.asarray(x), sae.cfg, fast=fast)
    ref_out, ref_fvu, _, ref_mt = _torch_reference_forward(
        sae.params, x, K, multi_topk=True
    )
    np.testing.assert_allclose(out.sae_out, ref_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.fvu), ref_fvu, rtol=1e-4)
    np.testing.assert_allclose(float(out.multi_topk_fvu), ref_mt, rtol=1e-4)


def test_auxk_matches_torch_reference(sae):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, D_IN)).astype(np.float32)
    dead = np.zeros(L, dtype=bool)
    dead[rng.choice(L, size=40, replace=False)] = True
    out = forward(sae.params, jnp.asarray(x), sae.cfg, dead_mask=jnp.asarray(dead))
    _, _, ref_auxk, _ = _torch_reference_forward(
        sae.params, x, K, dead_mask=dead, multi_topk=False
    )
    np.testing.assert_allclose(float(out.auxk_loss), ref_auxk, rtol=1e-3)


def test_auxk_zero_when_no_dead(sae):
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, D_IN)), dtype=jnp.float32)
    dead = jnp.zeros(L, dtype=bool)
    out = forward(sae.params, x, sae.cfg, dead_mask=dead)
    assert float(out.auxk_loss) == 0.0


def test_fired_mask(sae):
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, D_IN)), dtype=jnp.float32)
    out = forward(sae.params, x, sae.cfg, fast=True, return_topk=True)
    fired_from_idx = np.zeros(L, dtype=bool)
    fired_from_idx[np.asarray(out.latent_indices).ravel()] = True
    # Every latent with a strictly positive selected activation must be in both.
    pos = np.asarray(out.latent_acts) > 0
    for i in np.asarray(out.latent_indices)[pos]:
        assert bool(out.fired[int(i)])


def test_grad_projection_orthogonal(sae):
    g = {k: jnp.ones_like(v) for k, v in sae.params.items()}
    g2 = remove_gradient_parallel_to_decoder_directions(sae.params, g)
    dots = jnp.einsum("ld,ld->l", g2["W_dec"], sae.params["W_dec"])
    np.testing.assert_allclose(dots, 0.0, atol=1e-5)


def test_unit_norm_idempotent(sae):
    p = set_decoder_norm_to_unit_norm(sae.params)
    norms = jnp.linalg.norm(p["W_dec"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_serde_roundtrip(tmp_path, sae):
    sae.save_to_disk(tmp_path / "layers.24")
    loaded = Sae.load_from_disk(tmp_path / "layers.24")
    for k in sae.params:
        np.testing.assert_array_equal(loaded.params[k], sae.params[k])
    assert loaded.cfg == sae.cfg and loaded.d_in == sae.d_in
    cfg_json = json.loads((tmp_path / "layers.24" / "cfg.json").read_text())
    assert cfg_json["d_in"] == D_IN and cfg_json["k"] == K


def test_load_torch_written_checkpoint(tmp_path):
    """A checkpoint written from torch (the reference's writer layout,
    reference sae.py:150-162) loads and produces identical activations."""
    import torch
    from safetensors.torch import save_file

    rng = torch.Generator().manual_seed(0)
    W = torch.randn(L, D_IN, generator=rng)
    tensors = {
        "encoder.weight": W.clone(),
        "encoder.bias": torch.randn(L, generator=rng),
        "W_dec": W / W.norm(dim=1, keepdim=True),
        "b_dec": torch.randn(D_IN, generator=rng),
    }
    d = tmp_path / "layers.0"
    d.mkdir()
    save_file(tensors, str(d / "sae.safetensors"))
    (d / "cfg.json").write_text(
        json.dumps(
            {
                "expansion_factor": EXPANSION,
                "normalize_decoder": True,
                "num_latents": 0,
                "k": K,
                "multi_topk": False,
                "signed": False,
                "d_in": D_IN,
            }
        )
    )
    sae = Sae.load_from_disk(d)
    x = np.random.default_rng(5).normal(size=(4, D_IN)).astype(np.float32)
    ours = pre_acts(sae.params, jnp.asarray(x))
    theirs = torch.relu(
        (torch.tensor(x) - tensors["b_dec"]) @ tensors["encoder.weight"].T
        + tensors["encoder.bias"]
    )
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-5, atol=1e-5)


def test_load_torch_bf16_checkpoint(tmp_path):
    import torch
    from safetensors.torch import save_file

    W = torch.randn(L, D_IN, dtype=torch.bfloat16)
    tensors = {
        "encoder.weight": W,
        "encoder.bias": torch.zeros(L, dtype=torch.bfloat16),
        "W_dec": W.clone(),
        "b_dec": torch.zeros(D_IN, dtype=torch.bfloat16),
    }
    d = tmp_path / "layers.1"
    d.mkdir()
    save_file(tensors, str(d / "sae.safetensors"))
    (d / "cfg.json").write_text(json.dumps({**SaeConfig(k=K).to_dict(), "d_in": D_IN}))
    sae = Sae.load_from_disk(d, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sae.params["W_dec"]),
        W.to(torch.float32).numpy(),
        rtol=0,
        atol=0,
    )


def test_load_many(tmp_path):
    cfg = SaeConfig(expansion_factor=2, k=2)
    for i in [0, 2, 10]:
        Sae(8, cfg, key=jax.random.PRNGKey(i)).save_to_disk(tmp_path / f"layers.{i}")
    saes = Sae.load_many(str(tmp_path), local=True)
    assert list(saes.keys()) == ["layers.0", "layers.2", "layers.10"]  # natsorted


def test_fired_not_all_true_when_row_has_few_positive_acts():
    """A row with fewer than k positive pre-activations has kth == 0; the
    selection mask (pre >= 0) covers every post-ReLU latent of that row, but
    `fired` must still only mark positive selections — an all-True fired
    wipes the dead-feature counters and silently disables AuxK."""
    import jax.numpy as jnp

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae.model import forward, init_params

    cfg = SaeConfig(num_latents=64, k=8)
    params = init_params(jax.random.PRNGKey(0), 16, cfg)
    # Row 0: plenty of positive latents. Row 1: x == b_dec makes sae_in zero,
    # so every pre-activation is relu(b_enc) == 0 and its k-th value is 0.
    x = jnp.stack([jnp.ones((16,)), params["b_dec"]])
    out = forward(params, x, cfg, fast=True)
    fired = np.asarray(out.fired)
    assert 0 < fired.sum() < cfg.num_latents, fired.sum()
    # Only selected positives count: at most ~k from row 0 (+ ties).
    assert fired.sum() <= 2 * cfg.k, fired.sum()


def test_load_many_hub_multi_hookpoint(tmp_path, monkeypatch):
    """Hub load_many targets multi-hookpoint repos: cfg.json lives only in
    per-hookpoint subdirectories, so the resolver must not require one at the
    repo root, and the download filter needs the reference's '/*' suffix to
    fetch nested files (reference sae.py:79-83; review r3)."""
    import huggingface_hub

    cfg = SaeConfig(expansion_factor=2, k=2)
    repo = tmp_path / "fake-hub-snapshot"
    for i in [0, 2]:
        Sae(8, cfg, key=jax.random.PRNGKey(i)).save_to_disk(repo / f"layers.{i}")
    seen = {}

    def fake_snapshot_download(name, allow_patterns=None, **kw):
        seen["name"], seen["allow_patterns"] = name, allow_patterns
        return str(repo)

    monkeypatch.setattr(
        huggingface_hub, "snapshot_download", fake_snapshot_download
    )
    saes = Sae.load_many("org/multi-sae-repo", pattern="layers.*")
    assert list(saes.keys()) == ["layers.0", "layers.2"]
    assert seen == {"name": "org/multi-sae-repo", "allow_patterns": "layers.*/*"}
