"""End-to-end parity against the reference's own Sae implementation (imported
from the read-only mount; its Triton import falls back to eager decode on this
CPU-only torch): a checkpoint written by this framework loads in the
reference, and forward outputs (reconstruction, FVU, AuxK, Multi-TopK) agree.
Skipped when the mount is absent."""

import sys

import numpy as np
import pytest

from multimodal_sae_tpu.utils.reference_mount import (
    REFERENCE_ROOT,
    load_reference_sae_module as _load_reference_sae,
)

REFERENCE_SAE_DIR = REFERENCE_ROOT / "sae"

torch = pytest.importorskip("torch")


@pytest.mark.skipif(not REFERENCE_SAE_DIR.exists(), reason="reference mount absent")
def test_checkpoint_and_forward_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae, forward

    cfg = SaeConfig(expansion_factor=4, k=8, multi_topk=True)
    ours = Sae(32, cfg, key=jax.random.PRNGKey(0))
    ours.save_to_disk(tmp_path / "layers.0")

    ref_sae_mod = _load_reference_sae()
    theirs = ref_sae_mod.Sae.load_from_disk(tmp_path / "layers.0")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(24, 32)).astype(np.float32)
    dead = np.zeros(128, dtype=bool)
    dead[rng.choice(128, size=30, replace=False)] = True

    with torch.no_grad():
        ref_out = theirs(torch.tensor(x), dead_mask=torch.tensor(dead))
    our_out = forward(
        ours.params, jnp.asarray(x), cfg, dead_mask=jnp.asarray(dead)
    )

    np.testing.assert_allclose(
        np.asarray(our_out.sae_out), ref_out.sae_out.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(float(our_out.fvu), float(ref_out.fvu), rtol=2e-4)
    np.testing.assert_allclose(
        float(our_out.auxk_loss), float(ref_out.auxk_loss), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(our_out.multi_topk_fvu), float(ref_out.multi_topk_fvu), rtol=2e-4
    )


@pytest.mark.skipif(not REFERENCE_SAE_DIR.exists(), reason="reference mount absent")
def test_reference_written_checkpoint_loads_here(tmp_path):
    """The reverse direction: a checkpoint written by the reference's
    save_to_disk loads here with identical parameters."""
    import jax.numpy as jnp

    from multimodal_sae_tpu.sae import Sae

    ref_sae_mod = _load_reference_sae()
    ref_cfg_mod = sys.modules["_refsae.config"]
    torch.manual_seed(0)
    theirs = ref_sae_mod.Sae(16, ref_cfg_mod.SaeConfig(expansion_factor=2, k=4))
    theirs.save_to_disk(tmp_path / "layers.9")

    ours = Sae.load_from_disk(tmp_path / "layers.9", dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ours.params["W_dec"]), theirs.W_dec.detach().numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.params["W_enc"]).T, theirs.encoder.weight.detach().numpy()
    )
    assert ours.cfg.k == 4 and ours.d_in == 16
