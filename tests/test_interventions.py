"""Steering and attribution-patching tests against tiny random models, with
attribution parity-checked against an independent torch+hooks implementation
of the reference math (reference features/patching/attribution.py:116-189)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.config import SaeConfig
from multimodal_sae_tpu.features.patching.utils import (
    get_logit_diff,
    sae_splice_intervention,
    spliced_forward_with_delta,
)
from multimodal_sae_tpu.features.steering import clamp_features_max
from multimodal_sae_tpu.models.llama import LlamaConfig, LlamaModel, init_llama_params
from multimodal_sae_tpu.sae import Sae

torch = pytest.importorskip("torch")

D = 32


@pytest.fixture(scope="module")
def llama():
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=D,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=10000.0,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return LlamaModel(params, cfg)


@pytest.fixture(scope="module")
def sae():
    return Sae(D, SaeConfig(num_latents=128, k=8), key=jax.random.PRNGKey(1))


def test_clamp_intervention_changes_output(llama, sae):
    iv = clamp_features_max(sae, feature=7, k=50.0)
    h = jax.random.normal(jax.random.PRNGKey(2), (1, 4, D))
    out = iv(h)
    assert out.shape == h.shape
    # The clamped reconstruction contains feature 7's decoder direction.
    assert not np.allclose(np.asarray(out), np.asarray(h))


def test_steered_generation_differs(llama, sae):
    ids = np.array([[1, 5, 9, 3]])
    base = llama.generate(ids, max_new_tokens=6)
    steered = llama.generate(
        ids,
        max_new_tokens=6,
        interventions={"layers.1": clamp_features_max(sae, 3, k=100.0)},
        intervene_prefill_only=True,
    )
    assert base.shape == steered.shape == (1, 10)
    # With a huge clamp the continuation almost surely changes.
    assert not np.array_equal(np.asarray(base), np.asarray(steered))


def test_batched_steering_matches_sequential(llama, sae):
    """Features riding the batch axis of one generate call must produce the
    same continuations as the reference's one-generation-per-feature loop
    (VERDICT r1 item 4; reference launch/features/steering.py:71-78)."""
    from multimodal_sae_tpu.features.steering import SteeringController

    class Tok:
        def apply_chat_template(self, conv, add_generation_prompt=False, tokenize=False):
            return conv[0]["content"][0]["text"]

        def __call__(self, text, **kw):
            return {"input_ids": [1] + [2 + ord(c) % 100 for c in text]}

        def batch_decode(self, arr, **kw):
            return [" ".join(str(int(t)) for t in row) for row in np.asarray(arr)]

    feats = [3, 7, 11, 20, 33]

    def run(fbs):
        return SteeringController(
            sae=sae,
            module_name="layers.1",
            feature_idx=feats,
            model=llama,
            processor=Tok(),
            prompt="hello",
            k=100.0,
            max_new_tokens=6,
            feature_batch_size=fbs,
        ).run()

    sequential = run(1)
    batched = run(3)  # uneven chunks: 3 + 2
    assert sequential == batched
    assert set(sequential) == {f"layers.1_feature{i}" for i in feats}


def test_get_logit_diff():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 16)))
    ans = jnp.asarray([[3, 7], [1, 2]])
    v = get_logit_diff(logits, ans)
    expect = (
        (logits[0, -1, 3] - logits[0, -1, 7]) + (logits[1, -1, 1] - logits[1, -1, 2])
    ) / 2
    np.testing.assert_allclose(float(v), float(expect), rtol=1e-6)


def _torch_reference_attribution(llama, sae, ids, answer_ids, feature):
    """Independent torch implementation of the reference's hook-based
    attribution on the same weights (clean/corrupt splice + retain_grad)."""
    params = llama.params
    cfg = llama.cfg

    W_enc = torch.tensor(np.asarray(sae.params["W_enc"]), dtype=torch.float64)
    b_enc = torch.tensor(np.asarray(sae.params["b_enc"]), dtype=torch.float64)
    W_dec = torch.tensor(np.asarray(sae.params["W_dec"]), dtype=torch.float64)
    b_dec = torch.tensor(np.asarray(sae.params["b_dec"]), dtype=torch.float64)

    def torch_forward(h_splice_fn):
        """Recompute the jax llama in torch float64 with a splice after layer 1."""
        import torch as t

        def rms(x, w):
            var = (x.double() ** 2).mean(-1, keepdim=True)
            return x * t.rsqrt(var + cfg.rms_norm_eps) * w

        emb = t.tensor(np.asarray(params["embed_tokens"]), dtype=t.float64)
        h = emb[t.tensor(ids)]
        B, S, _ = h.shape
        pos = t.arange(S)
        inv = 1.0 / (
            cfg.rope_theta
            ** (t.arange(0, cfg.head_dim_, 2, dtype=t.float64) / cfg.head_dim_)
        )
        freqs = pos[:, None].double() * inv
        cos = t.cat([freqs, freqs], -1).cos()
        sin = t.cat([freqs, freqs], -1).sin()

        def rot(x):
            half = x.shape[-1] // 2
            return t.cat([-x[..., half:], x[..., :half]], -1)

        H, kvH, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
        mask = t.where(
            t.arange(S)[None, :] <= t.arange(S)[:, None], 0.0, -t.inf
        ).double()
        from multimodal_sae_tpu.models.llama import _layer_slice

        n_layers = (
            len(params["layers"])
            if isinstance(params["layers"], list)
            else next(iter(params["layers"].values())).shape[0]
        )
        for i in range(n_layers):
            lp = _layer_slice(params["layers"], i)
            W = {k: t.tensor(np.asarray(v), dtype=t.float64) for k, v in lp.items()}
            res = h
            x = rms(h, W["input_layernorm"])
            q = (x @ W["q_proj"]).reshape(B, S, H, hd).transpose(1, 2)
            k = (x @ W["k_proj"]).reshape(B, S, kvH, hd).transpose(1, 2)
            v = (x @ W["v_proj"]).reshape(B, S, kvH, hd).transpose(1, 2)
            q = q * cos + rot(q) * sin
            k = k * cos + rot(k) * sin
            k = k.repeat_interleave(H // kvH, dim=1)
            v = v.repeat_interleave(H // kvH, dim=1)
            att = t.softmax(q @ k.transpose(-1, -2) * hd**-0.5 + mask, dim=-1)
            h = res + (att @ v).transpose(1, 2).reshape(B, S, H * hd) @ W["o_proj"]
            res = h
            x = rms(h, W["post_attention_layernorm"])
            h = res + (
                t.nn.functional.silu(x @ W["gate_proj"]) * (x @ W["up_proj"])
            ) @ W["down_proj"]
            if i == 1:
                h = h_splice_fn(h)
        h = rms(h, t.tensor(np.asarray(params["norm"]), dtype=t.float64))
        head = params.get("lm_head")
        logits = h @ t.tensor(np.asarray(head), dtype=t.float64)
        return logits

    def splice(h, off=None):
        flat = h.reshape(-1, h.shape[-1])
        pre = t_relu((flat - b_dec) @ W_enc + b_enc)
        if off is not None:
            m = torch.ones_like(pre)
            m[:, off] = 0
            pre = pre * m
        vals, idx = pre.topk(sae.cfg.k)
        buf = torch.zeros_like(pre)
        buf.scatter_(-1, idx, vals)
        out = buf @ W_dec + b_dec
        return out.reshape(h.shape)

    t_relu = torch.relu

    clean_logits = torch_forward(lambda h: splice(h))
    clean_out = {}

    def clean_capture(h):
        out = splice(h)
        clean_out["v"] = out.detach()
        return out

    torch_forward(clean_capture)

    corrupt_store = {}

    def corrupt_capture(h):
        out = splice(h, off=feature).clone().requires_grad_(True)
        corrupt_store["v"] = out
        return out

    logits = torch_forward(corrupt_capture)
    final = logits[:, -1, :]
    ans = torch.tensor(answer_ids)
    metric = (
        final.gather(1, ans[:, 0:1]) - final.gather(1, ans[:, 1:2])
    ).mean()
    metric.backward()
    attribution = (
        (clean_out["v"] - corrupt_store["v"].detach()) * corrupt_store["v"].grad
    ).sum(-1)
    return attribution.numpy()


def test_attribution_matches_torch_reference(llama, sae):
    ids = np.array([[1, 5, 9, 3, 17]])
    answer_ids = np.array([[7, 11]])
    feature = 3

    zeros = {"layers.1": jnp.zeros((1, ids.shape[1], D))}
    sae_dict = {"layers.1": sae}

    class Wrap:
        def forward(self, batch, capture=(), interventions=None, return_logits=True):
            from multimodal_sae_tpu.models.llama import llama_forward

            return llama_forward(
                llama.params,
                llama.cfg,
                jnp.asarray(batch["input_ids"]),
                capture=capture,
                interventions=interventions,
                return_logits=return_logits,
            )

    model = Wrap()
    batch = {"input_ids": ids}

    _, clean_cache = spliced_forward_with_delta(model, batch, sae_dict, zeros)

    def corrupted_metric(deltas):
        logits, cache = spliced_forward_with_delta(
            model, batch, sae_dict, deltas, off_feature=feature
        )
        return get_logit_diff(logits, jnp.asarray(answer_ids)), cache

    (_, corrupted_cache), grads = jax.value_and_grad(
        corrupted_metric, has_aux=True
    )(zeros)
    ours = np.asarray(
        (
            (clean_cache["layers.1"] - corrupted_cache["layers.1"])
            * grads["layers.1"]
        ).sum(-1)
    )
    ref = _torch_reference_attribution(llama, sae, ids, answer_ids, feature)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-6)


def test_generate_executable_cache_reused_across_chunks(llama, sae):
    """Fresh steering chunks (new Intervention objects with new feature
    arrays) must reuse ONE cached prefill+decode executable — the steering
    fleet recompiled the whole generate program per chunk without this
    (models/llama.py _generate_fns)."""
    import jax.numpy as jnp

    from multimodal_sae_tpu.models import llama as llama_mod
    from multimodal_sae_tpu.features.steering import clamp_features_max_batched

    llama_mod._GENERATE_CACHE.clear()
    ids = jnp.ones((2, 4), jnp.int32)
    for i in range(3):
        iv = {"layers.0": clamp_features_max_batched(sae, [i, i + 1], k=5.0)}
        llama_mod.greedy_generate(
            llama.params, llama.cfg, ids, max_new_tokens=2, interventions=iv
        )
    assert len(llama_mod._GENERATE_CACHE) == 1


def test_generate_cache_eviction_is_lru(llama):
    """A cache hit must refresh recency: with the cap at 2, re-hitting the
    oldest entry then inserting a third must evict the *unused* middle entry,
    not the hot one (FIFO would recompile the hottest steering config)."""
    import jax.numpy as jnp

    from multimodal_sae_tpu.models import llama as llama_mod

    llama_mod._GENERATE_CACHE.clear()
    ids = jnp.ones((1, 4), jnp.int32)

    def gen(new):
        llama_mod.greedy_generate(
            llama.params, llama.cfg, ids, max_new_tokens=new
        )
        return next(
            k for k in reversed(llama_mod._GENERATE_CACHE) if k[1] == new
        )

    orig_cap = llama_mod._GENERATE_CACHE_CAP
    llama_mod._GENERATE_CACHE_CAP = 2
    try:
        hot = gen(2)
        gen(3)
        gen(2)  # hit: must move `hot` to most-recent
        gen(4)  # insert at cap: must evict max_new_tokens=3, not `hot`
        assert hot in llama_mod._GENERATE_CACHE
        assert all(k[1] != 3 for k in llama_mod._GENERATE_CACHE)
    finally:
        llama_mod._GENERATE_CACHE_CAP = orig_cap
        llama_mod._GENERATE_CACHE.clear()


def test_fast_attribution_oom_fallback(monkeypatch):
    """On a device RESOURCE_EXHAUSTED, fast_attribution_maps halves the
    feature batch and retries instead of dying mid-sweep (every retry at
    long shapes costs a fresh compile, so correctness of the fallback
    matters more than its frequency)."""
    import multimodal_sae_tpu.features.patching.attribution as A

    B, S, D_ = 1, 3, 4
    widths_seen = []

    def fake_build(model, hook, sae, batch, metric):
        prefix = (np.zeros((B * S, 5)), np.zeros((B * S, 5), np.int64),
                  np.zeros((B, S, D_)))

        def chunk_step(mp, sp, wv, wi, clean, feats):
            widths_seen.append(len(feats))
            if len(feats) > 2:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of HBM")
            return np.stack(
                [np.full((B, S), float(f)) for f in np.asarray(feats)]
            )

        return prefix, {"w": np.zeros(1)}, chunk_step

    monkeypatch.setattr(A, "build_fast_attribution", fake_build)

    class M:
        params = {}

    sae = Sae(D_, SaeConfig(num_latents=8, k=2), key=jax.random.PRNGKey(0))
    out = A.fast_attribution_maps(
        M(), "layers.0", sae, {"input_ids": np.zeros((B, S))}, lambda l: l,
        indices=[0, 1, 2, 3, 4], feature_batch=8, progress=False,
    )
    # 8 OOMs, 4 OOMs, then chunks of 2 succeed (padded ragged tail).
    assert widths_seen == [8, 4, 2, 2, 2]
    sal = out["layers.0"]
    assert len(sal) == 5
    assert [float(s[0, 0]) for s in sal] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_replicate_batch_aligns_list_and_array_keys():
    """_replicate_batch must repeat per-ELEMENT ([a,a,b,b]) for list values,
    matching np.repeat's axis-0 semantics for arrays — whole-list tiling
    ([a,b,a,b]) would pair row i's list values with row j's array values in
    a multi-prompt batch (review r5)."""
    import numpy as np

    from multimodal_sae_tpu.features.steering import SteeringController

    ctrl = SteeringController.__new__(SteeringController)
    ctrl.batch = {
        "ids": np.array([[1, 2], [3, 4]]),
        "sizes": [(10, 20), (30, 40)],
    }
    out = ctrl._replicate_batch(3)
    np.testing.assert_array_equal(
        out["ids"], np.repeat(np.array([[1, 2], [3, 4]]), 3, axis=0)
    )
    assert out["sizes"] == [(10, 20)] * 3 + [(30, 40)] * 3
    # Row i of every key describes the same source prompt.
    for i, row in enumerate(out["ids"][:, 0].tolist()):
        assert out["sizes"][i] == ((10, 20) if row == 1 else (30, 40))
