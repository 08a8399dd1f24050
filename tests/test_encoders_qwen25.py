"""Qwen2.5 / Cosmos-Reason1 text encoder parity vs transformers.

Mirrors the reference's Cosmos Predict2 conditioning stack:
``CosmosPredict2TextEncoder`` wraps Qwen2.5-VL, mean-normalizes every layer's
hidden states and concatenates them into 100,352-dim embeddings
(``fastgen/networks/cosmos_predict2/network.py:507-690``).

Two parity axes at toy size:
* vs ``transformers.Qwen2Model`` (standard RoPE, the text-path math);
* vs ``transformers.Qwen2_5_VLTextModel`` — validates the claim that
  3-section mRoPE collapses to standard RoPE for text-only inputs, which is
  what licenses the flax module's plain-RoPE implementation.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fastgen_tpu.networks.encoders.qwen25 import (
    Qwen25TextModel,
    combine_hidden_states,
    convert_qwen25,
    mean_normalize,
)

# >60s on the single-core dev box (torch-replica / large-module builds): excluded
# from the quick tier (`make pytest`); run via `make pytest-all`.
pytestmark = pytest.mark.slow

TINY = dict(vocab_size=89, hidden=32, intermediate=48, num_layers=4,
            num_heads=4, num_kv_heads=2, head_dim=8)


def _flax_model():
    return Qwen25TextModel(**TINY)


def _torch_qwen2():
    import torch
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2Model

    cfg = Qwen2Config(
        vocab_size=89, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=1_000_000.0, attention_bias=True,
        attn_implementation="eager", use_sliding_window=False)
    torch.manual_seed(0)
    return Qwen2Model(cfg).eval()


class TestQwen25Parity:
    def test_all_hidden_states_vs_qwen2(self):
        import torch

        tm = _torch_qwen2()
        fm = _flax_model()
        params = convert_qwen25({k: v.numpy() for k, v in tm.state_dict().items()})
        rs = np.random.RandomState(0)
        ids = rs.randint(2, 89, (2, 12)).astype(np.int32)
        with torch.no_grad():
            out = tm(input_ids=torch.tensor(ids.astype(np.int64)),
                     output_hidden_states=True)
        last, hs = fm.apply(params, jnp.asarray(ids))
        assert len(hs) == len(out.hidden_states)
        for i, (a, b) in enumerate(zip(hs, out.hidden_states)):
            d = np.abs(np.asarray(a) - b.numpy())
            assert d.max() < 2e-4, (i, d.max())
        d_last = np.abs(np.asarray(last) - out.last_hidden_state.numpy())
        assert d_last.max() < 2e-4

    def test_mrope_collapses_for_text(self):
        """Qwen2.5-VL's 3-section mRoPE equals standard RoPE on text-only
        input — the flax module relies on this (ref loads
        Qwen2_5_VLForConditionalGeneration, ``network.py:571-578``)."""
        import torch
        from transformers.models.qwen2_5_vl import (Qwen2_5_VLTextConfig,
                                                    Qwen2_5_VLTextModel)

        cfg = Qwen2_5_VLTextConfig(
            vocab_size=89, hidden_size=32, intermediate_size=48,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, rope_theta=1_000_000.0, rms_norm_eps=1e-6,
            rope_scaling={"rope_type": "default", "mrope_section": [1, 1, 2]},
            attn_implementation="eager", use_sliding_window=False)
        torch.manual_seed(1)
        tm = Qwen2_5_VLTextModel(cfg).eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        fm = _flax_model()
        params = convert_qwen25(sd)
        rs = np.random.RandomState(1)
        ids = rs.randint(2, 89, (1, 10)).astype(np.int32)
        with torch.no_grad():
            out = tm(input_ids=torch.tensor(ids.astype(np.int64)),
                     output_hidden_states=True)
        last, _ = fm.apply(params, jnp.asarray(ids))
        d = np.abs(np.asarray(last) - out.last_hidden_state.numpy())
        assert d.max() < 2e-4, d.max()

    def test_attention_mask_blocks_pads(self):
        fm = _flax_model()
        tm = _torch_qwen2()
        params = convert_qwen25({k: v.numpy() for k, v in tm.state_dict().items()})
        rs = np.random.RandomState(2)
        ids = rs.randint(2, 89, (1, 8)).astype(np.int32)
        mask = np.ones((1, 8), np.int32)
        mask[0, 6:] = 0
        full, _ = fm.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        ids2 = ids.copy()
        ids2[0, 6:] = 1  # different pad content must not change valid tokens
        full2, _ = fm.apply(params, jnp.asarray(ids2), jnp.asarray(mask))
        assert np.allclose(np.asarray(full)[:, :6], np.asarray(full2)[:, :6],
                           atol=1e-5)


class TestCosmosEmbeddingAssembly:
    def _torch_reference_combine(self, hidden_states, strategy, n_group=2):
        """Reference-exact mean_normalize + combine
        (``network.py:594-596, 645-662``)."""
        import torch

        hs = [torch.tensor(np.asarray(h, np.float32)) for h in hidden_states]
        normed = [(h - h.mean(dim=-1, keepdim=True))
                  / (h.std(dim=-1, keepdim=True) + 1e-8) for h in hs[1:]]
        if strategy == "full_concat":
            return torch.cat(normed, dim=-1).numpy()
        if strategy == "mean_pooling":
            return torch.stack(normed).mean(dim=0).numpy()
        pooled = []
        for i in range(0, len(normed), n_group):
            pooled.append(torch.stack(normed[i:i + n_group]).mean(dim=0))
        return torch.cat(pooled, dim=-1).numpy()

    @pytest.mark.parametrize("strategy", ["full_concat", "mean_pooling",
                                          "pool_every_n_layers_and_concat"])
    def test_combine_matches_torch(self, strategy):
        rs = np.random.RandomState(0)
        hs = [rs.randn(2, 5, 16).astype(np.float32) for _ in range(5)]
        ours = np.asarray(combine_hidden_states(
            [jnp.asarray(h) for h in hs], strategy, n_layers_per_group=2))
        ref = self._torch_reference_combine(hs, strategy, 2)
        assert ours.shape == ref.shape
        assert np.abs(ours - ref).max() < 1e-5

    def test_mean_normalize_unbiased_std(self):
        rs = np.random.RandomState(3)
        x = rs.randn(3, 4, 33).astype(np.float32)
        import torch

        t = torch.tensor(x)
        ref = ((t - t.mean(dim=-1, keepdim=True))
               / (t.std(dim=-1, keepdim=True) + 1e-8)).numpy()
        ours = np.asarray(mean_normalize(jnp.asarray(x)))
        assert np.abs(ours - ref).max() < 1e-5


class TestCosmosTextEncoderWrapper:
    def test_encode_shapes_and_dit_wiring(self):
        """HashTokenizer smoke path: encoder output feeds the Cosmos DiT's
        crossattn_proj input contract (raw-embedding conditioning,
        ``fastgen_tpu/networks/cosmos/network.py``)."""
        from fastgen_tpu.networks.encoders.wrappers import CosmosTextEncoder

        enc = CosmosTextEncoder(max_length=16, allow_hash_tokenizer=True,
                                dtype=jnp.float32, **TINY)
        assert enc.embedding_dim == TINY["num_layers"] * TINY["hidden"]
        emb = enc.encode(["a red cube", "two birds"])
        assert emb.shape == (2, 16, enc.embedding_dim)
        assert np.isfinite(np.asarray(emb)).all()

    def test_mean_pooling_dim(self):
        from fastgen_tpu.networks.encoders.wrappers import CosmosTextEncoder

        enc = CosmosTextEncoder(max_length=8, allow_hash_tokenizer=True,
                                embedding_concat_strategy="mean_pooling",
                                dtype=jnp.float32, **TINY)
        emb = enc.encode(["x"])
        assert emb.shape == (1, 8, TINY["hidden"])


class TestGenerate:
    """KV-cached lax.scan generation (``qwen25.generate``)."""

    def test_cache_decode_matches_full_forward(self):
        """Greedy tokens from the cached scan decode must equal a naive
        full-recompute argmax loop — validates the fixed-shape KV cache,
        the traced start_pos RoPE, and the prefill/decode split."""
        import jax
        import jax.numpy as jnp

        from fastgen_tpu.networks.encoders.qwen25 import generate, lm_logits

        fm = _flax_model()
        rs = np.random.RandomState(1)
        ids = rs.randint(2, 89, (2, 7)).astype(np.int32)
        params = fm.init(jax.random.PRNGKey(0), jnp.asarray(ids))

        n_new = 6
        toks = np.asarray(generate(fm, params, ids, n_new))

        cur = ids
        naive = []
        for _ in range(n_new):
            h, _ = fm.apply(params, jnp.asarray(cur))
            nxt = np.asarray(
                jnp.argmax(lm_logits(fm, params, h[:, -1]), axis=-1),
                np.int32)
            naive.append(nxt)
            cur = np.concatenate([cur, nxt[:, None]], axis=1)
        np.testing.assert_array_equal(toks, np.stack(naive, axis=1))

    def test_generate_matches_torch_generate(self):
        """Greedy decode parity vs ``transformers`` ``generate`` on converted
        weights with the untied lm_head (``convert_qwen25(keep_lm_head=True)``)."""
        import torch
        from transformers import Qwen2Config
        from transformers.models.qwen2 import Qwen2ForCausalLM

        from fastgen_tpu.networks.encoders.qwen25 import generate

        cfg = Qwen2Config(
            vocab_size=89, hidden_size=32, intermediate_size=48,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, rope_theta=1_000_000.0, attention_bias=True,
            attn_implementation="eager", use_sliding_window=False,
            tie_word_embeddings=False)
        torch.manual_seed(0)
        tm = Qwen2ForCausalLM(cfg).eval()
        params = convert_qwen25(
            {k: v.numpy() for k, v in tm.state_dict().items()},
            keep_lm_head=True)
        assert "lm_head" in params["params"]

        fm = _flax_model()
        rs = np.random.RandomState(2)
        ids = rs.randint(2, 89, (1, 9)).astype(np.int32)
        n_new = 8
        with torch.no_grad():
            ref = tm.generate(torch.tensor(ids.astype(np.int64)),
                              max_new_tokens=n_new, do_sample=False,
                              use_cache=True)[0, ids.shape[1]:].numpy()
        toks = np.asarray(generate(fm, params, ids, n_new))[0]
        np.testing.assert_array_equal(toks, ref.astype(np.int32))
