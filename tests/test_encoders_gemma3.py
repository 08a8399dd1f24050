"""Gemma3 text encoder parity vs transformers + LTX-2 caption packing.

Mirrors the reference's conditioning stack: ``LTX2TextEncoder`` wraps a
Gemma3 LM, stacks ALL hidden states and masked-normalizes them into caption
features (``fastgen/networks/LTX2/network.py:85-114, 314-377``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fastgen_tpu.networks.encoders.gemma3 import (
    Gemma3TextModel,
    convert_gemma3,
    pack_text_embeds,
)

# >60s on the single-core dev box (torch-replica / large-module builds): excluded
# from the quick tier (`make pytest`); run via `make pytest-all`.
pytestmark = pytest.mark.slow


def _tiny_pair(sliding_window=4, pattern=2, factor=1.0):
    import torch
    from transformers import Gemma3TextConfig
    from transformers.models.gemma3 import Gemma3TextModel as TorchGemma3

    cfg = Gemma3TextConfig(
        vocab_size=89, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16,
        sliding_window=sliding_window, sliding_window_pattern=pattern,
        layer_types=["sliding_attention" if (i + 1) % pattern else
                     "full_attention" for i in range(4)],
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        rope_scaling=({"rope_type": "linear", "factor": factor}
                      if factor != 1.0 else None),
        attn_implementation="eager")
    torch.manual_seed(0)
    tm = TorchGemma3(cfg).eval()
    fm = Gemma3TextModel(
        vocab_size=89, hidden=32, intermediate=48, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=16, query_pre_attn_scalar=16.0,
        sliding_window=sliding_window, sliding_window_pattern=pattern,
        rope_linear_factor=factor)
    params = convert_gemma3({k: v.numpy() for k, v in tm.state_dict().items()})
    return tm, fm, params


class TestGemma3Parity:
    @pytest.mark.parametrize("factor", [1.0, 8.0])
    def test_all_hidden_states(self, factor):
        import torch

        tm, fm, params = _tiny_pair(factor=factor)
        rs = np.random.RandomState(0)
        ids = rs.randint(2, 89, (2, 10)).astype(np.int32)
        # left padding (the LTX2 tokenizer contract)
        mask = np.ones((2, 10), np.int32)
        mask[0, :3] = 0
        ids[0, :3] = 0
        with torch.no_grad():
            out = tm(input_ids=torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64)),
                     output_hidden_states=True)
        last, hs = fm.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        assert len(hs) == len(out.hidden_states)
        for i, (a, b) in enumerate(zip(hs, out.hidden_states)):
            # padded rows diverge (torch keeps pad garbage); compare valid only
            d = np.abs(np.asarray(a) - b.numpy())[:, 3:]
            assert d.max() < 2e-4, (i, d.max())
        d_last = np.abs(np.asarray(last) - out.last_hidden_state.numpy())[:, 3:]
        assert d_last.max() < 2e-4

    def test_sliding_vs_full_differ(self):
        """The sliding-window mask must actually bind (long-range key blocked
        in local layers)."""
        _, fm, params = _tiny_pair(sliding_window=2)
        ids = jnp.asarray(np.arange(2, 14)[None].astype(np.int32))
        full = Gemma3TextModel(
            vocab_size=89, hidden=32, intermediate=48, num_layers=4,
            num_heads=4, num_kv_heads=2, head_dim=16,
            query_pre_attn_scalar=16.0, sliding_window=4096,
            sliding_window_pattern=2)
        a, _ = fm.apply(params, ids)
        b, _ = full.apply(params, ids)
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestPackTextEmbeds:
    def _torch_reference(self, hs, seq_len, scale_factor=8.0, eps=1e-6):
        """Transliteration of ref ``network.py:85-114`` for the parity check."""
        import torch

        x = torch.tensor(hs)  # [B, T, H, L]
        B, T, H, L = x.shape
        tok = torch.arange(T)[None]
        start = T - torch.tensor(seq_len)[:, None]
        mask = (tok >= start)[:, :, None, None]
        masked = x.masked_fill(~mask, 0.0)
        num_valid = (torch.tensor(seq_len) * H).view(B, 1, 1, 1)
        mean = masked.sum(dim=(1, 2), keepdim=True) / (num_valid + eps)
        x_min = x.masked_fill(~mask, float("inf")).amin(dim=(1, 2), keepdim=True)
        x_max = x.masked_fill(~mask, float("-inf")).amax(dim=(1, 2), keepdim=True)
        normed = (x - mean) / (x_max - x_min + eps) * scale_factor
        normed = normed.flatten(2)
        mask_flat = mask.squeeze(-1).expand(-1, -1, H * L)
        return normed.masked_fill(~mask_flat, 0.0).numpy()

    def test_parity(self):
        rs = np.random.RandomState(1)
        B, T, H, L = 2, 8, 6, 3
        hs_list = [rs.randn(B, T, H).astype(np.float32) for _ in range(L)]
        mask = np.ones((B, T), np.int32)
        mask[0, :2] = 0
        seq_len = mask.sum(-1)
        got = pack_text_embeds([jnp.asarray(h) for h in hs_list],
                               jnp.asarray(mask))
        want = self._torch_reference(np.stack(hs_list, -1), seq_len)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_shapes_and_pad_zeroed(self):
        rs = np.random.RandomState(2)
        hs = [jnp.asarray(rs.randn(1, 5, 4).astype(np.float32))
              for _ in range(2)]
        mask = jnp.asarray(np.array([[0, 0, 1, 1, 1]], np.int32))
        out = pack_text_embeds(hs, mask)
        assert out.shape == (1, 5, 8)
        assert np.abs(np.asarray(out)[0, :2]).max() == 0.0


class TestGemma3TextEncoderWrapper:
    def test_encode_caption_features(self):
        """encode() returns [B, max_length, hidden*(layers+1)] caption
        features with finite values (LTX-2 conditioning width contract)."""
        from fastgen_tpu.networks.encoders.wrappers import Gemma3TextEncoder

        enc = Gemma3TextEncoder(
            vocab_size=89, hidden=16, intermediate=24, num_layers=2,
            num_heads=2, num_kv_heads=1, head_dim=8,
            query_pre_attn_scalar=8.0, max_length=6, dtype="float32")
        out = enc.encode(["a cat", "a much longer prompt about a dog"])
        assert out.shape == (2, 6, 16 * 3)
        assert bool(jnp.isfinite(out).all())
        # same prompt twice -> identical features (deterministic hash tokenizer)
        again = enc.encode(["a cat", "a much longer prompt about a dog"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(again))
