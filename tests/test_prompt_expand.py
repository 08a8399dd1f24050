"""Prompt expander tests (ref ``third_party/wan_prompt_expand``)."""

from fastgen_tpu.utils.prompt_expand import (
    PromptOutput,
    TemplatePromptExpander,
    make_prompt_expander,
)


def test_template_deterministic_and_content():
    ex = TemplatePromptExpander()
    a = ex("a dog surfing", seed=3)
    b = ex("a dog surfing", seed=3)
    assert isinstance(a, PromptOutput) and a.status
    assert a.prompt == b.prompt
    assert "a dog surfing" in a.prompt
    assert len(a.prompt) > len("a dog surfing") + 40
    c = ex("a dog surfing", seed=4)
    assert c.prompt != a.prompt


def test_system_prompt_routing():
    ex = TemplatePromptExpander()
    assert ex.decide_system_prompt("en", i2v=False) != \
        ex.decide_system_prompt("en", i2v=True)
    out = ex("a cat", image="fake", seed=0)
    assert out.extra.get("image_conditioned")


def test_factory_falls_back_offline():
    ex = make_prompt_expander("Qwen/definitely-not-local")
    assert isinstance(ex, TemplatePromptExpander)
    ex2 = make_prompt_expander(None)
    assert isinstance(ex2, TemplatePromptExpander)


def test_flax_qwen_expander_toy():
    """FlaxQwenPromptExpander end-to-end with an injected toy model and a
    minimal tokenizer: chat-template-free encode, left-padded prefill,
    eos cut, decode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastgen_tpu.networks.encoders.qwen25 import Qwen25TextModel
    from fastgen_tpu.utils.prompt_expand import FlaxQwenPromptExpander

    class ByteTok:
        eos_token_id = 0

        def __call__(self, text):
            return {"input_ids": [b % 89 for b in text.encode()][:48]}

        def apply_chat_template(self, messages, tokenize=False,
                                add_generation_prompt=True):
            return "\n".join(m["content"] for m in messages)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{i}" for i in ids)

    model = Qwen25TextModel(vocab_size=89, hidden=32, intermediate=48,
                            num_layers=2, num_heads=4, num_kv_heads=2,
                            head_dim=8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))
    ex = FlaxQwenPromptExpander(model=model, params=params,
                                tokenizer=ByteTok(), max_new_tokens=5,
                                pad_prompt_to=16)
    out = ex("a small dog", seed=-1)
    assert out.status and isinstance(out.prompt, str) and out.prompt
    # deterministic greedy decode
    out2 = ex("a small dog", seed=-1)
    assert out.prompt == out2.prompt
