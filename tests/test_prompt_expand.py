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
