"""Prompt expansion for video generation
(ref ``fastgen/third_party/wan_prompt_expand/prompt_expand.py``).

Short user prompts are rewritten into the detailed, shot-described prompts
Wan-style models were trained on. The reference runs a Qwen2.5(-VL) LLM with
task-specific system prompts (``prompt_expand.py:141-209``); here:

* ``QwenPromptExpander`` — same contract over a *local* HF causal LM
  (zero-egress: the model must already be on disk);
* ``TemplatePromptExpander`` — deterministic offline fallback that applies
  the same prompt-engineering rules (shot language, motion, lighting,
  style qualifiers) without a model, so ``--prompt_expand`` always works.

Both expose ``__call__(prompt, system_prompt=None, tar_lang="en", seed=-1,
image=None) -> PromptOutput`` like the reference.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from fastgen_tpu.utils import logging_utils as logger

# Written for this project (the reference ships Chinese/English Qwen system
# prompts, ``prompt_expand.py:25-139``; these cover the same tasks).
SYSTEM_PROMPT_TYPES: Dict[str, str] = {
    "t2v_en": (
        "You rewrite a short video idea into one detailed English prompt for "
        "a text-to-video model. Describe the subject, its motion, the camera "
        "shot and movement, the environment, lighting, and visual style in "
        "80-120 words. Keep every fact from the input; never add text "
        "overlays or subtitles; output only the rewritten prompt."),
    "t2v_zh": (
        "Rewrite the short video idea into one detailed Chinese prompt for a "
        "text-to-video model, covering subject, motion, camera work, scene, "
        "lighting and style in about 100 characters. Output only the prompt."),
    "i2v_en": (
        "You are given a reference image and a short instruction. Rewrite the "
        "instruction into one detailed English prompt describing how the "
        "image should animate: subject motion, camera movement, tempo, and "
        "atmosphere, consistent with the image content. Output only the "
        "prompt."),
    "i2v_zh": (
        "Given a reference image and a short instruction, write one detailed "
        "Chinese prompt describing how the image should animate. Output only "
        "the prompt."),
}


@dataclass
class PromptOutput:
    """Result record (ref ``prompt_expand.py:152-160``)."""

    status: bool
    prompt: str
    seed: int
    system_prompt: str
    message: str = ""
    extra: Dict[str, Any] = field(default_factory=dict)

    def add_custom_field(self, key: str, value) -> None:
        self.extra[key] = value


class PromptExpander:
    """Interface (ref ``prompt_expand.py:163-209``)."""

    def __init__(self, model_name: Optional[str] = None, is_vl: bool = False,
                 **kwargs):
        self.model_name = model_name
        self.is_vl = is_vl

    def decide_system_prompt(self, tar_lang: str = "en",
                             i2v: bool = False) -> str:
        task = f"{'i2v' if (i2v or self.is_vl) else 't2v'}_{tar_lang}"
        return SYSTEM_PROMPT_TYPES[task]

    def extend(self, prompt: str, system_prompt: str, seed: int = -1,
               **kwargs) -> PromptOutput:
        raise NotImplementedError

    def extend_with_img(self, prompt: str, system_prompt: str, image=None,
                        seed: int = -1, **kwargs) -> PromptOutput:
        raise NotImplementedError

    def __call__(self, prompt: str, system_prompt: Optional[str] = None,
                 tar_lang: str = "en", image=None, seed: int = -1,
                 **kwargs) -> PromptOutput:
        if system_prompt is None:
            system_prompt = self.decide_system_prompt(
                tar_lang=tar_lang, i2v=image is not None)
        if image is not None:
            return self.extend_with_img(prompt, system_prompt, image=image,
                                        seed=seed, **kwargs)
        return self.extend(prompt, system_prompt, seed=seed, **kwargs)


class TemplatePromptExpander(PromptExpander):
    """Deterministic offline expansion: enrich the prompt with seeded picks
    of shot / motion / lighting / style language. No model required."""

    SHOTS = ("a slow dolly-in shot", "a sweeping aerial shot",
             "a steady medium shot", "a handheld tracking shot",
             "a low-angle wide shot")
    MOTION = ("moving smoothly through the frame",
              "with gentle, continuous motion",
              "in dynamic, fluid motion",
              "unfolding in unhurried detail")
    LIGHT = ("bathed in soft golden-hour light", "under crisp daylight",
             "lit by moody, diffuse overcast light",
             "glowing with warm practical lights")
    STYLE = ("cinematic color grading, shallow depth of field, high detail",
             "photorealistic, rich texture, natural color",
             "filmic contrast, fine grain, vivid detail")

    def extend(self, prompt: str, system_prompt: str, seed: int = -1,
               **kwargs) -> PromptOutput:
        rng = random.Random(seed if seed >= 0 else 0)
        body = prompt.strip().rstrip(".")
        expanded = (f"{self.SHOTS[rng.randrange(len(self.SHOTS))]} of {body}, "
                    f"{self.MOTION[rng.randrange(len(self.MOTION))]}, "
                    f"{self.LIGHT[rng.randrange(len(self.LIGHT))]}; "
                    f"{self.STYLE[rng.randrange(len(self.STYLE))]}.")
        return PromptOutput(status=True, prompt=expanded,
                            seed=seed if seed >= 0 else 0,
                            system_prompt=system_prompt)

    def extend_with_img(self, prompt, system_prompt, image=None, seed=-1,
                        **kwargs) -> PromptOutput:
        out = self.extend(prompt, system_prompt, seed=seed)
        out.add_custom_field("image_conditioned", True)
        return out


class QwenPromptExpander(PromptExpander):
    """Local HF causal-LM expander (ref ``prompt_expand.py:212-330``).

    Loads with ``local_files_only`` — in a zero-egress environment the model
    directory must already exist. Use :class:`TemplatePromptExpander` as the
    fallback (``make_prompt_expander`` does this automatically).
    """

    def __init__(self, model_name: str = "Qwen/Qwen2.5-3B-Instruct",
                 is_vl: bool = False, max_new_tokens: int = 256, **kwargs):
        super().__init__(model_name, is_vl=is_vl)
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name,
                                                       local_files_only=True)
        self.model = AutoModelForCausalLM.from_pretrained(model_name,
                                                          local_files_only=True)
        self.model.eval()
        self.max_new_tokens = max_new_tokens

    def extend(self, prompt, system_prompt, seed=-1, **kwargs) -> PromptOutput:
        import torch

        messages = [{"role": "system", "content": system_prompt},
                    {"role": "user", "content": prompt}]
        text = self.tokenizer.apply_chat_template(messages, tokenize=False,
                                                  add_generation_prompt=True)
        inputs = self.tokenizer([text], return_tensors="pt")
        if seed >= 0:
            torch.manual_seed(seed)
        with torch.no_grad():
            out_ids = self.model.generate(**inputs,
                                          max_new_tokens=self.max_new_tokens,
                                          do_sample=seed >= 0)
        new_tokens = out_ids[0][inputs["input_ids"].shape[1]:]
        expanded = self.tokenizer.decode(new_tokens,
                                         skip_special_tokens=True).strip()
        return PromptOutput(status=True, prompt=expanded or prompt,
                            seed=max(seed, 0), system_prompt=system_prompt)

    extend_with_img = extend  # VL variant needs a local Qwen-VL; same contract


class FlaxQwenPromptExpander(PromptExpander):
    """In-framework Qwen2.5 rewriter: the flax :class:`Qwen25TextModel`
    decoder (``networks/encoders/qwen25.py``) with its KV-cached
    ``lax.scan`` generation loop — no torch in the loop; the decode runs as
    one compiled XLA program per (prompt_len, max_new_tokens) shape.

    ``model_name`` points at a local transformers checkpoint directory
    (weights via ``convert_qwen25(..., keep_lm_head=True)``, tokenizer via
    ``AutoTokenizer(local_files_only=True)``). Tests drive the same path at
    toy size by passing ``model=``/``params=``/``tokenizer=`` directly.
    """

    def __init__(self, model_name: Optional[str] = None, is_vl: bool = False,
                 max_new_tokens: int = 256, model=None, params=None,
                 tokenizer=None, pad_prompt_to: int = 64, **kwargs):
        super().__init__(model_name, is_vl=is_vl)
        self.max_new_tokens = max_new_tokens
        self.pad_prompt_to = pad_prompt_to
        if model is not None:
            self.model, self.params, self.tokenizer = model, params, tokenizer
            return
        import glob
        import json
        import os

        from transformers import AutoTokenizer

        from fastgen_tpu.networks.encoders.qwen25 import (Qwen25TextModel,
                                                          convert_qwen25)

        self.tokenizer = AutoTokenizer.from_pretrained(model_name,
                                                       local_files_only=True)
        with open(os.path.join(model_name, "config.json")) as f:
            cfg = json.load(f)
        sd = {}
        shards = sorted(glob.glob(os.path.join(model_name, "*.safetensors")))
        if shards:
            from safetensors.numpy import load_file

            for s in shards:
                sd.update(load_file(s))
        else:
            import torch

            for s in sorted(glob.glob(os.path.join(model_name,
                                                   "pytorch_model*.bin"))):
                sd.update({k: v.numpy() for k, v in
                           torch.load(s, map_location="cpu").items()})
        self.model = Qwen25TextModel(
            vocab_size=cfg.get("vocab_size", 152064),
            hidden=cfg.get("hidden_size", 3584),
            intermediate=cfg.get("intermediate_size", 18944),
            num_layers=cfg.get("num_hidden_layers", 28),
            num_heads=cfg.get("num_attention_heads", 28),
            num_kv_heads=cfg.get("num_key_value_heads", 4),
            rope_theta=cfg.get("rope_theta", 1e6))
        self.params = convert_qwen25(sd, keep_lm_head=True)

    def _encode(self, system_prompt: str, prompt: str):
        if hasattr(self.tokenizer, "apply_chat_template"):
            text = self.tokenizer.apply_chat_template(
                [{"role": "system", "content": system_prompt},
                 {"role": "user", "content": prompt}],
                tokenize=False, add_generation_prompt=True)
            return self.tokenizer(text)["input_ids"], self.tokenizer.eos_token_id
        return self.tokenizer(f"{system_prompt}\n{prompt}"), None

    def extend(self, prompt, system_prompt, seed=-1, **kwargs) -> PromptOutput:
        import numpy as np
        import jax

        from fastgen_tpu.networks.encoders.qwen25 import generate

        ids, eos_id = self._encode(system_prompt, prompt)
        # pad the prompt length up to a bucket so repeat calls reuse the
        # compiled prefill instead of re-jitting per prompt length
        plen = max(self.pad_prompt_to,
                   -(-len(ids) // self.pad_prompt_to) * self.pad_prompt_to)
        pad_id = eos_id if eos_id is not None else 0
        padded = np.full((1, plen), pad_id, np.int32)
        padded[0, plen - len(ids):] = ids     # left-pad: generation continues
        toks = np.asarray(generate(
            self.model, self.params, padded, self.max_new_tokens,
            temperature=0.7 if seed >= 0 else 0.0,
            key=jax.random.PRNGKey(max(seed, 0)), eos_id=eos_id))[0]
        if eos_id is not None:
            cut = np.nonzero(toks == eos_id)[0]
            toks = toks[:cut[0]] if cut.size else toks
        if hasattr(self.tokenizer, "decode"):
            expanded = self.tokenizer.decode(toks.tolist(),
                                             skip_special_tokens=True).strip()
        else:
            expanded = " ".join(str(t) for t in toks.tolist())
        return PromptOutput(status=True, prompt=expanded or prompt,
                            seed=max(seed, 0), system_prompt=system_prompt)

    extend_with_img = extend


def make_prompt_expander(model_name: Optional[str] = None, backend: str = "flax",
                         **kwargs) -> PromptExpander:
    """Qwen if a local model is available (flax in-framework decode by
    default, ``backend="torch"`` for the HF generate path), else the
    template expander."""
    if model_name:
        cls = FlaxQwenPromptExpander if backend == "flax" else QwenPromptExpander
        try:
            return cls(model_name, **kwargs)
        except Exception as e:  # noqa: BLE001 - offline fallback
            logger.warning(f"Qwen prompt expander unavailable ({e}); "
                           "falling back to TemplatePromptExpander")
    return TemplatePromptExpander(**kwargs)
