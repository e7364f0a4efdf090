"""Conversation prompt templates + interactive chat helper.

Capability parity with the reference's conversation module
(ref ``graphs/models/minigpt4/conversation/conversation.py:23-232``):
the ``Conversation`` prompt builder with SINGLE/TWO separator styles,
the three vision templates (Vicuna0 / LLama2 / minigptv2 — the eval
agent uses minigptv2 with a blanked system prompt, ref
``minigpt4_eval_agent.py:80-81``), and a ``Chat`` helper driving the
jit-compiled decode instead of HF generate + CUDA streams. Stop-token
handling lives inside the compiled decode loop (EOS masking in
``models/minigpt4.generate``), so no StoppingCriteria class is needed.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, List, Optional, Tuple

import jax
import numpy as np


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int = 2
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.SINGLE:
            out = self.system + self.sep
            for role, message in self.messages:
                out += role + message + self.sep if message else role
            return out
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2 or ""]
            out = self.system + seps[0]
            for i, (role, message) in enumerate(self.messages):
                out += role + message + seps[i % 2] if message else role
            return out
        raise ValueError(f"Invalid separator style: {self.sep_style}")

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
        )


CONV_VISION_Vicuna0 = Conversation(
    system=(
        "Give the following image: <Img>ImageContent</Img>. "
        "You will be able to see the image once I provide it to you. "
        "Please answer my questions."
    ),
    roles=("Human: ", "Assistant: "),
    messages=[],
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
)

CONV_VISION_LLama2 = Conversation(
    system=(
        "Give the following image: <Img>ImageContent</Img>. "
        "You will be able to see the image once I provide it to you. "
        "Please answer my questions."
    ),
    roles=("<s>[INST] ", " [/INST] "),
    messages=[],
    sep_style=SeparatorStyle.SINGLE,
    sep="",
)

CONV_VISION_minigptv2 = Conversation(
    system="",
    roles=("<s>[INST] ", " [/INST]"),
    messages=[],
    sep_style=SeparatorStyle.SINGLE,
    sep="",
)

TEMPLATES = {
    "vicuna0": CONV_VISION_Vicuna0,
    "llama2": CONV_VISION_LLama2,
    "minigptv2": CONV_VISION_minigptv2,
}


def wrap_instruction(instruction: str, template: Optional[str]) -> str:
    """Wrap a bare instruction in a conversation template with a blanked
    system prompt — the serving-time prompt convention shared by the
    eval AND certify agents (ref ``minigpt4_eval_agent.py:80-81,96``:
    ``CONV_VISION_minigptv2`` with ``conv.system = ""``). One helper so
    the two agents can never drift apart and invalidate cross-agent
    comparisons. ``template`` falsy -> the instruction passes through."""
    if not template:
        return instruction
    conv = TEMPLATES[str(template)].copy()
    conv.system = ""
    conv.append_message(conv.roles[0], instruction)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


class Chat:
    """Minimal interactive helper over the compiled generate path
    (the reference's ``Chat`` ask/answer surface, CUDA-free)."""

    def __init__(self, model, vis_processor, template: str = "minigptv2"):
        self.model = model
        self.vis_processor = vis_processor
        self.conv = TEMPLATES[template].copy()
        self.image: Optional[np.ndarray] = None

    def upload_img(self, image) -> None:
        if self.image is not None:
            # the single-image pipeline splits the prompt on the FIRST
            # <ImageHere> only (data/text.py::_split_instruction) — a
            # second placeholder turn would silently put the new image in
            # the old turn's slot and feed the new marker as literal text
            raise RuntimeError(
                "a conversation holds one image; call reset() to start a "
                "new one"
            )
        self.image = np.asarray(self.vis_processor(image), np.float32)
        self.conv.append_message(self.conv.roles[0], "<Img><ImageHere></Img>")

    def reset(self) -> None:
        """Start a fresh conversation (new image allowed)."""
        self.conv = self.conv.copy()
        self.conv.messages = []
        self.image = None

    def ask(self, text: str) -> None:
        if (
            self.conv.messages
            and self.conv.messages[-1][0] == self.conv.roles[0]
            and self.conv.messages[-1][1]
            and "</Img>" in self.conv.messages[-1][1]
        ):
            # merge the question into the image turn (reference behavior)
            self.conv.messages[-1][1] = self.conv.messages[-1][1] + " " + text
        else:
            self.conv.append_message(self.conv.roles[0], text)

    def answer(
        self,
        max_new_tokens: int = 20,
        seq_len: int = 160,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: float = 0.9,
        seed: int = 0,
    ) -> str:
        if self.image is None:
            raise RuntimeError("upload_img must be called before answer")
        import jax.numpy as jnp

        from certifiedgpt_tpu.data.loader import shard_batch
        from certifiedgpt_tpu.data.text import BatchSpec, build_gen_batch
        from certifiedgpt_tpu.models.minigpt4 import generate

        self.conv.append_message(self.conv.roles[1], None)
        prompt = self.conv.get_prompt()
        spec = BatchSpec(
            seq_len=seq_len, num_img_tokens=self.model.cfg.num_img_tokens
        )
        batch = shard_batch(
            build_gen_batch(self.model.tokenizer, [prompt], spec), None
        )
        batch["image"] = jnp.asarray(self.image)[None]
        tokens = np.asarray(
            generate(
                self.model.params,
                self.model.cfg,
                batch,
                max_new_tokens,
                self.model.tokenizer.eos_token_id,
                self.model.tokenizer.pad_token_id,
                do_sample=do_sample,
                temperature=temperature,
                top_p=top_p,
                rng=jax.random.PRNGKey(seed),
            )
        )[0]
        # strip role/special markers but PRESERVE case (the reference
        # Chat stores the decoded text verbatim in the history, ref
        # ``conversation.py:185-194``) — ``clean_answer`` is the
        # eval-scorer cleanup and lowercases, which would corrupt the
        # next turn's context ("Paris" -> "paris")
        from certifiedgpt_tpu.data.text import (
            decode_until_eos,
            strip_generation_markers,
        )

        text = strip_generation_markers(
            decode_until_eos(self.model.tokenizer, tokens)
        )
        self.conv.messages[-1][1] = text
        return text

    def stream_answer(
        self,
        max_new_tokens: int = 20,
        seq_len: int = 160,
        seed: int = 0,
    ):
        """Yield the answer incrementally, one decoded token at a time
        (the reference Chat's streaming surface, ref
        ``conversation.py:139-232``, without CUDA threads: each step is
        one compiled single-token decode over the persistent KV cache)."""
        if self.image is None:
            raise RuntimeError("upload_img must be called before stream_answer")
        import jax.numpy as jnp

        from certifiedgpt_tpu.data.loader import shard_batch
        from certifiedgpt_tpu.data.text import BatchSpec, build_gen_batch
        from certifiedgpt_tpu.models.llama import (
            embed_tokens,
            init_kv_cache,
            llama_apply,
            lm_head_logits,
        )
        from certifiedgpt_tpu.models.minigpt4 import assemble_embeds, encode_img

        self.conv.append_message(self.conv.roles[1], None)
        prompt = self.conv.get_prompt()
        spec = BatchSpec(
            seq_len=seq_len, num_img_tokens=self.model.cfg.num_img_tokens
        )
        batch = shard_batch(
            build_gen_batch(self.model.tokenizer, [prompt], spec), None
        )
        params, cfg = self.model.params, self.model.cfg
        img = encode_img(params, cfg, jnp.asarray(self.image)[None])
        embeds = assemble_embeds(
            params, cfg, batch["input_ids"], img, batch["img_pos"]
        )
        s = embeds.shape[1]
        total = s + max_new_tokens
        mask = batch["attention_mask"].astype(jnp.int32)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0).astype(jnp.int32)
        cache = init_kv_cache(cfg.llama, 1, total)
        cache_mask = jnp.concatenate(
            [mask, jnp.ones((1, max_new_tokens), jnp.int32)], axis=1
        )
        # prefill needs only the LAST position's logits — skip the
        # [1, S, vocab] lm_head over the whole prompt (generate() does
        # the same, models/minigpt4.py)
        _, hidden, cache = llama_apply(
            params["llama"], cfg.llama, embeds, cache_mask, positions,
            kv_cache=cache, cache_offset=jnp.int32(0), compute_logits=False,
        )
        token = int(jnp.argmax(lm_head_logits(params["llama"], hidden[0, -1])))
        eos = self.model.tokenizer.eos_token_id
        ids: list = []
        emitted = ""
        self.conv.messages[-1][1] = ""  # immediate-EOS answers are empty
        next_pos = int(jnp.sum(mask))
        for t in range(max_new_tokens):
            if token == eos:
                break
            # decode the GROWING id list and yield the delta: decoding
            # each id in isolation drops SentencePiece leading-space
            # markers ("▁a ▁red ▁car" would stream as "aredcar"), and
            # updating history inside the loop keeps the turn correct
            # even if the consumer stops iterating early
            ids.append(token)
            text = self.model.tokenizer.decode(ids, skip_special_tokens=True)
            piece, emitted = text[len(emitted):], text
            self.conv.messages[-1][1] = text.strip()
            yield piece
            if t == max_new_tokens - 1:
                break  # budget spent — don't pay a decode step we discard
            tok_embed = embed_tokens(params["llama"], jnp.asarray([[token]]))
            logits, _, cache = llama_apply(
                params["llama"], cfg.llama, tok_embed, cache_mask,
                jnp.asarray([[next_pos + t]], jnp.int32),
                kv_cache=cache, cache_offset=jnp.int32(s + t),
            )
            token = int(jnp.argmax(logits[0, -1]))
