"""Chat-template construction + tokenization into static-shape LanguageLabels.

Behavioral counterpart of reference `get_custom_chat_template` +
`get_chat_tokens` (simlingo_training/utils/internvl2_utils.py:29-175): the
internlm2-chat template with the system prompt stripped, `<image>` expanded
to `<img>` + N x `<IMG_CONTEXT>` + `</img>`, assistant-only loss masking.

TPU improvement: since we construct the template string ourselves, the
assistant span is computed *structurally* (no token-subsequence search),
and padding side is an argument (right for training, left for inference --
see core/structs.py for why each layout is used).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from simlingo_tpu.core.structs import LanguageLabel
from simlingo_tpu.data.tokenizer import (IM_END, IM_START, IMG_CONTEXT_TOKEN,
                                         IMG_END_TOKEN, IMG_START_TOKEN,
                                         SimLingoTokenizer)

# internlm2-chat separators (reference internvl2_utils.py:129 ->
# OpenGVLab conversation.py internlm2-chat: roles ("<|im_start|>user\n",
# "<|im_start|>assistant\n"), sep "<|im_end|>").
USER_PREFIX = f"{IM_START}user\n"
ASSISTANT_PREFIX = f"{IM_START}assistant\n"
SEP = f"{IM_END}"


def image_token_block(num_image_tokens: int) -> str:
    return IMG_START_TOKEN + IMG_CONTEXT_TOKEN * num_image_tokens + IMG_END_TOKEN


def build_prompt(question: str, answer: Optional[str],
                 num_image_tokens: int) -> Tuple[str, str]:
    """Returns (full_string, question_only_string).

    Matches the reference prompt layout after system-prompt stripping:
    user turn gets the image block prefixed on its first line.
    """
    img = image_token_block(num_image_tokens)
    q = f"{USER_PREFIX}{img}\n{question}{SEP}"
    question_only = q + ASSISTANT_PREFIX
    if answer is None:
        return question_only, question_only
    full = q + f"{ASSISTANT_PREFIX}{answer}{SEP}"
    return full, question_only


@dataclasses.dataclass
class TokenizedChat:
    ids: np.ndarray          # [T] int32
    loss_mask: np.ndarray    # [T] bool (assistant answer tokens + final sep)


def tokenize_chat(tok: SimLingoTokenizer, question: str,
                  answer: Optional[str], num_image_tokens: int
                  ) -> TokenizedChat:
    """Tokenize piecewise so the assistant span is known exactly."""
    img = image_token_block(num_image_tokens)
    prefix = f"{USER_PREFIX}{img}\n{question}{SEP}{ASSISTANT_PREFIX}"
    prefix_ids = tok.encode(prefix)
    if answer is None:
        ids = np.asarray(prefix_ids, np.int32)
        return TokenizedChat(ids=ids, loss_mask=np.zeros(len(ids), bool))
    ans_ids = tok.encode(f"{answer}{SEP}")
    ids = np.asarray(prefix_ids + ans_ids, np.int32)
    mask = np.zeros(len(ids), bool)
    mask[len(prefix_ids):] = True
    return TokenizedChat(ids=ids, loss_mask=mask)


def find_placeholder_slots(ids: np.ndarray,
                           placeholder_values: Dict[int, np.ndarray],
                           max_placeholders: int
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Expand {token_id: coords [N,2]} into flat (slot, coord) lists.

    Reference semantics (internvl2_model.py:53-91): coordinates overwrite
    embeddings starting at the FIRST occurrence of the placeholder token id,
    spanning len(coords) consecutive positions (the prompt repeats the token
    len(coords) times, e.g. "<TARGET_POINT><TARGET_POINT>").
    """
    slots = np.full(max_placeholders, -1, np.int32)
    coords = np.zeros((max_placeholders, 2), np.float32)
    cursor = 0
    for token_id, value in placeholder_values.items():
        value = np.asarray(value, np.float32).reshape(-1, 2)
        occ = np.nonzero(ids == token_id)[0]
        if len(occ) == 0:
            continue
        start = occ[0]
        for j in range(len(value)):
            if cursor >= max_placeholders:
                break
            slots[cursor] = start + j
            coords[cursor] = value[j]
            cursor += 1
    return slots, coords


def batch_language_label(chats: Sequence[TokenizedChat],
                         placeholder_values: Sequence[Dict[int, np.ndarray]],
                         pad_id: int, max_len: int,
                         pad_side: str = "right",
                         max_placeholders: int = 8) -> LanguageLabel:
    """Pad a list of tokenized chats into one static-shape LanguageLabel."""
    import jax.numpy as jnp

    B = len(chats)
    ids = np.full((B, max_len), pad_id, np.int32)
    valid = np.zeros((B, max_len), bool)
    loss_mask = np.zeros((B, max_len), bool)
    ph_slots = np.full((B, max_placeholders), -1, np.int32)
    ph_coords = np.zeros((B, max_placeholders, 2), np.float32)

    for b, chat in enumerate(chats):
        n = len(chat.ids)
        if n > max_len:
            raise ValueError(f"sample {b}: {n} tokens > max_len {max_len}")
        off = 0 if pad_side == "right" else max_len - n
        ids[b, off:off + n] = chat.ids
        valid[b, off:off + n] = True
        loss_mask[b, off:off + n] = chat.loss_mask
        slots, coords = find_placeholder_slots(
            chat.ids, placeholder_values[b] or {}, max_placeholders)
        shift = np.where(slots >= 0, slots + off, -1)
        ph_slots[b] = shift
        ph_coords[b] = coords

    return LanguageLabel(
        ids=jnp.asarray(ids), valid=jnp.asarray(valid),
        loss_mask=jnp.asarray(loss_mask),
        ph_slots=jnp.asarray(ph_slots), ph_coords=jnp.asarray(ph_coords))
