"""SimLingoTokenizer's HF path, exercised with a synthesized BPE tokenizer
saved to disk (no network): special tokens, placeholder ids, chat roundtrip."""

import os

import pytest

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def hf_tokenizer_dir(tmp_path_factory):
    """Build a tiny byte-level BPE tokenizer with the InternVL special tokens
    and save it in HF format."""
    from tokenizers import (Tokenizer, decoders, models,
                            pre_tokenizers, trainers)
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600,
        special_tokens=["<|im_start|>", "<|im_end|>", "<img>", "</img>",
                        "<IMG_CONTEXT>", "<pad>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    corpus = ["Current speed: 5.0 m/s. Target waypoint. Predict the "
              "waypoints. What should the ego do next? Q: A: user assistant "
              "The ego vehicle accelerates and follows the road."] * 50
    tok.train_from_iterator(corpus, trainer)

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", eos_token="<|im_end|>",
        additional_special_tokens=["<|im_start|>", "<img>", "</img>",
                                   "<IMG_CONTEXT>"])
    d = str(tmp_path_factory.mktemp("tok"))
    fast.save_pretrained(d)
    return d


def test_hf_tokenizer_path(hf_tokenizer_dir):
    from simlingo_tpu.data.prompts import tokenize_chat
    from simlingo_tpu.data.tokenizer import (PLACEHOLDER_TOKENS,
                                             SimLingoTokenizer)

    tok = SimLingoTokenizer(hf_tokenizer_dir)
    assert not tok.is_fallback
    assert tok.img_context_id >= 0
    assert tok.pad_token_id is not None and tok.eos_token_id is not None
    # the 8 placeholder tokens were added as single ids
    for t in PLACEHOLDER_TOKENS:
        tid = tok.convert_tokens_to_ids(t)
        assert isinstance(tid, int) and tid >= 0
        assert tok.encode(t) == [tid]

    chat = tokenize_chat(tok, "Q: test? <TARGET_POINT><TARGET_POINT>",
                         "A: yes.", num_image_tokens=4)
    ids = list(chat.ids)
    assert ids.count(tok.img_context_id) == 4
    assert ids.count(tok.placeholder_ids["<TARGET_POINT>"]) == 2
    masked = tok.decode(chat.ids[chat.loss_mask], skip_special_tokens=False)
    assert "A: yes." in masked and masked.endswith("<|im_end|>")

    # placeholder slot discovery works on HF ids too
    import numpy as np
    from simlingo_tpu.data.prompts import find_placeholder_slots
    slots, coords = find_placeholder_slots(
        np.asarray(chat.ids),
        {tok.placeholder_ids["<TARGET_POINT>"]: np.ones((2, 2))}, 8)
    assert (slots >= 0).sum() == 2
