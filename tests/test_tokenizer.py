"""Placeholder splicing + embedding-id base semantics
(reference: modules/modelSetup/mixin/ModelSetupEmbeddingMixin.py:25-88 —
the reference adds placeholder tokens to the HF tokenizer, so text-order
and repeat handling come for free there; the splice-based wrappers must
reproduce them, and placeholder ids must index the MODEL's embedding
table, not the HF tokenizer's reported vocab)."""

import numpy as np

from onetrainer_tpu.setup.tokenizer import (
    GemmaTokenizerWrapper, LlamaTokenizerWrapper, SDTokenizer,
    T5TokenizerWrapper,
)


def test_placeholder_ids_use_model_table_size_not_tokenizer_vocab():
    """HF T5Tokenizer reports vocab_size 32100 while the T5 model table
    is 32128 (same for Llama-3: 128000 vs 128320). Placeholder ids index
    extra_embeddings appended at the TABLE size — shrinking
    vocab_size (as a real HF load does) must not move them."""
    tok = T5TokenizerWrapper(None, vocab_size=32128)
    tok.vocab_size = 32100   # what a real HF T5 tokenizer reports
    ids = tok.register_placeholder("<emb>", 2)
    assert ids == [32128, 32129]

    sd = SDTokenizer(None, vocab_size=49408)
    assert sd.register_placeholder("<e>", 1) == [49408]

    ll = LlamaTokenizerWrapper(None, vocab_size=128320)
    ll.vocab_size = 128000
    assert ll.register_placeholder("<e>", 1) == [128320]


def test_llama_real_vocab_does_not_trip_tiny_fallback():
    """Llama-3's real tokenizer reports vocab_size 128000 == bos id; the
    tiny-test-vocab special-id reset must only apply to the hash
    fallback, not to a real tokenizer's valid specials."""
    ll = LlamaTokenizerWrapper(None, vocab_size=128320)
    assert ll.bos == 128000 and ll.pad == 128001
    tiny = LlamaTokenizerWrapper(None, vocab_size=100)
    assert (tiny.bos, tiny.eos, tiny.pad) == (2, 1, 0)


def _spliced_positions(tokens, ids):
    tokens = list(tokens)
    for i in range(len(tokens) - len(ids) + 1):
        if tokens[i:i + len(ids)] == list(ids):
            return i
    return -1


def test_multi_placeholder_text_order():
    """Two placeholders in reverse registration order: splice must follow
    TEXT order, and the placeholder strings must never be word-tokenized."""
    for cls, kw in ((SDTokenizer, {}), (T5TokenizerWrapper, {}),
                    (GemmaTokenizerWrapper, {}),
                    (LlamaTokenizerWrapper, {})):
        tok = cls(None, **kw)
        a = tok.register_placeholder("<aaa>", 2)
        b = tok.register_placeholder("<bbb>", 2)
        out = tok("photo of <bbb> and <aaa> together")
        pa, pb = _spliced_positions(out, a), _spliced_positions(out, b)
        assert pa >= 0 and pb >= 0, cls.__name__
        assert pb < pa, f"{cls.__name__}: text order not preserved"


def test_repeated_placeholder_spliced_every_time():
    tok = SDTokenizer(None)
    ids = tok.register_placeholder("<x>", 1)
    out = list(tok("<x> next to <x>"))
    assert out.count(ids[0]) == 2


def test_overlapping_spans_keep_earliest():
    """A placeholder that is a substring of an earlier span must not
    double-splice."""
    tok = SDTokenizer(None)
    long_ids = tok.register_placeholder("<abc>", 1)
    sub_ids = tok.register_placeholder("abc", 1)
    out = list(tok("a <abc> b"))
    assert out.count(long_ids[0]) == 1
    assert out.count(sub_ids[0]) == 0


def test_t5_eos_and_padding_layout():
    tok = T5TokenizerWrapper(None, max_length=8)
    out = tok("hello world")
    assert out.shape == (8,)
    assert out[2] == tok.eos
    assert (np.asarray(out[3:]) == tok.pad).all()
