from telugu_asr_tpu.text.tokenizer import (
    CharacterTokenizer,
    TeluguTokenizer,
    TransducerTeluguTokenizer,
    load_vendored_telugu_tokens,
    make_default_tokenizer,
    make_transducer_tokenizer,
)

__all__ = [
    "CharacterTokenizer",
    "TeluguTokenizer",
    "TransducerTeluguTokenizer",
    "load_vendored_telugu_tokens",
    "make_default_tokenizer",
    "make_transducer_tokenizer",
]
