"""Tokenizer round-trips and special-token laws (reference parity)."""
from telugu_asr_tpu.text import (
    CharacterTokenizer,
    TeluguTokenizer,
    TransducerTeluguTokenizer,
    load_vendored_telugu_tokens,
    make_default_tokenizer,
    make_transducer_tokenizer,
)

# The reference's own debug ground-truth sentence (dataset_helpers.py:52).
GROUND_TRUTH = "కరెంటు బిల్లుల్ని కూడా సులువుగా ఆండ్రాయిడ్ ఫోన్ ఉంటే జీపే ద్వారా చెయ్యొచ్చు"


def test_vendored_vocab_size():
    assert len(load_vendored_telugu_tokens()) == 237


def test_special_ids():
    tok = make_default_tokenizer()
    assert tok.bos_token_id == 0
    assert tok.eos_token_id == 1
    assert tok.pad_token_id == 2
    assert tok.unk_token_id == 3


def test_roundtrip_reference_sentence():
    tok = make_default_tokenizer()
    ids = tok.encode(GROUND_TRUTH, add_special_tokens=True)
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    decoded = tok.batch_decode([ids], skip_special_tokens=True)[0]
    assert decoded == GROUND_TRUTH


def test_longest_first_matching():
    # "న్ని" is a vocab entry; greedy longest-first must prefer it over
    # matching shorter prefixes.
    tok = make_default_tokenizer()
    vocab = tok.get_vocab()
    assert "న్ని" in vocab
    ids = tok.encode("న్ని", add_special_tokens=False)
    assert ids == [vocab["న్ని"]]


def test_unk_for_unmatched():
    tok = make_default_tokenizer()
    ids = tok.encode("q", add_special_tokens=False)
    assert ids == [tok.unk_token_id]
    # UNK is stripped on skip_special_tokens decode (HF semantics)
    assert tok.decode(ids, skip_special_tokens=True) == ""


def test_duplicate_token_dict_semantics():
    """A duplicated token gets the LAST id (reference dict-comprehension law)."""
    tok = TeluguTokenizer(["అ", "ఆ", "అ"], None)
    vocab = tok.get_vocab()
    assert vocab["అ"] == 6  # 4 + 2 (last occurrence)
    assert tok.vocab_size == 6  # 4 specials + 2 unique
    ids = tok.encode("అఆ", add_special_tokens=False)
    assert ids == [6, 5]


def test_default_vocab_size_with_extension():
    # 237 vendored + [" ", "."]; " " already present → overwritten, not duplicated.
    tok = make_default_tokenizer()
    assert tok.vocab_size == 4 + 238


def test_character_tokenizer():
    tok = CharacterTokenizer(list("abc "), None)
    ids = tok.encode("ab cx", add_special_tokens=False)
    assert ids == [4, 5, 7, 6, tok.unk_token_id]
    assert tok.decode(tok.encode("ab c")) == "ab c"


def test_transducer_tokenizer():
    tok = make_transducer_tokenizer()
    assert tok.blank_token_id == 0 and tok.unk_token_id == 1
    ids = tok.encode(GROUND_TRUTH, add_special_tokens=False)
    assert tok.decode(tok.prepend_blank(ids), skip_special_tokens=True) == GROUND_TRUTH


def test_ids_dense_within_vocab():
    """Every assignable id must be < vocab_size (embedding-table bound) —
    regression for the vendored-vocab duplicate-space gap."""
    for tok in (make_default_tokenizer(), make_transducer_tokenizer()):
        ids = tok.get_vocab().values()
        assert max(ids) == tok.vocab_size - 1
        assert len(set(ids)) == tok.vocab_size
    tok = make_default_tokenizer()
    ids = tok.encode("కరెంటు బిల్లు.", add_special_tokens=True)
    assert max(ids) < tok.vocab_size
