"""Telugu subword / character tokenizers — self-contained, no network access.

Behavioral parity with the reference tokenizers:

* ``TeluguTokenizer`` mirrors src/models/moonshine/tokenizer.py:172-306 —
  greedy longest-first string matching over a fixed subword list, specials
  ``[BOS]=0, [EOS]=1, [PAD]=2, [UNK]=3``, subword ids from 4, unmatched
  characters become ``[UNK]``, ``encode(..., add_special_tokens=True)``
  wraps with BOS/EOS, and ``batch_decode(..., skip_special_tokens=True)``
  drops all four specials.
* ``CharacterTokenizer`` mirrors moonshine/tokenizer.py:21-148 (same specials,
  one id per character from 4).
* ``TransducerTeluguTokenizer`` mirrors src/tokenizer.py:17-136 — transducer
  vocabulary ``[BLANK]=0, [UNK]=1`` + tokens from 2, with ``prepend_blank``.

The canonical vocabulary ships vendored in ``vocab_te_237.json`` (the
committed snapshot EDA/telugu_token_tokenizer/tokenizer_config.json from the
reference repo — 237 subwords, model_max_length 2048), so no HuggingFace
download (reference: dataset_helpers.py:76-81 mined google/gemma-2-2b online).
``make_default_tokenizer`` appends ``" "`` and ``"."`` exactly like
dataset_helpers.py:78 — including the reference's dict-overwrite semantics
when a token appears twice (the *last* occurrence wins the id; earlier ids
become decode-only gaps).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Sequence

__all__ = [
    "BaseMatchTokenizer",
    "TeluguTokenizer",
    "CharacterTokenizer",
    "TransducerTeluguTokenizer",
    "load_vendored_telugu_tokens",
    "make_default_tokenizer",
    "make_transducer_tokenizer",
]

_VENDORED_VOCAB = os.path.join(os.path.dirname(__file__), "vocab_te_237.json")


def load_vendored_telugu_tokens() -> List[str]:
    """The committed 237-subword Telugu vocabulary snapshot."""
    with open(_VENDORED_VOCAB, "r", encoding="utf-8") as f:
        return list(json.load(f)["telugu_tokens"])


class BaseMatchTokenizer:
    """Shared longest-first matcher + encode/decode plumbing."""

    def __init__(
        self,
        tokens: Sequence[str],
        specials: Dict[str, int],
        unk_token: str,
        first_token_id: int,
        model_max_length: Optional[int] = None,
    ):
        self.tokens = list(tokens)
        self.model_max_length = model_max_length
        # Reference semantics: a dict comprehension assigns ids in order, so a
        # duplicated token keeps only its LAST id (moonshine/tokenizer.py:196-202).
        self._vocab_str_to_int: Dict[str, int] = dict(specials)
        for i, token in enumerate(self.tokens):
            self._vocab_str_to_int[token] = first_token_id + i
        self._vocab_int_to_str = {v: k for k, v in self._vocab_str_to_int.items()}
        self._special_ids = set(specials.values())
        self._special_tokens = set(specials.keys())
        self._unk_token = unk_token
        self._unk_id = specials[unk_token]
        # Longest-first match order (moonshine/tokenizer.py:206).
        self._sorted_tokens = sorted(self.tokens, key=len, reverse=True)

    # -- vocab ---------------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return len(self._vocab_str_to_int)

    def get_vocab(self) -> Dict[str, int]:
        return dict(self._vocab_str_to_int)

    # -- tokenize ------------------------------------------------------------
    def _tokenize(self, text: str) -> List[str]:
        """Greedy longest-first matching (moonshine/tokenizer.py:225-245)."""
        out: List[str] = []
        i = 0
        n = len(text)
        while i < n:
            for token in self._sorted_tokens:
                if text.startswith(token, i):
                    out.append(token)
                    i += len(token)
                    break
            else:
                out.append(self._unk_token)
                i += 1
        return out

    def convert_token_to_id(self, token: str) -> int:
        return self._vocab_str_to_int.get(token, self._unk_id)

    def convert_id_to_token(self, index: int) -> str:
        return self._vocab_int_to_str[index]

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        ids = [self.convert_token_to_id(t) for t in self._tokenize(text)]
        if add_special_tokens:
            ids = self.build_inputs_with_special_tokens(ids)
        return ids

    def build_inputs_with_special_tokens(self, ids: List[int]) -> List[int]:
        return list(ids)  # overridden where BOS/EOS exist

    # -- decode --------------------------------------------------------------
    def decode(self, ids: Iterable[int], skip_special_tokens: bool = True) -> str:
        parts = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in self._special_ids:
                continue
            token = self._vocab_int_to_str.get(i)
            if token is None:
                continue  # decode-only gap from duplicate-token overwrite
            parts.append(token)
        return "".join(parts)

    def batch_decode(
        self, batch: Iterable[Iterable[int]], skip_special_tokens: bool = True
    ) -> List[str]:
        return [self.decode(seq, skip_special_tokens=skip_special_tokens) for seq in batch]

    # -- persistence ---------------------------------------------------------
    def get_config(self) -> Dict:
        return {"tokens": self.tokens, "model_max_length": self.model_max_length}

    def save_pretrained(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        with open(
            os.path.join(save_directory, "tokenizer_config.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(self.get_config(), f, ensure_ascii=False, indent=2)


class TeluguTokenizer(BaseMatchTokenizer):
    """Seq2seq Telugu subword tokenizer (moonshine/tokenizer.py:172-306)."""

    bos_token, eos_token, pad_token, unk_token = "[BOS]", "[EOS]", "[PAD]", "[UNK]"
    bos_token_id, eos_token_id, pad_token_id, unk_token_id = 0, 1, 2, 3

    def __init__(self, telugu_tokens: Sequence[str], model_max_length: Optional[int] = None):
        super().__init__(
            tokens=telugu_tokens,
            specials={"[BOS]": 0, "[EOS]": 1, "[PAD]": 2, "[UNK]": 3},
            unk_token="[UNK]",
            first_token_id=4,
            model_max_length=model_max_length,
        )
        self.telugu_tokens = self.tokens

    def build_inputs_with_special_tokens(self, ids: List[int]) -> List[int]:
        # moonshine/tokenizer.py:256-264
        return [self.bos_token_id] + list(ids) + [self.eos_token_id]

    def get_config(self) -> Dict:
        return {"telugu_tokens": self.telugu_tokens, "model_max_length": self.model_max_length}

    @classmethod
    def from_config(cls, config: Dict) -> "TeluguTokenizer":
        return cls(config["telugu_tokens"], config.get("model_max_length"))

    @classmethod
    def from_pretrained(cls, directory: str) -> "TeluguTokenizer":
        with open(os.path.join(directory, "tokenizer_config.json"), encoding="utf-8") as f:
            return cls.from_config(json.load(f))


class CharacterTokenizer(TeluguTokenizer):
    """Character-level fallback (moonshine/tokenizer.py:21-148)."""

    def __init__(self, characters: Sequence[str], model_max_length: Optional[int] = None):
        super().__init__(list(characters), model_max_length)
        self.characters = list(characters)

    def _tokenize(self, text: str) -> List[str]:
        return [c if c in self._vocab_str_to_int else self._unk_token for c in text]

    def get_config(self) -> Dict:
        return {
            "char_ords": [ord(c) for c in self.characters],
            "model_max_length": self.model_max_length,
        }

    @classmethod
    def from_config(cls, config: Dict) -> "CharacterTokenizer":
        return cls([chr(i) for i in config["char_ords"]], config.get("model_max_length"))


class TransducerTeluguTokenizer(BaseMatchTokenizer):
    """RNN-T tokenizer: ``[BLANK]=0, [UNK]=1`` + tokens from 2 (src/tokenizer.py:17-136)."""

    blank_token, unk_token = "[BLANK]", "[UNK]"
    blank_token_id, unk_token_id = 0, 1

    def __init__(self, telugu_tokens: Sequence[str], model_max_length: Optional[int] = None):
        super().__init__(
            tokens=telugu_tokens,
            specials={"[BLANK]": 0, "[UNK]": 1},
            unk_token="[UNK]",
            first_token_id=2,
            model_max_length=model_max_length,
        )
        self.telugu_tokens = self.tokens

    def prepend_blank(self, token_ids: Sequence[int]) -> List[int]:
        # src/tokenizer.py:82-84
        return [self.blank_token_id] + list(token_ids)


def _default_tokens() -> List[str]:
    """Vendored vocabulary + the ``[" ", "."]`` extension, DEDUPLICATED.

    The reference extends its freshly-mined (Telugu-only) vocabulary with
    ``" "`` and ``"."`` (dataset_helpers.py:78); the committed snapshot we
    vendor ALREADY contains ``" "``, and blindly appending would leave a gap
    in the id space (duplicate token ids are dict-overwritten, so
    ``max_id == vocab_size`` — one past the embedding table, an
    out-of-bounds lookup for any transcript containing the duplicate).
    Dedup keeps ids dense: ``max_id == vocab_size - 1``.
    """
    tokens = load_vendored_telugu_tokens()
    for extra in (" ", "."):
        if extra not in tokens:
            tokens.append(extra)
    return tokens


def make_default_tokenizer() -> TeluguTokenizer:
    """The canonical training tokenizer (offline vocabulary, see
    :func:`_default_tokens`)."""
    return TeluguTokenizer(_default_tokens(), model_max_length=None)


def make_transducer_tokenizer() -> TransducerTeluguTokenizer:
    return TransducerTeluguTokenizer(_default_tokens(), model_max_length=None)
