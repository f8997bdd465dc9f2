"""Native sentencepiece-unigram tokenizer tests.

Serializes tiny ModelProto files with a hand-rolled protobuf writer (the
inverse of the reader under test) and checks Viterbi segmentation, scoring
semantics, special-token conventions, and the conditioner integration
ladder (reference conditioners.py:268-275 tokenizes via HF/sentencepiece).
"""

import os
import struct

import numpy as np
import pytest

from friendly_stable_audio_tools_tpu.models.sentencepiece import (
    SentencePieceUnigramTokenizer,
    TYPE_BYTE,
    TYPE_CONTROL,
    TYPE_NORMAL,
    TYPE_UNKNOWN,
    parse_model_proto,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(piece: str, score: float, ptype: int) -> bytes:
    p = piece.encode("utf-8")
    body = (
        bytes([0x0A]) + _varint(len(p)) + p            # field 1, wire 2
        + bytes([0x15]) + struct.pack("<f", score)      # field 2, wire 5
        + bytes([0x18]) + _varint(ptype)                # field 3, wire 0
    )
    return bytes([0x0A]) + _varint(len(body)) + body    # ModelProto field 1


def build_model(pieces) -> bytes:
    return b"".join(_piece(p, s, t) for p, s, t in pieces)


BASE = [
    ("<pad>", 0.0, TYPE_CONTROL),
    ("</s>", 0.0, TYPE_CONTROL),
    ("<unk>", 0.0, TYPE_UNKNOWN),
]


def make_tok(vocab, tmp_path=None):
    data = build_model(BASE + vocab)
    if tmp_path is not None:
        f = tmp_path / "spiece.model"
        f.write_bytes(data)
        return SentencePieceUnigramTokenizer.from_file(str(f))
    return SentencePieceUnigramTokenizer(parse_model_proto(data))


def test_proto_roundtrip(tmp_path):
    tok = make_tok([("▁hello", -1.0, TYPE_NORMAL), ("▁world", -2.0, TYPE_NORMAL)], tmp_path)
    assert len(tok) == 5
    assert tok.pieces[3][0] == "▁hello"
    assert tok.pieces[3][1] == pytest.approx(-1.0)
    assert tok.pad_id == 0 and tok.eos_id == 1 and tok.unk_id == 2


def test_viterbi_prefers_high_score_segmentation():
    # "▁hello" (-1.0) beats "▁h"+"ello" (-0.9 + -0.9 = -1.8)
    tok = make_tok([
        ("▁hello", -1.0, TYPE_NORMAL),
        ("▁h", -0.9, TYPE_NORMAL),
        ("ello", -0.9, TYPE_NORMAL),
    ])
    assert tok.encode_pieces("hello") == [3]

    # flip the scores: now the split wins
    tok2 = make_tok([
        ("▁hello", -3.0, TYPE_NORMAL),
        ("▁h", -1.0, TYPE_NORMAL),
        ("ello", -1.0, TYPE_NORMAL),
    ])
    assert tok2.encode_pieces("hello") == [4, 5]


def test_word_boundary_and_whitespace_collapse():
    tok = make_tok([
        ("▁hello", -1.0, TYPE_NORMAL),
        ("▁world", -1.0, TYPE_NORMAL),
    ])
    assert tok.encode_pieces("hello world") == [3, 4]
    assert tok.encode_pieces("  hello   world  ") == [3, 4]


def test_unknown_char_gets_unk_id():
    tok = make_tok([("▁a", -1.0, TYPE_NORMAL), ("▁", -2.0, TYPE_NORMAL)])
    ids = tok.encode_pieces("a Z")
    assert ids[0] == 3
    assert tok.unk_id in ids


def test_byte_fallback():
    tok = make_tok([
        ("▁", -1.0, TYPE_NORMAL),
        ("<0x5A>", -10.0, TYPE_BYTE),  # 'Z'
    ])
    ids = tok.encode_pieces("Z")
    assert ids == [3, 4]  # "▁" then byte piece for Z


def test_call_api_eos_padding_mask():
    tok = make_tok([("▁hi", -1.0, TYPE_NORMAL)])
    out = tok(["hi", "hi hi"], max_length=6)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == (2, 6)
    assert list(ids[0][:2]) == [3, 1]           # piece + </s>
    assert list(ids[0][2:]) == [0, 0, 0, 0]      # <pad>
    assert list(mask[0]) == [1, 1, 0, 0, 0, 0]
    assert list(ids[1][:3]) == [3, 3, 1]


def test_truncation_keeps_eos():
    tok = make_tok([("▁hi", -1.0, TYPE_NORMAL)])
    out = tok(["hi hi hi hi hi"], max_length=3)
    assert list(out["input_ids"][0]) == [3, 3, 1]


def test_nfkc_normalization():
    # U+FB01 LATIN SMALL LIGATURE FI normalizes to "fi" under NFKC
    tok = make_tok([("▁fi", -1.0, TYPE_NORMAL)])
    assert tok.encode_pieces("ﬁ") == [3]


def test_t5_conditioner_picks_up_spiece_via_env(tmp_path, monkeypatch):
    data = build_model(BASE + [("▁hi", -1.0, TYPE_NORMAL)])
    (tmp_path / "spiece.model").write_bytes(data)
    monkeypatch.setenv("FSAT_TOKENIZER_DIR", str(tmp_path))
    from friendly_stable_audio_tools_tpu.models.conditioners import get_hf_tokenizer

    tok = get_hf_tokenizer("t5-base", 32100)
    assert isinstance(tok, SentencePieceUnigramTokenizer)
    assert not tok.is_fallback


def test_pretrained_loading_hard_fails_on_fallback_tokenizer():
    from friendly_stable_audio_tools_tpu.models.conditioners import SimpleTokenizer
    from friendly_stable_audio_tools_tpu.models.pretrained import assert_no_fallback_tokenizers

    class FakeCond:
        tokenizer = SimpleTokenizer(100)

    class FakeMulti:
        conditioners = {"prompt": FakeCond()}

    class FakeModel:
        conditioner = FakeMulti()

    with pytest.raises(RuntimeError, match="hash-fallback"):
        assert_no_fallback_tokenizers(FakeModel())

    class NoCondModel:
        pass

    assert_no_fallback_tokenizers(NoCondModel())  # no conditioner: fine


def test_bare_spiece_dir_not_used_for_bpe_tokenizers(tmp_path, monkeypatch):
    """A checkpoint dir holding the T5 spiece.model must NOT capture lookups
    for BPE tokenizers (CLAP's roberta-base): that would be silently-wrong
    token ids. Name-scoped subdirs still resolve for any name."""
    data = build_model(BASE + [("▁hi", -1.0, TYPE_NORMAL)])
    (tmp_path / "spiece.model").write_bytes(data)
    monkeypatch.setenv("FSAT_TOKENIZER_DIR", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    from friendly_stable_audio_tools_tpu.models.conditioners import (
        SimpleTokenizer, get_hf_tokenizer,
    )

    tok = get_hf_tokenizer("roberta-base", 50265)
    assert not isinstance(tok, SentencePieceUnigramTokenizer)
    assert isinstance(tok, SimpleTokenizer)  # falls through the ladder instead

    # name-scoped subdir is explicit -> honored for any name
    sub = tmp_path / "my-sp-model"
    sub.mkdir()
    (sub / "spiece.model").write_bytes(data)
    tok2 = get_hf_tokenizer("my-sp-model", 100)
    assert isinstance(tok2, SentencePieceUnigramTokenizer)


def test_t5_extra_ids_vocab_and_sentinels(tmp_path, monkeypatch):
    """HF T5 tokenizers report 32100 = pieces + 100 <extra_id_*>; LUT
    embeddings sized by len(tokenizer) must match pretrained checkpoints."""
    data = build_model(BASE + [("▁hi", -1.0, TYPE_NORMAL)])
    (tmp_path / "spiece.model").write_bytes(data)
    monkeypatch.setenv("FSAT_TOKENIZER_DIR", str(tmp_path))
    from friendly_stable_audio_tools_tpu.models.conditioners import get_hf_tokenizer

    tok = get_hf_tokenizer("t5-base", 32100)
    n_pieces = len(tok.pieces)
    assert len(tok) == n_pieces + 100
    assert tok.vocab_size == n_pieces + 100
    # HF convention: <extra_id_0> gets the HIGHEST id
    assert tok.encode_pieces("<extra_id_0>") == [n_pieces + 99]
    assert tok.encode_pieces("<extra_id_99>") == [n_pieces]
    # normal text unaffected
    ids = tok(["hi"], max_length=8)
    assert ids["input_ids"].shape == (1, 8)
