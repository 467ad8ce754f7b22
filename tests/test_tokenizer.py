"""Tokenizer tests: native SentencePiece parser/encoders, streaming decode.

A tiny SentencePiece ``ModelProto`` is synthesized with our own wire-format
writer (tokenizer/proto.py) and parsed back — exercising the exact on-disk
format of Llama's tokenizer.model without the sentencepiece library.
"""

import pytest

from simplellminference_tpu.tokenizer import proto
from simplellminference_tpu.tokenizer.base import StreamingDetokenizer
from simplellminference_tpu.tokenizer.bytes import ByteTokenizer
from simplellminference_tpu.tokenizer.sentencepiece import (
    BYTE, CONTROL, NORMAL, UNKNOWN, Piece, SentencePieceTokenizer)


def _sp_piece(text: str, score: float, ptype: int = NORMAL) -> bytes:
    body = proto.field_str(1, text) + proto.field_float(2, score)
    body += proto.field_varint(3, ptype)
    return proto.field_bytes(1, body)


def _make_bpe_model() -> bytes:
    """Vocab: specials, chars h,e,l,o,▁ and merges he(-1) ll(-2) hell(-3)
    ▁hello? We keep it tiny and deterministic."""
    blob = b""
    pieces = [
        ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
        ("▁", -10.0, NORMAL), ("h", -11.0, NORMAL), ("e", -12.0, NORMAL),
        ("l", -13.0, NORMAL), ("o", -14.0, NORMAL),
        ("he", -1.0, NORMAL), ("ll", -2.0, NORMAL), ("hell", -3.0, NORMAL),
        ("hello", -4.0, NORMAL), ("▁hello", -5.0, NORMAL),
    ]
    # byte fallback pieces
    for b in range(256):
        pieces.append((f"<0x{b:02X}>", -20.0, BYTE))
    for p in pieces:
        blob += _sp_piece(*p)
    trainer = (proto.field_varint(3, 2)      # model_type = BPE
               + proto.field_varint(40, 0) + proto.field_varint(41, 1)
               + proto.field_varint(42, 2))
    blob += proto.field_bytes(2, trainer)
    norm = proto.field_varint(6, 1)          # add_dummy_prefix
    blob += proto.field_bytes(3, norm)
    return blob


@pytest.fixture(scope="module")
def sp_bpe():
    return SentencePieceTokenizer.from_bytes(_make_bpe_model())


def test_parse_model_proto(sp_bpe):
    assert sp_bpe.model_type == "bpe"
    assert sp_bpe.bos_id == 1 and sp_bpe.eos_id == 2
    assert sp_bpe.vocab_size == 13 + 256
    assert sp_bpe.byte_pieces[0x41] == sp_bpe.piece_to_id["<0x41>"]


def test_bpe_merge_order(sp_bpe):
    # "hello" -> chars h,e,l,l,o -> he(-1), ll(-2), then "hell"? "he"+"ll"
    # concat = "hell" (-3) -> "hell"+"o" = "hello" (-4) -> ▁+hello (-5)
    ids = sp_bpe.encode("hello", add_bos=False)
    assert ids == [sp_bpe.piece_to_id["▁hello"]]
    ids = sp_bpe.encode("hello", add_bos=True)
    assert ids[0] == 1


def test_bpe_partial_merges(sp_bpe):
    # "helo" -> ▁,h,e,l,o -> he merges; lo doesn't exist; ▁ stays alone
    ids = sp_bpe.encode("helo", add_bos=False)
    texts = [sp_bpe.id_to_piece(i) for i in ids]
    assert texts == ["▁", "he", "l", "o"]


def test_byte_fallback_roundtrip(sp_bpe):
    text = "hello 😀"
    ids = sp_bpe.encode(text, add_bos=False)
    # emoji must come out as 4 byte pieces
    byte_ids = [i for i in ids if sp_bpe.pieces[i].type == BYTE]
    assert len(byte_ids) == 4
    assert sp_bpe.decode(ids) == text


def test_decode_skips_control(sp_bpe):
    ids = sp_bpe.encode("hello", add_bos=True) + [sp_bpe.eos_id]
    assert sp_bpe.decode(ids) == "hello"


def test_streaming_detokenizer_utf8_boundary(sp_bpe):
    text = "hello 😀"
    ids = sp_bpe.encode(text, add_bos=False)
    stream = StreamingDetokenizer(sp_bpe)
    chunks = [stream.push(i) for i in ids]
    chunks.append(stream.flush())
    assert "".join(chunks) == text
    # partial UTF-8 bytes must never surface as replacement chars
    for c in chunks:
        assert "�" not in c


def test_unigram_viterbi():
    pieces = [Piece("<unk>", 0.0, UNKNOWN), Piece("<s>", 0.0, CONTROL),
              Piece("</s>", 0.0, CONTROL),
              Piece("▁ab", -1.0), Piece("▁a", -2.0), Piece("b", -2.5),
              Piece("c", -3.0), Piece("▁", -3.5), Piece("a", -4.0)]
    tok = SentencePieceTokenizer(pieces, model_type="unigram")
    ids = tok.encode("abc", add_bos=False)
    # best: ▁ab (-1) + c (-3) = -4 vs ▁a + b + c = -7.5
    assert [tok.id_to_piece(i) for i in ids] == ["▁ab", "c"]


def test_byte_tokenizer_roundtrip():
    t = ByteTokenizer()
    ids = t.encode("héllo", add_bos=True)
    assert ids[0] == t.bos_id
    assert t.decode(ids) == "héllo"


def test_hf_tokenizer_wrapper(tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        special_tokens=["<unk>", "<s>", "</s>"], vocab_size=200)
    tok.train_from_iterator(["hello world", "hello there"], trainer)
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)

    from simplellminference_tpu.tokenizer.hf import HFTokenizer
    t = HFTokenizer(path)
    ids = t.encode("hello world", add_bos=False)
    assert t.decode(ids).replace(" ", "") == "helloworld"


def test_load_tokenizer_auto(tmp_path):
    from simplellminference_tpu.tokenizer.auto import load_tokenizer
    (tmp_path / "tokenizer.model").write_bytes(_make_bpe_model())
    t = load_tokenizer(str(tmp_path))
    assert t.encode("hello", add_bos=False) == [t.piece_to_id["▁hello"]]
    with pytest.raises(FileNotFoundError):
        load_tokenizer(str(tmp_path / "nope"))
