"""In-repo SentencePiece tokenizer: wire-format parsing + SP-BPE/unigram
encoding against hand-serialized model protos and hand-computed merges.

(Real tokenizer.model assets don't exist in this environment; day-one parity
re-checks encodings against recorded HF tokenizations — PARITY_RUNBOOK.md.)
"""

import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from openvla_oft_tpu.processing.sentencepiece import (
    BYTE,
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePieceTokenizer,
    SPModel,
    parse_model_proto,
)


# --- minimal protobuf writer (test-side serializer for ModelProto) ---
def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _varint(field << 3) + _varint(value)


def _f32(field: int, value: float) -> bytes:
    return _varint((field << 3) | 5) + struct.pack("<f", value)


def _piece(text: str, score: float, ptype: int = NORMAL) -> bytes:
    body = _ld(1, text.encode()) + _f32(2, score)
    if ptype != NORMAL:
        body += _vi(3, ptype)
    return _ld(1, body)


def _model(pieces, model_type=2, byte_fallback=True, add_dummy_prefix=True):
    data = b"".join(_piece(*p) for p in pieces)
    data += _ld(2, _vi(3, model_type) + _vi(35, int(byte_fallback)))
    data += _ld(3, _vi(3, int(add_dummy_prefix)))
    return data


def _llama_like_pieces(extra):
    base = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
            ("</s>", 0.0, CONTROL)]
    byte_pieces = [(f"<0x{i:02X}>", 0.0, BYTE) for i in range(256)]
    return base + byte_pieces + [(p, s, NORMAL) for p, s in extra]


def test_parse_model_proto_roundtrip():
    pieces = _llama_like_pieces([("▁a", -1.0), ("ab", -2.5)])
    m = parse_model_proto(_model(pieces, model_type=2, byte_fallback=True,
                                 add_dummy_prefix=True))
    assert len(m.pieces) == len(pieces)
    assert m.pieces[0] == "<unk>" and m.types[0] == UNKNOWN
    assert m.pieces[1] == "<s>" and m.types[1] == CONTROL
    assert m.pieces[3] == "<0x00>" and m.types[3] == BYTE
    assert m.pieces[-2] == "▁a"
    assert abs(m.scores[-1] + 2.5) < 1e-6
    assert m.model_type == 2 and m.byte_fallback and m.add_dummy_prefix
    assert m.unk_id == 0


def test_bpe_merge_order_by_score_not_position():
    # "abc": pair scores ab=-2, bc=-1 -> bc merges FIRST (higher score),
    # yielding [a, bc]; a left-to-right merger would give [ab, c].
    pieces = _llama_like_pieces(
        [("a", -10.0), ("b", -10.0), ("c", -10.0),
         ("ab", -2.0), ("bc", -1.0)])
    tok = SentencePieceTokenizer(parse_model_proto(
        _model(pieces, add_dummy_prefix=False)))
    ids = tok.encode("abc", add_bos=False)
    assert [tok.model.pieces[i] for i in ids] == ["a", "bc"]


def test_bpe_cascading_merges_and_dummy_prefix():
    ws = "▁"
    pieces = _llama_like_pieces(
        [(ws, -10.0), ("h", -11.0), ("i", -11.0),
         ("hi", -1.0), (ws + "hi", -0.5), (ws + "there", -0.7),
         ("t", -11.0), ("h", -11.0), ("e", -11.0), ("r", -11.0),
         ("th", -3.0), ("er", -3.1), ("the", -2.0), ("ther", -1.9),
         ("there", -1.5)])
    tok = SentencePieceTokenizer(parse_model_proto(_model(pieces)))
    # "hi there" -> "_hi_there" -> [_hi, _, there]? No: "_there" is in vocab
    ids = tok.encode("hi there", add_bos=False)
    texts = [tok.model.pieces[i] for i in ids]
    assert texts == [ws + "hi", ws + "there"]
    # BOS prepended by default
    ids2 = tok.encode("hi there")
    assert ids2[0] == tok.bos_token_id and ids2[1:] == ids


def test_byte_fallback_for_oov_chars():
    pieces = _llama_like_pieces([("▁", -10.0), ("x", -11.0)])
    tok = SentencePieceTokenizer(parse_model_proto(_model(pieces)))
    ids = tok.encode("xé", add_bos=False)  # é = 0xC3 0xA9 in UTF-8
    texts = [tok.model.pieces[i] for i in ids]
    assert texts == ["▁", "x", "<0xC3>", "<0xA9>"]
    # decode reassembles the multi-byte char and strips the dummy prefix
    assert tok.decode(ids) == "xé"


def test_control_pieces_never_match_text():
    pieces = _llama_like_pieces(
        [("▁", -10.0), ("<", -11.0), ("s", -11.0), (">", -11.0),
         ("<s", -3.0), ("<s>", -1.0)])
    # "<s>" as NORMAL piece would merge; the CONTROL "<s>" (id 1) must not.
    tok = SentencePieceTokenizer(parse_model_proto(_model(pieces)))
    ids = tok.encode("<s>", add_bos=False)
    assert tok.bos_token_id not in ids
    # the NORMAL "<s>" piece (added last) is the legal match
    texts = [tok.model.pieces[i] for i in ids]
    assert texts == ["▁", "<s>"]
    assert ids[-1] != tok.bos_token_id


def test_unigram_viterbi_prefers_total_score():
    ws = "▁"
    # "abc": [ab]+[c] = -1 + -2 = -3 beats [abc] = -4 -> Viterbi picks [ab, c].
    pieces = _llama_like_pieces(
        [(ws, -1.0), ("a", -5.0), ("b", -5.0), ("c", -2.0),
         ("ab", -1.0), ("abc", -4.0)])
    m = parse_model_proto(_model(pieces, model_type=1, add_dummy_prefix=False))
    tok = SentencePieceTokenizer(m)
    ids = tok.encode("abc", add_bos=False)
    texts = [tok.model.pieces[i] for i in ids]
    assert texts == ["ab", "c"]


def test_hf_interface_and_processor_integration():
    ws = "▁"
    words = ["in", ":", "what", "action", "should", "the", "robot", "take",
             "to", "do", "it", "?", "out"]
    extra = [(ws, -2.0)] + [(ws + w, -1.0) for w in words] + \
        [(w, -5.0) for w in "inwhatcsoudlrbkt?:ed"] + [("\n", -3.0)]
    tok = SentencePieceTokenizer(parse_model_proto(_model(
        _llama_like_pieces(extra))))
    out = tok("in: what action", add_special_tokens=True)
    assert out["input_ids"][0] == tok.bos_token_id
    assert len(out["input_ids"]) == len(out["attention_mask"])
    assert all(a == 1 for a in out["attention_mask"])
    # batched call
    out2 = tok(["do it", "take to"], add_special_tokens=True)
    assert len(out2["input_ids"]) == 2

    # PrismaticProcessor accepts the in-repo tokenizer
    import numpy as np

    import openvla_oft_tpu.config as C
    from openvla_oft_tpu.config import (
        OpenVLAConfig, TINY_DINOV2, TINY_LLAMA, TINY_SIGLIP)
    from openvla_oft_tpu.processing.processor import PrismaticProcessor

    C._VISION_REGISTRY.setdefault("tiny-dual", (TINY_DINOV2, TINY_SIGLIP))
    C._LLM_REGISTRY.setdefault("tiny-llama", TINY_LLAMA)
    cfg = OpenVLAConfig(vision_backbone_id="tiny-dual",
                        llm_backbone_id="tiny-llama")
    proc = PrismaticProcessor(cfg, tokenizer=tok)
    h = TINY_DINOV2.image_size
    img = (np.random.default_rng(0).random((h, h, 3)) * 255).astype(np.uint8)
    batch = proc("do it", img)
    assert batch["input_ids"].shape[0] == 1
    assert batch["pixel_values"].shape[:3] == (1, 1, 2)


def test_load_sentencepiece_from_dir(tmp_path):
    from openvla_oft_tpu.processing.sentencepiece import load_sentencepiece

    assert load_sentencepiece(tmp_path) is None
    # BPE reaches "▁hi" through the "hi" intermediate merge (real Llama
    # vocabs contain all merge intermediates)
    model_bytes = _model(_llama_like_pieces(
        [("▁hi", -1.0), ("hi", -2.0), ("h", -9.0), ("i", -9.0),
         ("▁", -9.0)]))
    (tmp_path / "tokenizer.model").write_bytes(model_bytes)
    tok = load_sentencepiece(tmp_path)
    assert tok is not None
    assert tok.encode("hi", add_bos=False) == [tok.vocab["▁hi"]]


def test_derive_prompt_bucket():
    from openvla_oft_tpu.models.prismatic import prepare_prompt_ids
    from openvla_oft_tpu.processing.processor import (
        FakeLlamaTokenizer,
        derive_prompt_bucket,
    )

    tok = FakeLlamaTokenizer()
    corpus = ["pick up the black bowl", "turn on the stove",
              "open the top drawer of the cabinet and put the bowl inside"]
    bucket = derive_prompt_bucket(tok, corpus, multiple=16)
    assert bucket % 16 == 0
    # every corpus instruction must fit the derived bucket without the
    # auto-escalation path firing (ids length == bucket after left-pad)
    for ins in corpus:
        ids, mask = prepare_prompt_ids(tok, ins, bucket)
        assert len(ids) == bucket


# --- round-3 review regressions: loud rejection of non-SP assets ---
def test_truncated_proto_raises():
    import pytest

    data = _model(_llama_like_pieces([("▁a", -1.0)]))
    with pytest.raises(ValueError):
        parse_model_proto(data[:-2])  # cuts the final length-delimited field


def test_garbage_and_empty_models_rejected(tmp_path):
    import warnings

    import pytest

    from openvla_oft_tpu.processing.sentencepiece import load_sentencepiece

    with pytest.raises(ValueError):
        parse_model_proto(_model([]))  # parses clean but has no pieces
    # byte_fallback claimed but no <0xNN> pieces -> refuse
    with pytest.raises(ValueError):
        parse_model_proto(_model([("<unk>", 0.0, UNKNOWN), ("a", -1.0, NORMAL)],
                                 byte_fallback=True))
    # load_sentencepiece: corrupt/tiktoken-format file -> warn + None so the
    # caller falls back to the HF stack instead of tokenizing garbage
    bad = tmp_path / "tokenizer.model"
    bad.write_bytes(b"IQ==\nRA==\n" * 200)  # tiktoken-style base64 lines
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert load_sentencepiece(tmp_path) is None
        assert any("not a usable sentencepiece" in str(x.message) for x in w)


def test_decode_preserves_space_without_dummy_prefix():
    # singles + "▁h" give BPE a merge path up to "▁hi"
    pieces = _llama_like_pieces([("▁", -10.0), ("h", -10.0), ("i", -10.0),
                                 ("▁h", -2.0), ("▁hi", -1.0)])
    with_prefix = SentencePieceTokenizer(parse_model_proto(
        _model(pieces, add_dummy_prefix=True)))
    without = SentencePieceTokenizer(parse_model_proto(
        _model(pieces, add_dummy_prefix=False)))
    hid = with_prefix.vocab["▁hi"]
    # encoder-added dummy prefix is stripped on decode...
    assert with_prefix.decode(with_prefix.encode("hi", add_bos=False)) == "hi"
    # ...but a genuine leading space survives when the model adds no prefix
    assert without.decode([hid]) == " hi"
