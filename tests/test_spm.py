"""Pure-Python sentencepiece (tokenization/spm.py) tests.

The real Gemma ``tokenizer.model`` is not in this image, so the tests build
synthetic ``ModelProto`` bytes with a minimal protobuf writer and pin the
encoders against the HF ``tokenizers`` Rust implementations of the same
algorithms (Unigram Viterbi / BPE best-pair merge) — an independent oracle
that shares no code with ours.  Reference behavior under test:
``sentencepiece.SentencePieceProcessor.encode`` as used by the reference's
Pi0Tokenization (dexbotic/tokenization/process.py:116-127).
"""

import struct

import numpy as np
import pytest

from dexbotic_tpu.tokenization.spm import (
    BYTE,
    CONTROL,
    UNKNOWN,
    SentencePieceModel,
    SpmTokenizer,
)
from dexbotic_tpu.tokenization.tokenize import Pi0Tokenization


# ---------------------------------------------------------------------------
# Minimal protobuf writer (test-local; the module under test only reads)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(fn: int, payload: bytes) -> bytes:
    return _varint((fn << 3) | 2) + _varint(len(payload)) + payload


def _vi(fn: int, v: int) -> bytes:
    return _varint((fn << 3) | 0) + _varint(v)


def _f32(fn: int, x: float) -> bytes:
    return _varint((fn << 3) | 5) + struct.pack("<f", x)


def piece(p: str, score: float, ptype: int = 1) -> bytes:
    body = _ld(1, p.encode()) + _f32(2, score)
    if ptype != 1:
        body += _vi(3, ptype)
    return _ld(1, body)


def model_bytes(pieces, model_type=1, byte_fallback=False,
                unk=0, bos=1, eos=2, pad=-1, name="identity",
                dummy_prefix=True, remove_ws=True, escape_ws=True) -> bytes:
    trainer = (_vi(3, model_type) + _vi(35, int(byte_fallback))
               + _vi(40, unk) + _vi(41, bos) + _vi(42, eos) + _vi(43, pad))
    norm = (_ld(1, name.encode()) + _vi(3, int(dummy_prefix))
            + _vi(4, int(remove_ws)) + _vi(5, int(escape_ws)))
    return b"".join(pieces) + _ld(2, trainer) + _ld(3, norm)


# A small unigram vocab over {h,e,l,o,w,r,d, space}: distinct scores so the
# Viterbi argmax is unique (tie-break order may differ across impls).
UNI_SPECIALS = [piece("<unk>", 0.0, UNKNOWN), piece("<s>", 0.0, CONTROL),
                piece("</s>", 0.0, CONTROL)]
UNI_VOCAB = [
    ("▁", -2.0), ("▁hello", -3.0), ("hello", -5.0),
    ("▁w", -4.0), ("orld", -4.5), ("▁world", -3.25),
    ("he", -6.0), ("llo", -6.5),
    ("h", -9.0), ("e", -9.1), ("l", -9.2), ("o", -9.3), ("w", -9.4),
    ("r", -9.5), ("d", -9.6), ("\n", -11.0),
]


def _unigram_model(**kw) -> SentencePieceModel:
    data = model_bytes(
        UNI_SPECIALS + [piece(p, s) for p, s in UNI_VOCAB], **kw)
    return SentencePieceModel.from_bytes(data)


def test_parse_model_proto():
    m = _unigram_model()
    assert m.vocab_size() == 3 + len(UNI_VOCAB)
    assert m.unk_id() == 0 and m.bos_id() == 1 and m.eos_id() == 2
    assert m.pad_id() == -1  # negative int32 survives varint round-trip
    assert m.model_type == 1 and not m.byte_fallback
    assert m.piece_to_id("▁hello") == 4
    assert m.id_to_piece(4) == "▁hello"
    assert m.piece_to_id("not-a-piece") == m.unk_id()


def test_unigram_viterbi_picks_max_score_segmentation():
    m = _unigram_model()
    # "▁hello▁world": ▁hello(-3) + ▁world(-3.25) beats every split
    assert m.encode("hello world", out_type=str) == ["▁hello", "▁world"]
    ids = m.encode("hello world", add_bos=True, add_eos=True)
    assert ids[0] == 1 and ids[-1] == 2
    assert ids[1:-1] == [4, 8]


def test_unigram_parity_vs_hf_tokenizers():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers.models import Unigram
    from tokenizers.pre_tokenizers import Metaspace

    hf_vocab = [("<unk>", 0.0)] + UNI_VOCAB
    hf = tokenizers.Tokenizer(Unigram(hf_vocab, unk_id=0, byte_fallback=False))
    hf.pre_tokenizer = Metaspace(replacement="▁", prepend_scheme="always")

    m = _unigram_model()
    for text in ["hello world", "world", "hello hello world", "held",
                 "wow", "lode", "do rod he", "hello xylo world"]:
        ours = m.encode(text, out_type=str)
        theirs = hf.encode(text).tokens
        # hf reports unknown chars as their surface; ours as one fused <unk>
        theirs = ["<unk>" if t not in {p for p, _ in hf_vocab} else t
                  for t in theirs]
        fused = [t for i, t in enumerate(theirs)
                 if t != "<unk>" or i == 0 or theirs[i - 1] != "<unk>"]
        assert ours == fused, (text, ours, theirs)


def test_unigram_consecutive_unknowns_fuse():
    m = _unigram_model()
    # "xy" has no pieces: both chars are unknown -> ONE unk id
    out = m.encode("xy", out_type=int)
    # dummy prefix ▁ then a single fused unk
    assert out == [m.piece_to_id("▁"), m.unk_id()]


def test_byte_fallback():
    pieces = (UNI_SPECIALS
              + [piece(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
              + [piece(p, s) for p, s in UNI_VOCAB])
    m = SentencePieceModel.from_bytes(model_bytes(pieces, byte_fallback=True))
    out = m.encode("hé", out_type=str)  # é = 0xC3 0xA9 in utf-8
    assert out == ["▁", "h", "<0xC3>", "<0xA9>"]
    assert m.decode(m.encode("hé wow")) == "hé wow"


def test_normalizer_options():
    m = _unigram_model()
    assert m.normalize("  hello   world ") == "▁hello▁world"
    m2 = _unigram_model(dummy_prefix=False, remove_ws=False)
    assert m2.normalize(" hello") == "▁hello"
    # NFKC: ﬁ ligature decomposes; identity leaves it alone
    m3 = _unigram_model(name="nmt_nfkc")
    assert m3.normalize("ﬁn") == "▁fin"
    assert m.normalize("ﬁn") == "▁ﬁn"


def test_decode_roundtrip_and_unk_surface():
    m = _unigram_model()
    assert m.decode(m.encode("hello world")) == "hello world"
    assert m.decode(m.encode("hello  world ")) == "hello world"
    assert " ⁇ " in m.decode(m.encode("hello Q"))  # unk surface
    # control ids are dropped
    assert m.decode(m.encode("world", add_bos=True, add_eos=True)) == "world"


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

BPE_CHARS = [("h", -100.0), ("e", -101.0), ("l", -102.0), ("o", -103.0),
             ("w", -104.0), ("r", -105.0), ("d", -106.0), ("▁", -107.0)]
# merge priority = score (higher first); every piece has one decomposition
BPE_MERGES = [
    ("l", "l", "ll", -1.0),
    ("ll", "o", "llo", -2.0),
    ("he", "llo", "hello", -3.0),
    ("h", "e", "he", -4.0),
    ("▁", "hello", "▁hello", -5.0),
    ("o", "r", "or", -6.0),
    ("▁w", "or", "▁wor", -7.0),
    ("▁", "w", "▁w", -8.0),
    ("l", "d", "ld", -9.0),
]


def _bpe_model() -> SentencePieceModel:
    pieces = (UNI_SPECIALS
              + [piece(p, s) for p, s in BPE_CHARS]
              + [piece(m, s) for _, _, m, s in BPE_MERGES])
    return SentencePieceModel.from_bytes(model_bytes(pieces, model_type=2))


def test_bpe_merge_order():
    m = _bpe_model()
    assert m.encode("hello", out_type=str) == ["▁hello"]
    # ▁world: ▁w+or formed (scores -8,-6) -> ▁wor, then l+d -> ld
    assert m.encode("world", out_type=str) == ["▁wor", "ld"]
    assert m.encode("hello world", out_type=str) == [
        "▁hello", "▁wor", "ld"]


def test_bpe_parity_vs_hf_tokenizers():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Metaspace

    m = _bpe_model()
    vocab = {p.piece: i for i, p in enumerate(m.pieces)}
    # hf BPE ranks merges by list order == sentencepiece's score order
    merges = [(a, b) for a, b, _, _ in
              sorted(BPE_MERGES, key=lambda t: -t[3])]
    hf = tokenizers.Tokenizer(BPE(vocab, merges, unk_token="<unk>"))
    hf.pre_tokenizer = Metaspace(replacement="▁", prepend_scheme="always")
    for text in ["hello world", "hold", "wed", "hello hello",
                 "dror", "owl he"]:
        assert m.encode(text, out_type=str) == hf.encode(text).tokens, text


def test_bpe_unknown_char_falls_back():
    m = _bpe_model()
    out = m.encode("hxo", out_type=int)
    assert m.unk_id() in out
    pieces = (UNI_SPECIALS
              + [piece(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
              + [piece(p, s) for p, s in BPE_CHARS]
              + [piece(mm, s) for _, _, mm, s in BPE_MERGES])
    mb = SentencePieceModel.from_bytes(
        model_bytes(pieces, model_type=2, byte_fallback=True))
    assert "<0x78>" in mb.encode("hxo", out_type=str)  # 'x'


# ---------------------------------------------------------------------------
# SpmTokenizer wrapper + Pi0Tokenization end-to-end
# ---------------------------------------------------------------------------


def test_spm_tokenizer_file_roundtrip(tmp_path):
    path = tmp_path / "tokenizer.model"
    path.write_bytes(model_bytes(
        UNI_SPECIALS + [piece(p, s) for p, s in UNI_VOCAB]))
    tok = SpmTokenizer(str(path), model_max_length=48)
    assert tok.vocab_size == 3 + len(UNI_VOCAB)
    assert tok.bos_token_id == 1 and tok.eos_token_id == 2
    assert tok.pad_token_id == 0  # pad_id=-1 -> 0 like HF's fallback
    ids = tok.encode("hello world", add_special_tokens=True)
    assert ids[0] == 1
    assert tok.decode(ids) == "hello world"
    assert tok.convert_tokens_to_ids("▁hello") == 4


def test_build_tokenizer_loads_raw_model_file(tmp_path):
    """TokenizerConfig.tokenizer_path pointing at a raw .model file (or a dir
    holding only tokenizer.model) builds the sentencepiece-free SpmTokenizer."""
    from dexbotic_tpu.exp.base_exp import TokenizerConfig

    data = model_bytes(UNI_SPECIALS + [piece(p, s) for p, s in UNI_VOCAB])
    path = tmp_path / "tokenizer.model"
    path.write_bytes(data)
    for p in (str(path), str(tmp_path)):
        tok = TokenizerConfig(tokenizer_path=p, model_max_length=48).build_tokenizer()
        assert isinstance(tok, SpmTokenizer)
        assert tok.model_max_length == 48
        assert tok.sp_model.encode("hello", add_bos=True)[0] == 1


def test_spm_hf_call_surface_feeds_tokenize_layer():
    """tokenize.py does `tokenizer(text).input_ids` (HF BatchEncoding style);
    SpmTokenizer.__call__ must provide it so raw .model files work through
    tokenizer_image_token / tokenize_dexbotic, not only Pi0Tokenization."""
    from dexbotic_tpu.tokenization.tokenize import tokenizer_image_token

    tok = SpmTokenizer(SentencePieceModel.from_bytes(model_bytes(
        UNI_SPECIALS + [piece(p, s) for p, s in UNI_VOCAB])),
        model_max_length=48)
    enc = tok("hello world")
    assert enc.input_ids == enc["input_ids"] == tok.encode("hello world")
    assert enc.input_ids[0] == tok.bos_token_id

    ids = tokenizer_image_token("hello<image>world", tok, num_image_tokens=3)
    assert ids.count(-200) == 3
    assert ids[0] == tok.bos_token_id
    # exactly one bos total (per-chunk bos stripped by the splice)
    assert ids.count(tok.bos_token_id) == 1


def test_pi0_tokenization_with_spm():
    """Reference path: sp_model.encode(cleaned, add_bos=True) + encode('\\n'),
    zero-padded to max_len (dexbotic/tokenization/process.py:116-127)."""
    tok = SpmTokenizer(SentencePieceModel.from_bytes(model_bytes(
        UNI_SPECIALS + [piece(p, s) for p, s in UNI_VOCAB])),
        model_max_length=48)
    out = Pi0Tokenization(tok, max_len=48)(
        [{"from": "human", "value": "hello_world\n"}])
    ids = out["input_ids"]
    assert ids.shape == (48,)
    expect = ([1] + tok.sp_model.encode("hello world")
              + tok.sp_model.encode("\n"))
    assert list(ids[:len(expect)]) == expect
    assert (ids[len(expect):] == 0).all()
    assert out["token_mask"].sum() == len(expect)
    assert np.array_equal(out["labels"], ids)


# ---------------------------------------------------------------------------
# Precompiled charsmap (darts-clone trie) — exact sentencepiece normalization
# ---------------------------------------------------------------------------


def build_darts_charsmap(mapping: dict) -> bytes:
    """Hand-build a NormalizerSpec.precompiled_charsmap blob: a valid
    darts-clone double-array over the UTF-8 source keys + the NUL-terminated
    replacement blob.  Unit layout matches darts-clone's DoubleArrayUnit
    (label=low byte, has_leaf=bit8, offset=(unit>>10), leaf value at
    base^0 with bit31 set) — readable by BOTH our DartsCharsMap and the HF
    tokenizers Rust `Precompiled` normalizer, which makes the Rust
    implementation a parity oracle for ours."""
    import collections
    import struct as _struct

    root: dict = {}
    norm = bytearray()
    values: dict = {}
    for src, dst in sorted(mapping.items()):
        node = root
        for b in src.encode():
            node = node.setdefault(b, {})
        values[id(node)] = len(norm)
        norm += dst.encode() + b"\x00"

    units = [0] * 8
    used = [False] * 8
    used_bases = set()  # darts requires EXCLUSIVE bases: two nodes sharing a
    # base would accept each other's transitions (label check can't tell)

    def ensure(n):
        while len(units) <= n:
            units.append(0)
            used.append(False)

    pos_of = {id(root): 0}
    used[0] = True
    incoming: dict = {}
    queue = collections.deque([root])
    while queue:
        node = queue.popleft()
        p = pos_of[id(node)]
        slots = sorted(node.keys())
        if id(node) in values:
            slots = [0] + slots
        base = 1
        while True:
            ensure(base + 256)
            if base not in used_bases and all(not used[base ^ c] for c in slots):
                break
            base += 1
        used_bases.add(base)
        for c in slots:
            q = base ^ c
            used[q] = True
            if c == 0:
                units[q] = 0x80000000 | values[id(node)]
            else:
                pos_of[id(node[c])] = q
                incoming[id(node[c])] = c
                queue.append(node[c])
        off = p ^ base
        assert off < (1 << 21)
        leaf = 1 if id(node) in values else 0
        label = incoming.get(id(node), 0)
        units[p] = (off << 10) | (leaf << 8) | label

    trie = b"".join(_struct.pack("<I", u) for u in units)
    return _struct.pack("<I", len(trie)) + trie + bytes(norm)


# a realistic nmt_nfkc-style slice: compatibility decompositions, whitespace
# foldings, a deletion — single-grapheme sources only (HF oracle limit)
CHARSMAP = {
    "Ａ": "A",        # fullwidth A
    "ﬁ": "fi",       # ﬁ ligature
    " ": " ",        # nbsp -> space
    " ": " ",        # line separator -> space
    "​": "",         # zero-width space DELETED
    "Å": "Å",   # identity mapping still goes through the trie
}

# multi-byte/multi-grapheme overlap family: native sentencepiece does
# byte-level LONGEST match (normalizer.cc NormalizePrefix); only our
# reader is asserted on these — HF's Rust `Precompiled` deviates from
# native sentencepiece by normalizing grapheme-by-grapheme, so
# multi-grapheme keys never match there
CHARSMAP_MULTI = dict(CHARSMAP, **{"ab": "Q", "abc": "Z"})

ADVERSARIAL = [
    "Ａbc​d",            # mapped + longest-match + deletion
    "abc", "ab", "abd", "aabcc",  # overlap family
    "ﬁn du monde !",
    "  x​",
    "plain ascii stays",
    "ünïcödé ﬁ ＡＡ",
    "Ångström",
    "",
]


def test_charsmap_parity_vs_hf_precompiled():
    """Our darts reader must normalize EXACTLY like HF tokenizers' Rust
    `Precompiled` (the sentencepiece-compatibility implementation)."""
    from tokenizers.normalizers import Precompiled

    from dexbotic_tpu.tokenization.spm import DartsCharsMap

    blob = build_darts_charsmap(CHARSMAP)
    ours = DartsCharsMap(blob)
    theirs = Precompiled(blob)
    for text in ADVERSARIAL:
        assert ours.normalize(text) == theirs.normalize_str(text), repr(text)


def test_charsmap_longest_match_and_deletion():
    from dexbotic_tpu.tokenization.spm import DartsCharsMap

    cm = DartsCharsMap(build_darts_charsmap(CHARSMAP_MULTI))
    assert cm.normalize("abc") == "Z"
    assert cm.normalize("abd") == "Qd"
    assert cm.normalize("aabcc") == "aZc"
    assert cm.normalize("x​y") == "xy"
    assert cm.normalize("Ａﬁ") == "Afi"
    # invalid utf-8 never reaches str inputs, but lone surrogates do:
    # handled by the encode/replace path without raising
    assert isinstance(cm.normalize("ok"), str)


def test_model_with_charsmap_normalizes_exactly():
    """A .model whose NormalizerSpec carries the charsmap must use it (NOT
    the NFKC approximation): 'ab' folds to 'Q' which NFKC would never do."""
    norm_spec = (_ld(1, b"nmt_nfkc") + _ld(2, build_darts_charsmap(CHARSMAP_MULTI))
                 + _vi(3, 1) + _vi(4, 1) + _vi(5, 1))
    trainer = _vi(3, 1) + _vi(40, 0) + _vi(41, 1) + _vi(42, 2) + _vi(43, -1)
    pieces = UNI_SPECIALS + [piece(p, s) for p, s in UNI_VOCAB] + [
        piece("Q", -1.0), piece("▁Q", -1.0), piece("A", -1.5), piece("fi", -1.5),
    ]
    data = b"".join(pieces) + _ld(2, trainer) + _ld(3, norm_spec)
    m = SentencePieceModel.from_bytes(data)
    assert m.charsmap is not None
    assert m.normalize("ab") == "▁Q"
    assert m.normalize("ﬁ") == "▁fi"
    # and through encode(): ids of the folded pieces
    assert m.encode("ab") == m.encode("Q")
