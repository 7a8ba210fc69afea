"""SentencePiece-compatible tokenizer tests.

Golden ids were generated with the HuggingFace `tokenizers` Rust unigram
implementation loaded from the same .model files (an independent
reimplementation of sentencepiece), except where noted.
"""

import pytest

from speech_recognition_tpu.data.tokenizer import SentencePieceTokenizer

from .const import SP_MODEL_KSPON, SP_MODEL_LIBRI

GOLD_LIBRI = {
    "Hello World Good night": [2921, 1, 837, 1, 1629, 1, 50, 1],
    "gOddy bye": [50, 1, 424, 1, 50, 1],
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG": [17, 480, 847, 1749, 1235, 18, 113, 17, 913, 1, 38, 747],
    "I AM SITTING IN A ROOM DIFFERENT FROM THE ONE YOU ARE IN NOW": [25, 157, 750, 24, 23, 199, 530, 61, 17, 63, 35, 72, 24, 92],
    "A": [23],
    "MISSISSIPPI RIVERBOAT GAMBLERS": [5744, 559, 8088, 9720, 18],
    "IT WAS THE BEST OF TIMES IT WAS THE WORST OF TIMES": [29, 30, 17, 370, 21, 577, 29, 30, 17, 1791, 21, 577],
    "DON'T STOP BELIEVING": [172, 32, 52, 860, 3969],
    "HELLO,WORLD": [6610, 1, 9944],
    # NFKC folding of full-width forms via the precompiled charsmap
    "ＡＢＣ ｆｕｌｌｗｉｄｔｈ": [4376, 795, 50, 1],
    "Multi   spaces\tand\ttabs": [1203, 1, 50, 1, 50, 1, 50, 1],
    "ACCENTS ÀÉÎÕÜ": [3934, 18, 50, 1],
}

GOLD_KSPON = {
    "안녕하세요 반갑습니다": [6798, 283, 3153, 1758],
    "한국어 음성 인식 테스트": [4629, 107, 419, 3647, 6672],
    "Hello World Good night": [22, 6190, 4367, 5645, 5645, 3977, 22, 7745, 3977, 5169, 5645, 4972, 22, 3441, 3977, 3977, 4972, 22, 4232, 4547, 5022, 7676, 2774],
}


@pytest.fixture(scope="module")
def libri():
    return SentencePieceTokenizer(SP_MODEL_LIBRI, add_bos=False, add_eos=False)


@pytest.fixture(scope="module")
def kspon():
    return SentencePieceTokenizer(SP_MODEL_KSPON, add_bos=False, add_eos=False)


def test_special_ids(libri):
    assert (libri.unk_id, libri.bos_id, libri.eos_id, libri.pad_id) == (1, 2, 3, 0)
    assert libri.vocab_size == 16000


@pytest.mark.parametrize("text", sorted(GOLD_LIBRI))
def test_libri_gold(libri, text):
    assert libri.tokenize(text) == GOLD_LIBRI[text]


@pytest.mark.parametrize("text", sorted(GOLD_KSPON))
def test_kspon_gold(kspon, text):
    assert kspon.tokenize(text) == GOLD_KSPON[text]


def test_bos_eos(libri):
    tok = SentencePieceTokenizer(SP_MODEL_LIBRI, add_bos=True, add_eos=True)
    assert tok.tokenize("") == [tok.bos_id, tok.eos_id]
    assert tok.tokenize("A") == [tok.bos_id] + GOLD_LIBRI["A"] + [tok.eos_id]


def test_detokenize_roundtrip(libri):
    text = "IT WAS THE BEST OF TIMES IT WAS THE WORST OF TIMES"
    assert libri.detokenize(libri.tokenize(text)) == text


def test_detokenize_skips_control(libri):
    ids = [libri.bos_id] + GOLD_LIBRI["A"] + [libri.eos_id, libri.pad_id, libri.pad_id]
    assert libri.detokenize(ids) == "A"


def test_detokenize_korean(kspon):
    text = "안녕하세요 반갑습니다"
    assert kspon.detokenize(kspon.tokenize(text)) == text


def test_composed_hangul_stays_composed(kspon):
    # '가' (U+AC00) is NORMAL piece id 34 in the kspon vocab.  The HF oracle
    # maps it to UNK here (known HF Precompiled Hangul quirk); real
    # sentencepiece keeps the composed syllable.
    ids = kspon.tokenize("아가 조합형 자모")
    assert 34 in ids and kspon.unk_id not in ids


def test_unknowns_fused(libri):
    # consecutive OOV characters collapse into a single UNK id
    ids = libri.tokenize("Hello")
    assert ids == [2921, 1]


def test_darts_leaf_label_collision(libri):
    """darts-clone label() is ``unit & 0x800000FF``: the bit-31 leaf marker
    must participate in the label compare.  Without it, a leaf unit whose
    low byte collides with the next input byte is traversed as if it were a
    branch and its value bits are XORed in as an offset — an out-of-bounds
    walk that crashed on real inputs under the libri nmt_nfkc charsmap
    (round-5 regression)."""
    # these inputs hit leaf/label collisions in the normalizer trie
    for text in ("charlie", "alpha alpha", "CHARLIE TANGO ALPHA"):
        ids = libri.tokenize(text)
        assert all(0 <= i < libri.vocab_size for i in ids)
    # uppercase round-trips exactly (the libri model is all-caps)
    text = "CHARLIE TANGO ALPHA"
    assert libri.detokenize(libri.tokenize(text)) == text
