import numpy as np
import pytest

from audio_processor_tpu.models.tokenizer import (
    CTCVocab, batch_decode, ctc_collapse, decode_ids,
)


@pytest.fixture
def vocab():
    return CTCVocab({"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3,
                     "|": 4, "a": 5, "b": 6, "c": 7})


def test_ctc_collapse():
    np.testing.assert_array_equal(
        ctc_collapse(np.array([5, 5, 0, 5, 6, 6, 0, 0, 7]), 0),
        np.array([5, 5, 6, 7]))
    assert ctc_collapse(np.array([], dtype=np.int64), 0).size == 0
    assert ctc_collapse(np.array([0, 0, 0]), 0).size == 0


def test_decode_ids(vocab):
    # "ab|c" with repeats and blanks: a a <pad> b b | | c
    assert decode_ids([5, 5, 0, 6, 6, 4, 4, 7], vocab) == "ab c"


def test_decode_repeated_char_needs_blank(vocab):
    # 'aa' requires a blank between; without it repeats collapse.
    assert decode_ids([5, 5, 5], vocab) == "a"
    assert decode_ids([5, 0, 5], vocab) == "aa"


def test_skip_special_tokens(vocab):
    ids = [1, 5, 2, 3, 6]
    assert decode_ids(ids, vocab, skip_special_tokens=True) == "ab"
    assert decode_ids(ids, vocab) == "<s>a</s><unk>b"


def test_batch_decode_with_mask(vocab):
    ids = np.array([[5, 6, 0, 0], [7, 4, 5, 5]])
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], bool)
    assert batch_decode(ids, vocab, mask) == ["ab", "c a"]


def test_darija_default_vocab():
    v = CTCVocab.darija_default()
    assert v.pad_id == 0
    assert len(v) > 40
    assert decode_ids([v.vocab["س"], v.vocab["|"], v.vocab["a"]], v) == "س a"


def test_hf_tokenizer_parity(tmp_path):
    """Decode parity vs HF Wav2Vec2CTCTokenizer on random id sequences."""
    transformers = pytest.importorskip("transformers")
    import json

    vocab_dict = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4,
                  "a": 5, "b": 6, "c": 7, "d": 8, "e": 9}
    vp = tmp_path / "vocab.json"
    vp.write_text(json.dumps(vocab_dict))
    hf_tok = transformers.Wav2Vec2CTCTokenizer(
        str(vp), pad_token="<pad>", word_delimiter_token="|")
    ours = CTCVocab(vocab_dict)
    rng = np.random.default_rng(0)
    for _ in range(25):
        ids = rng.integers(0, 10, size=50)
        ref = hf_tok.decode(ids, skip_special_tokens=True)
        got = decode_ids(ids, ours, skip_special_tokens=True)
        assert got == ref, (ids.tolist(), got, ref)
