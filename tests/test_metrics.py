"""WER/CER metrics (utils/metrics.py) — edit distance parity-tested
against rapidfuzz's Levenshtein, rates against hand-computed cases."""

import numpy as np
import pytest

from audio_processor_tpu.utils.metrics import cer, edit_distance, wer


def test_edit_distance_matches_rapidfuzz_on_random_sequences():
    rf = pytest.importorskip("rapidfuzz")
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = "".join(rng.choice(list("abcde "), rng.integers(0, 30)))
        b = "".join(rng.choice(list("abcde "), rng.integers(0, 30)))
        assert edit_distance(a, b) == rf.distance.Levenshtein.distance(a, b)


def test_edit_distance_token_sequences():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a", "b"]) == 2
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance(["the", "cat"], ["the", "hat"]) == 1


def test_wer_hand_computed():
    # 1 sub + 1 del over 4 reference words
    assert wer(["the cat sat down"], ["the hat sat"]) == 2 / 4
    assert wer(["a b"], ["a b"]) == 0.0
    # corpus-level: edits sum over utterances, divided by total ref
    # words — NOT the mean of per-utterance rates
    got = wer(["a b c d e f g h i j", "x"], ["a b c d e f g h i j", "y"])
    assert got == 1 / 11


def test_cer_whitespace_normalisation():
    assert cer(["ab  cd"], ["ab cd"]) == 0.0
    assert cer(["abc"], ["abd"]) == 1 / 3


def test_empty_reference_conventions():
    assert wer([""], [""]) == 0.0
    assert wer([""], ["x"]) == float("inf")
    with pytest.raises(ValueError):
        wer(["a"], ["a", "b"])
