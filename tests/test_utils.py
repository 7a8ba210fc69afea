"""Tests for runtime utilities (mirrors reference tests/test_utils.py)."""

from speech_recognition_tpu.utils import levenshtein_distance, path_join


def test_levenshtein_gold_cases():
    assert levenshtein_distance("abc", "abc", normalize=False) == 0
    assert levenshtein_distance("abc", "axc", normalize=False) == 1
    assert levenshtein_distance("kitten", "sitting", normalize=False) == 3
    assert levenshtein_distance("flaw", "lawn", normalize=False) == 2
    assert levenshtein_distance("", "", normalize=False) == 0
    assert levenshtein_distance("abc", "", normalize=False) == 3
    assert levenshtein_distance("", "abc", normalize=False) == 3


def test_levenshtein_korean_and_normalized():
    assert levenshtein_distance("안녕하세요", "안녕하세용", normalize=False) == 1
    assert levenshtein_distance("안녕하세요", "안녕하세용") == 1 / 5
    assert levenshtein_distance(["hello", "world"], ["hello", "word"], normalize=False) == 1
    assert levenshtein_distance(["hello", "world"], ["hello", "word"]) == 0.5


def test_levenshtein_matches_reference_dp():
    import numpy as np

    rng = np.random.default_rng(0)
    for _ in range(20):
        a = "".join(rng.choice(list("abcd"), rng.integers(0, 12)))
        b = "".join(rng.choice(list("abcd"), rng.integers(1, 12)))
        # O(mn) reference DP (reference utils.py:80-101)
        m, n = len(a) + 1, len(b) + 1
        d = np.zeros([m, n], np.int32)
        d[0] = np.arange(n)
        d[:, 0] = np.arange(m)
        for i in range(1, m):
            for j in range(1, n):
                diff = int(a[i - 1] != b[j - 1])
                d[i, j] = min(d[i - 1, j - 1] + diff, d[i - 1, j] + 1, d[i, j - 1] + 1)
        assert levenshtein_distance(a, b, normalize=False) == d[m - 1, n - 1]


def test_path_join():
    assert path_join("gs://bucket", "a", "b") == "gs://bucket/a/b"
    assert path_join("gs://bucket/", "a/") == "gs://bucket/a"
    assert path_join("/local", "a", "b").endswith("/local/a/b")
