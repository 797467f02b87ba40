"""Native (C++) scoring kernels: build + parity with the Python fallbacks."""

import os
import random
import string
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SO = os.path.join(REPO, "pyramidkv_tpu", "_native", "libpkv_native.so")


@pytest.fixture(scope="module", autouse=True)
def built():
    if not os.path.exists(SO):
        subprocess.run(["make", "-C", os.path.join(REPO, "csrc")], check=True,
                       capture_output=True)
    # reset the loader cache in case an earlier test poked it
    from pyramidkv_tpu import native

    native._LIB = None
    native._TRIED = False
    assert native.available()
    yield


def test_levenshtein_parity_random():
    from pyramidkv_tpu import native
    from pyramidkv_tpu.evalsuite.metrics import levenshtein_ratio as py

    rng = random.Random(0)
    alphabet = string.ascii_letters + " 0123456789éü中文"
    for _ in range(300):
        a = "".join(rng.choices(alphabet, k=rng.randint(0, 50)))
        b = "".join(rng.choices(alphabet, k=rng.randint(0, 50)))
        assert abs(native.levenshtein_ratio(a, b) - py(a, b)) < 1e-9


def test_string_match_all_parity():
    from pyramidkv_tpu import native
    from pyramidkv_tpu.evalsuite.metrics import string_match_all as py

    preds = ["the KEY is here", "nothing", "a b c", ""]
    refs = [["key"], ["x", "y"], ["a", "b", "z"], ["q"]]
    assert abs(native.string_match_all(preds, refs) - py(preds, refs)) < 1e-9


def test_token_f1_parity():
    from pyramidkv_tpu import native
    from pyramidkv_tpu.evalsuite.metrics import _token_f1 as py

    cases = [
        (["a", "b", "b"], ["b", "c"]),
        ([], ["x"]),
        (["x"], ["x"]),
        (["a"] * 5, ["a"] * 3 + ["b"]),
    ]
    for a, b in cases:
        assert abs(native.token_f1(a, b) - py(a, b)) < 1e-12


def test_rouge_l_native_vs_python_fallback():
    from pyramidkv_tpu import native

    t1 = "the quick brown fox jumps over".split()
    t2 = "a quick fox jumped over it".split()
    nat = native.rouge_l_f1(t1, t2)
    lib, tried = native._LIB, native._TRIED
    try:
        native._LIB, native._TRIED = None, True  # force fallback
        pyv = native.rouge_l_f1(t1, t2)
    finally:
        native._LIB, native._TRIED = lib, tried
    assert abs(nat - pyv) < 1e-12


def test_code_sim_uses_native():
    from pyramidkv_tpu.evalsuite.metrics import code_sim_score

    assert code_sim_score("# c\nreturn x\n", "return x") == 1.0
