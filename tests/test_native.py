"""Native C++ wordpiece: exact parity with the Python tokenizer (UTF-8
BMP-complete path + flagged-codepoint fallback), fuzz-tested, plus a sanity
speed check."""
import random
import string
import time

import numpy as np
import pytest

from proqa_tpu.text.basic import BasicTokenizer
from proqa_tpu.text.wordpiece import BertTokenizer, WordpieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] the quick brown fox jump ##s over lazy dog a an of "
    "in was b ##ob born 1992 ##92 19 , . ? ! ' - ( ) un ##able able run ##ning "
    "1 2 3 ##1 ##2 ##3 w ##0 ##4 ##5 tok ##en"
).split(" ")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    p = tmp_path_factory.mktemp("nat") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    native = BertTokenizer.from_vocab_file(str(p))
    if native._native is None:
        pytest.skip("native tokenizer unavailable (g++ missing?)")
    pure = BertTokenizer.from_vocab_file(str(p))
    pure._native = None
    return native, pure


def test_native_matches_python_basic(pair):
    native, pure = pair
    cases = [
        "The quick brown fox jumps over the lazy dog",
        "unable, unknowable!! running",
        "b0b was born in 1992.",
        "", "   ", "a" * 150,
        "control\x01chars\x7fhere",
        "tabs\tand\nnewlines",
    ]
    for s in cases:
        assert native.tokenize(s) == pure.tokenize(s), repr(s)


def test_native_unicode_parity(pair):
    """Non-ASCII BMP text runs natively now (tables from unicodedata); the
    results must match the pure-Python path exactly."""
    native, pure = pair
    cases = [
        "naïve café", "héllo", "токен", "日本語 text",
        "Zürich Üben ÄÖÜ ß strasse",          # Latin-1 accents + sharp s
        "ĄŻÓŁĆ ąż źdźbło",                     # Latin Extended
        "ΑΛΦΑΒΗΤΟ γράμμα",                     # Greek, non-final sigma forms
        "ΟΔΥΣΣΕΥΣ",                            # capital sigma: final-sigma ctx
        "Привет МИР ёлка",                      # Cyrillic
        "İstanbul İstanbul",              # dotted capital I + combining
        "á è́ ́",         # combining marks strip to base
        "x y z",                      # unicode spaces (Zs)
        "zero​width­hyphen",          # Cf controls are dropped
        "�replacement\x00char",            # invalid chars dropped
        "mixed ASCII + ünïcodé, twice! mixed ASCII + ünïcodé!",
        "한국어 텍스트",                          # Hangul -> NFD multi -> fallback
        "emoji 😀 astral",              # astral -> fallback
        "the quick fox",      # Zl/Zp: str.split() whitespace, not Zs
        "a\x85b c\x1cd",                # isspace() C1/C0 controls (deleted)
    ]
    for s in cases:
        assert native.tokenize(s) == pure.tokenize(s), repr(s)


def test_native_unicode_fuzz(pair):
    """Random mixed ASCII/BMP strings, including combining marks, CJK, and
    flagged codepoints — native must equal Python on every input."""
    native, pure = pair
    rng = random.Random(7)
    pools = [
        string.ascii_letters + string.digits + string.punctuation + "  \t",
        "àáâäçèéêëñöüßÀÉÎÖÜ",
        "αβγδεζΣσςΩω",
        "абвгдежзиАБВГД",
        "一二三中文字テストかタカ",
        "̀́̈  ​",
        "가냐더려",  # Hangul (fallback path)
        "😀𝄞",  # astral (fallback path)

        "\u2028\u2029\x85\x1c ",  # Zl/Zp + isspace controls
    ]
    for _ in range(300):
        n = rng.randint(0, 60)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        assert native.tokenize(s) == pure.tokenize(s), repr(s)


def test_native_cased_unicode_parity(pair, tmp_path):
    """Cased mode (SpanBERT path): no lowercasing/accent stripping; unicode
    classification still applies natively."""
    vocab = tmp_path / "vocab_cased.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "Zürich", "Apple", "apple",
         "Καλά", "##μέρα", "день"]
    ))
    native = BertTokenizer.from_vocab_file(str(vocab), do_lower_case=False)
    if native._native is None:
        pytest.skip("native tokenizer unavailable")
    pure = BertTokenizer.from_vocab_file(str(vocab), do_lower_case=False)
    pure._native = None
    for s in ["Zürich Apple apple", "Καλάμέρα ΟΔΥΣΣΕΥΣ", "день день!",
              "Zürich, Καλά: день"]:
        assert native.tokenize(s) == pure.tokenize(s), repr(s)


def test_native_fuzz(pair):
    native, pure = pair
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + string.punctuation + "  \t"
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        assert native.tokenize(s) == pure.tokenize(s), repr(s)


def test_native_encode_path(pair):
    native, _ = pair
    ids = native.encode("the quick fox", max_length=8)
    assert ids[0] == native.cls_id and ids[-1] == native.sep_id


def test_native_is_faster(pair):
    native, pure = pair
    text = "the quick brown fox jumps over the lazy dog , running unable ! " * 20

    def bench(tok, n=200):
        t0 = time.perf_counter()
        for _ in range(n):
            tok.tokenize(text)
        return time.perf_counter() - t0

    t_native, t_pure = bench(native), bench(pure)
    # soft bound: native should be clearly faster on ASCII text
    assert t_native < t_pure, (t_native, t_pure)


def _py_prepare(context, tok):
    """The pure-Python prepare_context loop (native path disabled)."""
    from proqa_tpu.text.squad import prepare_context

    class _NoNative:
        _native = None

        def __init__(self, inner):
            self._inner = inner

        def tokenize(self, text):
            return self._inner.tokenize(text)

    return prepare_context(context, _NoNative(tok))


def test_native_prepare_context_parity(pair):
    from proqa_tpu.text.squad import prepare_context

    native, pure = pair
    cases = [
        "the quick brown fox jumps over the lazy dog",
        "  leading and trailing  ",
        "punct,uation! splits-words (here)",
        "unable running b0b 1992.",
        "", "   ", "\tonly\nws\r", "x",
        "ctrl\x01inside\x7fword",
        "unicode naïve café ΑΛΦΑ день",
        "zl inside word stays one doc token",
        "a b c", " lead", "multi   spaces\t\ttabs",
        "word " + "a" * 150 + " end",   # >max_chars_per_word -> [UNK]
    ]
    for s in cases:
        got = prepare_context(s, native)
        want = _py_prepare(s, pure)
        assert got == tuple(want) or list(got) == list(want), repr(s)


def test_native_prepare_context_fuzz(pair):
    import random
    from proqa_tpu.text.squad import prepare_context

    native, pure = pair
    rng = random.Random(13)
    pools = [
        string.ascii_letters + string.digits + string.punctuation + "  \t\n",
        "àáçèñöß ",
        "αβΣσς 一二三",
        "  \x85\x1c\x01 ",
        "̀́ ​",
    ]
    for _ in range(250):
        n = rng.randint(0, 70)
        s = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        got = prepare_context(s, native)
        want = _py_prepare(s, pure)
        assert list(got) == list(want), repr(s)


def test_native_tokenize_thread_safety(pair):
    """One tokenizer instance is shared across sampler worker threads and
    the train/eval BatchLoader producers — concurrent tokenize calls must
    not corrupt each other (the output buffer is per-thread)."""
    import concurrent.futures

    native, pure = pair
    texts = [
        f"thread safety case {i}: the quick brown fox {i * 37} "
        + "runs " * (i % 7 + 1) + f"unknowable{i}!"
        for i in range(48)
    ]
    want = [pure.tokenize(t) for t in texts]

    def worker(seed: int):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(texts))
        for j in order:
            got = native.tokenize(texts[j])
            assert got == want[j], (j, got[:8], want[j][:8])
        return True

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        assert all(ex.map(worker, range(8)))
