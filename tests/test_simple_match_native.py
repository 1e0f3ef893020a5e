"""Native C++ SimpleTokenizer span matcher: exact parity with the Python
path (text/matching.py) on tricky unicode, fuzz-tested, plus a speed check.

The Python reference path is forced via a SimpleTokenizer subclass (the
native fast path engages only for the exact SimpleTokenizer type)."""
import random
import string
import time

import pytest

from proqa_tpu.text.matching import match_answer_span, normalize, para_has_answer
from proqa_tpu.text.simple import SimpleTokenizer


class _PyOnlyTokenizer(SimpleTokenizer):
    """Subclass -> type() check in _native_matcher fails -> pure Python."""


@pytest.fixture(scope="module")
def toks():
    from proqa_tpu.native.simple_match import get_matcher

    if get_matcher() is None:
        pytest.skip("native simple_match unavailable (g++ missing?)")
    return SimpleTokenizer(), _PyOnlyTokenizer()


CASES = [
    # (paragraph, answers)
    ("The quick brown fox jumps over the lazy dog", ["lazy dog"]),
    ("The quick brown fox", ["QUICK  Brown"]),          # case + ws folding
    ("punct, splits-words (here)!", ["splits"]),
    ("punct, splits-words (here)!", ["splits - words"]),  # punct tokens match
    ("repeated ans here and ans here too", ["ans here"]),  # multiple matches
    ("overlap aa aa aa end", ["aa aa"]),
    ("no match at all", ["missing"]),
    ("answer at the very end", ["end"]),
    ("start is the answer", ["start"]),
    ("", ["anything"]),
    ("some text", [""]),                                 # empty answer
    ("some text", ["", "text"]),
    ("multi answer list", ["nope", "answer list"]),
    ("unicode naïve café crème", ["naïve café"]),
    ("Zürich ÜBEN strasse", ["zürich üben"]),
    ("Привет мир ёлка", ["МИР"]),
    ("日本語のテキストです", ["テキスト"]),               # CJK: one token per run
    ("a​b c", ["ab"]),                              # ZWSP (Cf) inside word
    ("gap‍ here trail  ", ["gap here"]),            # Cf char in token gap
    ("tabs\tand\nnewlines and", ["and newlines"]),
    ("unicode thin spaces", ["thin spaces"]),
    ("hyphen-ated words", ["hyphen-ated"]),
    ("digits 1992 and 3.14 here", ["3.14"]),
    ("mixed 'quotes' “smart”", ["smart"]),
    ("a  b   c    d", ["b c"]),
    ("ΟΔΥΣΣΕΥΣ was here", ["οδυσσευς"]),                 # sigma -> fallback path
    ("İstanbul visit", ["istanbul"]),                    # dotted I -> fallback
    ("astral 😀 emoji text", ["emoji"]),                 # astral -> fallback
    ("combining é vs é compare", ["é"]),                 # NFC vs NFD answer
]


def test_para_has_answer_parity(toks):
    fast, py = toks
    for para, answers in CASES:
        got = para_has_answer(para, answers, fast)
        want = para_has_answer(para, answers, py)
        assert got == want, (para, answers, got, want)


def test_match_answer_span_parity(toks):
    fast, py = toks
    for para, answers in CASES:
        got = match_answer_span(normalize(para), answers, fast)
        want = match_answer_span(normalize(para), answers, py)
        assert sorted(got) == sorted(want), (para, answers, got, want)


def test_match_fuzz(toks):
    fast, py = toks
    rng = random.Random(11)
    pools = [
        string.ascii_letters + string.digits + string.punctuation + "  \t\n",
        "àáçèñöß ",
        "αβΣσς 一二三 ",
        "абвгд ёЁ ",
        "  \x85​‍ ",
        "̀́ ",
        "😀𝄞 ",  # astral -> both sides must agree via fallback
    ]
    for _ in range(300):
        para = "".join(rng.choice(rng.choice(pools)) for _ in range(rng.randint(0, 80)))
        # answers: random snippets of the para (likely matches) + random junk
        answers = []
        if len(para) > 4:
            i = rng.randrange(len(para) - 2)
            answers.append(para[i : i + rng.randint(1, 12)])
        answers.append("".join(
            rng.choice(rng.choice(pools)) for _ in range(rng.randint(0, 6))
        ))
        assert para_has_answer(para, answers, fast) == \
            para_has_answer(para, answers, py), (para, answers)
        assert sorted(match_answer_span(normalize(para), answers, fast)) == \
            sorted(match_answer_span(normalize(para), answers, py)), (para, answers)


def test_regex_mode_unchanged(toks):
    fast, _ = toks
    got = match_answer_span("the year 1992 was fine", ["19\\d2"], fast, match="regex")
    assert got == ["1992"]


def test_native_match_is_faster(toks):
    fast, py = toks
    words = [f"tok{i}" for i in range(50)]
    para = normalize(" ".join(words * 5))
    answers = ["tok10 tok11", "tok40"]

    def bench(tok, n=200):
        t0 = time.perf_counter()
        for _ in range(n):
            match_answer_span(para, answers, tok)
        return time.perf_counter() - t0

    t_fast, t_py = bench(fast), bench(py)
    assert t_fast < t_py, (t_fast, t_py)
