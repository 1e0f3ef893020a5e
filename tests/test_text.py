"""Text stack tests: wordpiece golden vs HuggingFace, span machinery, metrics,
answer matching. These pin the behavior-critical host-side logic (SURVEY.md §4
calls for golden-value tests of tokenization/span mapping)."""
import random
import string

import pytest

from proqa_tpu.text import (
    BasicTokenizer,
    BertTokenizer,
    SimpleTokenizer,
    exact_match_score,
    f1_score,
    find_answer_spans,
    get_final_text,
    match_answer_span,
    metric_max_over_ground_truths,
    normalize,
    normalize_answer,
    para_has_answer,
    prepare_context,
    regex_match,
    regex_match_score,
)
from proqa_tpu.text.squad import char_spans_of, wordpieces_to_text

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s over lazy dog "
    "a an of in was b ##ob born 1992 ##92 19 paris capital france is what when "
    "city ##ty ci test ing ##ing run new york who wrote book , . ? ! ' \" - ( ) "
    "1 2 3 4 5 6 7 8 9 0 ##1 ##2 ##3 ##4 ##5 ##6 ##7 ##8 ##9 ##0 and to he she it "
    "un ##able able know ##n answer question para ##graph word piece ##piece"
).split(" ")


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tok(vocab_file):
    return BertTokenizer.from_vocab_file(vocab_file)


class TestWordpieceGolden:
    """Token-for-token parity with transformers' BertTokenizer on our vocab."""

    @pytest.fixture(scope="class")
    def hf(self, vocab_file):
        transformers = pytest.importorskip("transformers")
        return transformers.BertTokenizer(vocab_file, do_lower_case=True)

    SENTENCES = [
        "The quick brown fox jumps over the lazy dog",
        "Bob was born in 1992.",
        "What is the capital of France?",
        "unable, unknowable!! running tests",
        "Héllo wörld — naïve café",  # accents + unseen chars -> [UNK]s
        "a" * 150,  # overlong word
        "",
        "   ",
        "1992 2023 b0b",
    ]

    def test_tokenize_matches_hf(self, tok, hf):
        for s in self.SENTENCES:
            assert tok.tokenize(s) == hf.tokenize(s), s

    def test_encode_matches_hf(self, tok, hf):
        for s in self.SENTENCES:
            if not s.strip():
                continue
            ours = tok.encode(s, max_length=16)
            theirs = hf.encode(s, max_length=16, truncation=True)
            assert ours == theirs, s

    def test_fuzz_matches_hf(self, tok, hf):
        rng = random.Random(0)
        alphabet = string.ascii_letters + string.digits + string.punctuation + "  éü"
        for _ in range(200):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60)))
            assert tok.tokenize(s) == hf.tokenize(s), repr(s)


class TestBasicTokenizer:
    def test_lower_and_punct(self):
        bt = BasicTokenizer(do_lower_case=True)
        assert bt.tokenize("Hello, World!") == ["hello", ",", "world", "!"]

    def test_accents_stripped(self):
        assert BasicTokenizer().tokenize("naïve café") == ["naive", "cafe"]

    def test_cased(self):
        assert BasicTokenizer(do_lower_case=False).tokenize("Hello There") == ["Hello", "There"]

    def test_control_chars_removed(self):
        assert BasicTokenizer().tokenize("a\x00b�c") == ["abc"]


class TestSimpleTokenizer:
    def test_untokenize_roundtrip(self):
        st = SimpleTokenizer()
        text = "Bob Dylan (born 1941) wrote songs."
        assert st.tokenize(text).untokenize() == text

    def test_slice_untokenize(self):
        st = SimpleTokenizer()
        toks = st.tokenize("the quick brown fox")
        assert toks.slice(1, 3).untokenize() == "quick brown"

    def test_words_uncased(self):
        st = SimpleTokenizer()
        assert st.tokenize("Bob-Dylan").words(uncased=True) == ["bob", "-", "dylan"]

    def test_offsets(self):
        st = SimpleTokenizer()
        toks = st.tokenize("ab cd")
        assert toks.offsets() == [(0, 2), (3, 5)]


class TestMatching:
    def test_para_has_answer(self):
        st = SimpleTokenizer()
        covered, matched = para_has_answer("Bob was born in Paris in 1992.", ["PARIS"], st)
        assert covered and matched == "Paris"

    def test_para_no_answer(self):
        st = SimpleTokenizer()
        covered, matched = para_has_answer("nothing here", ["Paris"], st)
        assert not covered and matched == ""

    def test_match_answer_span_multi(self):
        st = SimpleTokenizer()
        p = "Paris is Paris, and paris."
        spans = match_answer_span(p, ["paris"], st)
        assert set(spans) == {"Paris", "paris"}

    def test_match_regex(self):
        spans = match_answer_span("In 1492 and 1493.", ["14\\d\\d"], None, match="regex")
        assert set(spans) == {"1492", "1493"}

    def test_regex_bad_pattern(self):
        assert regex_match("text", "[unclosed") == []

    def test_match_regex_drops_empty_matches(self):
        """Nullable patterns ('\\d*' matches '' at every position) must not
        mark every paragraph covered with whole-paragraph span targets —
        same train-path guard as the empty ans_words case."""
        spans = match_answer_span("no digits here at all", ["\\d*"], None, match="regex")
        assert spans == []
        spans = match_answer_span("years 1492 and 1493", ["\\d*"], None, match="regex")
        assert set(spans) == {"1492", "1493"}

    def test_simple_tokenizer_re_fallback_parity(self):
        """The stdlib-re fallback must tokenize NFD text (which the matchers
        always produce) like the regex-module original: combining marks stay
        inside words, '_' is its own token, IGNORECASE set.

        Exercises the SHIPPED fallback: simple.py is re-executed with the
        `regex` import blocked (it IS importable in this image, so the
        fallback branch never runs otherwise), not a hand-copied pattern."""
        import builtins
        import importlib.util
        import unicodedata

        from proqa_tpu.text import simple as _simple

        orig_import = builtins.__import__

        def blocked(name, *a, **k):
            if name == "regex":
                raise ImportError("blocked: force the stdlib-re fallback")
            return orig_import(name, *a, **k)

        spec = importlib.util.spec_from_file_location(
            "_simple_fallback_under_test", _simple.__file__
        )
        mod = importlib.util.module_from_spec(spec)
        import sys

        # dataclasses resolves string annotations via sys.modules[cls.__module__]
        sys.modules[spec.name] = mod
        builtins.__import__ = blocked
        try:
            spec.loader.exec_module(mod)
        finally:
            builtins.__import__ = orig_import
            sys.modules.pop(spec.name, None)
        assert mod._re.__name__ == "re"  # the fallback branch actually ran

        st = SimpleTokenizer()           # regex-backed original
        fb = mod.SimpleTokenizer()       # shipped stdlib-re fallback
        for text in ["naïve café", "foo_bar baz", "hello, world!", "ABC123 ÅΩ"]:
            nfd = unicodedata.normalize("NFD", text)
            want = st.tokenize(nfd).words()
            got = fb.tokenize(nfd).words()
            assert got == want, (text, got, want)
            # span/untokenize machinery agrees too
            assert fb.tokenize(nfd).untokenize() == st.tokenize(nfd).untokenize()

    def test_normalize_nfd(self):
        assert normalize("café") == "café"


class TestSquadSpans:
    def test_prepare_context_maps(self, tok):
        ctx = "Bob was born in 1992"
        doc_tokens, c2w, o2t, t2o, pieces = prepare_context(ctx, tok)
        assert doc_tokens == ["Bob", "was", "born", "in", "1992"]
        assert len(c2w) == len(ctx)
        assert c2w[0] == 0 and c2w[-1] == 4
        assert pieces == ["b", "##ob", "was", "born", "in", "1992"]
        assert o2t == [0, 2, 3, 4, 5]
        assert t2o == [0, 0, 1, 2, 3, 4]

    def test_find_answer_spans(self, tok):
        ctx = "Bob was born in 1992"
        doc_tokens, c2w, o2t, t2o, pieces = prepare_context(ctx, tok)
        spans_chars = char_spans_of(ctx, "1992")
        spans = find_answer_spans("1992", spans_chars, c2w, doc_tokens, pieces, o2t, tok)
        assert spans == [(5, 5)]
        assert pieces[5] == "1992"

    def test_find_answer_spans_subword(self, tok):
        ctx = "who is Bob"
        doc_tokens, c2w, o2t, t2o, pieces = prepare_context(ctx, tok)
        spans = find_answer_spans("Bob", char_spans_of(ctx, "Bob"), c2w, doc_tokens, pieces, o2t, tok)
        (s, e) = spans[0]
        assert pieces[s : e + 1] == ["b", "##ob"]

    def test_wordpieces_to_text(self):
        assert wordpieces_to_text(["b", "##ob", "was", "here"]) == "bob was here"

    def test_get_final_text_exact(self):
        # prediction 'john smith' inside original 'John Smith lives here.'
        out = get_final_text("john smith", "John Smith lives here.", do_lower_case=True)
        assert out == "John Smith"

    def test_get_final_text_punct(self):
        out = get_final_text("1992", "(1992)", do_lower_case=True)
        assert out == "1992"

    def test_get_final_text_fallback(self):
        orig = "Something else entirely"
        assert get_final_text("zzz", orig, do_lower_case=True) == orig


class TestMetrics:
    def test_normalize_answer(self):
        assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"

    def test_em(self):
        assert exact_match_score("the answer", "Answer")
        assert not exact_match_score("an answer", "another")

    def test_f1(self):
        assert f1_score("brown fox", "the big brown fox") == pytest.approx(0.8)
        assert f1_score("xyz", "abc") == 0.0

    def test_regex_match_score(self):
        assert regex_match_score("1492", r"14\d\d")
        assert not regex_match_score("992", r"14\d\d")
        assert not regex_match_score("1492", r"[bad")

    def test_max_over_ground_truths(self):
        assert metric_max_over_ground_truths(exact_match_score, "a b", ["x", "A B."])


class TestRegexpTokenizer:
    def test_substitutions_and_spans(self):
        from proqa_tpu.text.simple import RegexpTokenizer
        rt = RegexpTokenizer()
        toks = rt.tokenize('He said "hello" -- then... left')
        words = toks.words()
        assert "``" in words and "''" in words
        assert "--" in words and "..." in words
        assert rt.tokenize("can't stop").words(uncased=True)[:2] == ["ca", "n't"]

    def test_digits_kept_whole(self):
        from proqa_tpu.text.simple import RegexpTokenizer
        rt = RegexpTokenizer()
        assert "3.14" in rt.tokenize("pi is 3.14 ok").words()


def test_ids_to_rows_duplicate_doc_ids():
    """A duplicated doc id must map to EVERY row carrying it (gold labeling
    is row-set membership; losing rows silently drops training questions)."""
    from proqa_tpu.index.idmap import IdMap

    m = IdMap(["a", "d", "b", "d", "c"])
    assert sorted(m.ids_to_rows(["d"])) == [1, 3]
    assert m.ids_to_rows(["missing"]) == []
    assert sorted(m.ids_to_rows(["a", "d"])) == [0, 1, 3]


def test_match_answer_span_empty_answer_guarded():
    """Empty-tokenizing answers must not vacuously match in the TRAIN path
    (deliberate divergence from the reference; recall-side para_has_answer
    keeps the reference's vacuous match — see test_reference_exec)."""
    from proqa_tpu.text.matching import match_answer_span, para_has_answer
    from proqa_tpu.text.simple import SimpleTokenizer

    tok = SimpleTokenizer()
    assert match_answer_span("some paragraph here", ["", "   "], tok) == []
    covered, matched = para_has_answer("some paragraph", [""], tok)
    assert covered and matched == ""   # reference semantics on the recall side
