"""Host-side text stack: tokenizers, span machinery, answer matching, metrics.

Covers the reference's vendored text code (qa/tokenizer.py, qa/basic_tokenizer.py,
qa/prepro_utils.py, qa/eval_utils.py, qa/official_eval.py and their retrieval/
duplicates) as one deduplicated package.
"""

from proqa_tpu.text.chars import (
    is_control,
    is_punctuation,
    is_whitespace,
    whitespace_tokenize,
)
from proqa_tpu.text.basic import BasicTokenizer
from proqa_tpu.text.wordpiece import BertTokenizer, WordpieceTokenizer, load_vocab
from proqa_tpu.text.simple import SimpleTokenizer, Tokens
from proqa_tpu.text.matching import (
    match_answer_span,
    normalize,
    normalize_para,
    para_has_answer,
    regex_match,
)
from proqa_tpu.text.squad import (
    find_answer_spans,
    get_final_text,
    improve_answer_span,
    prepare_context,
)
from proqa_tpu.text.metrics import (
    evaluate_predictions,
    exact_match_score,
    f1_score,
    metric_max_over_ground_truths,
    normalize_answer,
    regex_match_score,
)

__all__ = [
    "BasicTokenizer",
    "BertTokenizer",
    "SimpleTokenizer",
    "Tokens",
    "WordpieceTokenizer",
    "evaluate_predictions",
    "exact_match_score",
    "f1_score",
    "find_answer_spans",
    "get_final_text",
    "improve_answer_span",
    "is_control",
    "is_punctuation",
    "is_whitespace",
    "load_vocab",
    "match_answer_span",
    "metric_max_over_ground_truths",
    "normalize",
    "normalize_answer",
    "normalize_para",
    "para_has_answer",
    "prepare_context",
    "regex_match",
    "regex_match_score",
    "whitespace_tokenize",
]
