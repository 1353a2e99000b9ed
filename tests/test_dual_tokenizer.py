"""Dual-tokenizer eval fidelity: the reference builds TWO MarkushTokenizers
at eval time — inputs/GT pinned to `mdu_3005` encoding, predictions per the
dataset's `training_dataset_name` (/root/reference/markushgrapher/eval.py:39,
58-77; consumed at utils_evaluation.py:229 vs :354). With `mdu_300` the two
vocabularies genuinely diverge: its substituent separator is "," while the
default is "<n>" (markush_tokenizer.py:21-26)."""

import pytest

from markushgrapher_tpu.data.markush_tokenizer import MarkushTokenizer
from markushgrapher_tpu.eval_pipeline import EvalConfig, Evaluator

GT_ANNOTATION = (
    "<markush><cxsmi>C</cxsmi>"
    "<stable>R1:H<n>Me<ns>R2:F</stable></markush>"
)
PRED_TEXT = (
    "<markush><cxsmi>C</cxsmi>"
    "<stable>R1:H,Me<ns>R2:F</stable></markush>"
)


@pytest.fixture(scope="module")
def tokenizers():
    mt_input = MarkushTokenizer(training_dataset_name="mdu_3005")
    mt_pred = MarkushTokenizer(training_dataset_name="mdu_300")
    return mt_input, mt_pred


def test_mdu_300_separator_diverges(tokenizers):
    mt_input, mt_pred = tokenizers
    assert mt_input.substituents_separator == "<n>"
    assert mt_pred.substituents_separator == ","
    # the same GT string parses DIFFERENTLY under the two tokenizers — this
    # is the silent divergence the dual-tokenizer pairing exists to prevent
    assert mt_input.get_stable(GT_ANNOTATION) == {
        "R1": ["H", "Me"], "R2": ["F"]}
    assert mt_pred.get_stable(GT_ANNOTATION) != {
        "R1": ["H", "Me"], "R2": ["F"]}


def test_score_one_uses_input_tokenizer_for_gt(tokenizers):
    """Evaluator must parse GT with the input tokenizer and the prediction
    with the training tokenizer — exactly the reference pairing."""
    mt_input, mt_pred = tokenizers
    ev = Evaluator(model=None, params={}, markush_tokenizer=mt_pred,
                   cfg=EvalConfig(bf16_params=False, cache_predictions=False),
                   input_tokenizer=mt_input)
    predictions, per_sample = [], []
    meta = {"id": 0, "gt_cxsmiles_opt": "C", "gt_annotation": GT_ANNOTATION}
    ev._score_one(meta, PRED_TEXT, predictions, per_sample)
    s = per_sample[0]
    # comma-separated prediction == <n>-separated GT under the right pairing
    assert s["stable_equality"] is True
    assert s["markush_equality"] is True

    # single-tokenizer pairing (the pre-round-3 behavior) parses the GT with
    # the mdu_300 comma separator and misses the equality
    ev_single = Evaluator(model=None, params={}, markush_tokenizer=mt_pred,
                          cfg=EvalConfig(bf16_params=False,
                                         cache_predictions=False))
    predictions2, per_sample2 = [], []
    ev_single._score_one(dict(meta), PRED_TEXT, predictions2, per_sample2)
    assert per_sample2[0]["stable_equality"] is False
