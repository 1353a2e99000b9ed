"""Chemistry-aware evaluation metrics.

Behavioral re-implementation of the reference's evaluation suite
(/root/reference/markushgrapher/utils/ocsr/utils_evaluation.py, 1969 LoC)
on this framework's chemistry substrate. Metric namespace matches the
reference ({benchmark}_ar_{valid,tanimoto,inchi_equality,string_equality,
stable_recall,stable_precision,stable_equality,r,m,sg,cxsmi_equality,
markush_equality,...}, curriculumTrainer.py:744-769) so downstream dashboards
and the `metric_for_best_model` selection port unchanged.

Divergence note: where the reference uses RDKit InChI and MCS
(compute_markush_prediction_quality:1366-1969), this module uses canonical-
SMILES equality and fragment-level canonical matching from chem.mol —
self-consistent for GT-vs-prediction comparison. If RDKit is importable it is
used instead (chem.rdkit_compat).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

from markushgrapher_tpu.chem import cxsmiles as cx_lib
from markushgrapher_tpu.chem import mol as mol_lib
from markushgrapher_tpu.chem.abbreviation import Abbreviation, fix_cxsmiles


def levenshtein(a: str, b: str) -> int:
    try:
        from markushgrapher_tpu.utils import native

        d = native.levenshtein(a, b)
        if d is not None:
            return d
    except Exception:
        pass
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def get_stable_score(
    gt_stable: Optional[Dict[str, List[str]]],
    predicted_stable: Optional[Dict[str, List[str]]],
    permissive: bool = True,
    normalize: bool = True,
) -> Dict[str, object]:
    """Substituent-table recall/precision/equality with filler-word
    normalization ("aryl" == "an aryl group") — exact semantics of
    utils_evaluation.py:594-733."""
    scores = {"stable_equality": False, "stable_recall": 0.0,
              "stable_precision": 0.0}
    if predicted_stable is None:
        return scores
    gt_stable = gt_stable or {}
    if gt_stable == {}:
        if predicted_stable == {}:
            return {"stable_equality": True, "stable_recall": 1.0,
                    "stable_precision": 1.0}
        return scores

    if normalize:
        new_pred = {}
        for label, preds in predicted_stable.items():
            if label not in gt_stable:
                new_pred[label] = preds
                continue
            norm_gt = [s.replace("a ", "").replace(" group", "")
                       for s in gt_stable[label]]
            fixed = []
            for p in preds:
                if p in gt_stable[label]:
                    fixed.append(p)
                    continue
                norm_p = p.replace("a ", "").replace(" group", "")
                if norm_p in norm_gt:
                    fixed.append(gt_stable[label][norm_gt.index(norm_p)])
                else:
                    fixed.append(p)
            new_pred[label] = fixed
        predicted_stable = new_pred

    if permissive:
        gt_stable = {k.lower(): [e.lower().replace(" ", "") for e in v]
                     for k, v in gt_stable.items()}
        predicted_stable = {k.lower(): [e.lower().replace(" ", "") for e in v]
                            for k, v in predicted_stable.items()}

    gt_found, perfect = [], []
    for label, gts in gt_stable.items():
        if label not in predicted_stable:
            perfect.append(False)
            gt_found.append([False] * len(gts))
            continue
        perfect.append(set(gts) == set(predicted_stable[label]))
        gt_found.append([g in predicted_stable[label] for g in gts])

    pred_found = []
    for label, preds in predicted_stable.items():
        if preds == []:
            continue
        if label not in gt_stable:
            pred_found.append([False] * len(preds))
            continue
        pred_found.append([p in gt_stable[label] for p in preds])

    scores["stable_equality"] = all(perfect) if perfect else False
    scores["stable_recall"] = round(
        _mean([sum(r) / len(r) for r in gt_found]), 3) if gt_found else 0.0
    prec = _mean([sum(r) / len(r) for r in pred_found]) if pred_found else float("nan")
    scores["stable_precision"] = 0.0 if math.isnan(prec) else round(prec, 3)
    return scores


def _mean(xs: Sequence[float]) -> float:
    return sum(xs) / len(xs) if xs else float("nan")


def _ngrams(seq: Sequence[str], n: int):
    return [tuple(seq[i:i + n]) for i in range(len(seq) - n + 1)]


def rouge_n(pred: str, gt: str, n: int) -> float:
    """Char-level ROUGE-N f-measure (reference uses rouge_scorer over
    space-joined chars, utils_evaluation.py:1264-1276)."""
    p, g = list(pred), list(gt)
    pn, gn = _ngrams(p, n), _ngrams(g, n)
    if not pn or not gn:
        return 0.0
    from collections import Counter

    overlap = sum((Counter(pn) & Counter(gn)).values())
    prec = overlap / len(pn)
    rec = overlap / len(gn)
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def rouge_l(pred: str, gt: str) -> float:
    """Char-level ROUGE-L f-measure via LCS."""
    a, b = pred, gt
    if not a or not b:
        return 0.0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    lcs = prev[-1]
    prec, rec = lcs / len(a), lcs / len(b)
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def nlp_metrics(pred: str, gt: str) -> Dict[str, float]:
    """Char-level BLEU (nltk when available) + ROUGE-1/2/3/4/L
    (compute_nlp_metrics block, utils_evaluation.py:1238-1278)."""
    out: Dict[str, float] = {}
    try:
        from nltk.translate.bleu_score import (SmoothingFunction,
                                               sentence_bleu)

        ref, hyp = [list(gt)], list(pred)
        sm = SmoothingFunction().method1
        out["bleu_average"] = sentence_bleu(
            ref, hyp, weights=[0.25] * 4, smoothing_function=sm)
        for i in range(4):
            w = [0.0] * 4
            w[i] = 1.0
            out[f"bleu{i + 1}"] = sentence_bleu(
                ref, hyp, weights=w, smoothing_function=sm)
    except Exception:
        pass
    for n in range(1, 5):
        out[f"rouge{n}"] = rouge_n(pred, gt, n)
    out["rougeL"] = rouge_l(pred, gt)
    return out


def compute_molecule_prediction_quality(
    predicted_smiles: Optional[str],
    gt_smiles: str,
    remove_stereo: bool = False,
    compute_nlp_metrics: bool = False,
) -> Dict[str, object]:
    """String/canonical/Tanimoto equality for plain molecules
    (utils_evaluation.py:1131-1282). `inchi_equality` is canonical-SMILES
    equality on this substrate (see module docstring)."""
    scores = {
        "levenshtein": len(gt_smiles), "levenshtein0": False,
        "tanimoto": 0.0, "tanimoto1": False,
        "valid": False, "inchi_equality": False, "string_equality": False,
    }
    if predicted_smiles is None or (
            isinstance(predicted_smiles, float) and math.isnan(predicted_smiles)):
        return scores
    if not mol_lib.is_valid_smiles(predicted_smiles):
        return scores

    scores["string_equality"] = predicted_smiles == gt_smiles
    if compute_nlp_metrics:
        d = levenshtein(predicted_smiles, gt_smiles)
        scores["levenshtein"] = d
        scores["levenshtein0"] = d == 0
        scores.update(nlp_metrics(predicted_smiles, gt_smiles))

    pred, gt = predicted_smiles, gt_smiles
    if remove_stereo:
        try:
            pred = mol_lib.remove_stereo(pred)
            gt = mol_lib.remove_stereo(gt)
        except Exception:
            pass
    scores["tanimoto"] = mol_lib.tanimoto(gt, pred)
    scores["tanimoto1"] = scores["tanimoto"] == 1.0
    try:
        scores["inchi_equality"] = (
            mol_lib.canonical_smiles(gt) == mol_lib.canonical_smiles(pred))
    except Exception:
        scores["inchi_equality"] = False
    scores["valid"] = True
    return scores


def compute_markush_prediction_quality(
    predicted_cxsmiles: Optional[str],
    gt_cxsmiles: str,
    remove_stereo: bool = False,
) -> Dict[str, object]:
    """Markush (CXSMILES) structural comparison
    (utils_evaluation.py:1366-1969): fragment decomposition + per-fragment
    matching, R-label / m-section / Sg-section correctness, and
    `cxsmi_equality` = r AND m AND sg AND backbone AND fragment-count."""
    scores = {
        "valid_cxsmiles": False,
        "fragment_count_equality": False,
        "backbone_equality": False,
        "r": False, "m": False, "sg": False,
        "cxsmi_equality": False,
    }
    if not predicted_cxsmiles:
        return scores
    if not cx_lib.is_valid_cxsmiles(predicted_cxsmiles):
        return scores
    scores["valid_cxsmiles"] = True

    gt_canon = cx_lib.canonicalize_markush(gt_cxsmiles)
    pred_canon = cx_lib.canonicalize_markush(predicted_cxsmiles)
    if gt_canon is None or pred_canon is None:
        return scores
    gt_cx = cx_lib.parse_cxsmiles(gt_canon)
    pred_cx = cx_lib.parse_cxsmiles(pred_canon)

    # fragment decomposition (Chem.GetMolFrags equivalent)
    gt_frags = sorted(gt_cx.smiles.split("."))
    pred_frags = sorted(pred_cx.smiles.split("."))
    scores["fragment_count_equality"] = len(gt_frags) == len(pred_frags)
    scores["backbone_equality"] = gt_frags == pred_frags
    # partial credit: greedy best-match fragment similarity (the reference
    # uses rdFMCS per fragment pair for its core/side backbone scores,
    # utils_evaluation.py:1535-1696; here Morgan-environment overlap gives a
    # monotone substitute, exact 1.0 iff fragments match)
    scores["fragment_similarity"] = _fragment_similarity(gt_frags, pred_frags)

    # after canonicalization the atom order is canonical on both sides, so
    # label/section equality is index-exact when the backbones match
    scores["r"] = gt_cx.labels == pred_cx.labels
    scores["m"] = ([m.render() for m in gt_cx.m_sections]
                   == [m.render() for m in pred_cx.m_sections])
    scores["sg"] = ([s.render() for s in gt_cx.sg_sections]
                    == [s.render() for s in pred_cx.sg_sections])

    scores["cxsmi_equality"] = bool(
        scores["r"] and scores["m"] and scores["sg"]
        and scores["backbone_equality"] and scores["fragment_count_equality"])
    return scores


def replace_wildcards(smiles: str, remove_stereo: bool = False) -> str:
    """Substitute wildcard atoms (`*`) with carbon and re-canonicalize
    (utils_evaluation.py replace_wildcards:1339-1363 — applied to fragment
    SMILES before backbone comparison so attachment points don't block
    matching). Falls back to the input on parse failure, like the reference's
    permissive-parse retries."""
    try:
        mol = mol_lib.parse_smiles(smiles)
    except Exception:
        return smiles
    for atom in mol.atoms:
        if atom.symbol == "*":
            atom.symbol = "C"
            atom.isotope = 0
            atom.bracket = False
            atom.explicit_h = None
    try:
        out = mol_lib.to_smiles(mol)[0]
    except Exception:
        return smiles
    if remove_stereo:
        out = mol_lib.remove_stereo(out)
    return out


def get_smiles_star_raw(
    smiles: str,
    keypoints: Sequence[Sequence[float]] = (),
    atom_symbols: Sequence[str] = (),
    encode_position: bool = False,
    ocr_box_size: int = 80,
) -> str:
    """Build the `smiles!<atom boxes>` target string
    (utils_evaluation.py get_smiles_star_raw:1285-1336). Without
    encode_position this is the `smiles + "![[0,0]]"` form every shipped
    dataset uses; with it, per-atom OCR boxes of side `ocr_box_size` are
    centered on the keypoints (the reference reads symbols from a molblock;
    here they come from `atom_symbols`, same order as `keypoints`)."""
    if not encode_position:
        return smiles + "![[0,0]]"
    boxes = []
    for sym, kp in zip(atom_symbols, keypoints):
        boxes.append(str([kp[0] - ocr_box_size / 2, kp[1] - ocr_box_size / 2,
                          kp[0] + ocr_box_size / 2, kp[1] + ocr_box_size / 2]))
    return smiles + "!" + ",".join(boxes)


def _fragment_similarity(gt_frags: Sequence[str],
                         pred_frags: Sequence[str]) -> float:
    """Mean over GT fragments of the best Tanimoto match among predicted
    fragments (greedy one-to-one assignment, larger fragments first).
    Wildcards are carbon-substituted first (reference compares fragment
    backbones after replace_wildcards, utils_evaluation.py:1605-1608)."""
    if not gt_frags:
        return 1.0 if not pred_frags else 0.0
    gt_frags = [replace_wildcards(g) for g in gt_frags]
    pred_frags = [replace_wildcards(p) for p in pred_frags]
    pairs = []
    for gi, g in enumerate(gt_frags):
        for pi, p in enumerate(pred_frags):
            s = 1.0 if p == g else mol_lib.tanimoto(g, p)
            pairs.append((s, gi, pi))
    pairs.sort(reverse=True)
    used_g, used_p = set(), set()
    total = 0.0
    for s, gi, pi in pairs:
        if gi in used_g or pi in used_p:
            continue
        used_g.add(gi)
        used_p.add(pi)
        total += max(s, 0.0)
    return float(total / len(gt_frags))


def score_sample(
    prediction_text: str,
    gt_cxsmiles_opt: str,
    gt_stable: Optional[Dict[str, List[str]]],
    markush_tokenizer,
    abbreviation: Optional[Abbreviation] = None,
    remove_stereo: bool = False,
    fix: bool = True,
) -> Dict[str, object]:
    """One prediction string -> full score dict. Mirrors the per-sample flow
    of get_smiles_metrics (utils_evaluation.py:140-414): extract the
    <cxsmi> span and stable table, convert opt->out, fix abbreviations,
    compare against GT."""
    import re

    scores: Dict[str, object] = {}

    m = re.search(r"<cxsmi>(.*?)(</cxsmi>|$)", prediction_text)
    pred_opt = m.group(1).replace(" ", "").split("!")[0] if m else None

    gt_out = cx_lib.convert_opt_to_out(gt_cxsmiles_opt)
    pred_out = cx_lib.convert_opt_to_out(pred_opt) if pred_opt else None
    if fix:
        gt_out = fix_cxsmiles(gt_out, abbreviation)
        if pred_out:
            pred_out = fix_cxsmiles(pred_out, abbreviation)

    scores.update(compute_markush_prediction_quality(
        pred_out, gt_out, remove_stereo=remove_stereo))

    gt_body = cx_lib.split_extension(gt_out)[0]
    pred_body = cx_lib.split_extension(pred_out)[0] if pred_out else None
    scores.update(compute_molecule_prediction_quality(
        pred_body, gt_body, remove_stereo=remove_stereo))

    pred_stable = markush_tokenizer.get_stable(prediction_text)
    scores.update(get_stable_score(gt_stable, pred_stable))

    info = cx_lib.get_molecule_information(gt_out)
    scores["gt_has_r"], scores["gt_has_m"], scores["gt_has_sg"] = (
        info["r"], info["m"], info["sg"])
    scores["markush_equality"] = bool(
        scores["cxsmi_equality"] and scores["stable_equality"])
    return scores


def aggregate_scores(per_sample: Sequence[Dict[str, object]],
                     prefix: str = "") -> Dict[str, float]:
    """Mean-reduce bool/float fields over samples (get_scores reduction,
    utils_evaluation.py:777-1128)."""
    out: Dict[str, float] = {}
    if not per_sample:
        return out
    keys = set().union(*(s.keys() for s in per_sample))
    for k in sorted(keys):
        vals = [s[k] for s in per_sample if isinstance(s.get(k), (bool, int, float))]
        if vals:
            out[f"{prefix}{k}"] = float(sum(float(v) for v in vals) / len(vals))
    out[f"{prefix}n_samples"] = float(len(per_sample))
    return out
