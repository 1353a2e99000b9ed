"""Prediction postprocessing hook.

The reference ships an identity `MoleculePostprocessor`
(/root/reference/markushgrapher/utils/ocsr/utils_postprocessing.py:11-13,
applied at utils_evaluation.py:417-421) as the extension point for cleanup
passes. Here the hook is a composable pipeline with one useful default:
valence-safe syntax repair of common generation glitches (unbalanced ring
digits / brackets)."""

from __future__ import annotations

from typing import Callable, List, Optional

from markushgrapher_tpu.chem.mol import is_valid_smiles


def repair_unclosed_rings(smiles: str) -> str:
    """Drop ring-closure digits that appear an odd number of times."""
    from markushgrapher_tpu.chem.smiles_tokenize import atomwise_tokenizer

    tokens = atomwise_tokenizer(smiles)
    counts = {}
    for t in tokens:
        if t.isdigit() or (t.startswith("%") and len(t) == 3):
            counts[t] = counts.get(t, 0) + 1
    bad = {t for t, c in counts.items() if c % 2}
    if not bad:
        return smiles
    seen = {t: 0 for t in bad}
    out = []
    for t in tokens:
        if t in bad:
            seen[t] += 1
            if seen[t] == counts[t]:  # drop the last unpaired occurrence
                continue
        out.append(t)
    return "".join(out)


def repair_unbalanced_parens(smiles: str) -> str:
    depth = 0
    out = []
    for c in smiles:
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                continue
            depth -= 1
        out.append(c)
    out.extend(")" * depth)
    return "".join(out)


class MoleculePostprocessor:
    """Composable postprocessing; `postprocess` keeps the reference API name."""

    def __init__(self, steps: Optional[List[Callable[[str], str]]] = None,
                 repair: bool = False):
        self.steps = list(steps or [])
        if repair:
            self.steps.extend([repair_unbalanced_parens, repair_unclosed_rings])

    def postprocess(self, smiles: str) -> str:
        if not smiles:
            return smiles
        if not self.steps:
            return smiles  # identity default (reference behavior)
        if is_valid_smiles(smiles):
            return smiles
        fixed = smiles
        for step in self.steps:
            fixed = step(fixed)
            if is_valid_smiles(fixed):
                return fixed
        return smiles  # repairs failed: return the original
