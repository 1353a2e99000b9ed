"""Training-set SMILES cache for the `is_in_training` overfit metric.

Equivalent of /root/reference/markushgrapher/utils/ocsr/utils_training.py:
16-68 (`get_training_smiles`): canonicalize every training-set (CX)SMILES
once, cache as pkl, and let the evaluator flag predictions that literally
reproduce training molecules (utils_evaluation.py:929-936)."""

from __future__ import annotations

import logging
import os
import pickle
from typing import Iterable, Optional, Set

from markushgrapher_tpu.chem.cxsmiles import split_extension
from markushgrapher_tpu.chem.mol import canonical_smiles

logger = logging.getLogger(__name__)


def get_training_smiles(smiles_iter: Iterable[str],
                        cache_path: Optional[str] = None) -> Set[str]:
    """Canonicalized training-set SMILES with pkl caching."""
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            return pickle.load(f)
    out: Set[str] = set()
    for s in smiles_iter:
        if not s:
            continue
        body = split_extension(s)[0]
        try:
            out.add(canonical_smiles(body))
        except Exception:
            continue
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        with open(cache_path, "wb") as f:
            pickle.dump(out, f)
        logger.info("cached %d training SMILES to %s", len(out), cache_path)
    return out


def is_in_training(prediction_smiles: str, training: Set[str]) -> bool:
    try:
        return canonical_smiles(split_extension(prediction_smiles)[0]) in training
    except Exception:
        return False
