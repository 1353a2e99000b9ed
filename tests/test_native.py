"""Native C++ extension: parity with the Python implementations."""

import numpy as np
import pytest

from markushgrapher_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable; Python fallbacks active")


class TestNative:
    def test_levenshtein_parity(self):
        from markushgrapher_tpu.chem import evaluation

        cases = [("kitten", "sitting"), ("", "abc"), ("same", "same"),
                 ("CCO", "OCC")]
        for a, b in cases:
            # python fallback path
            py = evaluation.levenshtein.__wrapped__(a, b) if hasattr(
                evaluation.levenshtein, "__wrapped__") else None
            assert native.levenshtein(a, b) == _py_lev(a, b)

    def test_atomwise_parity(self):
        smiles = [
            "CC(=O)Oc1ccccc1C(=O)O", "[13CH3]Cl%12Br", "C1CC1.c1ccccc1",
            "F/C=C\\F", "*<r>R1</r>*",  # grammar passthrough chars
        ]
        import re

        from markushgrapher_tpu.chem.smiles_tokenize import _SMILES_TOKEN_RE

        def py_tok(s):
            tokens, pos = [], 0
            while pos < len(s):
                m = _SMILES_TOKEN_RE.match(s, pos)
                if m:
                    tokens.append(m.group(0))
                    pos = m.end()
                else:
                    tokens.append(s[pos])
                    pos += 1
            return tokens

        for s in smiles:
            assert native.atomwise_tokenize(s) == py_tok(s), s

    def test_quantize(self):
        boxes = np.array([[0.0, 0.5, 1.0, 2.0], [-1.0, 0.2, 0.999, 0.001]],
                         np.float32)
        out = native.quantize_boxes(boxes, 500)
        np.testing.assert_array_equal(out, [[0, 250, 500, 500],
                                            [0, 100, 499, 0]])

    def test_split_cell_box(self):
        out = native.split_cell_box(np.array([10, 0, 40, 5], np.float32),
                                    np.array([12, 24], np.int32))
        np.testing.assert_allclose(out, [[10, 0, 20, 5], [20, 0, 40, 5]])


def _py_lev(a, b):
    if not a:
        return len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
