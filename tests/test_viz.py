"""Visualization: molecule layout/drawing and the 6-panel eval figure."""

import os

import numpy as np

from markushgrapher_tpu.chem.mol import parse_smiles
from markushgrapher_tpu.utils.viz import display_eval_sample, draw_molecule, layout_2d


class TestViz:
    def test_layout_shapes(self):
        mol = parse_smiles("CC(C)c1ccc(O)cc1")
        pos = layout_2d(mol, iterations=50)
        assert pos.shape == (mol.num_atoms(), 2)
        assert np.isfinite(pos).all()

    def test_draw_molecule_valid_and_invalid(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        assert draw_molecule(ax, "CC(*)O |$;;R1;$,m:2:0.1|")
        fig2, ax2 = plt.subplots()
        assert not draw_molecule(ax2, "((((garbage")
        plt.close("all")

    def test_display_eval_sample_saves(self, tmp_path):
        out = tmp_path / "sample.png"
        fig = display_eval_sample(
            image=np.full((64, 64, 3), 255, np.uint8),
            cells=[{"bbox": [0.1, 0.1, 0.4, 0.2], "text": "R1"}],
            gt_text="<markush><cxsmi>CC</cxsmi></markush>",
            pred_text="<markush><cxsmi>CC</cxsmi></markush>",
            gt_stable={"R1": ["F"]},
            pred_stable={"R1": ["F", "Cl"]},
            pred_cxsmiles="CC(*)O |$;;R1;$|",
            scores={"cxsmi_equality": True},
            output_path=str(out))
        assert os.path.exists(out) and os.path.getsize(out) > 1000
