"""Auxiliary subsystems: definition groups, training-SMILES cache,
postprocessor, profiling utilities."""

import numpy as np
import pytest

from markushgrapher_tpu.chem.postprocess import (
    MoleculePostprocessor,
    repair_unbalanced_parens,
    repair_unclosed_rings,
)
from markushgrapher_tpu.chem.training_smiles import get_training_smiles, is_in_training
from markushgrapher_tpu.data.definition_groups import DefinitionGroupSelector
from markushgrapher_tpu.utils.profiling import MetricsLogger, StepTimer, device_memory_stats


class TestDefinitionGroups:
    def test_select_pairs_image_and_text(self):
        # dense cluster of structure tokens around (0.4, 0.3) + definition rows
        words = ["C", "N", "R1", "O", "C", "R1", "=", "halogen",
                 "R2", "=", "alkyl"]
        boxes = [
            [0.38, 0.28, 0.40, 0.30], [0.40, 0.28, 0.42, 0.30],
            [0.42, 0.30, 0.44, 0.32], [0.38, 0.32, 0.40, 0.34],
            [0.40, 0.32, 0.42, 0.34],
            [0.10, 0.80, 0.14, 0.83], [0.15, 0.80, 0.17, 0.83],
            [0.18, 0.80, 0.28, 0.83],
            [0.10, 0.86, 0.14, 0.89], [0.15, 0.86, 0.17, 0.89],
            [0.18, 0.86, 0.26, 0.89],
        ]
        sel = DefinitionGroupSelector()
        groups = sel.select(words, boxes)
        assert groups.shape == (16, 4)
        # R1 appears in the image cluster (idx 2) and in text (idx 5)
        assert groups[0].tolist() == [2, 3, 5, 8]

    def test_no_groups(self):
        sel = DefinitionGroupSelector()
        out = sel.select(["plain", "text"], [[0, 0, 0.1, 0.1],
                                             [0.9, 0.9, 1, 1]])
        assert (out == 0).all()


class TestTrainingSmiles:
    def test_cache_and_membership(self, tmp_path):
        cache = tmp_path / "train.pkl"
        smiles = ["CCO", "OCC", "c1ccccc1 |m:0:1.2|", "invalid((("]
        s = get_training_smiles(smiles, str(cache))
        assert len(s) == 2  # CCO==OCC canonical; benzene; invalid dropped
        assert is_in_training("OCC", s)
        assert not is_in_training("CCN", s)
        # cache round-trip
        s2 = get_training_smiles([], str(cache))
        assert s2 == s


class TestPostprocess:
    def test_identity_default(self):
        pp = MoleculePostprocessor()
        assert pp.postprocess("C1CC") == "C1CC"  # reference identity behavior

    def test_repair_mode(self):
        pp = MoleculePostprocessor(repair=True)
        assert pp.postprocess("C1CC") == "CCC"        # unclosed ring dropped
        assert pp.postprocess("CC(C") == "CC(C)"      # paren balanced
        assert pp.postprocess("CCO") == "CCO"         # valid untouched

    def test_repair_helpers(self):
        assert repair_unclosed_rings("C1CCCCC1C2CC") == "C1CCCCC1CCC"
        assert repair_unbalanced_parens(")CC(") == "CC()"


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(warmup=1)
        for _ in range(3):
            with t:
                pass
        assert t.count == 3 and t.steps_per_sec > 0

    def test_metrics_logger(self, tmp_path):
        path = tmp_path / "m.jsonl"
        ml = MetricsLogger(str(path))
        ml.log({"loss": 1.0}, step=1)
        ml.log({"loss": 0.5}, step=2)
        assert len(ml.history) == 2
        assert len(path.read_text().splitlines()) == 2

    def test_device_memory_stats(self):
        stats = device_memory_stats()
        assert len(stats) >= 1

    def test_aggregate_trace(self, tmp_path):
        """aggregate_trace classifies per-step vs one-time device ops with
        the mode-based captured-step estimator (truncated captures report
        honest ms/step) and groups by op family."""
        import gzip
        import json

        from markushgrapher_tpu.utils.profiling import aggregate_trace

        # synthetic Chrome trace: 2 per-step fusions seen 100x (a truncated
        # 512-step capture), one helper seen 200x, one-time encoder ops
        evs = []
        for i in range(100):
            evs.append({"ph": "X", "pid": 3, "name": "fusion.1", "dur": 10,
                        "args": {"long_name": "%fusion.1 = f32[8]"}})
            evs.append({"ph": "X", "pid": 3, "name": "my_kernel.2",
                        "dur": 30, "args": {}})
            evs += [{"ph": "X", "pid": 3, "name": "dynamic_update_slice.3",
                     "dur": 1, "args": {}}] * 2
        evs.append({"ph": "X", "pid": 3, "name": "one_time.9", "dur": 500,
                    "args": {}})
        evs.append({"ph": "X", "pid": 1, "name": "host_thing", "dur": 9e9,
                    "args": {}})   # non-TPU pid ignored
        evs.append({"ph": "X", "pid": 3, "name": "while.1", "dur": 9e9,
                    "args": {}})   # container region ignored
        d = tmp_path / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        with gzip.open(d / "vm.trace.json.gz", "wt") as f:
            json.dump({"traceEvents": evs}, f)
        out = aggregate_trace(str(tmp_path), steps=512)
        assert out["steps_seen"] == 100
        # per-step: 10 + 30 + 2*1 = 42 us/step = 0.042 ms/step
        assert abs(out["per_step_ms"] - 0.042) < 1e-9
        assert abs(out["one_time_ms"] - 0.5) < 1e-9
        fams = dict((n, ms) for n, ms, _ in out["families"])
        assert "my_kernel" in fams and "while" not in fams
        top_names = [n for n, *_ in out["top"]]
        assert "one_time.9" not in top_names


class TestTracker:
    """Experiment-tracker backends (utils/tracker; reference train.py:68-78
    wires ClearML behind report_to with an import guard)."""

    def test_none_and_unknown_are_noop(self):
        from markushgrapher_tpu.utils.tracker import NoopTracker, make_tracker

        assert isinstance(make_tracker("none"), NoopTracker)
        assert isinstance(make_tracker(""), NoopTracker)
        assert isinstance(make_tracker("wandb"), NoopTracker)  # unknown

    def test_clearml_missing_degrades_to_noop(self):
        from markushgrapher_tpu.utils.tracker import NoopTracker, make_tracker

        t = make_tracker("clearml", task_name="x")  # clearml not installed
        assert isinstance(t, NoopTracker)

    def test_jsonl_tracker_streams_during_training(self, tmp_path):
        import json

        from markushgrapher_tpu.utils.tracker import make_tracker

        t = make_tracker("jsonl", output_dir=str(tmp_path))
        t.connect({"lr": 1e-4, "model": object()})
        t.log_scalars(1, {"loss": 2.0})
        t.log_scalars(2, {"loss": 1.5, "note": "eval"})
        # stream is on disk BEFORE close (a killed run keeps its curve)
        lines = [json.loads(x) for x in
                 (tmp_path / "tracker.jsonl").read_text().splitlines()]
        t.close()
        assert lines[0]["event"] == "config" and lines[0]["lr"] == 1e-4
        assert lines[1] == {"step": 1, "loss": 2.0}
        assert lines[2]["step"] == 2 and lines[2]["loss"] == 1.5

    def test_trainer_loop_feeds_tracker(self):
        """The Trainer.train loop must forward log_history events to the
        tracker (train + eval)."""
        from tests.test_train import tiny_setup

        trainer, batch = tiny_setup()

        class Capture:
            events = []

            def log_scalars(self, step, scalars):
                self.events.append((step, dict(scalars)))

        trainer.tracker = Capture()
        trainer.eval_fn = lambda state, step: {"eval_loss": 0.0}
        trainer.cfg = __import__("dataclasses").replace(
            trainer.cfg, eval_steps=2, max_steps=2)
        import jax

        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng, batch)
        trainer.train(state, iter([batch] * 4), rng, max_steps=2,
                      log_every=1)
        steps = [s for s, _ in Capture.events]
        assert 1 in steps and 2 in steps
        assert any("eval_loss" in sc for _, sc in Capture.events)
