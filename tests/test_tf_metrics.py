"""Teacher-forced metric tests: token accuracy, loc MAE, loc IoU."""

import numpy as np

import jax.numpy as jnp

from markushgrapher_tpu.data.vocab import LOC_BASE_ID
from markushgrapher_tpu.train.tf_metrics import loc_box_iou, token_metrics


class TestTokenMetrics:
    def test_accuracy_and_loc_mae(self):
        V = LOC_BASE_ID + 600
        labels = jnp.asarray([[5, LOC_BASE_ID + 10, LOC_BASE_ID + 20, -100]])
        logits = np.full((1, 4, V), -10.0, np.float32)
        logits[0, 0, 5] = 10            # correct
        logits[0, 1, LOC_BASE_ID + 14] = 10  # loc, off by 4
        logits[0, 2, LOC_BASE_ID + 20] = 10  # loc exact
        logits[0, 3, 7] = 10            # padded, ignored
        m = token_metrics(jnp.asarray(logits), labels)
        assert abs(float(m["token_accuracy"]) - 2 / 3) < 1e-6
        assert float(m["loc_mae"]) == 2.0     # (4 + 0) / 2
        assert float(m["loc_token_type_accuracy"]) == 1.0

    def test_loc_iou(self):
        L = LOC_BASE_ID
        labels = np.asarray([[1, L + 0, L + 0, L + 100, L + 100, 2]])
        preds_same = labels.copy()
        assert loc_box_iou(preds_same, labels) == 1.0
        preds_half = labels.copy()
        preds_half[0, 3:5] = [L + 50, L + 100]  # box 0,0,50,100
        iou = loc_box_iou(preds_half, labels)
        assert abs(iou - 0.5) < 1e-6
        # non-loc predictions in loc slots -> skipped
        preds_bad = labels.copy()
        preds_bad[0, 1:5] = [5, 6, 7, 8]
        assert loc_box_iou(preds_bad, labels) == 0.0
