"""Definition-group selection: pair R-group labels in the molecule image
region with their textual definitions.

Equivalent of the reference's `DefinitionGroupSelector`
(/root/reference/markushgrapher/utils/ocsr/definition_group_selector.py:
detect_markush_structure_image_tokens :56-104 clusters tokens by bbox
proximity to find the structure-image region; R-labels matched with
`[ABDEGJKLMQRTUVWXYZ]\\d{0,2}` :106-139; `select` :141 emits
[image_span, text_span] index pairs). Used when `encode_definition_group`
is enabled (off in all shipped reference configs); output is padded to
16x4 like the reference's tensor (utils/common.py:77-97).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

R_LABEL_RE = re.compile(r"^[ABDEGJKLMQRTUVWXYZ]\d{0,2}$")

MAX_GROUPS = 16


@dataclass
class DefinitionGroupSelector:
    """Operates on (words, bboxes) in [0,1] cell space."""

    image_region_threshold: float = 0.04  # proximity for region growing

    def detect_image_region(self, bboxes: Sequence[Sequence[float]]
                            ) -> List[int]:
        """Indices of words inside the molecule-drawing region: grow a
        cluster from the densest box neighborhood (structure images have many
        small, tightly packed atom labels)."""
        n = len(bboxes)
        if n == 0:
            return []
        centers = np.asarray([[(b[0] + b[2]) / 2, (b[1] + b[3]) / 2]
                              for b in bboxes])
        d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
        # structure-image tokens are small and densely packed in 2D; seed
        # from the tightest neighborhood and grow with the same small radius
        neighbor_counts = (d < self.image_region_threshold).sum(-1)
        seed = int(np.argmax(neighbor_counts))
        cluster = {seed}
        frontier = [seed]
        while frontier:
            i = frontier.pop()
            for j in range(n):
                if j not in cluster and d[i, j] < self.image_region_threshold:
                    cluster.add(j)
                    frontier.append(j)
        return sorted(cluster)

    def find_r_labels(self, words: Sequence[str]) -> Dict[str, List[int]]:
        labels: Dict[str, List[int]] = {}
        for i, w in enumerate(words):
            clean = w.lstrip("▁").strip()
            if R_LABEL_RE.match(clean):
                labels.setdefault(clean, []).append(i)
        return labels

    def select(self, words: Sequence[str], bboxes: Sequence[Sequence[float]]
               ) -> np.ndarray:
        """-> [MAX_GROUPS, 4] int32 rows (img_start, img_end, txt_start,
        txt_end), zero-padded. A group pairs an R-label occurrence inside the
        image region with an occurrence of the same label outside it (its
        definition line)."""
        image_idx = set(self.detect_image_region(bboxes))
        labels = self.find_r_labels(words)
        groups: List[Tuple[int, int, int, int]] = []
        for label, occurrences in sorted(labels.items()):
            inside = [i for i in occurrences if i in image_idx]
            outside = [i for i in occurrences if i not in image_idx]
            if not inside or not outside:
                continue
            img_i = inside[0]
            txt_i = outside[0]
            # definition span: from the label to the end of its line
            # (words sharing its row band)
            y0 = bboxes[txt_i][1]
            txt_end = txt_i
            for j in range(txt_i + 1, len(words)):
                if abs(bboxes[j][1] - y0) < 0.02:
                    txt_end = j
                else:
                    break
            groups.append((img_i, img_i + 1, txt_i, txt_end + 1))
            if len(groups) >= MAX_GROUPS:
                break
        out = np.zeros((MAX_GROUPS, 4), np.int32)
        for k, g in enumerate(groups):
            out[k] = g
        return out
