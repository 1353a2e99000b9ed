"""Checkpointing: orbax-backed step checkpoints with rotation + resume,
per-submodule weight export/import, and weight fingerprints.

Capability parity with the reference:
 - HF Trainer step checkpoints with `save_total_limit` rotation and
   auto-resume from the last checkpoint (begin.py:61-74, train.py:265-274,
   config/train.yaml:52-55);
 - `save_weights_separately` per-submodule export for the two-phase training
   recipe (utils/model/utils_model_loading.py:6-42 — molscribe_encoder /
   molscribe_projector / decoder / lm_head);
 - `compute_weight_stats` / `compare_module_weights` checksum fingerprints
   (utils_model_loading.py:48-177) as a load-correctness self-check.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def last_checkpoint(output_dir: str) -> Optional[str]:
    """Most recent checkpoint-N dir (begin.py last_checkpoint:61-74)."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            step = int(m.group(1))
            if step > best_step:
                best, best_step = os.path.join(output_dir, name), step
    return best


class Checkpointer:
    """Orbax checkpointing of the TrainState with rotation."""

    def __init__(self, output_dir: str, save_total_limit: int = 10):
        import orbax.checkpoint as ocp

        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.save_total_limit = save_total_limit
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, state: Any) -> str:
        path = os.path.join(self.output_dir, f"checkpoint-{step}")
        self._ckptr.save(os.path.join(path, "state"), state, force=True)
        self._ckptr.wait_until_finished()
        self._rotate()
        logger.info("saved checkpoint %s", path)
        return path

    def restore(self, path: str, abstract_state: Any) -> Any:
        return self._ckptr.restore(os.path.join(path, "state"),
                                   abstract_state)

    def restore_params(self, path: str, abstract_params: Any) -> Any:
        """Params-only restore (for evaluation/serving: the optimizer state
        structure may differ from training, e.g. different grad-accum)."""
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                os.path.join(path, "state"),
                args=ocp.args.PyTreeRestore(
                    item={"params": abstract_params},
                    partial_restore=True))
        return restored["params"]

    def _rotate(self) -> None:
        ckpts = []
        for name in os.listdir(self.output_dir):
            m = _CKPT_RE.match(name)
            if m:
                ckpts.append((int(m.group(1)), name))
        ckpts.sort()
        while len(ckpts) > self.save_total_limit:
            _, name = ckpts.pop(0)
            import shutil

            shutil.rmtree(os.path.join(self.output_dir, name),
                          ignore_errors=True)
            logger.info("rotated out old checkpoint %s", name)


# -- submodule export / import ---------------------------------------------------

SUBMODULES = ("molscribe_encoder", "molscribe_projector", "encoder", "decoder",
              "lm_head", "shared_embedding")


def save_weights_separately(params: Dict, output_dir: str,
                            submodules: Optional[List[str]] = None) -> List[str]:
    """Export each top-level submodule as its own msgpack file
    (utils_model_loading.py:6-42)."""
    from flax import serialization
    from markushgrapher_tpu.parallel.mesh import unbox

    os.makedirs(output_dir, exist_ok=True)
    tree = unbox(params.get("params", params))
    written = []
    for name in (submodules or SUBMODULES):
        if name not in tree:
            continue
        path = os.path.join(output_dir, f"{name}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(tree[name]))
        written.append(path)
        logger.info("exported %s", path)
    return written


def load_submodule_weights(params: Dict, name: str, path: str) -> Dict:
    """Tolerant submodule load (`safe_load` equivalent, begin.py:141-172):
    replace the submodule subtree from a msgpack file; shape mismatches
    raise with the offending paths listed."""
    from flax import serialization
    from flax import linen as nn

    tree = params["params"] if "params" in params else params
    if name not in tree:
        raise KeyError(f"model has no submodule {name!r}; has {list(tree)}")
    with open(path, "rb") as f:
        data = f.read()

    target = tree[name]
    boxed = jax.tree.map(
        lambda x: x.value if isinstance(x, nn.Partitioned) else x, target,
        is_leaf=lambda x: isinstance(x, nn.Partitioned))
    loaded = serialization.from_bytes(boxed, data)

    mismatches = []
    def check(path_, a, b):
        if a.shape != b.shape:
            mismatches.append((path_, a.shape, b.shape))
    jax.tree_util.tree_map_with_path(
        lambda p, a, b: check(jax.tree_util.keystr(p), a, b), boxed, loaded)
    if mismatches:
        raise ValueError(f"shape mismatches loading {name}: {mismatches}")

    # re-box with the original partitioning metadata
    def rebox(orig, new):
        if isinstance(orig, nn.Partitioned):
            return orig.replace_boxed(new)
        return new
    reboxed = jax.tree.map(rebox, target, loaded,
                           is_leaf=lambda x: isinstance(x, nn.Partitioned))
    tree[name] = reboxed
    return params


# -- fingerprints ---------------------------------------------------------------

def compute_weight_stats(params: Dict) -> Dict[str, Any]:
    """Checksum-style fingerprints: param count, first/last-1000 sums,
    per-tensor sums (utils_model_loading.py:48-92)."""
    from markushgrapher_tpu.parallel.mesh import unbox

    tree = unbox(params.get("params", params))
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    per_tensor = {}
    total = 0
    flat_parts = []
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf, np.float64)
        key = jax.tree_util.keystr(path)
        per_tensor[key] = float(arr.sum())
        total += arr.size
        flat_parts.append(arr.reshape(-1))
    flat = np.concatenate(flat_parts) if flat_parts else np.zeros(0)
    return {
        "num_params": int(total),
        "first_1000_sum": float(flat[:1000].sum()),
        "last_1000_sum": float(flat[-1000:].sum()),
        "per_tensor_sums": per_tensor,
    }


def compare_module_weights(params: Dict, reference_json: str,
                           atol: float = 1e-4) -> List[str]:
    """Compare fingerprints against a stored JSON; returns mismatch list
    (utils_model_loading.py compare_module_weights:93-177)."""
    with open(reference_json) as f:
        ref = json.load(f)
    cur = compute_weight_stats(params)
    problems = []
    if cur["num_params"] != ref.get("num_params"):
        problems.append(
            f"num_params {cur['num_params']} != {ref.get('num_params')}")
    for key in ("first_1000_sum", "last_1000_sum"):
        if abs(cur[key] - ref.get(key, 0.0)) > atol:
            problems.append(f"{key} {cur[key]} != {ref.get(key)}")
    for name, s in ref.get("per_tensor_sums", {}).items():
        c = cur["per_tensor_sums"].get(name)
        if c is None:
            problems.append(f"missing tensor {name}")
        elif abs(c - s) > atol:
            problems.append(f"tensor {name} sum {c} != {s}")
    return problems
